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
 * The commit/rollup/compaction PROTOCOL lives in the shared [[ShardLog]]
 * (r15 verdict #2: this class used to hand-roll its own copy of the
 * crash-ordering discipline; now one implementation serves the whole
 * maintenance family, including the r15 serve-while-compact deferral).
 * This class contributes only what is dedup-specific:
 *
 *  - `fps/<b>/` — batch b's STORED COLUMNS (SimHash: doc_id + fp;
 *    MinHash: doc_id + banded signatures + word-hash set) — written ONCE
 *    at ingest, O(batch); the standing corpus is only ever SCANNED
 *    afterwards (the banded join's corpus side), never re-materialized.
 *    This is what makes per-batch cost O(batch + candidates): the
 *    r10/r11 shape that re-checkpointed the accumulated fingerprint
 *    union every batch was quadratic in batch count. fps shards are
 *    never compacted (they ARE the corpus-side stored columns); their
 *    enumeration is cached from one startup listing, advanced per
 *    commit, and gated on the log's committed state.
 *  - `delta/<b>/` — the [[ShardLog]] data shards: batch b's MERGE
 *    payload (node, comp, b) — only rows the batch changed or created
 *    (the algo's delta refresh), O(ingest activity), never O(index).
 *  - [[IndexMaintenance.DeltaFold]] — the latest-wins fold semantics:
 *    the snapshot holds one row per node and is anti-joined (broadcast,
 *    never shuffled) against the windowed tail; snapshots carry a `b`
 *    stamp so an empty-delta batch still reads under the explicit
 *    schema.
 *
 * Exactly-once under foreachBatch replay: Spark commits source offsets
 * AFTER foreachBatch returns, so a crash can leave batch b fully or
 * partially persisted here but uncommitted there. Replay of a COMMITTED
 * batch is a no-op (the marker short-circuits); replay of a crashed
 * batch rewrites fps/delta in overwrite mode and then commits — the
 * standard idempotent-foreachBatch protocol.
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

  private val log = new ShardLog(spark, root, "delta", compactEvery,
    IndexMaintenance.DeltaFold, deleteKey = "node")

  private def fs = new Path(root)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  // committed batch ids whose fps/<b> shard is part of the standing
  // corpus scan — cached from one startup listing and advanced per commit
  @volatile private var fpsIdsMemo: Vector[Long] = _
  private def fpsIds: Vector[Long] = {
    if (fpsIdsMemo == null) {
      val fpsDir = new Path(s"$root/fps")
      fpsIdsMemo =
        if (!fs.exists(fpsDir)) Vector.empty
        else fs.listStatus(fpsDir).toVector
          .flatMap(s => scala.util.Try(s.getPath.getName.toLong).toOption)
          // an fps dir without a committed marker is a crashed batch's
          // debris — its replay overwrites it; never scan it as standing
          .filter(log.isCommitted)
          .sorted
    }
    fpsIdsMemo
  }

  /** Committed batch ids still individually listed — the post-snapshot
    * TAIL. Ids <= [[coveredUpTo]] are committed but rolled into the
    * snapshot marker; use [[isCommitted]]/[[committedCount]] for the full
    * picture. */
  def committedIds: Seq[Long] = log.committedIds

  /** Max batch id summarized by the latest compacted snapshot. */
  def coveredUpTo: Option[Long] = log.coveredUpTo

  def isCommitted(id: Long): Boolean = log.isCommitted(id)

  /** Total committed batches (covered prefix + tail). */
  def committedCount: Long = log.committedCount

  // committed DELETE-batch ids whose fpsdels/<b> mask shard is part of
  // the standing-corpus anti-join — same caching discipline as fpsIds
  @volatile private var fpsDelIdsMemo: Vector[Long] = _
  private def fpsDelIds: Vector[Long] = {
    if (fpsDelIdsMemo == null) {
      val d = new Path(s"$root/fpsdels")
      fpsDelIdsMemo =
        if (!fs.exists(d)) Vector.empty
        else fs.listStatus(d).toVector
          .flatMap(s => scala.util.Try(s.getPath.getName.toLong).toOption)
          .filter(log.isCommitted)
          .sorted
    }
    fpsDelIdsMemo
  }

  /**
   * DELETE documents from the index (takedown / right-to-erasure):
   * `docIds` is any DataFrame exposing `doc_id`. Two effects, one
   * marker:
   *
   *  - the standing `(node, comp)` rows vanish from serves immediately
   *    and are PHYSICALLY purged by the covering compaction (the shared
   *    [[ShardLog.commitDeletes]] tombstone protocol);
   *  - the docs' stored columns (fps shards are immutable, never
   *    compacted) are MASKED out of every later batch's standing-corpus
   *    scan by a persistent `fpsdels/` key set — a removed doc can no
   *    longer attract new ingest into its component.
   *
   * Honest residuals, by design: surviving docs keep the component
   * labels computed while the deleted doc was present (deletion removes
   * rows, it does not re-split components — a rebuild does), and the
   * deleted docs' 64-bit fingerprints stay on disk masked (not content;
   * physically erased at the next index rebuild).
   */
  def deleteBatch(batchId: Long, docIds: DataFrame): Unit = {
    if (log.isCommitted(batchId)) return
    val keys = docIds.select(col("doc_id").cast("long").as("node")).distinct()
    // the fps mask shard goes first — marker-last ordering makes the
    // crash replay overwrite both shards before committing
    keys.select(col("node").as("doc_id"))
      .write.mode("overwrite").parquet(s"$root/fpsdels/$batchId")
    log.commitDeletes(batchId, keys, """{"del":true}""")
    if (fpsDelIdsMemo != null)
      fpsDelIdsMemo = (fpsDelIdsMemo :+ batchId).distinct.sorted
  }

  /** Eager compaction (cadence-independent); two calls physically purge
    * every tombstoned `(node, comp)` row from the delta log. */
  def compactNow(): Unit = log.compactNow()

  /** The standing `(node, comp)` index over all committed batches —
    * resolved from the cached commit state at plan time; safe to execute
    * concurrently with ONE later compaction (the [[ShardLog]] deferral
    * contract). */
  def currentIndex(): DataFrame = log.currentRows()

  /**
   * Fold one ingest batch into the index. Idempotent: a replayed
   * committed batch returns immediately; a replayed crashed batch
   * self-heals through overwrite writes. Per-batch cost is
   * O(batch) writes + O(standing fps + index) scans + CC over the
   * touched subgraph — independent of HOW MANY batches preceded.
   */
  def processBatch(batchId: Long, docs: DataFrame): Unit = {
    if (log.isCommitted(batchId)) return
    val standingFps = fpsIds
    // stage ONLY this batch's docs into the algo's stored columns and
    // persist them once — the lakehouse regime where fingerprints /
    // signatures are stored columns of the doc table
    graft.operators.Jobs.labeled(spark, s"idxmaint b=$batchId stage fps") {
      algo.stage(docs.select(col("doc_id"), col("text")))
        .write.mode("overwrite").parquet(s"$root/fps/$batchId")
    }
    // explicit schema: an EMPTY ingest file is a legal batch
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
      else {
        val raw = spark.read.schema(algo.stagedSchema)
          .parquet(standingFps.map(b => s"$root/fps/$b"): _*)
        // deleted docs are MASKED out of the standing corpus (fps shards
        // are immutable): key-only anti-join, broadcast-sized, applied
        // under the cache so every chunk scan sees the masked corpus
        val masked =
          if (fpsDelIds.isEmpty) raw
          else raw.join(
            spark.read.parquet(fpsDelIds.map(b => s"$root/fpsdels/$b"): _*),
            Seq("doc_id"), "left_anti")
        Some(masked.persist())
      }
    // transient per-batch caches: the banded join scans the standing fps
    // once per simhash chunk and the delta tail scans `base` three times;
    // both are released before the batch commits and before the
    // compaction scan (commitShardNoCompact + compactIfDue below), so no
    // cross-batch memory state accumulates (a restart pays two cold scans)
    val all = standingRaw
      .map(_.withColumn("inc", lit(false)).unionByName(newFps))
      .getOrElse(newFps)
    val base = log.currentRows().persist()
    try {
      graft.operators.Jobs.labeled(spark, s"idxmaint b=$batchId refresh delta") {
        // sink form: the delta's ONE materialization IS the shard write
        // (r17 opt round — the old shape localCheckpointed the delta and
        // then wrote the checkpoint back out, one redundant job per batch)
        algo.refreshDeltaTo(all, base,
          df => log.writeShard(batchId, df.withColumn("b", lit(batchId))))
        log.commitWrittenShard(batchId, s"""{"batch":$batchId}""")
      }
    } finally {
      standingRaw.foreach(_.unpersist())
      base.unpersist()
    }
    if (fpsIdsMemo != null) fpsIdsMemo = (fpsIdsMemo :+ batchId).sorted
    // periodic delta-log compaction: every compactEvery committed
    // batches, fold the log into a snapshot so the per-batch index read
    // stays O(index + compactEvery deltas) forever. Compaction is an
    // optimization of DERIVED data — skipping it (e.g. this batch was
    // replayed and short-circuited above) only defers truncation to a
    // later compaction point.
    log.compactIfDue()
  }
}

object IndexMaintenance {

  private[streaming] val deltaSchema = new StructType()
    .add("node", LongType).add("comp", LongType).add("b", LongType)

  private def emptyIndex(spark: SparkSession): DataFrame =
    spark.createDataFrame(new java.util.ArrayList[Row](),
      new StructType().add("node", LongType).add("comp", LongType))

  /**
   * Latest-wins DELTA semantics over the shared [[ShardLog]] protocol:
   * deltas carry their batch id as a stored column so the tail fold is
   * ONE multi-path FileScan + window, and the snapshot (one row per
   * node) is anti-joined against the tail's node set — broadcast, never
   * an O(index) exchange (r12 verdict #2: the old shape ran the
   * row_number window over snapshot ∪ tail, a full-index shuffle on
   * every batch). Explicit broadcast: the tail is bounded by
   * compactEvery batches of deltas (each O(ingest activity)) —
   * structurally small — while file-size stats alone would leave the
   * planner free to pick a sort-merge join and re-shuffle the snapshot.
   */
  private[streaming] object DeltaFold extends ShardLog.Fold {
    def rows(spark: SparkSession, snapshot: Option[String],
        tail: Seq[(Long, String)]): DataFrame = {
      // explicit schema: a batch whose delta is EMPTY (no new pairs) is
      // legal, and schema inference over an empty parquet dir would fail
      def read(paths: Seq[String]): DataFrame =
        spark.read.schema(deltaSchema).parquet(paths: _*)
      // latest-wins over the delta TAIL only — O(recent activity), never
      // O(index); tail deltas all carry b > the snapshot's batch id
      val tailFold = Option(tail).filter(_.nonEmpty).map { t =>
        val w = Window.partitionBy(col("node")).orderBy(col("b").desc)
        read(t.map(_._2))
          .withColumn("rn", row_number().over(w))
          .where(col("rn") === 1)
          .select(col("node"), col("comp"))
      }
      val snap = snapshot.map(p => read(Seq(p)).select(col("node"), col("comp")))
      (snap, tailFold) match {
        case (Some(s), None) => s
        case (None, Some(t)) => t
        case (None, None) => empty(spark) // unreachable: ShardLog guards
        case (Some(s), Some(t)) =>
          s.join(broadcast(t.select(col("node"))), Seq("node"), "left_anti")
            .unionByName(t)
      }
    }
    // the `b` stamp keeps the snapshot readable under deltaSchema (and an
    // all-columns multi-path read with later tail deltas well-typed)
    override def snapshotRows(rows: DataFrame, upTo: Long): DataFrame =
      rows.select(col("node"), col("comp")).withColumn("b", lit(upTo))
    override def empty(spark: SparkSession): DataFrame = emptyIndex(spark)
  }

  /**
   * Stored-column strategy for the maintenance loop: how a batch's docs
   * are staged (what the lakehouse stores per doc), and how the staged
   * union of (standing ∪ incoming) — flagged by `inc` — refreshes into
   * a delta against the standing index.
   */
  sealed trait Algo {
    private[streaming] def stage(docs: DataFrame): DataFrame
    private[streaming] def stagedSchema: StructType
    /** Sink form: the delta plan's single materialization is the caller's
      * `sink` (the batch's shard write) — no intermediate checkpoint. */
    private[streaming] def refreshDeltaTo(staged: DataFrame, base: DataFrame,
        sink: DataFrame => Unit): Unit
  }

  /** 60-bit SimHash at `maxHamming` — stored column: the fingerprint. */
  final case class Simhash(maxHamming: Int) extends Algo {
    private[streaming] def stage(docs: DataFrame): DataFrame =
      Dedup.simhashFingerprints(docs)
    private[streaming] val stagedSchema: StructType =
      new StructType().add("doc_id", LongType).add("fp", LongType)
    private[streaming] def refreshDeltaTo(staged: DataFrame, base: DataFrame,
        sink: DataFrame => Unit): Unit =
      Dedup.simhashComponentsRefreshFromFpsDeltaTo(staged, maxHamming, base, sink)
  }

  /** MinHash LSH + exact unigram-Jaccard verification at `threshold` —
    * stored columns: banded signatures + sorted word-hash set. */
  final case class MinhashJaccard(threshold: Double) extends Algo {
    private[streaming] def stage(docs: DataFrame): DataFrame =
      Dedup.minhashStagedColumns(docs)
    private[streaming] val stagedSchema: StructType = Dedup.minhashStagedSchema
    private[streaming] def refreshDeltaTo(staged: DataFrame, base: DataFrame,
        sink: DataFrame => Unit): Unit =
      Dedup.minhashComponentsRefreshFromSigsDeltaTo(
        staged.drop("wset", "n_w"),
        staged.select(col("doc_id"), col("wset"), col("n_w")),
        threshold, base, sink)
  }
}
