package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/**
 * The crash-safe PER-BATCH SHARD LOG shared by the standing-index
 * maintenance family ([[AnnMaintenance]], [[IvfPqMaintenance]],
 * [[SqMaintenance]], [[IndexMaintenance]]): one parquet shard + one
 * commit marker per ingest batch, periodic compaction into a snapshot,
 * and commit markers that ROLL UP into the snapshot marker so the marker
 * log stays bounded by `compactEvery` over an unbounded stream lifetime
 * (r14 verdict #1; flat per-batch cost proven by the 200-batch
 * AnnMaintScale soak).
 *
 * Layout under `root/`:
 *  - `<dataDir>/<b>/` — one parquet shard per committed batch;
 *  - `meta/<b>` — the batch's commit marker ([[CommitMarkers]]);
 *  - `base/<b>/` + `basemeta/<b>` — compacted snapshots (the fold of
 *    every shard <= b); covered shards, rolled-up markers, and superseded
 *    snapshots are deleted ONE COMPACTION CYCLE LATE (see below);
 *  - `dels/<b>/` — TOMBSTONE batches ([[commitDeletes]]): a key-only
 *    shard naming standing rows to remove, committed under the same
 *    marker log. Reads anti-join tombstones newer than the covered
 *    snapshot (KB-scale broadcast — the standing side never moves);
 *    the covering compaction's snapshot physically excludes the rows,
 *    and the tombstone shard itself is swept one cycle later — the
 *    takedown/right-to-erasure path, bounded at two compaction cycles
 *    (or two [[compactNow]] calls for an eager purge).
 *
 * How the standing rows FOLD out of (snapshot, shard tail) is pluggable
 * ([[ShardLog.Fold]]): the ANN family appends (one multi-path scan —
 * snapshot and shards share a schema), [[IndexMaintenance]] folds
 * latest-wins deltas (window over the tail + broadcast anti-join against
 * the snapshot). The log owns the PROTOCOL — markers, rollup, compaction
 * ordering, sweeps — exactly once for every member (r15 verdict #2: the
 * crash-ordering discipline previously lived in two hand-synced copies).
 *
 * Crash-ordering discipline (inherited verbatim from the r12-r14 dedup
 * maintenance lineage): a batch is committed iff its marker exists (or
 * its id <= the snapshot's covered prefix); snapshots are derived data —
 * an unmarked partial snapshot dir is ignored by readers and swept by the
 * next compaction; replay of a committed batch short-circuits on the
 * marker. SINGLE WRITER: the cached commit state assumes exactly one live
 * instance writes a given root (the foreachBatch contract).
 *
 * SERVE-WHILE-COMPACT (r15 verdict #1): deletions are DEFERRED BY ONE
 * COMPACTION CYCLE. A compaction at `upTo = U` with previous snapshot `P`
 * writes `base/U`, commits its marker, and then sweeps only what the
 * PREVIOUS cycle covered: shards <= P and snapshots < P — `base/P` and
 * the shards in (P, U] stay on disk until the compaction after U. Every
 * file a serving plan can reference (the read set resolved from the
 * cached state at plan time: one snapshot + the then-current tail)
 * therefore survives at least one full concurrent compaction, closing
 * the FileNotFoundException race the drain-then-read contract used to
 * document away. Shards are immutable, so the late-executed plan returns
 * exactly the rows as of its plan time. The price is bounded retention:
 * at most one extra snapshot + compactEvery extra shards on disk. A plan
 * held across TWO compaction points must be re-resolved (or eagerly
 * materialized via `localCheckpoint`) — the one remaining caveat, now a
 * cycle wide instead of a batch wide.
 */
private[streaming] final class ShardLog(spark: SparkSession, root: String,
    dataDir: String, compactEvery: Int, fold: ShardLog.Fold,
    markerExtra: () => String = () => "", deleteKey: String = "") {

  /** Append-semantics log (the ANN family): snapshot and shards share a
    * schema and fold as one multi-path scan of `readCols`. */
  def this(spark: SparkSession, root: String, dataDir: String,
      compactEvery: Int, readCols: Seq[String]) =
    this(spark, root, dataDir, compactEvery, new ShardLog.AppendFold(readCols))

  require(compactEvery >= 2, s"compactEvery must be >= 2, got $compactEvery")

  private val metaDir = new Path(s"$root/meta")
  private val baseMetaDir = new Path(s"$root/basemeta")
  private val delsDir = new Path(s"$root/dels")
  private def fs = metaDir.getFileSystem(spark.sparkContext.hadoopConfiguration)

  // committed DELETE-batch ids whose dels/<b> key shard is still live —
  // cached from one startup listing (the IndexMaintenance.fpsIds
  // precedent: filter out unmarked crash debris via isCommitted), advanced
  // per commitDeletes, pruned at the deferred sweep. Bounded: tombstones
  // fold into the snapshot at compaction and their shards are swept one
  // cycle later, so at most ~2*compactEvery ids are ever live.
  @volatile private var delIdsMemo: Vector[Long] = _
  private def delIds: Vector[Long] = {
    if (delIdsMemo == null) {
      delIdsMemo =
        if (!fs.exists(delsDir)) Vector.empty
        else fs.listStatus(delsDir).toVector
          .flatMap(s => scala.util.Try(s.getPath.getName.toLong).toOption)
          .filter(state.isCommitted)
          .sorted
    }
    delIdsMemo
  }

  /** Committed delete-batch ids whose tombstone shard is still on disk
    * (for specs/forensics; reads already fold them in). */
  def committedDeleteIds: Seq[Long] = delIds

  // cached rolled-up commit state (single-writer contract — see class doc)
  @volatile private var logState: CommitMarkers.LogState = _
  private def state: CommitMarkers.LogState = {
    if (logState == null)
      logState = CommitMarkers.loadState(spark, metaDir, baseMetaDir)
    logState
  }

  /** Committed batch ids still individually listed — the post-snapshot
    * TAIL (ids <= [[coveredUpTo]] are committed but rolled up). */
  def committedIds: Seq[Long] = state.tail

  /** Max batch id summarized by the latest compacted snapshot. */
  def coveredUpTo: Option[Long] = state.coveredUpTo

  def isCommitted(id: Long): Boolean = state.isCommitted(id)

  /** Total committed batches (covered prefix + tail). */
  def committedCount: Long = state.count

  /** The latest snapshot marker's JSON content (carries `upTo`, `count`,
    * plus any extra fields the owner recorded — e.g. a model generation
    * for the streaming-refit members). One small FS read per call; the
    * owners memoize what they parse out of it. */
  def latestSnapshotMarker: Option[String] =
    state.coveredUpTo.map(b => CommitMarkers.readMarker(spark, baseMetaDir, b))

  /** Write one batch's shard + marker, then compact on cadence. The
    * caller must have short-circuited on [[isCommitted]] already (the
    * shard expression may be expensive). */
  def commitShard(batchId: Long, shard: DataFrame, markerJson: String): Unit = {
    commitShardNoCompact(batchId, shard, markerJson)
    compactIfDue()
  }

  /** The commit half of [[commitShard]] — split out for owners that must
    * release per-batch caches between the commit and the compaction scan
    * ([[IndexMaintenance]]). Callers pair it with [[compactIfDue]]. */
  def commitShardNoCompact(batchId: Long, shard: DataFrame,
      markerJson: String): Unit = {
    writeShard(batchId, shard)
    commitWrittenShard(batchId, markerJson)
  }

  /** Write half of [[commitShardNoCompact]], exposed for owners whose
    * delta producer sinks the batch's rows itself (one materialization —
    * no checkpoint-then-write): the shard parquet write, NO marker. The
    * caller MUST follow with [[commitWrittenShard]]; a crash in between
    * leaves unmarked debris the replay overwrites (the standard
    * marker-last ordering). */
  def writeShard(batchId: Long, shard: DataFrame): Unit =
    shard.write.mode("overwrite").parquet(s"$root/$dataDir/$batchId")

  /** Marker half of [[commitShardNoCompact]] — commit a shard already
    * written via [[writeShard]]. */
  def commitWrittenShard(batchId: Long, markerJson: String): Unit = {
    CommitMarkers.commit(spark, metaDir, batchId, markerJson)
    logState = state.withCommitted(batchId)
  }

  /**
   * Commit one DELETE batch: `keys` (any DataFrame exposing `deleteKey`)
   * names standing rows to remove. The tombstone shard is key-only and
   * lives in `dels/<b>`; its marker joins the same log, so deletes are
   * ordered, crash-safe, and replay-idempotent exactly like ingest.
   *
   * Read semantics: committed tombstones are anti-joined onto every fold
   * (serves reflect the delete as soon as its marker commits); the next
   * compaction's snapshot PHYSICALLY excludes the rows, and both the
   * covering data shards and the tombstone shards are swept one cycle
   * later — after at most two compaction cycles the deleted rows exist
   * nowhere under `root/` (the takedown/right-to-erasure contract;
   * call [[compactNow]] twice to force the purge eagerly).
   *
   * PRECONDITION (inherited from the family's unique-id contract): a key
   * is deleted AFTER the batch that ingested it committed, and never
   * re-ingested later — a tombstone only outlives its own compaction as
   * the snapshot's absence of the row.
   */
  def commitDeletes(batchId: Long, keys: DataFrame, markerJson: String): Unit = {
    require(deleteKey.nonEmpty, "this log was built without a deleteKey")
    if (isCommitted(batchId)) return
    keys.select(col(deleteKey)).distinct()
      .write.mode("overwrite").parquet(new Path(delsDir, batchId.toString).toString)
    CommitMarkers.commit(spark, metaDir, batchId, markerJson)
    logState = state.withCommitted(batchId)
    delIdsMemo = (delIds :+ batchId).distinct.sorted
    compactIfDue()
  }

  /** Force a compaction over everything committed (regardless of
    * cadence) — two successive calls physically purge all currently
    * tombstoned rows and their key shards (see [[commitDeletes]]). The
    * second call, finding the head already snapshotted, runs only the
    * retirement sweep — an EAGER sweep that waives the one-cycle
    * deferral, so plans resolved before it may lose their read set
    * (the caller is explicitly trading serve-while-compact for an
    * immediate purge). */
  def compactNow(): Unit = state.maxId.foreach { upTo =>
    if (compactedIds.contains(upTo)) sweepDeferred(Some(upTo), upTo)
    else compact(upTo)
  }

  /** Periodic shard compaction: every compactEvery committed batches,
    * fold everything readable into one snapshot so the read stays
    * O(1 snapshot + compactEvery shards) forever. Skipping a due point
    * (e.g. a replayed batch short-circuited) only defers truncation. */
  def compactIfDue(): Unit =
    if (state.count % compactEvery == 0) compact(state.maxId.get)

  /**
   * Commit `batchId` DIRECTLY AS a compacted snapshot whose rows REPLACE
   * the fold — the streaming-refit path: the caller retrained its models
   * and re-derived the whole standing table against them, so the old
   * shards are not just compactable but semantically superseded.
   * `extraJson` fields (e.g. `"gen":1`) are folded into the snapshot
   * marker — after the covered-marker sweep it is the durable record of
   * which model generation the snapshot's rows were derived under.
   *
   * Crash-safe like [[compactIfDue]]: nothing is visible until the
   * basemeta marker commits (a crash before it leaves the old log plus
   * unmarked debris the next compaction sweeps); a replay of a committed
   * refit batch short-circuits on [[isCommitted]]. Deletions follow the
   * same one-cycle deferral as ordinary compaction.
   */
  def commitSnapshot(batchId: Long, rows: DataFrame, extraJson: String): Unit = {
    require(!isCommitted(batchId), s"batch $batchId already committed")
    sweepUnmarkedSnapshots()
    val prev = state.coveredUpTo
    // a refit snapshot is caller-derived from a corpus that may predate
    // live tombstones — re-apply them so a refit can never resurrect a
    // deleted key (for tombstones already PURGED by earlier compactions
    // the caller must pass a corpus that no longer contains the key —
    // i.e. one derived from the maintained rows, the normal refit input)
    fold.snapshotRows(antiTombstones(rows, liveDels), batchId)
      .write.mode("overwrite").parquet(s"$root/base/$batchId")
    val next = state.withCommitted(batchId).rolledUp(batchId)
    val extra = if (extraJson.isEmpty) "" else s",$extraJson"
    CommitMarkers.commit(spark, baseMetaDir, batchId,
      s"""{"upTo":$batchId,"count":${next.count}$extra}""")
    logState = next
    sweepDeferred(prev, batchId)
  }

  /** Batch ids with a committed COMPACTED SNAPSHOT. */
  private def compactedIds: Seq[Long] =
    CommitMarkers.committed(spark, baseMetaDir)

  /** Tombstone ids a READ must still apply: only those newer than the
    * covered snapshot — older ones are already folded into `base/` as the
    * absence of their rows. Pinning reads to this set (not everything on
    * disk) keeps the serve-while-compact deferral symmetric: like data
    * shards, a dels shard is only referenced by plans built before the
    * compaction that covers it, so the one-cycle-late sweep can never
    * pull a file out from under a live plan. */
  private def liveDels: Vector[Long] = {
    val cov = state.coveredUpTo
    delIds.filter(id => cov.forall(id > _))
  }

  private def rowsFrom(snapshot: Option[Long], tail: Seq[Long]): DataFrame = {
    // delete batches have no dataDir shard — their ids leave the data fold
    val dels = liveDels
    val dataTail = if (dels.isEmpty) tail else tail.filterNot(dels.contains)
    val folded =
      if (snapshot.isEmpty && dataTail.isEmpty) fold.empty(spark)
      else fold.rows(spark, snapshot.map(b => s"$root/base/$b"),
        dataTail.map(b => b -> s"$root/$dataDir/$b"))
    antiTombstones(folded, dels)
  }

  /** Fold minus committed tombstones: one multi-path scan of the key-only
    * dels shards (KBs, never the standing table), anti-joined on
    * `deleteKey`. Catalyst picks a broadcast anti-join from the shards'
    * file-size stats — the standing side never shuffles; a pathological
    * tombstone volume degrades to a shuffled anti-join, which is still
    * the right plan. No committed deletes → the fold is returned as-is
    * (zero plan overhead for delete-free logs). */
  private def antiTombstones(rows: DataFrame, dels: Seq[Long]): DataFrame =
    if (dels.isEmpty) rows
    else rows.join(
      spark.read.parquet(dels.map(b => new Path(delsDir, b.toString).toString): _*),
      Seq(deleteKey), "left_anti")

  /** Delete numeric entries <= `upTo` under `dir` (covered shards or
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

  /** Sweep UNMARKED `base/<b>` debris (a crash between a snapshot write
    * and its basemeta commit) — numeric names only (never let an
    * unparsable name fall through a vacuous-truth delete). Runs before
    * each new snapshot is written. */
  private def sweepUnmarkedSnapshots(): Unit = {
    val marked = compactedIds.toSet
    val baseDir = new Path(s"$root/base")
    if (fs.exists(baseDir)) {
      fs.listStatus(baseDir).foreach { st =>
        scala.util.Try(st.getPath.getName.toLong).toOption match {
          case Some(id) => if (!marked.contains(id)) fs.delete(st.getPath, true)
          case None => ()
        }
      }
    }
  }

  /** The ONE-CYCLE-DEFERRED sweep after a snapshot at `upTo` committed
    * with `prev` as the previous snapshot: shards <= prev (NOT <= upTo —
    * a serving plan resolved against base/prev + the tail must survive
    * this compaction), rolled-up meta markers <= upTo (plans never read
    * markers; loadState ignores leftovers), and snapshots STRICTLY OLDER
    * than prev (base/prev itself survives one more cycle for the same
    * reason as its shards). Re-running after a crashed sweep is safe:
    * every step is a delete of already-unreachable entries. */
  private def sweepDeferred(prev: Option[Long], upTo: Long): Unit = {
    prev.foreach(p => sweepCovered(new Path(s"$root/$dataDir"), p, recursive = true))
    sweepCovered(metaDir, upTo, recursive = false)
    prev.foreach { p =>
      // tombstones <= prev are folded into base/prev (the rows are gone
      // there) AND into base/upTo — the key shards have nothing left to
      // mask; this sweep completes the physical purge
      sweepCovered(delsDir, p, recursive = true)
      delIdsMemo = delIds.filter(_ > p)
      compactedIds.filter(_ < p).foreach { b =>
        fs.delete(new Path(s"$root/base/$b"), true)
        fs.delete(new Path(baseMetaDir, b.toString), false)
      }
    }
  }

  private def compact(upTo: Long): Unit = {
    sweepUnmarkedSnapshots()
    if (compactedIds.contains(upTo)) return // snapshot already covers the log
    val prev = state.coveredUpTo
    graft.operators.Jobs.labeled(spark, s"shardlog compact $dataDir upTo=$upTo") {
      fold.snapshotRows(rowsFrom(prev, state.tail), upTo)
        .write.mode("overwrite").parquet(s"$root/base/$upTo")
    }
    // the marker carries the covered COUNT — with the covered meta/<b>
    // files deleted below, this is the only surviving record of how many
    // batches ever committed (the compaction-cadence counter) — plus the
    // owner's extra fields (e.g. the current model GENERATION, which an
    // ordinary compaction must carry forward or a restart would lose it)
    val extra = markerExtra() match { case "" => ""; case e => s",$e" }
    CommitMarkers.commit(spark, baseMetaDir, upTo,
      s"""{"upTo":$upTo,"count":${state.count}$extra}""")
    logState = state.rolledUp(upTo)
    sweepDeferred(prev, upTo)
  }

  /** All committed rows — the latest compacted snapshot plus the shard
    * tail, resolved from the CACHED state at plan time. Safe to execute
    * concurrently with ONE later compaction (see class doc). */
  def currentRows(): DataFrame = rowsFrom(state.coveredUpTo, state.tail)
}

private[streaming] object ShardLog {

  /**
   * How the standing rows FOLD out of (latest snapshot, post-snapshot
   * shard tail), and what gets persisted at a compaction point. The
   * protocol (markers, rollup, sweeps, crash ordering) stays in
   * [[ShardLog]]; only the read/merge SEMANTICS vary per member.
   */
  trait Fold {
    /** Standing rows at (snapshot dir, ascending `(batchId, shardDir)`
      * tail). At least one side is non-empty. */
    def rows(spark: SparkSession, snapshot: Option[String],
        tail: Seq[(Long, String)]): DataFrame
    /** Rows to persist as the compacted snapshot (default: the fold
      * itself — append semantics needs no batch stamp). */
    def snapshotRows(rows: DataFrame, upTo: Long): DataFrame = rows
    /** The fold when NOTHING is committed yet (default: fail — the ANN
      * members only read after a drain). */
    def empty(spark: SparkSession): DataFrame =
      throw new IllegalStateException("no committed batches")
  }

  /** Append semantics: snapshot + shards share a schema; the fold is ONE
    * multi-path FileScan of `readCols` (never an N-way union — per-batch
    * relations would add planning cost per COMMITTED batch). */
  final class AppendFold(readCols: Seq[String]) extends Fold {
    def rows(spark: SparkSession, snapshot: Option[String],
        tail: Seq[(Long, String)]): DataFrame =
      spark.read.parquet((snapshot.toSeq ++ tail.map(_._2)): _*)
        .select(readCols.map(col): _*)
  }

  /** SUM-MERGE semantics (r16, the cooccurrence member): shards carry
    * SIGNED per-key deltas of `cnt`; a key's standing value is the sum
    * of its deltas across the log. `rows()` returns the raw delta rows
    * — consumers filter/aggregate on top, so key predicates still push
    * into the multi-path scan — and a compaction materializes the
    * summed rows with exact zeros dropped, which is where per-key
    * ERASURE VIA NEGATIVE DELTAS completes physically (the tombstone
    * anti-join does not fit merged counts: a key's contribution is
    * baked into sums, so the delete verb subtracts instead). */
  final class SumFold(keys: Seq[String], cnt: String) extends Fold {
    def rows(spark: SparkSession, snapshot: Option[String],
        tail: Seq[(Long, String)]): DataFrame =
      spark.read.parquet((snapshot.toSeq ++ tail.map(_._2)): _*)
        .select((keys :+ cnt).map(col): _*)
    override def snapshotRows(rows: DataFrame, upTo: Long): DataFrame =
      rows.groupBy(keys.map(col): _*)
        .agg(org.apache.spark.sql.functions.sum(col(cnt)).as(cnt))
        .where(col(cnt) =!= 0)
  }
}
