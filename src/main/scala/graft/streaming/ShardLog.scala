package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/**
 * The crash-safe PER-BATCH SHARD LOG shared by the standing-index
 * maintenance family ([[AnnMaintenance]], [[IvfPqMaintenance]]): one
 * parquet shard + one commit marker per ingest batch, periodic compaction
 * into a snapshot, and commit markers that ROLL UP into the snapshot
 * marker so the marker log stays bounded by `compactEvery` over an
 * unbounded stream lifetime (r14 verdict #1; flat per-batch cost proven
 * by the 200-batch AnnMaintScale soak).
 *
 * Layout under `root/`:
 *  - `<dataDir>/<b>/` — one parquet shard per committed batch;
 *  - `meta/<b>` — the batch's commit marker ([[CommitMarkers]]);
 *  - `base/<b>/` + `basemeta/<b>` — compacted snapshots (the fold of
 *    every shard <= b); covered shards, rolled-up markers, and superseded
 *    snapshots are deleted strictly AFTER the snapshot marker commits.
 *
 * Crash-ordering discipline (inherited verbatim from the r12-r14 dedup
 * maintenance lineage): a batch is committed iff its marker exists (or
 * its id <= the snapshot's covered prefix); snapshots are derived data —
 * an unmarked partial snapshot dir is ignored by readers and swept by the
 * next compaction; replay of a committed batch short-circuits on the
 * marker. SINGLE WRITER: the cached commit state assumes exactly one live
 * instance writes a given root (the foreachBatch contract); serving reads
 * resolve file listings at plan time — read between batches
 * (drain-then-read) or localCheckpoint the frame before the next fold.
 */
private[streaming] final class ShardLog(spark: SparkSession, root: String,
    dataDir: String, compactEvery: Int, readCols: Seq[String]) {

  require(compactEvery >= 2, s"compactEvery must be >= 2, got $compactEvery")

  private val metaDir = new Path(s"$root/meta")
  private val baseMetaDir = new Path(s"$root/basemeta")
  private def fs = metaDir.getFileSystem(spark.sparkContext.hadoopConfiguration)

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

  /** Write one batch's shard + marker, then compact on cadence. The
    * caller must have short-circuited on [[isCommitted]] already (the
    * shard expression may be expensive). */
  def commitShard(batchId: Long, shard: DataFrame, markerJson: String): Unit = {
    shard.write.mode("overwrite").parquet(s"$root/$dataDir/$batchId")
    CommitMarkers.commit(spark, metaDir, batchId, markerJson)
    logState = state.withCommitted(batchId)
    // periodic shard compaction: every compactEvery committed batches,
    // fold everything readable into one snapshot so the read stays
    // O(1 snapshot + compactEvery shards) forever
    if (state.count % compactEvery == 0) compact(state.maxId.get)
  }

  /** Batch ids with a committed COMPACTED SNAPSHOT. */
  private def compactedIds: Seq[Long] =
    CommitMarkers.committed(spark, baseMetaDir)

  private def rowsFrom(snapshot: Option[Long], tail: Seq[Long]): DataFrame = {
    val paths = snapshot.map(b => s"$root/base/$b").toSeq ++
      tail.map(b => s"$root/$dataDir/$b")
    require(paths.nonEmpty, "no committed batches")
    spark.read.parquet(paths: _*).select(readCols.map(col): _*)
  }

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

  private def compact(upTo: Long): Unit = {
    // sweep unmarked base debris from a previous crashed compaction —
    // numeric names only (never let an unparsable name fall through a
    // vacuous-truth delete)
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
    if (marked.contains(upTo)) return // snapshot already covers the log
    val older = marked.filter(_ < upTo)
    rowsFrom(state.coveredUpTo, state.tail)
      .write.mode("overwrite").parquet(s"$root/base/$upTo")
    // the marker carries the covered COUNT — with the covered meta/<b>
    // files deleted below, this is the only surviving record of how many
    // batches ever committed (the compaction-cadence counter)
    CommitMarkers.commit(spark, baseMetaDir, upTo,
      s"""{"upTo":$upTo,"count":${state.count}}""")
    logState = state.rolledUp(upTo)
    // covered shards, rolled-up markers, and superseded snapshots are now
    // unreachable — deletions strictly AFTER the snapshot marker commit,
    // so a crash anywhere leaves either the old log or a committed
    // snapshot plus leftovers that loadState ignores and this sweep
    // (running on every later compaction) removes
    sweepCovered(new Path(s"$root/$dataDir"), upTo, recursive = true)
    sweepCovered(metaDir, upTo, recursive = false)
    older.foreach { b =>
      fs.delete(new Path(s"$root/base/$b"), true)
      fs.delete(new Path(s"$root/basemeta/$b"), false)
    }
  }

  /** All committed rows — the latest compacted snapshot plus the shard
    * tail. Plan-time file resolution (see class doc). */
  def currentRows(): DataFrame = rowsFrom(state.coveredUpTo, state.tail)
}
