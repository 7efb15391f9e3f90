package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.IvfIndex

/**
 * Crash-safe streaming maintenance of the STANDING ANN INDEX — the ANN
 * twin of [[IndexMaintenance]]: per-batch state lives on the filesystem
 * behind commit markers, so a killed job resumes exactly where it
 * stopped and the drained index is byte-identical to the uninterrupted
 * run (and to the frozen-centroid batch rebuild — the
 * `stream_ann_index_refresh` oracle).
 *
 * Layout under `root/`:
 *  - `centroids/` — the frozen codebook, written ONCE by the bootstrap
 *    batch via temp + atomic rename: visible iff complete;
 *  - `assign/<b>/` — one parquet shard per ingest batch, the batch's
 *    `(vec_id, qv, norm, cluster)` assignment;
 *  - `meta/<b>` — the batch's commit marker ([[CommitMarkers]]);
 *  - `base/<b>/` + `basemeta/<b>` — compacted snapshots (the fold of
 *    every shard <= b), written every `compactEvery` batches so the
 *    index read stays O(snapshot + compactEvery shards) forever; covered
 *    shards and superseded snapshots are deleted after the snapshot's
 *    marker commits, and an unmarked partial snapshot (crash
 *    mid-compaction) is ignored by readers and swept later.
 *
 * Lifecycle: the FIRST batch is the training snapshot — it fits the
 * k-means and publishes the centroids (the standard IVF posture: train
 * once, assign forever, refit = periodic maintenance under a new root).
 * Every later batch is O(batch): one scan of the batch against the
 * published centroids, one shard write, one marker.
 *
 * Crash windows, all idempotent by replay:
 *  - after the bootstrap fit but before the centroid publish → replay
 *    refits (deterministic k-means: same centroids);
 *  - after the publish but before the shard write → replay takes the
 *    assign-only path against the published centroids, which equals the
 *    bootstrap's own assignment (assignment is per-row given centroids);
 *  - after the shard write but before the marker → replay overwrites
 *    the shard and commits;
 *  - replay of a committed batch → short-circuits on the marker.
 *
 * PRECONDITION (same as IndexMaintenance): vec_ids are unique across
 * ingest batches.
 */
final class AnnMaintenance(spark: SparkSession, root: String,
    nLists: Int = 16, iters: Int = 3, compactEvery: Int = 64) {

  require(compactEvery >= 2, s"compactEvery must be >= 2, got $compactEvery")

  private val metaDir = new Path(s"$root/meta")
  private val baseMetaDir = new Path(s"$root/basemeta")
  private val centroidsDir = new Path(s"$root/centroids")
  private def fs = metaDir.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private val centroidSchema = StructType(Seq(
    StructField("cluster", IntegerType, nullable = false),
    StructField("cv", ArrayType(DoubleType, containsNull = false), nullable = false)))

  /** Batch ids whose marker committed — the restorable prefix. */
  def committedIds: Seq[Long] = CommitMarkers.committed(spark, metaDir)

  private def centroidsPublished: Boolean = fs.exists(centroidsDir)

  /** The frozen codebook (exact integer-valued doubles). */
  def centroids(): Array[Array[Double]] = {
    require(centroidsPublished, "no centroids published yet (no batch processed)")
    spark.read.schema(centroidSchema).parquet(centroidsDir.toString)
      .collect().sortBy(_.getInt(0)).map(_.getSeq[Double](1).toArray)
  }

  private def publishCentroids(cents: Array[Array[Double]]): Unit = {
    val tmp = new Path(s"$root/.centroids.tmp")
    val rows = cents.zipWithIndex.map { case (cv, i) =>
      org.apache.spark.sql.Row(i, cv.toSeq)
    }
    spark.createDataFrame(
        spark.sparkContext.parallelize(rows.toSeq, 1), centroidSchema)
      .write.mode("overwrite").parquet(tmp.toString)
    try CommitMarkers.renameOverwrite(spark, fs, tmp, centroidsDir)
    catch { case _: Exception => fs.delete(tmp, true); () }
  }

  /**
   * Fold one ingest batch of embeddings `(vec_id, embedding, ...)` into
   * the index. Idempotent; O(batch) after the bootstrap.
   */
  def processBatch(batchId: Long, embs: DataFrame): Unit = {
    if (committedIds.contains(batchId)) return
    val shard =
      if (!centroidsPublished) {
        // bootstrap: this batch IS the training snapshot
        val (c, a) = IvfIndex.buildIndex(embs, nLists, iters)
        publishCentroids(c)
        a
      } else IvfIndex.assignBatch(embs, centroids())
    shard.write.mode("overwrite").parquet(s"$root/assign/$batchId")
    CommitMarkers.commit(spark, metaDir, batchId,
      s"""{"nLists":$nLists,"iters":$iters}""")
    // periodic shard compaction: every compactEvery committed batches,
    // fold everything readable into one snapshot so the index read stays
    // O(1 snapshot + compactEvery shards) forever instead of one parquet
    // dir per batch since the dawn of the stream
    val done = committedIds
    if (done.size % compactEvery == 0) compact(done.max, done)
  }

  /** Batch ids with a committed COMPACTED SNAPSHOT (`base/<b>` = the fold
    * of every shard <= b). Snapshots are derived data: a crash
    * mid-compaction leaves an unmarked partial dir that readers ignore
    * and the next compaction sweeps. */
  private def compactedIds: Seq[Long] =
    CommitMarkers.committed(spark, baseMetaDir)

  private def indexAt(committed: Seq[Long]): DataFrame = {
    require(committed.nonEmpty, "no committed batches")
    val b0 = compactedIds.sorted.lastOption
    val paths = b0.map(b => s"$root/base/$b").toSeq ++
      committed.filter(id => b0.forall(id > _)).map(b => s"$root/assign/$b")
    spark.read.parquet(paths: _*)
      .select(col("vec_id"), col("qv"), col("norm"), col("cluster"))
  }

  private def compact(upTo: Long, ids: Seq[Long]): Unit = {
    // sweep unmarked base debris from a previous crashed compaction —
    // numeric names only (the r14 IndexMaintenance lesson: never let an
    // unparsable name fall through a vacuous-truth delete)
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
    val older = compactedIds.filter(_ < upTo)
    indexAt(ids).write.mode("overwrite").parquet(s"$root/base/$upTo")
    CommitMarkers.commit(spark, baseMetaDir, upTo, s"""{"upTo":$upTo}""")
    // covered shards and superseded snapshots are now unreachable
    ids.filter(_ <= upTo).foreach(b =>
      fs.delete(new Path(s"$root/assign/$b"), true))
    older.foreach { b =>
      fs.delete(new Path(s"$root/base/$b"), true)
      fs.delete(new Path(s"$root/basemeta/$b"), false)
    }
  }

  /** The standing `(vec_id, qv, norm, cluster)` index over all committed
    * batches — the latest compacted snapshot plus the shard tail. */
  def currentIndex(): DataFrame = indexAt(committedIds)

  /** Serve approximate top-k from the maintained index. */
  def topK(queryIds: Seq[Long], k: Int, nProbe: Int): DataFrame =
    IvfIndex.topKFrom(centroids(), currentIndex(), queryIds, k, nProbe)
}
