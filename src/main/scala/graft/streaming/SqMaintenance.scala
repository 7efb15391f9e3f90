package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

import graft.operators.SqIndex

/**
 * Crash-safe streaming maintenance of the STANDING SQ8 CODE TABLE — the
 * scalar-quantization member of the maintenance family ([[ShardLog]]
 * protocol, same as [[AnnMaintenance]]/[[IvfPqMaintenance]]): the FIRST
 * batch is the training snapshot (per-dimension exact min/max — one
 * aggregate scan, published via temp + atomic rename), every later batch
 * is O(batch): one projection pass encoding the batch against the frozen
 * stats (out-of-range values saturate — the standard SQ posture until a
 * refit under a new root), one shard write, one marker.
 *
 * Crash windows are [[AnnMaintenance]]'s with "centroids" replaced by
 * "stats": a replay after a crash before the `stats/` rename re-derives
 * them deterministically (exact MIN/MAX — order-free) and republishes
 * identical values.
 */
final class SqMaintenance(spark: SparkSession, root: String,
    dims: Int = 64, compactEvery: Int = 64) {

  private val log = new ShardLog(spark, root, "codes", compactEvery,
    Seq("vec_id", "codes", "recon2"))

  private val statsDir = new Path(s"$root/stats")
  private def fs = statsDir.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private val statsSchema = StructType(Seq(
    StructField("i", IntegerType, nullable = false),
    StructField("mn", LongType, nullable = false),
    StructField("mx", LongType, nullable = false)))

  def committedIds: Seq[Long] = log.committedIds
  def coveredUpTo: Option[Long] = log.coveredUpTo
  def isCommitted(id: Long): Boolean = log.isCommitted(id)
  def committedCount: Long = log.committedCount

  private def statsPublished: Boolean =
    statsMemo != null || fs.exists(statsDir)

  // write-once behind an atomic rename — loaded at most once per instance
  @volatile private var statsMemo: SqIndex.Stats = _

  /** The frozen per-dimension stats. */
  def stats(): SqIndex.Stats = {
    if (statsMemo == null) {
      require(statsPublished, "no stats published yet (no batch processed)")
      val rows = spark.read.schema(statsSchema).parquet(statsDir.toString)
        .collect().sortBy(_.getInt(0))
      // fail fast on parameter drift (mirrors IvfPqMaintenance.models):
      // an instance constructed with a different dims over an existing
      // root would silently reconstruct against truncated stats
      require(rows.length == dims,
        s"$statsDir holds ${rows.length} per-dimension stats, instance " +
          s"expects dims=$dims — constructor params disagree with the " +
          "published stats")
      statsMemo = SqIndex.Stats(rows.map(_.getLong(1)), rows.map(_.getLong(2)))
    }
    statsMemo
  }

  private def publishStats(st: SqIndex.Stats): Unit = {
    val tmp = new Path(s"$root/.stats.tmp")
    val rows = (0 until st.dims).map(i => Row(i, st.mins(i), st.maxs(i)))
    spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1), statsSchema)
      .write.mode("overwrite").parquet(tmp.toString)
    try {
      CommitMarkers.renameOverwrite(spark, fs, tmp, statsDir)
      statsMemo = st
    } catch {
      case e: Exception =>
        // PROPAGATE (r15 advice): a swallowed publish failure would still
        // commit batch 0's codes, and a later re-bootstrap would freeze
        // DIFFERENT stats — earlier codes reconstructed against the wrong
        // min/max at serve time. Fail the batch; the replay re-derives
        // identical stats (exact MIN/MAX) and republishes.
        fs.delete(tmp, true)
        throw e
    }
  }

  /**
   * Fold one ingest batch of embeddings `(vec_id, embedding, ...)` into
   * the code table. Idempotent; O(batch) after the bootstrap.
   */
  def processBatch(batchId: Long, embs: DataFrame): Unit = {
    if (log.isCommitted(batchId)) return
    val st =
      if (!statsPublished) {
        // bootstrap: this batch IS the training snapshot
        val (fitted, codes) = SqIndex.buildSq(embs, dims)
        publishStats(fitted)
        log.commitShard(batchId, codes, s"""{"dims":$dims}""")
        org.apache.spark.sql.graftbridge.CheckpointBridge.release(codes)
        return
      } else stats()
    log.commitShard(batchId, SqIndex.encodeBatch(embs, st), s"""{"dims":$dims}""")
  }

  /** The standing `(vec_id, codes, recon2)` table over all committed
    * batches. Drain-then-read (see [[ShardLog]]). */
  def currentCodes(): DataFrame = log.currentRows()

  /** Serve asymmetric top-k from the maintained code table. */
  def topK(embeddings: DataFrame, queryIds: Seq[Long], k: Int): DataFrame =
    SqIndex.sqTopKFrom(stats(), currentCodes(), embeddings, queryIds, k)
}
