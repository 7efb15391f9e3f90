package graft.operators

import org.apache.spark.sql.SparkSession

/**
 * Small-file compaction — the table-maintenance operator every large
 * ingest pipeline needs: streaming sinks and wide-parallelism writers
 * leave thousands of KB-scale files per partition, and at 100 TB the
 * resulting file-listing and task-scheduling overhead dominates scans
 * (1M tiny files = 1M scan tasks).
 *
 * Sizing is EXACT, not estimated: the input directory's real on-disk
 * bytes (Hadoop FileSystem API, any scheme) divided by the target file
 * size gives the output width. Width reduction uses coalesce() — a
 * narrow dependency that merges read tasks with NO shuffle; growing the
 * width (splitting oversized files) genuinely requires redistribution
 * and uses repartition().
 */
object Compaction {

  /** Rewrite `inDir`'s parquet to `outDir` in ~targetBytes files.
    * Returns the number of data files written. */
  def compactParquet(spark: SparkSession, inDir: String, outDir: String,
      targetBytes: Long): Int = {
    require(targetBytes > 0, "targetBytes must be positive")
    val inPath = new org.apache.hadoop.fs.Path(inDir)
    val fs = inPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val bytes = fs.getContentSummary(inPath).getLength
    val width = math.max(1L, (bytes + targetBytes - 1) / targetBytes).toInt
    val df = spark.read.parquet(inDir)
    val sized =
      if (width <= df.rdd.getNumPartitions) df.coalesce(width)
      else df.repartition(width)
    sized.write.mode("overwrite").parquet(outDir)
    // resolve the OUTPUT's FileSystem separately — in/out may live on
    // different schemes (hdfs -> s3a compaction is a normal migration)
    val outPath = new org.apache.hadoop.fs.Path(outDir)
    outPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .listStatus(outPath)
      .count(f => f.getPath.getName.startsWith("part-"))
  }
}
