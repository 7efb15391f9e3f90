package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Tables}

/**
 * Measurement main for the incremental-refresh scale claim: merging a
 * FIXED-SIZE ingest shard into a standing cluster index must cost
 * ~ingest-shard work, not corpus work, as the corpus grows. This is the
 * load-bearing property of the build-once/merge-many lakehouse pattern
 * (`dedup_index_refresh` et al.) — the bench queries can't show it
 * because they rebuild the base index inside the timed region.
 *
 * Protocol: UNTIMED setup hashes the corpus once, persists fingerprints
 * (the lakehouse regime — fp is a stored column), and builds the
 * standing index on all docs except the shard. TIMED region = exactly
 * what an ingest batch pays: the fingerprint-level banded refresh
 * ([[Dedup.simhashComponentsRefreshFromFps]]), which ends in an eager
 * localCheckpoint, so the wall includes full materialization.
 *
 * Env: SPARK_GRAFT_SF_DIR (corpus), SPARK_GRAFT_SHARD (ingest docs,
 * default 20000), SPARK_GRAFT_BENCH_REPS (default 3). Prints one JSON
 * line with all rep walls; rep 1 carries JIT, reps 2+ are the steady
 * ingest regime.
 */
object RefreshScale {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val shardN = sys.env.getOrElse("SPARK_GRAFT_SHARD", "20000").toInt
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = Tables.table(spark, sfDir, "documents").select("doc_id", "text")
    // the ingest shard = the shardN largest doc_ids (deterministic at
    // every scale; ScaleUp offsets replica ids so the shard is a real
    // slice of the newest replica, not a degenerate repeat)
    val thr = docs.select(col("doc_id")).orderBy(col("doc_id").desc)
      .limit(shardN).agg(min(col("doc_id"))).head().getLong(0)
    val fps = Dedup.simhashFingerprints(docs)
      .withColumn("inc", col("doc_id") >= thr)
      .localCheckpoint(true)
    val nBase = fps.where(!col("inc")).count()
    val nInc = fps.where(col("inc")).count()
    val baseComps = Dedup
      .simhashComponents(docs.where(col("doc_id") < thr), 3)
      .localCheckpoint(true)
    baseComps.count()

    val walls = (1 to reps).map { _ =>
      val t0 = System.nanoTime()
      Dedup.simhashComponentsRefreshFromFps(fps, 3, baseComps).count()
      (System.nanoTime() - t0) / 1e9
    }
    def median(xs: Seq[Double]): Double = xs.sorted.apply((xs.size - 1) / 2)
    val steady = if (walls.size > 1) walls.tail else walls
    println(
      s"""{"metric":"refresh_scale","sf":"$sfDir","base_docs":$nBase,""" +
      s""""shard_docs":$nInc,"reps":$reps,""" +
      s""""walls":[${walls.map(w => f"$w%.3f").mkString(",")}],""" +
      s""""steady_median":${f"${median(steady)}%.3f"}}""")
    spark.stop()
  }
}
