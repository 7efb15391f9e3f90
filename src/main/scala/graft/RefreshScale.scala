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
 * default 20000), SPARK_GRAFT_BENCH_REPS (default 3), SPARK_GRAFT_ALGO
 * (simhash | minhash, default simhash — the minhash twin's untimed
 * setup persists banded signatures + word-hash sets, its timed region
 * is [[Dedup.minhashComponentsRefreshFromSigs]]). Prints one JSON line
 * with all rep walls; rep 1 carries JIT, reps 2+ are the steady ingest
 * regime.
 */
object RefreshScale {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val shardN = sys.env.getOrElse("SPARK_GRAFT_SHARD", "20000").toInt
    val algo = sys.env.getOrElse("SPARK_GRAFT_ALGO", "simhash")
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
    val nBase = docs.where(col("doc_id") < thr).count()
    val nInc = docs.where(col("doc_id") >= thr).count()

    // UNTIMED setup: persist the stored columns an ingest batch reads,
    // and build the standing index on the base shard. TIMED region =
    // exactly what an ingest batch pays; both refreshes end in an eager
    // localCheckpoint, so the wall includes full materialization.
    val timedRefresh: () => Long = algo match {
      case "simhash" =>
        val fps = Dedup.simhashFingerprints(docs)
          .withColumn("inc", col("doc_id") >= thr)
          .localCheckpoint(true)
        fps.count()
        val baseComps = Dedup
          .simhashComponents(docs.where(col("doc_id") < thr), 3)
          .localCheckpoint(true)
        baseComps.count()
        () => Dedup.simhashComponentsRefreshFromFps(fps, 3, baseComps).count()
      case "minhash" =>
        val (sigs, wordSets) =
          Dedup.minhashRefreshInputs(docs, col("doc_id") >= thr)
        val baseComps = Dedup
          .minhashComponents(docs.where(col("doc_id") < thr), 0.9)
          .localCheckpoint(true)
        baseComps.count()
        () => Dedup
          .minhashComponentsRefreshFromSigs(sigs, wordSets, 0.9, baseComps)
          .count()
      case other =>
        throw new IllegalArgumentException(
          s"SPARK_GRAFT_ALGO must be simhash or minhash, got $other")
    }

    val walls = (1 to reps).map { _ =>
      val t0 = System.nanoTime()
      timedRefresh()
      (System.nanoTime() - t0) / 1e9
    }
    def median(xs: Seq[Double]): Double = xs.sorted.apply((xs.size - 1) / 2)
    val steady = if (walls.size > 1) walls.tail else walls
    println(
      s"""{"metric":"refresh_scale","algo":"$algo","sf":"$sfDir",""" +
      s""""base_docs":$nBase,"shard_docs":$nInc,"reps":$reps,""" +
      s""""walls":[${walls.map(w => f"$w%.3f").mkString(",")}],""" +
      s""""steady_median":${f"${median(steady)}%.3f"}}""")
    spark.stop()
  }
}
