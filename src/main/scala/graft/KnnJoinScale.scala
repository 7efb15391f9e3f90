package graft

import org.apache.spark.sql.functions._

import graft.operators.IvfIndex

/**
 * Measurement main for the batched kNN JOIN ([[IvfIndex.knnJoinFrom]])
 * under the decade protocol: build a full-corpus kNN graph (every
 * vector is a query) at sf0.1 / sf1 / sf10 with nLists following the
 * ~sqrt(N) FAISS sizing rule — the regime the query surface's fixed
 * nLists=16 gate configuration deliberately does NOT exercise.
 *
 * What the numbers must show:
 *  - candidate pairs scored grow as nProbe·N^1.5 (each of N queries
 *    scans nProbe lists of ~N/nLists = sqrt(N) rows) — the designed
 *    IVF kNN-graph exponent; a measured exponent drifting toward 2
 *    means list pruning is broken, toward 1 means lists aren't being
 *    scanned (recall silently collapsed);
 *  - the probe side does NOT broadcast (|Q| = N rows of quantized
 *    vectors is data-sized): the shuffled-hash join on `cluster` is
 *    the plan, and per-batch shuffle bytes stay ~|Q|·nProbe·row-size
 *    (probes) + corpus (one pass each) — candidates themselves never
 *    shuffle because the per-(query, list) pre-cut runs under the
 *    join's own hash(cluster) partitioning;
 *  - cand_pairs is computed ANALYTICALLY from the cluster histogram ×
 *    per-cluster probe counts (one tiny aggregate), not by re-running
 *    the join uncounted.
 *
 * Env: SPARK_GRAFT_SF_DIR (corpus dir), SPARK_GRAFT_K (default 5),
 * SPARK_GRAFT_NPROBE (default 4), SPARK_GRAFT_NLISTS (default
 * floor(sqrt(N)), the sizing rule), SPARK_GRAFT_CPUS.
 * One JSON line to stdout.
 */
object KnnJoinScale {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val k = sys.env.getOrElse("SPARK_GRAFT_K", "5").toInt
    val nProbe = sys.env.getOrElse("SPARK_GRAFT_NPROBE", "4").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val shuffleWrite = new java.util.concurrent.atomic.AtomicLong()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (te.taskMetrics != null)
          shuffleWrite.addAndGet(te.taskMetrics.shuffleWriteMetrics.bytesWritten)
    })
    def shuffleDelta(f: => Unit): Long = {
      org.apache.spark.sql.graftbridge.ListenerBridge.waitUntilEmpty(spark.sparkContext)
      val s0 = shuffleWrite.get()
      f
      org.apache.spark.sql.graftbridge.ListenerBridge.waitUntilEmpty(spark.sparkContext)
      shuffleWrite.get() - s0
    }
    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    val embs = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select("vec_id", "embedding")
    val n = embs.count()
    val nLists = sys.env.get("SPARK_GRAFT_NLISTS").map(_.toInt)
      .getOrElse(math.max(16, math.sqrt(n.toDouble).toInt))

    var centroids: Array[Array[Double]] = null
    var indexed: org.apache.spark.sql.DataFrame = null
    val buildWall = timed {
      val built = IvfIndex.buildIndex(embs, nLists, iters = 3)
      centroids = built._1; indexed = built._2
    }

    val graph = IvfIndex.knnJoinFrom(centroids, indexed, lit(true), k, nProbe,
      broadcastProbes = false)

    var edges = 0L; var distinctQueries = 0L; var graphWall = 0.0
    val graphShuffle = shuffleDelta {
      graphWall = timed {
        val agg = graph.agg(count(lit(1)).as("edges"),
          countDistinct(col("query_id")).as("nq")).collect()(0)
        edges = agg.getLong(0); distinctQueries = agg.getLong(1)
      }
    }

    // analytic candidate count: per-cluster corpus sizes x probe visits
    // (candidates scored = sum_c visits(c)·|c|, self-pairs excluded are
    // <= one per visit — report the upper product)
    val szMap = indexed.groupBy(col("cluster")).agg(count(lit(1)).as("sz"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val candPairs = IvfIndex.probeVisitCounts(centroids, indexed, nProbe)
      .map { case (cl, visits) => visits * szMap.getOrElse(cl, 0L) }.sum

    println(
      s"""{"metric":"knn_join_scale","sf":"$sfDir","n":$n,"k":$k,""" +
      s""""n_probe":$nProbe,"n_lists":$nLists,""" +
      f""""build_wall_s":$buildWall%.3f,"graph_wall_s":$graphWall%.3f,""" +
      s""""edges":$edges,"distinct_queries":$distinctQueries,""" +
      s""""cand_pairs":$candPairs,""" +
      f""""graph_shuffle_mb":${graphShuffle / 1e6}%.1f}""")
    spark.stop()
  }
}
