package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR, prints one JSON line. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // optional comma-separated filter for targeted profiling runs
    val only = sys.env.get("SPARK_GRAFT_QUERIES").map(_.split(",").toSet)
    // JIT/codegen warm-up outside the timed region: one batch query, one
    // default-provider streaming drain, and one RocksDB/transformWithState
    // drain (provider init + rocksdbjni load otherwise land on whichever
    // timed query runs them first). Warm-ups run only when the filter
    // would time a query of that kind.
    def warm(name: String, kindTimed: Boolean): Unit =
      if (kindTimed) try SparkEntry.queries(name)(spark, sfDir).count()
      catch { case _: Throwable => () }
    def timedAny(p: String => Boolean): Boolean =
      SparkEntry.queries.keys.exists(n => p(n) && only.forall(_.contains(n)))
    warm("q1_agg", timedAny(n => !n.startsWith("stream")))
    warm("stream_windowed_agg", timedAny(_.startsWith("stream")))
    warm("stream_group_topk", timedAny(Set(
      "stream_item_cut", "stream_reservoir_cooc", "stream_group_topk")))
    val selected = SparkEntry.queries.filter { case (n, _) => only.forall(_.contains(n)) }
    val failures = scala.collection.mutable.ArrayBuffer[String]()
    val results = selected.map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() }
      catch { case t: Throwable =>
        failures += name
        System.err.println(s"[bench] $name FAILED: ${t.getClass.getName}: ${t.getMessage}")
      }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val fails = failures.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failures":$fails,"sf":"$sfDir"}""")
    spark.stop()
  }
}
