package graft

import org.apache.spark.sql.SparkSession

import graft.operators.DedupIndex

/**
 * Cross-PROCESS probe for the durable cluster-index cache: with
 * `graft.index.cache` (sysprop) / `SPARK_GRAFT_INDEX_CACHE` (env) set,
 * the first JVM builds and publishes the index; a second JVM must LOAD
 * it — zero builds. DedupIndexSpec proves the same contract in-process
 * (fresh session-layer keys); this main is the two-JVM evidence
 * (tools/index_cache_smoke.sh drives it twice and asserts builds 1→0).
 *
 * Prints one JSON line: {"metric":"index_cache_probe","builds":N,
 * "rows":M} — `builds` is the number of actual index constructions this
 * JVM performed.
 */
object IndexCacheProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val rows = DedupIndex.simhashComponents(spark, sfDir, 3).count()
    println(s"""{"metric":"index_cache_probe","builds":${DedupIndex.buildCount.get()},"rows":$rows}""")
    spark.stop()
  }
}
