package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.operators.Tables

/** Cross-checks for the streaming-statistics wave (ExtQueries33). */
class Ext33Spec extends AnyFunSuite with BeforeAndAfterAll {

  private val sfDir = "/root/testdata/sf0.001"
  @transient private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("stream_trend_merge: merging across MULTIPLE microbatches equals the batch slope") {
    // stage the events into several files: maxFilesPerTrigger=1 makes
    // each file its own microbatch, so the standing-table merge runs
    // repeatedly instead of degenerating to one pass
    val tmp = java.nio.file.Files.createTempDirectory("trendmerge").toString
    Tables.events(spark, sfDir).repartition(3)
      .write.mode("overwrite").parquet(tmp)
    val nFiles = new java.io.File(tmp).listFiles()
      .count(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
    assert(nFiles >= 2, "staging must produce multiple microbatch files")
    val merged = ExtQueries33.trendMerge(spark, tmp, "part-*.parquet").collect()
    val batch = ExtQueries31.queries("trend_slope_by_type")(spark, sfDir).collect()
    assert(merged.map(_.toSeq).toSeq == batch.map(_.toSeq).toSeq,
      "the incremental merge must be exactly invisible")
  }

  test("stream_daily_percentiles: quantiles match driver-side sorted values per closed day") {
    val rows = ExtQueries33.queries("stream_daily_percentiles")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getAs[Long]("p50_centi") <= r.getAs[Long]("p95_centi")))
    val byDay = Tables.events(spark, sfDir)
      .select(date_format(col("ts"), "yyyy-MM-dd").as("day"),
        expr("CAST(FLOOR(value * 100) AS BIGINT)").as("v"))
      .collect().groupBy(_.getAs[String]("day"))
    val lastDay = byDay.keys.max
    assert(!rows.exists(_.getAs[String]("day") == lastDay),
      "the unclosed final day must not be emitted")
    rows.foreach { r =>
      val vs = byDay(r.getAs[String]("day")).map(_.getAs[Long]("v")).sorted
      assert(r.getAs[Long]("n_day") == vs.length)
      assert(r.getAs[Long]("p50_centi") == vs((vs.length + 1) / 2 - 1))
      val p95Idx = math.ceil(0.95 * vs.length).toInt - 1
      assert(r.getAs[Long]("p95_centi") == vs(p95Idx))
    }
  }
}
