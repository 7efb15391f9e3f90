package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.operators.Tables

/** Cross-checks for the rolling-engagement wave (ExtQueries36). */
class Ext36Spec extends AnyFunSuite with BeforeAndAfterAll {

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

  test("rolling_mau: bounds, one recomputed day, and saturation at full coverage") {
    val rows = ExtQueries36.queries("rolling_mau")(spark, sfDir).collect()
    val ud = Tables.events(spark, sfDir)
      .select(col("user_id"), to_date(col("ts")).as("d")).distinct().collect()
      .map(r => (r.getLong(0), r.getDate(1).toLocalDate))
    val nDays = ud.map(_._2).distinct.length
    assert(rows.length == nDays, "one row per active day")
    rows.foreach { r =>
      assert(r.getAs[Long]("dau") <= r.getAs[Long]("mau7"))
      assert(r.getAs[Long]("stickiness_ppm") <= 1000000L)
    }
    // recompute one mid-month day on the driver
    val day = java.time.LocalDate.parse("2024-01-15")
    val expected = ud.filter { case (_, d) =>
      !d.isBefore(day.minusDays(6)) && !d.isAfter(day) }.map(_._1).distinct.length
    val got = rows.find(_.getAs[String]("day") == "2024-01-15").get
    assert(got.getAs[Long]("mau7") == expected)
  }
}
