package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.operators.Tables

/** Cross-checks for the trend/seasonality + join-surface wave (ExtQueries31). */
class Ext31Spec extends AnyFunSuite with BeforeAndAfterAll {

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

  test("trend_slope_by_type: slope recomputed on the driver matches") {
    val rows = ExtQueries31.queries("trend_slope_by_type")(spark, sfDir).collect()
    val daily = Tables.events(spark, sfDir)
      .groupBy(col("event_type"),
        datediff(to_date(col("ts")), lit("2024-01-01").cast("date")).as("x"))
      .agg(count(lit(1)).as("y")).collect()
      .groupBy(_.getAs[String]("event_type"))
    rows.foreach { r =>
      val pts = daily(r.getAs[String]("event_type"))
        .map(p => (p.getAs[Int]("x").toLong, p.getAs[Long]("y")))
      val n = pts.length.toLong
      val (sx, sy) = (pts.map(_._1).sum, pts.map(_._2).sum)
      val sxx = pts.map(p => p._1 * p._1).sum
      val sxy = pts.map(p => p._1 * p._2).sum
      val num = n * sxy - sx * sy
      val den = n * sxx - sx * sx
      val expected = if (num >= 0) num * 1000000L / den else -((-num * 1000000L) / den)
      assert(r.getAs[Long]("slope_ppm_per_day") == expected)
    }
  }

  test("dow_profile: shares sum to ~1e6 per type, dows valid") {
    val rows = ExtQueries31.queries("dow_profile")(spark, sfDir).collect()
    rows.foreach(r => assert((1 to 7).contains(r.getAs[Int]("dow"))))
    rows.groupBy(_.getAs[String]("event_type")).foreach { case (et, rs) =>
      val total = rs.map(_.getAs[Long]("share_ppm")).sum
      // integer DIV floors each share: sum in (1e6 - 7, 1e6]
      assert(total > 1000000L - 7 && total <= 1000000L, s"$et shares: $total")
    }
  }

  test("join_asof_tolerance: subset of the unbounded as-of, staleness respected") {
    val tol = ExtQueries31.queries("join_asof_tolerance")(spark, sfDir).collect()
      .map(r => r.getAs[Long]("event_id") -> r).toMap
    val free = ExtQueries.queries("join_asof")(spark, sfDir).collect()
      .map(r => r.getAs[Long]("event_id") -> r).toMap
    assert(tol.keySet == free.keySet, "one output row per event either way")
    tol.foreach { case (id, r) =>
      val f = free(id)
      if (r.getAs[Long]("asof_order") != -1L) {
        // a within-horizon match must BE the unbounded match (same order)
        assert(r.getAs[Long]("asof_order") == f.getAs[Long]("asof_order"))
      } else if (f.getAs[Long]("asof_order") != -1L) {
        // dropped matches (stale beyond 30 days) fall back to the sentinel
        assert(r.getAs[String]("asof_date") == "none")
      }
    }
  }

  test("repeat_rate: repeaters are a subset of buyers") {
    val rows = ExtQueries31.queries("repeat_rate")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_repeat") <= r.getAs[Long]("n_buyers"))
      assert(r.getAs[Long]("n_buyers") >= 3)
      assert(r.getAs[Long]("repeat_ppm") <= 1000000L)
    }
  }

  test("session_stats: moments agree with sessionize_batch") {
    val st = ExtQueries31.queries("session_stats")(spark, sfDir).collect().head
    val lens = ExtQueries6.queries("sessionize_batch")(spark, sfDir)
      .select(col("n_events")).collect().map(_.getAs[Long]("n_events")).sorted
    assert(st.getAs[Long]("n_sessions") == lens.length)
    assert(st.getAs[Long]("total_events") == lens.sum)
    // exact rank median: smallest len with cum*2 >= n
    val n = lens.length
    val median = lens((n + 1) / 2 - 1)
    assert(st.getAs[Long]("median_len") == median)
    val p90 = lens(math.ceil(0.9 * n).toInt - 1)
    assert(st.getAs[Long]("p90_len") == p90)
  }
}
