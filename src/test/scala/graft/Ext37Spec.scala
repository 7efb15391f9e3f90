package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.operators.Tables

/** Cross-checks for the product-analytics composition wave (ExtQueries37). */
class Ext37Spec extends AnyFunSuite with BeforeAndAfterAll {

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

  test("anomaly_seasonal_ratio: one row per (type, day), ratio recomputed") {
    val rows = ExtQueries37.queries("anomaly_seasonal_ratio")(spark, sfDir).collect()
    val nCells = Tables.events(spark, sfDir)
      .select(col("event_type"), to_date(col("ts"))).distinct().count()
    assert(rows.length == nCells)
    // flag consistency + recompute the ratio for one (type, dow) group
    rows.foreach { r =>
      val flagged = r.getAs[Long]("ratio_ppt") < 500 || r.getAs[Long]("ratio_ppt") > 2000
      assert(r.getAs[Int]("is_anomaly") == (if (flagged) 1 else 0))
    }
    val g = rows.filter(r => r.getAs[String]("event_type") == "click"
      && r.getAs[Int]("dow") == rows.head.getAs[Int]("dow"))
    val sumN = g.map(_.getAs[Long]("n")).sum
    g.foreach(r => assert(r.getAs[Long]("ratio_ppt") ==
      r.getAs[Long]("n") * 1000 * g.length / sumN))
  }

  test("session_funnel: monotone steps over the sessionize_batch session count") {
    val f = ExtQueries37.queries("session_funnel")(spark, sfDir).collect().head
    val nSessions = ExtQueries6.queries("sessionize_batch")(spark, sfDir).count()
    assert(f.getAs[Long]("n_sessions") == nSessions)
    assert(f.getAs[Long]("viewed") <= f.getAs[Long]("n_sessions"))
    assert(f.getAs[Long]("clicked_after_view") <= f.getAs[Long]("viewed"))
    assert(f.getAs[Long]("purchased_after_click") <= f.getAs[Long]("clicked_after_view"))
  }

  test("funnel_by_arm: arm marginals reproduce the pooled time-bounded funnel") {
    val arms = ExtQueries37.queries("funnel_by_arm")(spark, sfDir).collect()
    val pooled = ExtQueries30.queries("funnel_timebound")(spark, sfDir).collect().head
    assert(arms.map(_.getAs[String]("arm")).toSet == Set("A", "B"))
    assert(arms.map(_.getAs[Long]("viewed")).sum == pooled.getAs[Long]("viewed"))
    assert(arms.map(_.getAs[Long]("clicked_1h")).sum == pooled.getAs[Long]("clicked_1h"))
    assert(arms.map(_.getAs[Long]("purchased_24h")).sum == pooled.getAs[Long]("purchased_24h"))
  }

  test("hour_dow_heatmap: cells partition the event stream") {
    val rows = ExtQueries37.queries("hour_dow_heatmap")(spark, sfDir).collect()
    val nEvents = Tables.events(spark, sfDir).count()
    assert(rows.map(_.getAs[Long]("n")).sum == nEvents)
    val shareSum = rows.map(_.getAs[Long]("share_ppm")).sum
    assert(shareSum > 1000000L - rows.length && shareSum <= 1000000L)
    rows.foreach { r =>
      assert((1 to 7).contains(r.getAs[Int]("dow")))
      assert((0 to 23).contains(r.getAs[Int]("hr")))
    }
  }
}
