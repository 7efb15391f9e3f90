package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.operators.Tables

/** Cross-checks for the round-7 mixture/as-of wave (ExtQueries25). */
class Ext25Spec extends AnyFunSuite with BeforeAndAfterAll {

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

  test("mix_temperature: weights normalize, order inverts by share, boost >1 iff small") {
    val rows = ExtQueries25.queries("mix_temperature")(spark, sfDir).collect()
      .map(r => (r.getAs[Double]("share"), r.getAs[Double]("weight"),
        r.getAs[Double]("boost")))
    assert(rows.length >= 2)
    assert(math.abs(rows.map(_._2).sum - 1.0) < 1e-4)
    // sqrt-tempering compresses: every source's tempered/flat boost is
    // ordered OPPOSITE to its share (larger share -> smaller boost)
    val byShare = rows.sortBy(_._1)
    assert(byShare.map(_._3).reverse.sameElements(byShare.map(_._3).sorted))
    // the mean share is the fixed point: below it boosts, above it shrinks
    rows.foreach { case (share, weight, boost) =>
      assert(boost > 0)
      assert((weight > share) == (boost > 1.0) || math.abs(boost - 1.0) < 1e-3)
    }
  }

  test("join_asof_nearest picks min(|distance|) vs backward/forward winners") {
    val nearest = ExtQueries25.queries("join_asof_nearest")(spark, sfDir)
      .select(col("event_id"), col("dist_days")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // recompute the true min distance per event independently
    val e = Tables.events(spark, sfDir)
      .select(col("event_id"), col("user_id"), to_date(col("ts")).as("ed"))
    val o = Tables.table(spark, sfDir, "orders")
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"))
    val truth = e.join(o, col("user_id") === col("o_custkey"), "left_outer")
      .groupBy(col("event_id"))
      .agg(min(abs(datediff(col("o_orderdate"), col("ed")))).as("d"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) -1L else r.getAs[Number](1).longValue)).toMap
    assert(nearest.size == truth.size)
    nearest.foreach { case (ev, d) => assert(truth(ev) == d, s"event $ev") }
  }
}
