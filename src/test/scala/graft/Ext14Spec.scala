package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Cross-checks for the round-6 fourth wave. */
class Ext14Spec extends AnyFunSuite with BeforeAndAfterAll {

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

  test("graph_pagerank: bit-stable across partitionings (fixed-point exactness) and mass-conserving") {
    def run(): Seq[(Int, Double)] =
      ExtQueries14.queries("graph_pagerank")(spark, sfDir).collect()
        .map(r => (r.getInt(0), r.getDouble(1))).toSeq
    val base = run()
    val prior = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "1")
    val single = try run() finally spark.conf.set("spark.sql.shuffle.partitions", prior)
    assert(base == single, "fixed-point PageRank must not depend on aggregation order")
    // mass conservation: with uniform init and no dangling vertices the
    // total rank stays |V| up to per-division fixed-point rounding dust
    val edges = graft.operators.Cooccurrence.coocCounts(
        graft.operators.Cooccurrence.interactions(spark, sfDir))
      .where(col("item") < col("other") && col("cnt") >= 3)
      .select(col("item").as("u"), col("other").as("v"))
    val full = ExtQueries14.pagerank(edges, 10)
      .agg(sum(col("r").cast("double") / lit(ExtQueries14.PrScale.toDouble)),
        count(lit(1))).collect()(0)
    val (mass, n) = (full.getDouble(0), full.getLong(1))
    assert(math.abs(mass - n) < 1e-6 * n, s"mass $mass vs |V| $n")
    assert(base.length == math.min(20, n))
    assert(base.map(_._2).sorted.reverse == base.map(_._2), "sorted desc")
  }

  test("timeseries_fill: filled == last observed value at or before the day") {
    val got = ExtQueries14.queries("timeseries_fill")(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2), r.getDouble(3), r.getBoolean(4)))
    val byType = got.groupBy(_._1)
    byType.foreach { case (_, rows) =>
      var lastSeen = -1.0
      rows.sortBy(_._2).foreach { case (t, d, obs, filled, gap) =>
        assert(gap == (obs == -1.0), s"$t $d gap flag")
        if (!gap) lastSeen = obs
        assert(filled == lastSeen, s"$t $d filled=$filled expected=$lastSeen")
      }
    }
    assert(got.exists(_._5) && got.exists(!_._5), "both gaps and observations present")
  }

  test("feature_pit_join: features never leak the future") {
    val got = ExtQueries14.queries("feature_pit_join")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    val ev = graft.operators.Tables.events(spark, sfDir)
      .select(col("user_id"), expr("unix_micros(ts)").as("us"), col("event_id"),
        col("value"), col("event_type")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getString(4)))
    val byUser = ev.groupBy(_._1)
    val labels = ev.filter(_._5 == "purchase")
    assert(got.length == labels.length)
    val gotMap = got.map(g => g._1 -> g).toMap
    labels.foreach { case (u, us, eid, _, _) =>
      val (_, _, f1, _) = gotMap(eid)
      val pre = byUser(u).filter(e => e._2 < us)
      if (pre.isEmpty) assert(f1 == -1.0, s"label $eid sentinel")
      else assert(f1 == pre.maxBy(e => (e._2, e._3))._4, s"label $eid f1")
    }
  }
}
