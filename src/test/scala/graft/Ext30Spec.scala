package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.operators.Tables

/** Cross-checks for the temporal-analytics + storage wave (ExtQueries30). */
class Ext30Spec extends AnyFunSuite with BeforeAndAfterAll {

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

  test("funnel_timebound: deadlines only shrink the unbounded funnel") {
    val bounded = ExtQueries30.queries("funnel_timebound")(spark, sfDir).collect().head
    val free = ExtQueries6.queries("funnel_steps")(spark, sfDir).collect().head
    assert(bounded.getAs[Long]("viewed") == free.getAs[Long]("viewed"))
    assert(bounded.getAs[Long]("clicked_1h") <= free.getAs[Long]("clicked"))
    assert(bounded.getAs[Long]("purchased_24h") <= bounded.getAs[Long]("clicked_1h"))
    assert(bounded.getAs[Long]("click_conv_ppm") <= 1000000L)
  }

  test("session_paths: trigram mass equals sum over sessions of max(0, len-2)") {
    val paths = ExtQueries30.queries("session_paths")(spark, sfDir).collect()
    val sessions = ExtQueries6.queries("sessionize_batch")(spark, sfDir)
      .select(col("n_events")).collect().map(_.getAs[Long]("n_events"))
    val totalTrigrams = sessions.map(n => math.max(0L, n - 2)).sum
    // the query returns the top-20 — its mass is bounded by the total,
    // and if there are <= 20 distinct trigrams it must equal it
    val mass = paths.map(_.getAs[Long]("n")).sum
    assert(mass <= totalTrigrams)
    if (paths.length < 20) assert(mass == totalTrigrams)
    paths.foreach(r => assert(r.getAs[String]("trigram").split(">").length == 3))
  }

  test("item_persistence: day counts within the calendar span") {
    val rows = ExtQueries30.queries("item_persistence")(spark, sfDir).collect()
    val nDays = Tables.events(spark, sfDir)
      .select(date_format(col("ts"), "yyyy-MM-dd")).distinct().count()
    rows.foreach { r =>
      val d = r.getAs[Long]("days_in_top")
      assert(d >= 1 && d <= nDays)
      assert(r.getAs[String]("first_day") <= r.getAs[String]("last_day"))
    }
  }

  test("zonemap_prune: skipping is SOUND and clustering is what enables it") {
    val rows = ExtQueries30.queries("zonemap_prune")(spark, sfDir).collect()
    // soundness: a skippable chunk must contain zero matching rows
    rows.filter(_.getAs[Int]("skippable") == 1)
      .foreach(r => assert(r.getAs[Long]("select_ppm") == 0L, s"unsound skip: $r"))
    val byLayout = rows.groupBy(_.getAs[String]("layout"))
    val nOrders = Tables.table(spark, sfDir, "orders").count()
    byLayout.values.foreach(rs => assert(rs.map(_.getAs[Long]("n")).sum == nOrders))
    // insertion layout cannot prune (dates uncorrelated with keys);
    // the date-clustered layout must prune most chunks
    assert(byLayout("keyrange").forall(_.getAs[Int]("skippable") == 0))
    val ds = byLayout("datesort")
    assert(ds.count(_.getAs[Int]("skippable") == 1) >= ds.length - 2,
      "date-clustered chunks outside the predicate range must all skip")
  }

  test("text_zipf_fit: slope is negative and Zipf-plausible") {
    val r = ExtQueries30.queries("text_zipf_fit")(spark, sfDir).collect().head
    // head is min(200, |vocab|) — the synthetic corpus vocab is tiny
    assert(r.getAs[Long]("n") >= 10L && r.getAs[Long]("n") <= 200L)
    val slope = r.getAs[Long]("slope_ppm")
    assert(slope < 0, s"word frequencies must fall with rank: $slope")
    assert(slope > -3000000L && slope < -50000L, s"implausible Zipf slope: $slope")
    assert(r.getAs[Long]("intercept_centi") > 0)
  }
}
