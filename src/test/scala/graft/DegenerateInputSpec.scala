package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/**
 * Degenerate-corpus behavior of the analytics queries: single-day
 * streams, users without conversions, one-word vocabularies. ANSI mode
 * makes an unguarded zero-denominator integer DIV fatal — every rate
 * here must come back 0 (or a sane value), never throw.
 */
class DegenerateInputSpec extends AnyFunSuite with BeforeAndAfterAll {

  @transient private var spark: SparkSession = _
  private var dir: String = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    dir = java.nio.file.Files.createTempDirectory("degenerate").toString
    val s = spark; import s.implicits._
    // ONE day, 3 users: u1 views only (no click -> funnel stage 2 empty),
    // u2 a single event, u3 view+click inside an hour but never purchases
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 10:00:00")
    def ts(mins: Int) = new java.sql.Timestamp(t0.getTime + mins * 60000L)
    Seq(
      (1L, ts(0), 1L, "view", 1.0, """{"k": 1}"""),
      (2L, ts(5), 1L, "view", 2.0, """{"k": 2}"""),
      (3L, ts(0), 2L, "error", 3.0, """{"k": 1}"""),
      (4L, ts(1), 3L, "view", 4.0, """{"k": 3}"""),
      (5L, ts(20), 3L, "click", 5.0, """{"k": 3}"""))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.parquet(s"$dir/events.parquet")
    Seq((1L, "word", "en", "src0", 4L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$dir/documents.parquet")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("funnel_timebound: zero purchases -> zero rates, no division error") {
    val r = ExtQueries30.queries("funnel_timebound")(spark, dir).collect().head
    assert(r.getAs[Long]("viewed") == 2L)
    assert(r.getAs[Long]("clicked_1h") == 1L)
    assert(r.getAs[Long]("purchased_24h") == 0L)
    assert(r.getAs[Long]("purchase_conv_ppm") == 0L)
  }

  test("trend_slope_by_type: single-day series -> slope 0") {
    val rows = ExtQueries31.queries("trend_slope_by_type")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_days") == 1L)
      assert(r.getAs[Long]("slope_ppm_per_day") == 0L)
    }
  }

  test("hazard_table: no purchases -> all censored, hazard 0") {
    val rows = ExtQueries29.queries("hazard_table")(spark, dir).collect()
    assert(rows.map(_.getAs[Long]("n_conv")).sum == 0L)
    assert(rows.map(_.getAs[Long]("n_censor")).sum == 3L)
    rows.foreach(r => assert(r.getAs[Long]("hazard_ppm") == 0L))
  }

  test("session_stats / rolling_mau / ab_assign_eval run clean on the tiny stream") {
    val st = ExtQueries31.queries("session_stats")(spark, dir).collect().head
    assert(st.getAs[Long]("n_sessions") >= 3L)
    assert(st.getAs[Long]("total_events") == 5L)
    val mau = ExtQueries36.queries("rolling_mau")(spark, dir).collect()
    assert(mau.length == 1 && mau.head.getAs[Long]("mau7") == 3L)
    val ab = ExtQueries29.queries("ab_assign_eval")(spark, dir).collect()
    assert(ab.map(_.getAs[Long]("n_users")).sum == 3L)
  }

  test("text_zipf_fit: one-word vocabulary -> degenerate fit, slope 0") {
    val r = ExtQueries30.queries("text_zipf_fit")(spark, dir).collect().head
    assert(r.getAs[Long]("n") == 1L)
    assert(r.getAs[Long]("slope_ppm") == 0L)
  }

  test("text_readability_lix: single-word doc stays on the grid") {
    val r = ExtQueries29.queries("text_readability_lix")(spark, dir).collect().head
    assert(r.getAs[Long]("n_words") == 1L)
    assert(r.getAs[Long]("lix_centi") == 100L, "1 word / 1 sentence, no long words")
  }

  test("simhashComponents: single-doc corpus -> no components, no errors") {
    val out = graft.operators.Dedup.simhashComponents(
      graft.operators.Tables.table(spark, dir, "documents"), 3).collect()
    assert(out.isEmpty, "a pairless corpus must produce an empty component table")
  }

  test("wave-39 reports survive the one-doc corpus (no dup structure, no DIV-0)") {
    val w = SparkEntry.queries("dedup_sample_weights")(spark, dir).collect()
    assert(w.length == 1 && w.head.getAs[Long]("effective_ppm_sum") == 1000000L,
      "singleton doc weighs 1.0 exactly")
    val t = SparkEntry.queries("token_dedup_savings")(spark, dir).collect()
    assert(t.length == 1 && t.head.getAs[Long]("saved_pm") == 0L,
      "nothing to save with no clusters")
    val q = SparkEntry.queries("quality_gate_by_source")(spark, dir).collect()
    assert(q.length == 1 && q.head.getAs[Long]("n_total") == 1L,
      "single-doc source still reports (percent_rank of a single row is 0)")
  }
}
