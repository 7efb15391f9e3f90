package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/**
 * Refund-cycle parity (SURVEY §7.4.1): with kMax = 0 every sampled slot
 * is refunded, so the full two-stage machinery must reduce to
 * first-fMax per (item, week) — checked against a declarative window
 * rank, and the streaming (per-microbatch refund fold) form must equal
 * the batch (per-window refund fold) form exactly.
 */
class Ext22Spec extends AnyFunSuite with BeforeAndAfterAll {

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

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[Seq[Any]] =
    df.collect().toSeq.map(_.toSeq)

  test("batch refund loop == declarative first-fMax-per-(item,window) rank") {
    val got = ExtQueries22.queries("cooc_item_cut_refunds")(spark, sfDir)
    val ev = graft.operators.Cooccurrence.interactions(spark, sfDir)
      .select(col("user"), col("item"), unix_millis(col("ts")).as("ts_ms"))
      .withColumn("wnd", expr(s"ts_ms DIV ${7L * 86400000L}"))
    val w = Window.partitionBy(col("item"), col("wnd")).orderBy(col("ts_ms"), col("user"))
    val expected = ev.withColumn("rn", row_number().over(w))
      .select(col("wnd"), col("item"), col("user"), col("ts_ms"),
        when(col("rn") <= 20, 1).otherwise(0).as("sampled"))
      .orderBy(col("wnd"), col("item"), col("ts_ms"), col("user"), col("sampled"))
    assert(rows(got) == rows(expected))
  }

  test("streaming per-microbatch refund fold == batch per-window refund fold") {
    val batch = ExtQueries22.queries("cooc_item_cut_refunds")(spark, sfDir)
    val stream = ExtQueries22.queries("stream_item_cut_refunds")(spark, sfDir)
    assert(rows(stream) == rows(batch))
  }

  test("refunds are load-bearing: some item samples past fMax across windows") {
    // sf0.001 has ~10 events/item over 5 weeks, so the query's fMax=20
    // never binds here — drive the machinery with fMax=2, where it must:
    // if refunds were dropped, per-item sampled totals would cap at 2
    // forever; the per-window refund reset pushes items past it
    val fMax = 2
    val flags = graft.operators.Sampling.itemCutFlags(
      graft.operators.Cooccurrence.interactions(spark, sfDir),
      fMax, kMax = 0, seed = 42L, windowMs = 7L * 86400000L)
    val maxSampled = flags.where(col("sample"))
      .groupBy(col("item")).agg(count(lit(1)).as("n"))
      .agg(max(col("n"))).head().getLong(0)
    assert(maxSampled > fMax,
      s"max per-item sampled $maxSampled never exceeded fMax=$fMax — refunds dead?")
    // and the fMax=2 flags still equal the declarative per-(item,week) rank
    val ev = graft.operators.Cooccurrence.interactions(spark, sfDir)
      .select(col("user"), col("item"), unix_millis(col("ts")).as("ts_ms"))
      .withColumn("wnd", expr(s"ts_ms DIV ${7L * 86400000L}"))
    val w = Window.partitionBy(col("item"), col("wnd")).orderBy(col("ts_ms"), col("user"))
    val expected = ev.withColumn("rn", row_number().over(w))
      .where(col("rn") <= fMax)
      .select(col("wnd"), col("item"), col("user"), col("ts_ms"))
      .orderBy(col("wnd"), col("item"), col("ts_ms"), col("user"))
    val gotSampled = flags.where(col("sample"))
      .select(col("wnd"), col("item"), col("user"), col("tsMs").as("ts_ms"))
      .orderBy(col("wnd"), col("item"), col("ts_ms"), col("user"))
    assert(rows(gotSampled) == rows(expected))
  }
}
