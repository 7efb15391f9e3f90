package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.operators.Tables
import graft.streaming.StreamingOps

/**
 * Schema-adaptive events loading (round-6 regression class): the driver
 * has shipped `events.ts` as TIMESTAMP(NANOS) and as `timestamp[us]`;
 * the loaders must branch on the arrived type, and the raw-INT64 path
 * must refuse modern-era microsecond values instead of silently
 * compressing every timestamp 1000×.
 */
class EventsLoaderSpec extends AnyFunSuite with BeforeAndAfterAll {

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

  /** Write a one-column events-shaped parquet dir with ts of the given values. */
  private def writeEvents(tsValues: Seq[Long]): String = {
    val sp = spark; import sp.implicits._
    val dir = Files.createTempDirectory("events_loader_spec").toString
    tsValues.zipWithIndex
      .map { case (t, i) => (i.toLong, t, i.toLong % 5, "view", 1.0, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/raw")
    // driver layout is one FILE named events.parquet
    val part = Files.list(java.nio.file.Paths.get(s"$dir/raw"))
      .filter(_.getFileName.toString.endsWith(".parquet")).findFirst.get
    Files.move(part, java.nio.file.Paths.get(s"$dir/events.parquet"))
    dir
  }

  test("driver testdata (timestamp[us]) loads as TimestampType with modern-era values") {
    val ev = Tables.events(spark, sfDir)
    assert(ev.schema("ts").dataType == TimestampType)
    val (lo, hi) = ev.agg(min(year(col("ts"))), max(year(col("ts")))).as[(Int, Int)](
      org.apache.spark.sql.Encoders.tuple(org.apache.spark.sql.Encoders.scalaInt,
        org.apache.spark.sql.Encoders.scalaInt)).head()
    assert(lo >= 2000 && hi < 2100, s"event years [$lo,$hi] not modern-era — unit mismatch?")
  }

  test("raw INT64 epoch-nanos converts via DIV 1000; stream probe agrees with batch") {
    val tsNanos = Seq(86400L * 1000000000L * 2 + 7000000000L, // 1970-01-03 00:00:07
      86400L * 1000000000L * 2 + 9000000000L)
    val dir = writeEvents(tsNanos)
    val batch = Tables.events(spark, dir)
    assert(batch.schema("ts").dataType == TimestampType)
    val got = batch.select(expr("unix_micros(ts)")).collect().map(_.getLong(0)).sorted
    assert(got.toSeq == tsNanos.map(_ / 1000L).sorted)
    val streamed = StreamingOps.runToMemory(
      StreamingOps.eventsStream(spark, dir)
        .select(expr("unix_micros(ts)").as("us"), col("event_id")),
      s"evload_${System.nanoTime()}", org.apache.spark.sql.streaming.OutputMode.Append())
    assert(streamed.collect().map(_.getLong(0)).sorted.toSeq == got.toSeq)
  }

  test("raw INT64 holding modern-era MICROS trips the unit invariant loudly") {
    val micros2024 = 1723500000000000L // 2024-08-12T..Z as epoch-micros
    val dir = writeEvents(Seq(micros2024, micros2024 + 1000000L))
    val e = intercept[IllegalArgumentException] { Tables.events(spark, dir).count() }
    assert(e.getMessage.contains("MICROSECONDS band"))
  }
}
