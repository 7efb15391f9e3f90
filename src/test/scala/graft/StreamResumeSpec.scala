package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.operators.Tables

/**
 * Checkpointed stop/restart: a stateful streaming query killed between
 * runs must resume from its checkpoint — already-processed files are
 * not re-read, dedup state survives the restart (RocksDB state store),
 * and the file sink stays exactly-once. This is the fault-tolerance
 * contract a 100 TB ingest pipeline actually relies on; AvailableNow
 * gives a deterministic stop point to test it with.
 */
class StreamResumeSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val sfDir = "/root/testdata/sf0.001"
  @transient private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("restart from checkpoint: no re-read, dedup state restored, sink exactly-once") {
    val src = Files.createTempDirectory("resume_src").toString
    val sink = Files.createTempDirectory("resume_sink").toString + "/out"
    val ckpt = Files.createTempDirectory("resume_ckpt").toString

    val ev = Tables.events(spark, sfDir)
      .select(col("event_id"), col("user_id")).orderBy(col("event_id"))
      .localCheckpoint(true)
    val medianUser = ev.select(col("user_id")).distinct()
      .orderBy(col("user_id")).collect().map(_.getLong(0)).apply(
        ev.select(col("user_id")).distinct().count().toInt / 2)
    // run 1 sees only low users; run 2's file re-contains ALL events, so
    // every run-1 user arrives again as a duplicate the restored state
    // must suppress, plus the high users arriving for the first time
    val half = ev.where(col("user_id") < medianUser)
    val rest = ev

    def runOnce(): Unit = {
      val schema = StructType(Seq(
        StructField("event_id", LongType), StructField("user_id", LongType)))
      val q = spark.readStream.schema(schema).parquet(src)
        .dropDuplicates("user_id")
        .select(col("user_id"))
        .writeStream.format("parquet")
        .option("path", sink).option("checkpointLocation", ckpt)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }

    half.coalesce(1).write.mode("append").parquet(src)
    runOnce() // run 1: first half of the files
    val afterRun1 = spark.read.parquet(sink).count()

    rest.coalesce(1).write.mode("append").parquet(src)
    runOnce() // run 2: SAME checkpoint — resumes, reads only the new file

    val out = spark.read.parquet(sink).select(col("user_id")).collect()
      .map(_.getLong(0))
    val expected = ev.select(col("user_id")).distinct().collect()
      .map(_.getLong(0)).sorted

    // exactly-once: every user exactly one row, across both runs combined
    assert(out.sorted.sameElements(expected),
      s"sink rows=${out.length}, distinct users=${expected.length}")
    assert(out.length == out.distinct.length,
      "restart re-emitted users whose dedup state was checkpointed")
    // the restart actually continued (run 2 added the users only the
    // second half contains) rather than reprocessing from scratch
    assert(afterRun1 < expected.length)
    assert(afterRun1 > 0)
  }
}
