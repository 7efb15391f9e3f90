package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

class Ext40Spec extends AnyFunSuite with BeforeAndAfterAll {

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

  test("stream_dsv2_interactions == source_dsv2_interactions (MICRO_BATCH_READ and BATCH_READ agree on the staged corpus)") {
    val batch = SparkEntry.queries("source_dsv2_interactions")(spark, sfDir)
      .collect().map(_.toSeq).toSeq
    val stream = SparkEntry.queries("stream_dsv2_interactions")(spark, sfDir)
      .collect().map(_.toSeq).toSeq
    assert(batch.nonEmpty, "staged corpus must be non-empty")
    assert(stream == batch,
      s"streaming read diverged from batch read: batch=${batch.take(3)} stream=${stream.take(3)}")
  }
}
