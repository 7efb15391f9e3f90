package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Semantics of the training-sequence packing family: concat packing's
  * prefix-sum offsets and straddle accounting, greedy atomic packing's
  * fit/overflow/oversized behavior, and the per-shard independence both
  * disciplines rely on. */
class Ext45Spec extends AnyFunSuite with BeforeAndAfterAll {

  @transient private var spark: SparkSession = _
  private var dir: String = _

  // SeqLen = 256, NShards = 8 (ExtQueries45 constants)
  private def words(n: Int): String = Seq.fill(n)("w").mkString(" ")

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    dir = java.nio.file.Files.createTempDirectory("ext45").toString
    spark.createDataFrame(Seq(
      (0L, words(100)), // shard 0
      (8L, words(100)), // shard 0
      (16L, words(100)), // shard 0 — straddles seq 0/1 under concat
      (24L, words(300)), // shard 0 — oversized (> SeqLen)
      (1L, words(10)) // shard 1 — shards pack independently
    )).toDF("doc_id", "text")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("concat packing: prefix-sum offsets with separators, straddlers spanning seqs") {
    val got = ExtQueries45.queries("pack_offsets")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toList
    assert(got == List(
      (0L, 0, 0L, 0L, 0L, 1L), //   0..99
      (1L, 1, 0L, 0L, 0L, 1L), // shard 1 starts from 0 — independent
      (8L, 0, 101L, 0L, 0L, 1L), // 101..200 (separator after doc 0)
      (16L, 0, 202L, 0L, 1L, 2L), // 202..301 straddles the 256 boundary
      (24L, 0, 303L, 1L, 2L, 2L)), s"got $got") // 303..602
  }

  test("concat packing stats: sequence count from stream length, straddle fraction") {
    val got = ExtQueries45.queries("pack_stats")(spark, dir)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5))).toList
    // shard 0: stream = 604 tokens (incl. final separator) -> 3 seqs;
    // docs 16 and 24 straddle -> 2/4
    assert(got == List(
      (0, 4L, 600L, 3L, 2L, 0.5),
      (1, 1L, 10L, 1L, 0L, 0.0)), s"got $got")
  }

  test("greedy atomic packing: fit, overflow to new sequence, oversized doc alone") {
    val got = ExtQueries45.queries("pack_greedy")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3))).toList
    assert(got == List(
      (0L, 0, 0L, 0L), // opens seq 0
      (1L, 1, 0L, 0L), // shard 1's own seq 0
      (8L, 0, 0L, 100L), // fits after doc 0 (200 <= 256)
      (16L, 0, 1L, 0L), // 300 > 256 -> new seq
      (24L, 0, 2L, 0L)), s"got $got") // oversized: its own seq
  }

  test("greedy packing stats: fill and waste per shard") {
    val got = ExtQueries45.queries("pack_greedy_stats")(spark, dir)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getLong(4))).toList
    // shard 0 seqs: used 200, 100, 300(capped 256) -> mean fill
    // (200+100+256)/(3*256) = 0.7240; waste 56+156+0 = 212
    assert(got == List(
      (0, 3L, 4L, math.rint((200.0 / 256 + 100.0 / 256 + 1.0) / 3 * 10000) / 10000, 212L),
      (1, 1L, 1L, math.rint(10.0 / 256 * 10000) / 10000, 246L)), s"got $got")
  }
}
