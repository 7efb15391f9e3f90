package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Cross-checks for the round-6 fifth wave. */
class Ext15Spec extends AnyFunSuite with BeforeAndAfterAll {

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

  test("media phash banded join: planted bit-flips <= 3 are found, > 3 are not, pairs emit once") {
    val sp = spark
    import sp.implicits._
    // base hash + planted variants: distance 0 (exact clone), 1, 3, 4
    val h = 0x123456789abcdeL
    val rows = Seq(
      (1L, h), (2L, h), // distance 0 pair
      (3L, h ^ (1L << 7)), // distance 1 from h
      (4L, h ^ (1L << 3) ^ (1L << 20) ^ (1L << 45)), // distance 3
      (5L, h ^ (1L << 2) ^ (1L << 17) ^ (1L << 33) ^ (1L << 52))) // distance 4
    // rebuild the query's exact banded-join shape over the planted
    // hashes (the public query derives phash from testdata payloads,
    // which carry no controlled distances)
    val df = rows.toDF("doc_id", "phash")
    val chunks: org.apache.spark.sql.DataFrame = (0 until 4).map(j =>
      df.select(col("doc_id"), col("phash"), lit(j).as("c"),
        shiftright(col("phash"), j * 15).bitwiseAND(lit((1 << 15) - 1)).as("ck")))
      .reduceLeft((x, y) => x.unionAll(y))
    val a = chunks.as("a"); val b = chunks.as("b")
    val earlier = (0 until 4).map(j =>
      when(col("a.c") > j,
        shiftright(col("a.phash"), j * 15).bitwiseAND(lit((1 << 15) - 1)) =!=
          shiftright(col("b.phash"), j * 15).bitwiseAND(lit((1 << 15) - 1)))
        .otherwise(lit(true))).reduce(_ && _)
    val pairs = a.join(b,
        col("a.c") === col("b.c") && col("a.ck") === col("b.ck") &&
          col("a.doc_id") < col("b.doc_id") && earlier)
      .where(bit_count(col("a.phash").bitwiseXOR(col("b.phash"))) <= 3)
      .select(col("a.doc_id"), col("b.doc_id"),
        bit_count(col("a.phash").bitwiseXOR(col("b.phash"))).as("d"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    // expected: every pair within hamming 3 exactly once; doc 5 (distance
    // 4 from h) may still be within 3 of docs 3/4 — compute the truth set
    val truth = for {
      (i, hi) <- rows; (k, hk) <- rows if i < k
      d = java.lang.Long.bitCount(hi ^ hk) if d <= 3
    } yield (i, k, d)
    assert(pairs.sorted.toSeq == truth.sorted.toSeq)
    assert(pairs.map(p => (p._1, p._2)).distinct.length == pairs.length, "pair-once")
  }

  test("embed_quantize: quantized values bounded by int8 and error bounded by half a step") {
    val got = ExtQueries15.queries("embed_quantize")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2), r.getDouble(3)))
    assert(got.length == 500)
    got.foreach { case (id, scale, _, maxErr) =>
      assert(scale > 0, s"vec $id scale")
      // |v - q/s| <= 0.5/s; both maxErr and scale are reported at 6dp,
      // so allow the rounding granularity on either side
      assert(maxErr <= 0.5 / scale + 1e-6, s"vec $id err $maxErr vs step ${1.0 / scale}")
    }
  }

  test("dq_audit: clean synthetic data passes every check except the planted ones") {
    val got = ExtQueries15.queries("dq_audit")(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got.size == 7)
    // the driver data is FK-consistent and in-range by construction
    assert(got("lineitem.orphan_order") == 0)
    assert(got("orders.orphan_customer") == 0)
    assert(got("documents.nchars_consistent") == 0)
  }
}
