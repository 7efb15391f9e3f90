package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.operators.Tables

/** Cross-checks for the round-6 ninth wave (bigram LM, outer
  * stream-stream join, BPE round-trip, HLL rollup). */
class Ext19Spec extends AnyFunSuite with BeforeAndAfterAll {

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

  test("bigram NLL matches a plain-Scala recount on one held-out doc") {
    val docs = Tables.table(spark, sfDir, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val train = docs.filter { case (id, _) => id % 5 != 4 }
    val trainBigrams = train.values.toSeq
      .flatMap(t => t.split(" ").sliding(2).filter(_.length == 2).map(a => (a(0), a(1))))
    val c12 = trainBigrams.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val c1 = trainBigrams.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
    val v = train.values.flatMap(_.split(" ")).toSet.size.toLong
    val heldOutId = docs.keys.filter(_ % 5 == 4).min
    val expected = docs(heldOutId).split(" ").sliding(2).filter(_.length == 2).map { a =>
      val p = (c12.getOrElse((a(0), a(1)), 0L) + 1).toDouble /
        (c1.getOrElse(a(0), 0L) + v).toDouble
      math.floor(-math.log(p) * 1e6 + 0.5).toLong
    }.sum
    val got = SparkEntry.queries("lm_bigram_nll")(spark, sfDir)
      .where(col("doc_id") === heldOutId).collect().head.getLong(2)
    assert(got == expected)
  }

  test("outer stream-stream join = inner rows + watermark-safe unmatched lefts") {
    val outer = SparkEntry.queries("stream_stream_outer")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val inner = SparkEntry.queries("stream_stream_join")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val (matched, unmatched) = outer.partition(_._2 != -1L)
    assert(matched.toSet == inner, "outer join must contain exactly the inner rows")
    assert(unmatched.nonEmpty, "some views have no purchase within the hour")
    val matchedIds = inner.map(_._1)
    unmatched.foreach { case (lId, _) =>
      assert(!matchedIds.contains(lId), s"view $lId emitted both matched and null")
    }
  }

  test("every document survives the BPE round-trip losslessly") {
    val rows = SparkEntry.queries("bpe_roundtrip")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getBoolean(1)))
  }

  test("HLL rollup: merge is partition-independent and within bounds") {
    val r = SparkEntry.queries("approx_distinct_rollup")(spark, sfDir).collect().head
    assert(r.getBoolean(0) && r.getBoolean(1) && r.getBoolean(2))
  }
}
