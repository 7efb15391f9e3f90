package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Driver-side naive-definition cross-checks for the round-6 second wave. */
class Ext12Spec extends AnyFunSuite with BeforeAndAfterAll {

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

  test("dedup_substring_rewrite == naive keep-first span masking; kept+masked partitions each doc") {
    val docs = graft.operators.Tables.table(spark, sfDir, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ")).sortBy(_._1)
    // naive: global first-occurrence per gram in (doc_id, pos) order
    val seen = scala.collection.mutable.Set[String]()
    val expect = docs.map { case (id, w) =>
      val dupStarts = (0 to w.length - 10).filter { i =>
        val g = w.slice(i, i + 10).mkString(" ")
        val dup = seen.contains(g); seen.add(g); dup
      }
      val maskedPos = dupStarts.flatMap(i => i until i + 10).toSet
      val kept = w.indices.filterNot(maskedPos).map(w)
      (id, w.length.toLong, kept.length.toLong, (w.length - kept.length).toLong, kept.mkString(" "))
    }
    val got = ExtQueries12.queries("dedup_substring_rewrite")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
    assert(got.toSeq == expect.toSeq)
    assert(expect.exists(_._4 > 0), "the corpus plants duplicated spans")
    got.foreach { case (id, nw, nk, nm, _) => assert(nk + nm == nw, s"doc $id") }
  }

  test("incremental_mv: merged base+delta partials equal the direct full recompute") {
    val got = ExtQueries12.queries("incremental_mv")(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    val full = graft.operators.Tables.table(spark, sfDir, "orders")
      .groupBy(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"),
        sum(col("o_totalprice").cast(org.apache.spark.sql.types.DecimalType(20, 4)))
          .cast("double").as("total"))
      .orderBy(col("o_orderstatus"), col("o_orderpriority")).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq == full.toSeq)
  }

  test("skew_diagnose: frequency profile matches a driver-side recount") {
    val got = ExtQueries12.queries("skew_diagnose")(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    val li = graft.operators.Tables.table(spark, sfDir, "lineitem")
      .select(col("l_orderkey")).collect().map(_.getLong(0))
    val freq = li.groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val maxF = freq.values.max
    val heaviest = freq.filter(_._2 == maxF).keys.max
    assert(got("lineitem.l_orderkey") ==
      ((freq.size.toLong, li.length.toLong, maxF, heaviest)))
  }
}
