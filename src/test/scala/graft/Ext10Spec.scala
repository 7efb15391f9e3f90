package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/**
 * Invariants for the round-5 second wave: chunking must reconstruct the
 * source text, Z-order buckets must be tight in BOTH dimensions, global
 * row numbers must be a contiguous permutation.
 */
class Ext10Spec extends AnyFunSuite with BeforeAndAfterAll {

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

  test("text_chunk_overlap: stride prefixes + last chunk reconstruct every document exactly") {
    val chunks = ExtQueries10.queries("text_chunk_overlap")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3).toSeq).toMap
    val texts = graft.operators.Tables.table(spark, sfDir, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(chunks.keySet == texts.keySet)
    texts.foreach { case (id, text) =>
      val cs = chunks(id)
      // chunk i covers [i*150, i*150+200): the first 150 chars of every
      // chunk but the last, plus the whole last chunk, is the text
      val rebuilt = cs.init.map(_.take(150)).mkString + cs.last
      assert(rebuilt == text, s"doc $id failed reconstruction")
      // consecutive chunks agree on the 50-char overlap
      cs.sliding(2).filter(_.length == 2).foreach { case Seq(a, b) =>
        assert(a.drop(150) == b.take(a.length - 150), s"doc $id overlap mismatch")
      }
    }
  }

  test("zorder_layout: every bucket is <= 16 wide in BOTH dimensions (the pruning property)") {
    val rows = ExtQueries10.queries("zorder_layout")(spark, sfDir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getInt(2), r.getInt(3), r.getInt(4), r.getInt(5)))
    assert(rows.nonEmpty)
    rows.foreach { case (zb, n, minX, maxX, minY, maxY) =>
      assert(n > 0)
      assert(maxX - minX <= 15, s"bucket $zb x-range ${maxX - minX}")
      assert(maxY - minY <= 15, s"bucket $zb y-range ${maxY - minY}")
    }
  }

  test("global_rownum: contiguous 1..N permutation consistent with the key order") {
    val rows = ExtQueries10.queries("global_rownum")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val n = rows.length
    assert(rows.map(_._3).sorted.sameElements(1L to n.toLong),
      "row numbers must be exactly 1..N")
    val byKey = rows.sortBy(t => t._1 * 100 + t._2).map(_._3)
    assert(byKey.sameElements(1L to n.toLong),
      "row numbers must follow the total key order")
  }
}
