package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.operators.Tables

/** Cross-checks for the corpus-evaluation wave (ExtQueries32). */
class Ext32Spec extends AnyFunSuite with BeforeAndAfterAll {

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

  test("langid_confusion: cells partition the corpus and agree with text_langid") {
    val cells = ExtQueries32.queries("langid_confusion")(spark, sfDir).collect()
    val nDocs = Tables.table(spark, sfDir, "documents").count()
    assert(cells.map(_.getAs[Long]("n")).sum == nDocs)
    val perDoc = ExtQueries.queries("text_langid")(spark, sfDir).collect()
    val expected = perDoc.groupBy(r =>
      (r.getAs[String]("labeled_lang"), r.getAs[String]("predicted_lang")))
      .view.mapValues(_.length.toLong).toMap
    cells.foreach { c =>
      val k = (c.getAs[String]("labeled_lang"), c.getAs[String]("predicted_lang"))
      assert(expected(k) == c.getAs[Long]("n"), s"cell $k")
    }
  }

  test("psi_by_source: PSI is non-negative (quantized terms keep the sign identity)") {
    val rows = ExtQueries32.queries("psi_by_source")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getAs[Long]("psi_nano") >= 0L,
      s"(p_s-p_c)·ln(p_s/p_c) is non-negative per bin: $r"))
    val nDocs = Tables.table(spark, sfDir, "documents").count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == nDocs)
  }

  test("dedup_containment: containment bounds and asymmetry") {
    val rows = ExtQueries32.queries("dedup_containment")(spark, sfDir).collect()
    rows.foreach { r =>
      val (c, na, nb) = (r.getAs[Long]("n_common"), r.getAs[Long]("n_a"), r.getAs[Long]("n_b"))
      assert(c <= math.min(na, nb))
      assert(r.getAs[Long]("cont_a_pm") <= 1000L && r.getAs[Long]("cont_b_pm") <= 1000L)
      assert(r.getAs[Long]("cont_a_pm") >= 500L || r.getAs[Long]("cont_b_pm") >= 500L)
      // containment dominates Jaccard: common/min >= common/union
      val jacPm = c * 1000 / (na + nb - c)
      assert(math.max(r.getAs[Long]("cont_a_pm"), r.getAs[Long]("cont_b_pm")) >= jacPm)
    }
  }

  test("approx_distinct_overlap: sketch inclusion-exclusion lands within the bound") {
    val rows = ExtQueries32.queries("approx_distinct_overlap")(spark, sfDir).collect()
    assert(rows.length == 10, "one row per unordered type pair")
    rows.foreach(r => assert(r.getAs[Int]("within_10pct") == 1,
      s"estimate out of bound for $r"))
    val ev = Tables.events(spark, sfDir)
    val usersPerType = ev.groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      val cap = math.min(usersPerType(r.getAs[String]("type_a")),
        usersPerType(r.getAs[String]("type_b")))
      assert(r.getAs[Long]("exact_overlap") <= cap)
    }
  }

  test("contamination_score: quantifies exactly the docs decontaminate_ngram drops") {
    val scored = ExtQueries32.queries("contamination_score")(spark, sfDir).collect()
      .map(_.getAs[Long]("doc_id")).toSet
    val survivors = ExtQueries5.queries("decontaminate_ngram")(spark, sfDir).collect()
      .map(_.getAs[Long]("doc_id")).toSet
    val corpus = Tables.table(spark, sfDir, "documents")
      .where(col("doc_id") % 10 =!= 3)
      // docs shorter than 5 words emit no shingles and can't be scored
      .where(size(split(col("text"), " ")) >= 5)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(scored.intersect(survivors).isEmpty,
      "a doc with any contaminated shingle cannot survive decontamination")
    assert(scored.union(survivors.intersect(corpus)) == corpus,
      "every shingled corpus doc is either contaminated (scored) or a survivor")
  }
}
