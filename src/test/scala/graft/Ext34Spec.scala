package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.operators.Tables

/** Cross-checks for the dedup-structure reporting wave (ExtQueries34). */
class Ext34Spec extends AnyFunSuite with BeforeAndAfterAll {

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

  test("dedup_cluster_stats: sizes >= 2 and masses match dedup_groups_cc") {
    val hist = ExtQueries34.queries("dedup_cluster_stats")(spark, sfDir).collect()
    val comps = ExtQueries4.queries("dedup_groups_cc")(spark, sfDir).collect()
    // every CC member is in a pair, so no singleton clusters exist
    hist.foreach(r => assert(r.getAs[Long]("size") >= 2L))
    assert(hist.map(_.getAs[Long]("n_docs")).sum == comps.length)
    val sizes = comps.groupBy(_.getAs[Long]("comp")).values.map(_.length.toLong)
    val expected = sizes.groupBy(identity).view.mapValues(_.size.toLong).toMap
    hist.foreach(r => assert(expected(r.getAs[Long]("size")) == r.getAs[Long]("n_clusters")))
  }

  test("dup_ratio_by_source: partitions the corpus, members bounded") {
    val rows = ExtQueries34.queries("dup_ratio_by_source")(spark, sfDir).collect()
    val nDocs = Tables.table(spark, sfDir, "documents").count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == nDocs)
    val nMembers = ExtQueries4.queries("dedup_groups_cc")(spark, sfDir).count()
    assert(rows.map(_.getAs[Long]("n_dup_members")).sum == nMembers)
    rows.foreach(r => assert(r.getAs[Long]("dup_ppm") <= 1000000L))
  }

  test("text_ngram_novelty: chunk 0 is all-new and novelty is a sound fraction") {
    val rows = ExtQueries34.queries("text_ngram_novelty")(spark, sfDir).collect()
    val first = rows.find(_.getAs[Long]("chunk") == 0L).get
    assert(first.getAs[Long]("n_new") == first.getAs[Long]("n_sh"),
      "every shingle in the first chunk is first-seen there")
    assert(first.getAs[Long]("novelty_pm") == 1000L)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_new") <= r.getAs[Long]("n_sh"))
      assert(r.getAs[Long]("novelty_pm") <= 1000L)
    }
    // total new shingles across chunks = distinct shingles in the corpus
    val totalDistinct = operators.Dedup
      .ngramShingles(Tables.table(spark, sfDir, "documents"), 5)
      .select(col("shingle")).distinct().count()
    assert(rows.map(_.getAs[Long]("n_new")).sum == totalDistinct)
  }
}
