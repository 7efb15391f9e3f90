package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.operators.{AnnIndex, PqIndex, Similarity}

/** IVFADC + exact refine (r15 verdict #1 of the missing list): the
  * two-stage serve must close the ADC recall gap — floor 0.9 on the
  * shared corpus (ADC alone is ~0.2 there, Ext47Spec) — and every
  * returned score must be the exact cosine of its pair (the refine
  * stage's whole point). */
class Ext51Spec extends AnyFunSuite with BeforeAndAfterAll {

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

  private val qids = Seq(0L, 1L, 2L, 3L, 4L)

  test("refined recall@10 >= 0.9 on the shared corpus; ADC-alone stays far below") {
    val real = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val art = AnnIndex.ivfpq(spark, sfDir, 16, 3, 8, 16, 2)
    def hits(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select(col("query_id"), col("vec_id")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = hits(Similarity.bruteForceTopK(real, qids, 10))
    val refined = hits(PqIndex.ivfadcRefinedTopK(art.centroids, art.books,
      art.table, real, qids, 10, ExtQueries51.NProbe, ExtQueries51.Shortlist))
    val plain = hits(PqIndex.ivfadcTopKFromTable(art.centroids, art.books,
      art.table, real, qids, 10, ExtQueries51.NProbe))
    val rRefined = (refined & exact).size.toDouble / exact.size
    val rPlain = (plain & exact).size.toDouble / exact.size
    info(f"refined recall@10 = $rRefined%.2f, plain ADC (same nProbe) = $rPlain%.2f")
    assert(rRefined >= 0.9, f"refined recall@10 $rRefined%.2f below the 0.9 floor")
    assert(rRefined >= rPlain,
      "exact re-rank must never lose recall vs ADC ranking of the same candidates")
  }

  test("every refined score is the exact cosine of its returned pair") {
    val real = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val art = AnnIndex.ivfpq(spark, sfDir, 16, 3, 8, 16, 2)
    val refined = PqIndex.ivfadcRefinedTopK(art.centroids, art.books,
      art.table, real, qids, 10, ExtQueries51.NProbe, ExtQueries51.Shortlist)
    val corpus = Similarity.quantizedWithNorm(real)
    val qSide = corpus.select(col("vec_id").as("query_id"),
      col("qv").as("qqv"), col("norm").as("qnorm"))
    val bad = refined
      .join(broadcast(qSide), "query_id")
      .join(corpus, "vec_id")
      .where(col("cos") =!= round(Similarity.cosineFromParts(
        Similarity.dotQ(col("qqv"), col("qv")), col("qnorm"), col("norm")), 4))
      .count()
    assert(bad == 0, s"$bad refined rows carry a non-exact score")
    // ranks contiguous from 1 per query
    val ranks = refined.groupBy(col("query_id"))
      .agg(min(col("rnk")).as("mn"), max(col("rnk")).as("mx"),
        count(lit(1)).as("n"), countDistinct(col("rnk")).as("nd"))
      .where(col("mn") =!= 1 || col("mx") =!= col("n") || col("n") =!= col("nd"))
      .count()
    assert(ranks == 0, "refined ranks must be contiguous from 1 per query")
  }
}
