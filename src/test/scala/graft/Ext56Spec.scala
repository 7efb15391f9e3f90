package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.operators.{Retrieval, Similarity, Tables}

/** Retrieval composition: maxsim's reduction identities and RRF's
  * rank-only fusion semantics. */
class Ext56Spec extends AnyFunSuite with BeforeAndAfterAll {

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

  private def embs = Tables.table(spark, sfDir, "embeddings")

  test("maxsim with one 64-wide token IS the exact dot product") {
    val corpus = embs.limit(40)
      .select(col("vec_id"), Similarity.quantize(col("embedding")).as("qv"))
    val q = corpus.where(col("vec_id") === 0L)
      .select(col("qv").as("qqv"))
    val rows = corpus.crossJoin(q)
      .select(col("vec_id"),
        Retrieval.maxSimScore(col("qqv"), col("qv"), nTok = 1, dim = 64).as("ms"),
        Similarity.dotQ(col("qqv"), col("qv")).as("dot"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getLong(1) == r.getLong(2),
      s"vec ${r.getLong(0)}: maxsim(1 token) ${r.getLong(1)} != dot ${r.getLong(2)}"))
  }

  test("maxsim dominates the aligned-token sum (max_j >= j=i term), so " +
      "maxsim >= exact dot on every pair") {
    val corpus = embs.limit(40)
      .select(col("vec_id"), Similarity.quantize(col("embedding")).as("qv"))
    val q = corpus.where(col("vec_id") === 1L).select(col("qv").as("qqv"))
    val bad = corpus.crossJoin(q)
      .select(col("vec_id"),
        Retrieval.maxSimScore(col("qqv"), col("qv"), nTok = 8, dim = 8).as("ms"),
        Similarity.dotQ(col("qqv"), col("qv")).as("dot"))
      .where(col("ms") < col("dot"))
      .count()
    assert(bad == 0L, "maxsim must upper-bound the aligned dot")
  }

  test("RRF is rank-only: a doc present in both legs beats a doc holding " +
      "the same rank in a single leg; absence contributes nothing") {
    // doc 10 ranks 2nd in both legs; docs 20/30 rank 1st in one leg only
    val sparse = spark.createDataFrame(Seq((20L, 1), (10L, 2), (40L, 3)))
      .toDF("doc_id", "rnk")
    val dense = spark.createDataFrame(Seq((30L, 1), (10L, 2), (50L, 3)))
      .toDF("doc_id", "rnk")
    val fused = Retrieval.rrfFuse(sparse, dense, k = 60, topN = 10)
      .orderBy(col("rrf").desc, col("doc_id"))
      .collect()
    assert(fused.head.getLong(0) == 10L,
      "the doubly-ranked doc must fuse to the top despite never ranking 1st")
    val rrfOf = fused.map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(rrfOf(20L) == rrfOf(30L),
      "single-leg docs at the same rank tie regardless of which leg")
    // absent-leg markers are 0, present ranks preserved
    val row10 = fused.find(_.getLong(0) == 10L).get
    assert(row10.getLong(2) == 2L && row10.getLong(3) == 2L)
    val row20 = fused.find(_.getLong(0) == 20L).get
    assert(row20.getLong(2) == 1L && row20.getLong(3) == 0L)
  }

  test("maxsim serve plan: corpus scans once against a broadcast query " +
      "side; the scorer stays in one projection (no explode)") {
    val plan = Retrieval.maxSimTopK(embs, Seq(0L, 1L), 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastHashJoin"),
      s"query side must broadcast:\n$plan")
    assert(!plan.contains("Generate"),
      "the token cross-product must not explode rows")
  }
}
