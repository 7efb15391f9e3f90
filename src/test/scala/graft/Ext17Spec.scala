package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Cross-checks for the round-6 seventh wave (retrieval evals). */
class Ext17Spec extends AnyFunSuite with BeforeAndAfterAll {

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

  test("ann_dim_ablation: n_full = 10 and recall is the kept ratio") {
    val rows = SparkEntry.queries("ann_dim_ablation")(spark, sfDir).collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      assert(r.getLong(1) == 10L)
      val kept = r.getLong(2)
      assert(kept >= 0L && kept <= 10L)
      assert(math.abs(r.getDouble(3) - kept.toDouble / 10.0) < 1e-9)
    }
  }

  test("dedup_simhash_eval: counts and ratios are mutually consistent") {
    val r = SparkEntry.queries("dedup_simhash_eval")(spark, sfDir).collect().head
    val (nT, nP, nB) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(nB <= math.min(nT, nP))
    assert(math.abs(r.getDouble(3) - nB.toDouble / nP) < 1e-4 + 1e-9)
    assert(math.abs(r.getDouble(4) - nB.toDouble / nT) < 1e-4 + 1e-9)
    // cross-check n_truth against the standalone jaccard operator
    val truth = graft.operators.Dedup.jaccardPairs(
      graft.operators.Dedup.ngramShingles(
        graft.operators.Tables.table(spark, sfDir, "documents"), 3), 0.5).count()
    assert(nT == truth)
  }

  test("schema_evolution: both generations flow through one mergeSchema scan") {
    val rows = SparkEntry.queries("schema_evolution")(spark, sfDir).collect()
    assert(rows.length == 10)
    val total = graft.operators.Tables.table(spark, sfDir, "lineitem").count()
    assert(rows.map(_.getLong(1)).sum == total)
    rows.foreach { r =>
      val bucket = r.getLong(0); val n = r.getLong(1); val nd = r.getLong(3)
      // odd orderkeys (gen2) carry the discount column; even (gen1) do not
      if (bucket % 2 == 1) assert(nd == n, s"gen2 bucket $bucket missing discounts")
      else assert(nd == 0L, s"gen1 bucket $bucket has phantom discounts")
    }
  }

  test("mix_resample: weight-1 sources keep everything, counts shrink monotonically, totals consistent") {
    val rows = SparkEntry.queries("mix_resample")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nb, na, tb, ta, w) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))
      assert(na <= nb && ta <= tb)
      assert(w > 0.0 && w <= 1.0)
      if (w == 1.0) assert(na == nb && ta == tb, s"weight-1 source ${r.getString(0)} lost docs")
    }
    // docs-before totals must partition the corpus
    val total = graft.operators.Tables.table(spark, sfDir, "documents").count()
    assert(rows.map(_.getLong(1)).sum == total)
  }

  test("dedup_minhash_eval: precision exactly 1 (verified candidates), banding recall < 1") {
    val r = SparkEntry.queries("dedup_minhash_eval")(spark, sfDir).collect().head
    val (nT, nP, nB) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(nB == nP, "every predicted pair must be true (exact verification)")
    assert(r.getDouble(3) == 1.0)
    assert(nB <= nT)
    assert(math.abs(r.getDouble(4) - nB.toDouble / nT) < 1e-4 + 1e-9)
    // truth must match the uncapped inverted-index word-jaccard operator
    val truth = graft.operators.Dedup.jaccardPairs(
      graft.operators.Dedup.ngramShingles(
        graft.operators.Tables.table(spark, sfDir, "documents")
          .where(col("doc_id") < 500), 1), 0.9).count()
    assert(nT == truth)
  }

  test("stream_ann_topk equals the batch multi-probe LSH ranking") {
    val streamed = SparkEntry.queries("stream_ann_topk")(spark, sfDir).collect()
    val batch = graft.operators.Similarity
      .lshTopK(graft.operators.Tables.table(spark, sfDir, "embeddings"),
        ExtQueries.AnnQueries, 10, dims = 64, nPlanes = 4)
      .orderBy(col("query_id"), col("rnk"))
      .collect()
    assert(streamed.map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSeq ==
      batch.map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSeq)
  }
}
