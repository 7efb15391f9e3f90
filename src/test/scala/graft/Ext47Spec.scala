package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.operators.{PqIndex, Similarity, Tables}

/** PQ semantics: code-table well-formedness, ADC ranking invariants,
  * partition-independence (the determinism the oracle relies on), and a
  * measured recall floor against the exact scan. */
class Ext47Spec extends AnyFunSuite with BeforeAndAfterAll {

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

  test("code table: one row per vector, codes within [0, ksub), recon2 positive") {
    val ct = PqIndex.codeTable(embs, m = 8, ksub = 16, iters = 2)
    val n = embs.count()
    assert(ct.count() == n)
    val bad = ct.where(
      (0 until 8).map(s => col(s"code_$s") < 0 || col(s"code_$s") >= 16)
        .reduce(_ || _) || col("recon2") <= 0)
    assert(bad.count() == 0, "codes out of range or non-positive recon2")
  }

  test("ADC top-k: 10 contiguous ranks per query, |score| <= 1, partition-independent") {
    val qids = Seq(0L, 1L, 2L, 3L, 4L)
    val a = PqIndex.adcTopK(embs, qids, 10).orderBy(col("query_id"), col("rnk"))
      .collect().toSeq
    val byQ = a.groupBy(_.getLong(0))
    assert(byQ.keySet == qids.toSet)
    byQ.values.foreach { rows =>
      assert(rows.map(_.getInt(1)).sorted == (1 to 10))
      rows.foreach(r => assert(math.abs(r.getDouble(3)) <= 1.0001,
        s"ADC cosine out of range: $r"))
    }
    // Cauchy-Schwarz: dot(q, recon(x)) <= |q| |recon(x)| exactly
    val b = PqIndex.adcTopK(embs.repartition(7), qids, 10)
      .orderBy(col("query_id"), col("rnk")).collect().toSeq
    assert(a == b, "ADC ranking must be partition-independent")
  }

  test("recall@10 vs exact scan is measurably better than random") {
    val qids = Seq(0L, 1L, 2L, 3L, 4L)
    val pq = PqIndex.adcTopK(embs, qids, 10)
      .select(col("query_id"), col("vec_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = Similarity.bruteForceTopK(embs, qids, 10)
      .select(col("query_id"), col("vec_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (pq & exact).size.toDouble / exact.size
    // 500-vector corpus, top-10: random would land ~0.02; the codes must
    // carry real signal even at 8 bytes/vector
    assert(recall >= 0.2, f"PQ recall@10 $recall%.2f below floor")
    info(f"PQ recall@10 = $recall%.2f")
  }
}
