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

  test("IVFADC == full ADC ranking restricted to the probed lists") {
    import graft.operators.IvfIndex
    val qids = Seq(0L, 1L, 2L)
    val nProbe = 2
    val (centroids, assigned) = IvfIndex.buildIndex(embs, 8, 2)
    val (books, codes) = PqIndex.buildPq(embs, 8, 16, 2)
    val got = PqIndex
      .ivfadcTopKFrom(centroids, assigned, books, codes, embs, qids, 5, nProbe)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
      .groupBy(_._1)
    // the single-table layout serves the identical ranking (the compose
    // above IS a stitch + FromTable; this pins the table path explicitly)
    val gotTable = PqIndex
      .ivfadcTopKFromTable(centroids, books,
        PqIndex.ivfpqTable(assigned, codes), embs, qids, 5, nProbe)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
      .toSeq.sorted
    assert(got.values.flatten.toSeq.sorted == gotTable,
      "single-table IVFADC diverged from the compose")

    // reference: the full ADC ranking (k = corpus) filtered to candidates
    // in the query's probed clusters, re-ranked by (score desc, vec_id)
    val fullAdc = PqIndex.adcTopKFrom(books, codes, embs, qids, 100000)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getDouble(3)))
    val clusterOf = assigned.select(col("vec_id"), col("cluster")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val qvOf = assigned.where(col("vec_id").isin(qids: _*))
      .select(col("vec_id"), col("qv")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toArray).toMap
    // probe clusters exactly as the operator computes them: nProbe
    // smallest |c|^2 - 2<v,c> (exact integers), ties to the lower id
    def probeClusters(q: Long): Set[Int] =
      centroids.zipWithIndex.map { case (c, i) =>
        val cq = c.map(math.round)
        (cq.map(x => x * x).sum - 2L * cq.zip(qvOf(q)).map { case (a, b) => a * b }.sum, i)
      }.sortBy(identity).take(nProbe).map(_._2).toSet

    qids.foreach { q =>
      val probed = probeClusters(q)
      val expect = fullAdc
        .filter(t => t._1 == q && t._2 != q && probed.contains(clusterOf(t._2)))
        .sortBy(t => (-t._3, t._2)).take(5).toSeq
        .zipWithIndex.map { case ((_, v, sc), i) => (q, i + 1, v, sc) }
      val gotQ = got(q).sortBy(_._2).toSeq
      assert(gotQ == expect, s"query $q:\n got=$gotQ\n exp=$expect")
    }
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
