package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.operators.{IvfIndex, SqIndex}

/** IVF-SQ compose semantics: the single-table serve equals the full SQ
  * ranking restricted to the probed lists, and the O(batch) refresh
  * equals the full stitch over frozen models. */
class Ext50Spec extends AnyFunSuite with BeforeAndAfterAll {

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

  private def embs = spark.read.parquet(s"$sfDir/embeddings.parquet")

  test("IVF-SQ == full SQ ranking restricted to the probed lists") {
    val qids = Seq(0L, 1L, 2L)
    val nProbe = 2
    val (centroids, assigned) = IvfIndex.buildIndex(embs, 8, 2)
    val (stats, codes) = SqIndex.buildSq(embs)
    val got = SqIndex.ivfsqTopKFromTable(centroids, stats,
        SqIndex.ivfsqTable(assigned, codes), embs, qids, 5, nProbe)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
      .groupBy(_._1)

    // reference: the full SQ ranking (k = corpus) filtered to candidates
    // in the query's probed clusters, re-ranked by (score desc, vec_id)
    val fullSq = SqIndex.sqTopKFrom(stats, codes, embs, qids, 100000)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getDouble(3)))
    val clusterOf = assigned.select(col("vec_id"), col("cluster")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val qvOf = assigned.where(col("vec_id").isin(qids: _*))
      .select(col("vec_id"), col("qv")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toArray).toMap
    def probeClusters(q: Long): Set[Int] =
      centroids.zipWithIndex.map { case (c, i) =>
        val cq = c.map(math.round)
        (cq.map(x => x * x).sum - 2L * cq.zip(qvOf(q)).map { case (a, b) => a * b }.sum, i)
      }.sortBy(identity).take(nProbe).map(_._2).toSet

    qids.foreach { q =>
      val probed = probeClusters(q)
      val expect = fullSq
        .filter(t => t._1 == q && t._2 != q && probed.contains(clusterOf(t._2)))
        .sortBy(t => (-t._3, t._2)).take(5).toSeq
        .zipWithIndex.map { case ((_, v, sc), i) => (q, i + 1, v, sc) }
      val gotQ = got(q).sortBy(_._2).toSeq
      assert(gotQ == expect, s"query $q:\n got=$gotQ\n exp=$expect")
    }
  }

  test("O(batch) IVF-SQ refresh == the full stitch over frozen models") {
    import graft.operators.AnnIndex
    AnnIndex.invalidateAll()
    val isIngest = col("vec_id") % 5 === 4
    val art = AnnIndex.ivfsqFiltered(spark, sfDir, 8, 2, "notmod5", !isIngest)
    val grown = AnnIndex.refreshedIvfSqTable(art, embs.where(isIngest))
    val full = SqIndex.ivfsqTable(
      IvfIndex.assignBatch(embs, art.centroids),
      SqIndex.encodeBatch(embs, art.stats))
    def rows(df: DataFrame): Set[Seq[Any]] =
      df.select(col("vec_id"), col("cluster").cast("int"),
          col("codes"), col("recon2"))
        .collect().map(_.toSeq.toVector: Seq[Any]).toSet
    assert(rows(grown) == rows(full),
      "O(batch) IVF-SQ refresh diverged from the full stitch")
  }

  test("IVF-cell dedup: hot-cell cap bounds candidate work; non-binding cap == uncapped") {
    import graft.operators.Dedup
    // SKEWED synthetic corpus: 1600 of 2000 vectors in one tight blob —
    // k-means puts the blob in few cells, exactly the regime where the
    // uncapped within-cell self-join goes quadratic (r15 verdict #3)
    val rows = (0L until 2000L).map { i =>
      val base = Array.fill(8)(0.01f)
      if (i < 1600) base(0) = 1.0f + (i % 7).toInt * 1e-4f
      else base((i % 4 + 4).toInt) = 1.0f + (i % 11).toInt * 1e-3f
      (i, base.toSeq)
    }
    val skewed = spark.createDataFrame(rows).toDF("vec_id", "embedding")
    val (_, indexed) = IvfIndex.buildIndex(skewed, 4, 2)
    val idx = indexed.persist()
    try {
      // the uncapped candidate count the hot cells would generate
      val uncappedPairs = idx.groupBy(col("cluster")).agg(count(lit(1)).as("n"))
        .select(sum((col("n") * (col("n") - 1) / 2).cast("long")))
        .collect()(0).getLong(0)
      val cap = 100
      // threshold -1 keeps every candidate pair: this measures BLOCKING
      // work, not similarity
      val cappedPairs = Dedup.embeddingNearDupsIvfCells(idx, -1.0, cap).count()
      info(s"skewed corpus: uncapped candidates = $uncappedPairs, " +
        s"capped (cellCap=$cap) = $cappedPairs")
      // linear bound: ~N*cap total work; the hash split is balanced, so
      // 2x slack is generous. The uncapped join is ~13x bigger here.
      assert(cappedPairs <= 2L * 2000L * cap,
        s"capped candidate count $cappedPairs exceeds the linear bound")
      assert(cappedPairs * 5 < uncappedPairs,
        "the cap must collapse the hot-cell quadratic blowup")
      // per-block bound: no (cluster, sub) block pairs more than ~2*cap
      // rows' worth (hash balance)
      val maxBlock = Dedup.embeddingNearDupsIvfCells(idx, -1.0, cap)
        .groupBy(col("vec_a")).agg(count(lit(1)).as("deg"))
        .agg(max(col("deg"))).collect()(0).getLong(0)
      assert(maxBlock <= 2L * cap,
        s"a vector pairs with $maxBlock others — block split not bounding")
      // cap >= max cell size -> nsub = 1 everywhere -> identical to the
      // uncapped within-cell join
      val unc = idx.as("a").join(idx.as("b"),
          col("a.cluster") === col("b.cluster") && col("a.vec_id") < col("b.vec_id"))
        .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val nonBinding = Dedup.embeddingNearDupsIvfCells(idx, -1.0, 1 << 20)
        .select(col("vec_a"), col("vec_b"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(nonBinding == unc, "a non-binding cap must be a no-op")
    } finally { idx.unpersist(); () }
  }
}
