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
}
