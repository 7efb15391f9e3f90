package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.operators.{AnnIndex, IvfIndex, PqIndex, Similarity}

/** Residual-encoded IVFADC (the true FAISS IndexIVFPQ layout): the
  * stored recon2 must be the EXACT |c + r_hat|^2 of every row, the
  * O(batch) refresh must equal the full frozen-artifact re-encode, and
  * the whole point — residual codes beat raw codes at equal bytes —
  * must hold measurably on the shared corpus. */
class Ext53Spec extends AnyFunSuite with BeforeAndAfterAll {

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

  test("recon2 is the exact |c + r_hat|^2 of every table row") {
    val art = ExtQueries53.resArt(spark, sfDir)
    val cents = art.centroids.map(_.map(math.round))
    val books = art.books.map(_.map(_.map(math.round)))
    val m = books.length
    val subDim = books(0)(0).length
    val bad = art.table.collect().filter { r =>
      val cluster = r.getAs[Int]("cluster")
      val recon2 = r.getAs[Long]("recon2")
      val codes = (0 until m).map(s => r.getAs[Int](s"code_$s"))
      val recon = cents(cluster).clone()
      for (s <- 0 until m; j <- 0 until subDim)
        recon(s * subDim + j) += books(s)(codes(s))(j)
      recon.map(x => x * x).sum != recon2
    }
    assert(bad.isEmpty,
      s"${bad.length} rows carry a recon2 that is not the exact |c + r_hat|^2")
  }

  test("O(batch) refresh == full re-encode against the frozen artifacts") {
    val real = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val isIngest = col("vec_id") % 5 === 4
    val art = AnnIndex.ivfpqResFiltered(spark, sfDir, 16, 3, 8, 16, 2,
      "ext53spec", !isIngest)
    val grown = AnnIndex.refreshedIvfPqResTable(art, real.where(isIngest))
    val full = PqIndex.encodeResBatch(
      IvfIndex.assignBatch(real, art.centroids), art.centroids, art.books)
    def rows(df: org.apache.spark.sql.DataFrame): Set[Seq[Any]] =
      df.collect().map(_.toSeq.toVector: Seq[Any]).toSet
    assert(rows(grown) == rows(full),
      "refreshed table diverged from the full frozen-artifact re-encode")
  }

  test("residual codes beat raw codes at equal nProbe/bytes; refined floor 0.9") {
    val real = spark.read.parquet(s"$sfDir/embeddings.parquet")
    def hits(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select(col("query_id"), col("vec_id")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = hits(Similarity.bruteForceTopK(real, qids, 10))
    val raw = AnnIndex.ivfpq(spark, sfDir, 16, 3, 8, 16, 2)
    val res = ExtQueries53.resArt(spark, sfDir)
    val rRaw = (hits(PqIndex.ivfadcTopKFromTable(raw.centroids, raw.books,
      raw.table, real, qids, 10, 4)) & exact).size.toDouble / exact.size
    val rRes = (hits(PqIndex.ivfadcResTopKFromTable(res.centroids, res.books,
      res.table, real, qids, 10, 4)) & exact).size.toDouble / exact.size
    val rRef = (hits(PqIndex.ivfadcResRefinedTopK(res.centroids, res.books,
      res.table, real, qids, 10, ExtQueries51.NProbe,
      ExtQueries51.Shortlist)) & exact).size.toDouble / exact.size
    info(f"recall@10: raw ADC $rRaw%.2f, residual ADC $rRes%.2f, residual refined $rRef%.2f")
    assert(rRes >= rRaw,
      f"residual codes ($rRes%.2f) must not lose to raw codes ($rRaw%.2f) at equal bytes")
    assert(rRes >= 0.4, f"residual recall@10 $rRes%.2f below the 0.4 floor")
    assert(rRef >= 0.9, f"refined residual recall@10 $rRef%.2f below the 0.9 floor")
  }

  test("serve is partition-independent") {
    val real = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val art = ExtQueries53.resArt(spark, sfDir)
    def got(t: org.apache.spark.sql.DataFrame): Seq[Seq[Any]] =
      PqIndex.ivfadcResTopKFromTable(art.centroids, art.books, t, real,
          qids, 10, 4)
        .orderBy(col("query_id"), col("rnk"))
        .collect().toSeq.map(_.toSeq.toVector)
    assert(got(art.table.repartition(7)) == got(art.table),
      "residual serve result depends on the table partitioning")
  }
}
