package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.operators.{AnnIndex, IvfIndex, PqIndex}

/** Contract tests for the PQ/IVFADC lifecycle symmetry (round 15):
  * frozen-codebook ingest refresh byte-equal to re-encoding the grown
  * corpus, filter-hash keying for the base-snapshot PQ memo, PQ
  * refit-and-swap release semantics, and the O(batch) IVFADC table
  * refresh equal to the full stitch. */
class Ext48Spec extends AnyFunSuite with BeforeAndAfterAll {

  @transient private var spark: SparkSession = _
  private var dir: String = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    dir = Files.createTempDirectory("pq_life").toString
    writeEmbs()
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  /** 48 deterministic 8-dim vectors in 4 well-separated blobs. */
  private def writeEmbs(): Unit = {
    val rows = (0L until 48L).map { i =>
      val blob = (i % 4).toInt
      val base = Array.fill(8)(0.05f)
      base(blob) = (1.0 + 0.001 * i).toFloat
      base(blob + 4) = (0.5 + 0.002 * i).toFloat
      (i, base.toSeq)
    }
    spark.createDataFrame(rows).toDF("vec_id", "embedding")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
  }

  private def embs: DataFrame =
    spark.read.parquet(s"$dir/embeddings.parquet")

  private val isIngest = col("vec_id") % 5 === 4

  private def codeRows(df: DataFrame): Set[Seq[Any]] =
    PqIndex.codeTableFrom(df, 2).collect().map(_.toSeq.toVector: Seq[Any]).toSet

  test("frozen-codebook refresh == re-encoding the grown corpus") {
    AnnIndex.invalidateAll()
    val art = AnnIndex.pqFiltered(spark, dir, m = 2, ksub = 4, iters = 2,
      "notmod5", !isIngest, dims = 8)
    val grown = AnnIndex.refreshedCodes(art, embs.where(isIngest))
    val full = PqIndex.encodeBatch(embs, art.books)
    assert(codeRows(grown) == codeRows(full),
      "O(batch) refresh diverged from the full re-encode")
    // and the refresh actually covers the ingest shard
    assert(grown.where(isIngest).count() == embs.where(isIngest).count())
  }

  test("one tag, two filters: PQ entries key apart (filter hash in the key)") {
    AnnIndex.invalidateAll()
    val b0 = AnnIndex.pqBuildCount.get()
    val a = AnnIndex.pqFiltered(spark, dir, 2, 4, 2, "t", col("vec_id") % 2 === 0, dims = 8)
    val b = AnnIndex.pqFiltered(spark, dir, 2, 4, 2, "t", col("vec_id") % 3 === 0, dims = 8)
    assert(!(a eq b), "different filters under one tag must not share an entry")
    assert(AnnIndex.pqBuildCount.get() == b0 + 2)
  }

  test("PQ refit-and-swap: refit == full-corpus fit; aged entry dropped and released") {
    AnnIndex.invalidateAll()
    val aged = AnnIndex.pqFiltered(spark, dir, 2, 4, 2, "aged", !isIngest, dims = 8)
    // snapshot BEFORE the swap: the release below unpins the aged codes'
    // checkpoint blocks, making the frame unreadable afterwards (that IS
    // the leak fix under test)
    val agedRows = codeRows(aged.codes)
    // the standard full-corpus artifact may already be warm — refit must
    // still swap the aged entry out
    val fullBefore = AnnIndex.pq(spark, dir, 2, 4, 2, dims = 8)
    val b0 = AnnIndex.pqBuildCount.get()
    val refit = AnnIndex.refitPqTo(spark, dir, 2, 4, 2, "aged", !isIngest, dims = 8)
    assert(refit eq fullBefore, "refit must share the standard full-corpus memo")
    assert(AnnIndex.pqBuildCount.get() == b0, "refit must not rebuild a warm full index")
    // the aged key is gone: the next lookup under it REBUILDS
    val b1 = AnnIndex.pqBuildCount.get()
    val rebuilt = AnnIndex.pqFiltered(spark, dir, 2, 4, 2, "aged", !isIngest, dims = 8)
    assert(AnnIndex.pqBuildCount.get() == b1 + 1, "aged entry must be dropped by the swap")
    assert(!(rebuilt eq aged))
    assert(codeRows(rebuilt.codes) == agedRows,
      "rebuild over the unchanged corpus must reproduce the aged codes")
  }

  test("O(batch) IVFADC table refresh == the full stitch over frozen artifacts") {
    AnnIndex.invalidateAll()
    val art = AnnIndex.ivfpqFiltered(spark, dir, nLists = 4, iters = 2,
      m = 2, ksub = 4, pqIters = 2, "notmod5", !isIngest, dims = 8)
    val grown = AnnIndex.refreshedIvfPqTable(art, embs.where(isIngest))
    val fullStitch = PqIndex.ivfpqTable(
      IvfIndex.assignBatch(embs, art.centroids),
      PqIndex.encodeBatch(embs, art.books))
    def rows(df: DataFrame): Set[Seq[Any]] =
      df.select(col("vec_id"), col("cluster").cast("int"),
          col("recon2"), col("code_0"), col("code_1"))
        .collect().map(_.toSeq.toVector: Seq[Any]).toSet
    assert(rows(grown) == rows(fullStitch),
      "O(batch) IVFADC refresh diverged from the full stitch")
  }
}
