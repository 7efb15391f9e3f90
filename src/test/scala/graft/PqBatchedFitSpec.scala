package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.operators.{IvfIndex, PqIndex, Similarity, Tables}

/** r16 optimization guard: the batched one-Lloyd-loop PQ codebook fit
  * (all M subspaces per job) must produce BYTE-IDENTICAL books to the
  * sequential per-subspace [[IvfIndex.fitCentroids]] composition it
  * replaced — same sample, same seeds, same rounded-grid argmin, same
  * exact integer sums and truncating means. Any drift here would silently
  * break every PQ oracle replay. */
class PqBatchedFitSpec extends AnyFunSuite with BeforeAndAfterAll {

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

  test("batched fitCodebooks == sequential per-subspace fitCentroids") {
    val dir = "/root/testdata/sf0.001"
    val corpus = Similarity
      .quantizedWithNorm(Tables.table(spark, dir, "embeddings"))
      .select(col("vec_id"), col("qv"))
      .persist()
    try {
      val m = 8
      val dims = corpus.select(size(col("qv"))).limit(1).collect()(0).getInt(0)
      assert(dims % m == 0)
      val subDim = dims / m
      for (iters <- Seq(1, 2)) {
        val batched = PqIndex.fitCodebooks(corpus, m, subDim, ksub = 16, iters)
        val sequential = (0 until m).map { s =>
          IvfIndex.fitCentroids(
            corpus.select(col("vec_id"),
              slice(col("qv"), s * subDim + 1, subDim).as("qv")),
            16, iters)
        }.toArray
        assert(batched.length == sequential.length)
        for (s <- 0 until m) {
          assert(batched(s).length == sequential(s).length, s"subspace $s size")
          for (c <- batched(s).indices)
            assert(batched(s)(c).toSeq == sequential(s)(c).toSeq,
              s"subspace $s code $c (iters=$iters)")
        }
      }
    } finally { corpus.unpersist(); () }
  }
}
