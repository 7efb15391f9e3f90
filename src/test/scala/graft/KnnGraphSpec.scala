package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.operators.{IvfIndex, Tables}
import graft.streaming.KnnGraphMaintenance

/** Incremental kNN-graph maintenance == the full frozen-centroid batch
  * rebuild, with both edge directions live (a later batch's vector must
  * be able to enter an earlier node's top-k), idempotent replay, and
  * byte-identical kill/resume. */
class KnnGraphSpec extends AnyFunSuite with BeforeAndAfterAll {

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
  private def chunk(c: Int): DataFrame =
    embs.where(pmod(col("vec_id"), lit(3)) === c)

  private def edges(df: DataFrame): Set[(Long, Long, Double)] =
    df.select("node", "dst", "cos").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  private def rebuildEdges(m: KnnGraphMaintenance,
      cents: Array[Array[Double]]): Set[(Long, Long, Double)] =
    edges(IvfIndex.knnJoinFrom(cents, m.vectorIndex(), lit(true), 5, 4)
      .select(col("query_id").as("node"), col("vec_id").as("dst"), col("cos")))

  test("drained graph equals the frozen-centroid full rebuild, and " +
      "reverse edges are LIVE (later vectors enter earlier nodes' top-k)") {
    val root = Files.createTempDirectory("knn_graph").toString
    val m = new KnnGraphMaintenance(spark, root, nLists = 16, iters = 3,
      k = 5, nProbe = 4, compactEvery = 2)
    m.processBatch(0L, chunk(0))
    val afterBatch0 = edges(m.currentGraph())
    m.processBatch(1L, chunk(1))
    m.processBatch(2L, chunk(2))

    val cents = new graft.streaming.AnnMaintenance(spark, s"$root/vec",
      16, 3, 2).centroids()
    assert(edges(m.currentGraph()) == rebuildEdges(m, cents),
      "incremental fold must equal the batch kNN join over the full index")

    // reverse-edge liveness: some batch-0 node's final list contains a
    // vector from a later batch AND displaced one of its original edges
    val batch0Nodes = afterBatch0.map(_._1)
    val laterDst = edges(m.currentGraph())
      .filter(e => batch0Nodes(e._1) && e._2 % 3 != 0)
    assert(laterDst.nonEmpty,
      "no later-batch vector ever entered an earlier node's top-k — " +
        "the reverse path is untested by this corpus")

    // replay of a committed batch is a no-op
    val before = edges(m.currentGraph())
    m.processBatch(1L, chunk(1))
    assert(edges(m.currentGraph()) == before)
  }

  test("in-stream refit swaps the probe geometry: post-refit ingest is " +
      "O(batch) and the final graph equals the refit-centroid rebuild") {
    val root = Files.createTempDirectory("knn_graph_refit").toString
    val m = new KnnGraphMaintenance(spark, root, nLists = 16, iters = 3,
      k = 5, nProbe = 4, compactEvery = 2)
    m.processBatch(0L, chunk(0))
    // refit on the corpus-so-far (chunks 0+1): retrains centroids,
    // rebuilds the graph snapshot, swaps the probe watermark
    m.refitBatch(1L, embs.where(pmod(col("vec_id"), lit(3)) <= 1))
    // post-refit O(batch) ingest rides the NEW probe geometry
    m.processBatch(2L, chunk(2))

    val refitCents = IvfIndex.buildIndex(
      embs.where(pmod(col("vec_id"), lit(3)) <= 1), 16, 3)._1
    assert(edges(m.currentGraph()) == rebuildEdges(m, refitCents),
      "drained graph must equal the rebuild under the REFIT centroids")

    // the watermark survives a restart: a fresh instance keeps routing
    // through the new geometry only
    val m2 = new KnnGraphMaintenance(spark, root, nLists = 16, iters = 3,
      k = 5, nProbe = 4, compactEvery = 2)
    m2.processBatch(2L, chunk(2)) // replay short-circuits
    assert(edges(m2.currentGraph()) == rebuildEdges(m, refitCents))
  }

  test("deleteBatch masks both edge directions without refill; refit " +
      "refills at full k over the post-delete corpus") {
    val root = Files.createTempDirectory("knn_graph_del").toString
    val m = new KnnGraphMaintenance(spark, root, nLists = 16, iters = 3,
      k = 5, nProbe = 4, compactEvery = 2)
    m.processBatch(0L, chunk(0)); m.processBatch(1L, chunk(1))
    m.processBatch(2L, chunk(2))
    val before = edges(m.currentGraph())
    val delSet = before.flatMap(e => Seq(e._1, e._2)).filter(_ % 7 == 3)
    assert(delSet.nonEmpty)
    m.deleteBatch(3L, spark.createDataFrame(delSet.toSeq.map(Tuple1(_)))
      .toDF("vec_id"))
    val after = edges(m.currentGraph())
    // both directions masked, nothing else changed, no refill
    assert(after == before.filterNot(e => delSet(e._1) || delSet(e._2)))
    // new ingest cannot resurrect a deleted node via stale routing: the
    // post-delete batch only links among survivors
    m.processBatch(4L, spark.createDataFrame(Seq(
      (900L, Seq.fill(64)(0.01f)))).toDF("vec_id", "embedding"))
    assert(edges(m.currentGraph())
      .forall(e => !delSet(e._1) && !delSet(e._2)))
    // refit on the post-delete corpus refills survivors' lists at full k
    m.refitBatch(5L, embs)
    val refilled = edges(m.currentGraph())
    assert(refilled.forall(e => !delSet(e._1) && !delSet(e._2)),
      "a refit must not resurrect deleted vectors (mask applied to corpus)")
    val perNode = refilled.groupBy(_._1).view.mapValues(_.size)
    assert(perNode.values.max == 5, "refit must refill lists to full k")
  }

  test("kill/resume across batches lands byte-identical to the " +
      "uninterrupted run") {
    val rootA = Files.createTempDirectory("knn_graph_a").toString
    val a = new KnnGraphMaintenance(spark, rootA, 16, 3, 5, 4, compactEvery = 2)
    a.processBatch(0L, chunk(0)); a.processBatch(1L, chunk(1))
    a.processBatch(2L, chunk(2))

    val rootB = Files.createTempDirectory("knn_graph_b").toString
    val b1 = new KnnGraphMaintenance(spark, rootB, 16, 3, 5, 4, compactEvery = 2)
    b1.processBatch(0L, chunk(0)); b1.processBatch(1L, chunk(1))
    // "kill": a fresh instance (cold caches, state reloaded from markers)
    val b2 = new KnnGraphMaintenance(spark, rootB, 16, 3, 5, 4, compactEvery = 2)
    b2.processBatch(1L, chunk(1)) // replay short-circuits
    b2.processBatch(2L, chunk(2))
    assert(edges(a.currentGraph()) == edges(b2.currentGraph()))
  }

  test("refit RE-SIZES nLists (new instance over the same root): the " +
      "sqrt(N)-growth remedy for fixed-geometry reverse-volume drift") {
    val root = Files.createTempDirectory("knn_graph_resize").toString
    val m = new KnnGraphMaintenance(spark, root, nLists = 4, iters = 3,
      k = 5, nProbe = 2, compactEvery = 2)
    m.processBatch(0L, chunk(0))
    m.processBatch(1L, chunk(1))
    // the corpus outgrew the bootstrap geometry: the periodic refit
    // re-sizes the list count through a NEW instance over the same root
    // (single-writer handover); its refit retrains at 9 lists, rebuilds
    // the snapshot, and swaps the routing watermark — post-refit ingest
    // rides the new geometry
    val m2 = new KnnGraphMaintenance(spark, root, nLists = 9, iters = 3,
      k = 5, nProbe = 2, compactEvery = 2)
    m2.refitBatch(2L, embs.where(pmod(col("vec_id"), lit(3)) <= 1))
    m2.processBatch(3L, chunk(2))

    val cents9 = IvfIndex.buildIndex(
      embs.where(pmod(col("vec_id"), lit(3)) <= 1), 9, 3)._1
    val expect = edges(IvfIndex.knnJoinFrom(cents9, m2.vectorIndex(),
        lit(true), 5, 2)
      .select(col("query_id").as("node"), col("vec_id").as("dst"), col("cos")))
    assert(edges(m2.currentGraph()) == expect,
      "drained graph must equal the rebuild under the RESIZED refit centroids")

    // an instance still constructed at the superseded geometry fails
    // FAST (param/codebook disagreement) instead of assigning against
    // the wrong codebook
    val stale = new KnnGraphMaintenance(spark, root, nLists = 4, iters = 3,
      k = 5, nProbe = 2, compactEvery = 2)
    val e = intercept[IllegalArgumentException] {
      stale.processBatch(4L, chunk(0).limit(1))
    }
    assert(e.getMessage.contains("constructor params disagree"))
  }
}
