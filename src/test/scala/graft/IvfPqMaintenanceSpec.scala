package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.operators.{IvfIndex, PqIndex}
import graft.streaming.IvfPqMaintenance

/** Crash-safety contract of the streaming IVFADC maintenance: drained
  * table == frozen-models batch rebuild (both fits on batch 0);
  * kill/resume byte-identical through the one-rename two-model publish
  * window; compaction + marker rollup over the shared ShardLog. */
class IvfPqMaintenanceSpec extends AnyFunSuite with BeforeAndAfterAll {

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

  private val M = 2

  /** 30 deterministic 8-dim vectors; batch b = vec_id % 3 == b. */
  private def embsAll: DataFrame = {
    val rows = (0L until 30L).map { i =>
      val blob = (i % 4).toInt
      val base = Array.fill(8)(0.05f)
      base(blob) = (1.0 + 0.002 * i).toFloat
      base(blob + 4) = (0.5 + 0.003 * i).toFloat
      (i, base.toSeq)
    }
    spark.createDataFrame(rows).toDF("vec_id", "embedding")
  }

  private def batch(b: Int): DataFrame = embsAll.where(col("vec_id") % 3 === b)

  private def rows(df: DataFrame): Set[Seq[Any]] =
    df.select(col("vec_id"), col("cluster").cast("int"), col("recon2"),
        col("code_0"), col("code_1"))
      .collect().map(_.toSeq.toVector: Seq[Any]).toSet

  private def mk(root: String, every: Int = 64) =
    new IvfPqMaintenance(spark, root, nLists = 4, iters = 2, m = M,
      ksub = 4, pqIters = 2, compactEvery = every, dims = 8)

  /** The frozen-models batch rebuild: both fits on batch 0, everything
    * assigned + encoded against them. */
  private def rebuild(): DataFrame = {
    val (cents, _) = IvfIndex.buildIndex(batch(0), 4, 2)
    val (books, _) = PqIndex.buildPq(batch(0), M, 4, 2, dims = 8)
    PqIndex.ivfpqTable(
      IvfIndex.assignBatch(embsAll, cents), PqIndex.encodeBatch(embsAll, books))
  }

  test("drained table == frozen-models rebuild; serve matches the static table path") {
    val root = Files.createTempDirectory("ivfpq_maint").toString
    val m = mk(root)
    (0 to 2).foreach(b => m.processBatch(b.toLong, batch(b)))
    assert(m.committedIds.sorted == Seq(0L, 1L, 2L))
    val expect = rebuild()
    assert(rows(m.currentTable()) == rows(expect))
    // serving from the maintained table == serving from the rebuild
    val (cents, books) = m.models()
    val got = m.topK(embsAll, Seq(0L, 1L), 3, 2)
      .collect().map(_.toSeq.toVector).toSet
    val exp = PqIndex.ivfadcTopKFromTable(cents, books, expect, embsAll,
      Seq(0L, 1L), 3, 2).collect().map(_.toSeq.toVector).toSet
    assert(got == exp, "maintained-table serve diverged from the rebuild serve")
    // the two-stage refined serve likewise (r16): same standing state,
    // exact re-rank of the ADC shortlist
    val gotR = m.topKRefined(embsAll, Seq(0L, 1L), 3, 2, shortlist = 6)
      .collect().map(_.toSeq.toVector).toSet
    val expR = PqIndex.ivfadcRefinedTopK(cents, books, expect, embsAll,
      Seq(0L, 1L), 3, 2, 6).collect().map(_.toSeq.toVector).toSet
    assert(gotR == expR, "maintained-table refined serve diverged")
  }

  test("kill/resume: pre-marker and pre-publish crash windows replay identically") {
    val rootA = Files.createTempDirectory("ivfpq_a").toString
    val a = mk(rootA)
    (0 to 2).foreach(b => a.processBatch(b.toLong, batch(b)))
    val expect = rows(a.currentTable())

    // window 1: killed after batch 1's shard write but BEFORE its marker
    val rootB = Files.createTempDirectory("ivfpq_b").toString
    val b1 = mk(rootB)
    b1.processBatch(0L, batch(0))
    b1.processBatch(1L, batch(1))
    val fs = new org.apache.hadoop.fs.Path(rootB)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(s"$rootB/meta/1"), false)
    val b2 = mk(rootB) // the restarted job reads the FS, not dead memory
    assert(b2.committedIds.sorted == Seq(0L))
    b2.processBatch(1L, batch(1))
    b2.processBatch(2L, batch(2))
    assert(rows(b2.currentTable()) == expect, "pre-marker crash replay diverged")

    // window 2: killed after the one-rename models publish but before
    // batch 0's shard write — replay must take the frozen-models path and
    // still equal the bootstrap's own stitch
    val rootC = Files.createTempDirectory("ivfpq_c").toString
    val c1 = mk(rootC)
    c1.processBatch(0L, batch(0))
    val fsC = new org.apache.hadoop.fs.Path(rootC)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fsC.delete(new org.apache.hadoop.fs.Path(s"$rootC/meta/0"), false)
    fsC.delete(new org.apache.hadoop.fs.Path(s"$rootC/codes/0"), true)
    assert(fsC.exists(new org.apache.hadoop.fs.Path(s"$rootC/models/centroids")) &&
      fsC.exists(new org.apache.hadoop.fs.Path(s"$rootC/models/books")),
      "the one-rename publish must expose both models atomically")
    val c2 = mk(rootC)
    c2.processBatch(0L, batch(0)) // models already published
    c2.processBatch(1L, batch(1))
    c2.processBatch(2L, batch(2))
    assert(rows(c2.currentTable()) == expect, "post-publish crash replay diverged")

    // replay of a COMMITTED batch is a no-op
    val before = rows(c2.currentTable())
    c2.processBatch(1L, batch(1))
    assert(rows(c2.currentTable()) == before)
  }

  test("in-stream refit: retrain + generation swap; kill/resume byte-identical") {
    val extra = spark.createDataFrame(Seq((100L, Seq.fill(8)(0.05f))))
      .toDF("vec_id", "embedding")
    val grown = embsAll.unionByName(extra)
    // the semantic contract: after a refit at batch 2 (corpus-so-far =
    // all 30 vectors) and one more O(batch) batch, the table equals the
    // gen-1 rebuild — fit on embsAll, encode the grown corpus
    val (cents, _) = IvfIndex.buildIndex(embsAll, 4, 2)
    val (books, _) = PqIndex.buildPq(embsAll, M, 4, 2, dims = 8)
    val expect = rows(PqIndex.ivfpqTable(
      IvfIndex.assignBatch(grown, cents), PqIndex.encodeBatch(grown, books)))

    // control: uninterrupted run with a live compaction before the refit
    val rootA = Files.createTempDirectory("ivfpq_refit_a").toString
    val a = mk(rootA, every = 2)
    a.processBatch(0L, batch(0))
    a.processBatch(1L, batch(1)) // compaction at 1 carries gen 0 forward
    a.refitBatch(2L, embsAll)
    a.processBatch(3L, extra)    // O(batch) against the gen-1 models
    assert(a.generation == 1, "refit must advance the committed generation")
    assert(a.models()._1.map(_.toSeq).toSeq == cents.map(_.toSeq).toSeq,
      "served models must be the gen-1 fit")
    assert(rows(a.currentTable()) == expect, "refit drain diverged from the gen-1 rebuild")

    // crash window: models_g1 published AND snapshot written, but the
    // snapshot marker never committed (deleted post-hoc). The restart
    // must keep serving generation 0 (models g0 paired with g0 codes);
    // the replay refits deterministically, skips the already-published
    // models dir, and lands byte-identical to the control.
    val rootB = Files.createTempDirectory("ivfpq_refit_b").toString
    val fsB = new org.apache.hadoop.fs.Path(rootB)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val b1 = mk(rootB, every = 2)
    b1.processBatch(0L, batch(0))
    b1.processBatch(1L, batch(1))
    b1.refitBatch(2L, embsAll)
    fsB.delete(new org.apache.hadoop.fs.Path(s"$rootB/basemeta/2"), false)
    val b2 = mk(rootB, every = 2)
    assert(b2.generation == 0,
      "an uncommitted refit must not advance the generation")
    assert(fsB.exists(new org.apache.hadoop.fs.Path(s"$rootB/models_g1")),
      "the crashed attempt's models publish is on disk (write-once)")
    val chunk01 = embsAll.where(col("vec_id") % 3 =!= 2)
    val (c0, _) = IvfIndex.buildIndex(batch(0), 4, 2)
    val (bk0, _) = PqIndex.buildPq(batch(0), M, 4, 2, dims = 8)
    assert(rows(b2.currentTable()) == rows(PqIndex.ivfpqTable(
      IvfIndex.assignBatch(chunk01, c0), PqIndex.encodeBatch(chunk01, bk0))),
      "pre-replay serving must pair gen-0 models with gen-0 codes")
    b2.refitBatch(2L, embsAll) // the foreachBatch replay
    b2.processBatch(3L, extra)
    assert(b2.generation == 1)
    assert(rows(b2.currentTable()) == expect,
      "refit kill/resume diverged from the uninterrupted run")
  }

  test("compaction: snapshot + marker rollup over the shared shard log") {
    val root = Files.createTempDirectory("ivfpq_cp").toString
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val ref = mk(Files.createTempDirectory("ivfpq_ref").toString)
    (0 to 2).foreach(b => ref.processBatch(b.toLong, batch(b)))
    val expect = rows(ref.currentTable())

    val m = mk(root, every = 2)
    (0 to 2).foreach(b => m.processBatch(b.toLong, batch(b)))
    assert(rows(m.currentTable()) == expect, "compacted read diverged")
    // DEFERRED sweep (r15 verdict #1, serve-while-compact): covered
    // shards survive their own compaction by one cycle; markers roll up
    // immediately (plans never read them)
    assert(fs.exists(new org.apache.hadoop.fs.Path(s"$root/codes/0")),
      "covered shards must survive their own compaction by one cycle")
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$root/meta/0")) &&
      !fs.exists(new org.apache.hadoop.fs.Path(s"$root/meta/1")),
      "covered markers must roll up into the snapshot marker")
    val m2 = mk(root, every = 2)
    assert(m2.coveredUpTo.contains(1L) && m2.committedCount == 3 &&
      m2.isCommitted(0L) && m2.isCommitted(2L))
    assert(rows(m2.currentTable()) == expect)
    // the NEXT compaction sweeps what the previous snapshot covered
    val extra = spark.createDataFrame(Seq((100L, Seq.fill(8)(0.05f))))
      .toDF("vec_id", "embedding")
    m2.processBatch(3L, extra) // count=4 -> compaction at 3, prev=1
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$root/codes/0")) &&
      !fs.exists(new org.apache.hadoop.fs.Path(s"$root/codes/1")),
      "shards covered by the PREVIOUS snapshot sweep at the next compaction")
    assert(fs.exists(new org.apache.hadoop.fs.Path(s"$root/base/1")) &&
      fs.exists(new org.apache.hadoop.fs.Path(s"$root/base/3")),
      "the previous snapshot itself survives one more cycle")
    val (cents, books) = m2.models()
    val grown = embsAll.unionByName(extra)
    assert(rows(m2.currentTable()) == rows(PqIndex.ivfpqTable(
      IvfIndex.assignBatch(grown, cents), PqIndex.encodeBatch(grown, books))))
  }

  // ------------------------------------------------------------------
  // residual=true: the same protocol maintains the residual-encoded
  // table (only the fit/encode calls differ — the durability machinery
  // is shared line-for-line)
  // ------------------------------------------------------------------

  private def mkRes(root: String, every: Int = 64) =
    new IvfPqMaintenance(spark, root, nLists = 4, iters = 2, m = M,
      ksub = 4, pqIters = 2, compactEvery = every, dims = 8, residual = true)

  /** Frozen-models residual rebuild: both fits on batch 0, every vector
    * assigned + residual-encoded against them. */
  private def rebuildRes(): DataFrame = {
    val (cents, _) = IvfIndex.buildIndex(batch(0), 4, 2)
    val assigned0 = IvfIndex.assignBatch(batch(0), cents)
    val (books, _) = PqIndex.buildResPq(assigned0, cents, M, 4, 2, dims = 8)
    PqIndex.encodeResBatch(IvfIndex.assignBatch(embsAll, cents), cents, books)
  }

  test("residual drain == frozen-models residual rebuild; resume + refit") {
    val root = Files.createTempDirectory("ivfpqres_maint").toString
    val m = mkRes(root, every = 2) // live compaction inside the drain
    (0 to 2).foreach(b => m.processBatch(b.toLong, batch(b)))
    val expect = rows(rebuildRes())
    assert(rows(m.currentTable()) == expect,
      "residual drain diverged from the frozen-models rebuild")
    // serve dispatches to the residual ADC read
    val (cents, books) = m.models()
    val got = m.topK(embsAll, Seq(0L, 1L), 3, 2)
      .collect().map(_.toSeq.toVector).toSet
    val exp = PqIndex.ivfadcResTopKFromTable(cents, books, m.currentTable(),
      embsAll, Seq(0L, 1L), 3, 2).collect().map(_.toSeq.toVector).toSet
    assert(got == exp, "residual maintained-table serve diverged")
    // a fresh instance over the same root resumes byte-identical
    val m2 = mkRes(root, every = 2)
    assert(rows(m2.currentTable()) == expect, "residual resume diverged")
    // in-stream refit: full-corpus retrain, generation swap
    m2.refitBatch(3L, embsAll)
    assert(m2.generation == 1)
    val (cents2, assigned2) = IvfIndex.buildIndex(embsAll, 4, 2)
    val (books2, table2) = PqIndex.buildResPq(assigned2, cents2, M, 4, 2, dims = 8)
    assert(rows(m2.currentTable()) == rows(table2),
      "residual refit diverged from the full-corpus rebuild")
    org.apache.spark.sql.graftbridge.CheckpointBridge.release(assigned2)
    org.apache.spark.sql.graftbridge.CheckpointBridge.release(table2)
  }
}
