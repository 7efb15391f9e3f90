package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.operators.SqIndex
import graft.streaming.SqMaintenance

/** Crash-safety contract of the streaming SQ8 maintenance: drained table
  * == frozen-stats batch rebuild (fit on batch 0, saturating encode of
  * everything); kill/resume byte-identical; compaction + marker rollup
  * over the shared ShardLog. */
class SqMaintenanceSpec extends AnyFunSuite with BeforeAndAfterAll {

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

  /** 30 deterministic 8-dim vectors; batch b = vec_id % 3 == b. The
    * later batches' magnitudes exceed batch 0's, so the frozen-stats
    * saturation path is live in every test. */
  private def embsAll: DataFrame = {
    val rows = (0L until 30L).map { i =>
      val blob = (i % 4).toInt
      val base = Array.fill(8)(0.05f)
      base(blob) = (1.0 + 0.02 * i).toFloat
      (i, base.toSeq)
    }
    spark.createDataFrame(rows).toDF("vec_id", "embedding")
  }

  private def batch(b: Int): DataFrame = embsAll.where(col("vec_id") % 3 === b)

  private def rows(df: DataFrame): Set[Seq[Any]] =
    SqIndex.codeTableFrom(df).collect().map(_.toSeq.toVector: Seq[Any]).toSet

  private def mk(root: String, every: Int = 64) =
    new SqMaintenance(spark, root, dims = 8, compactEvery = every)

  private def rebuild(): DataFrame = {
    val (stats, _) = SqIndex.buildSq(batch(0), dims = 8)
    SqIndex.encodeBatch(embsAll, stats)
  }

  test("drained table == frozen-stats rebuild (saturation live); serve matches") {
    val root = Files.createTempDirectory("sq_maint").toString
    val m = mk(root)
    (0 to 2).foreach(b => m.processBatch(b.toLong, batch(b)))
    val expect = rebuild()
    assert(rows(m.currentCodes()) == rows(expect))
    // at least one later-batch code saturates at 255 (magnitudes grow)
    assert(SqIndex.codeTableFrom(m.currentCodes())
      .where(col("vec_id") >= 10 && col("code") === 255).count() > 0,
      "expected live saturation in the ingest batches")
    val got = m.topK(embsAll, Seq(0L, 1L), 3)
      .collect().map(_.toSeq.toVector).toSet
    val exp = SqIndex.sqTopKFrom(m.stats(), expect, embsAll, Seq(0L, 1L), 3)
      .collect().map(_.toSeq.toVector).toSet
    assert(got == exp, "maintained-table serve diverged from the rebuild serve")
  }

  test("kill/resume: pre-marker and post-publish crash windows replay identically") {
    val rootA = Files.createTempDirectory("sq_a").toString
    val a = mk(rootA)
    (0 to 2).foreach(b => a.processBatch(b.toLong, batch(b)))
    val expect = rows(a.currentCodes())

    val rootB = Files.createTempDirectory("sq_b").toString
    val b1 = mk(rootB)
    b1.processBatch(0L, batch(0))
    b1.processBatch(1L, batch(1))
    val fs = new org.apache.hadoop.fs.Path(rootB)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(s"$rootB/meta/1"), false)
    val b2 = mk(rootB)
    assert(b2.committedIds.sorted == Seq(0L))
    b2.processBatch(1L, batch(1))
    b2.processBatch(2L, batch(2))
    assert(rows(b2.currentCodes()) == expect, "pre-marker crash replay diverged")

    val rootC = Files.createTempDirectory("sq_c").toString
    val c1 = mk(rootC)
    c1.processBatch(0L, batch(0))
    val fsC = new org.apache.hadoop.fs.Path(rootC)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fsC.delete(new org.apache.hadoop.fs.Path(s"$rootC/meta/0"), false)
    fsC.delete(new org.apache.hadoop.fs.Path(s"$rootC/codes/0"), true)
    val c2 = mk(rootC)
    c2.processBatch(0L, batch(0)) // stats already published
    c2.processBatch(1L, batch(1))
    c2.processBatch(2L, batch(2))
    assert(rows(c2.currentCodes()) == expect, "post-publish crash replay diverged")

    val before = rows(c2.currentCodes())
    c2.processBatch(1L, batch(1))
    assert(rows(c2.currentCodes()) == before)
  }

  test("in-stream refit: new stats generation, kill/resume byte-identical") {
    val extra = spark.createDataFrame(Seq((100L, Seq.fill(8)(2.5f))))
      .toDF("vec_id", "embedding") // outside the old range: refit matters
    val grown = embsAll.unionByName(extra)
    val (fitAll, _) = SqIndex.buildSq(embsAll, dims = 8)
    val expect = rows(SqIndex.encodeBatch(grown, fitAll))

    val rootA = Files.createTempDirectory("sq_refit_a").toString
    val a = mk(rootA, every = 2)
    a.processBatch(0L, batch(0))
    a.processBatch(1L, batch(1)) // live compaction carries gen 0
    a.refitBatch(2L, embsAll)
    a.processBatch(3L, extra)
    assert(a.generation == 1, "refit must advance the committed generation")
    assert(a.stats().mins.toSeq == fitAll.mins.toSeq &&
      a.stats().maxs.toSeq == fitAll.maxs.toSeq,
      "served stats must be the gen-1 fit")
    assert(rows(a.currentCodes()) == expect, "refit drain diverged from the gen-1 rebuild")

    // crash window: stats_g1 published + snapshot written, marker never
    // committed — restart serves gen 0, replay lands identical
    val rootB = Files.createTempDirectory("sq_refit_b").toString
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
    val (fit0, _) = SqIndex.buildSq(batch(0), dims = 8)
    assert(b2.stats().mins.toSeq == fit0.mins.toSeq,
      "pre-replay serving must pair gen-0 stats with gen-0 codes")
    b2.refitBatch(2L, embsAll)
    b2.processBatch(3L, extra)
    assert(b2.generation == 1)
    assert(rows(b2.currentCodes()) == expect,
      "refit kill/resume diverged from the uninterrupted run")
  }

  test("compaction + marker rollup over the shared shard log") {
    val root = Files.createTempDirectory("sq_cp").toString
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val ref = mk(Files.createTempDirectory("sq_ref").toString)
    (0 to 2).foreach(b => ref.processBatch(b.toLong, batch(b)))
    val expect = rows(ref.currentCodes())

    val m = mk(root, every = 2)
    (0 to 2).foreach(b => m.processBatch(b.toLong, batch(b)))
    assert(rows(m.currentCodes()) == expect, "compacted read diverged")
    // DEFERRED sweep (r15 verdict #1, serve-while-compact): the
    // compaction at batch 1 keeps its covered shards one more cycle so a
    // serve plan built before it stays executable; markers (never read
    // by plans) roll up immediately
    assert(fs.exists(new org.apache.hadoop.fs.Path(s"$root/codes/0")) &&
      !fs.exists(new org.apache.hadoop.fs.Path(s"$root/meta/0")),
      "markers roll up at compaction; covered shards defer one cycle")
    val m2 = mk(root, every = 2)
    assert(m2.coveredUpTo.contains(1L) && m2.committedCount == 3)
    assert(rows(m2.currentCodes()) == expect)
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
    assert(rows(m2.currentCodes()) ==
      rows(SqIndex.encodeBatch(embsAll.unionByName(extra), m2.stats())))
  }
}
