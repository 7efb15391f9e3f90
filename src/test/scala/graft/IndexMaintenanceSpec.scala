package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQueryException, Trigger}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.operators.{Dedup, Tables}
import graft.streaming.IndexMaintenance

/** Contract tests for the kill-resumable streaming index maintenance:
  * drain == full rebuild, idempotent replay, crash self-healing, and —
  * the r10/r11 scale fix — standing per-batch state is written once and
  * never re-materialized by later batches. */
class IndexMaintenanceSpec extends AnyFunSuite with BeforeAndAfterAll {

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

  private def comps(df: DataFrame): Set[(Long, Long)] =
    df.select("node", "comp").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  private def docs: DataFrame = Tables.table(spark, sfDir, "documents")

  private def chunk(c: Int): DataFrame =
    docs.where(pmod(col("doc_id"), lit(3)) === c)

  /** (relative path, length, mtime) of every file under `dir`. */
  private def snapshot(dir: String): Set[(String, Long, Long)] = {
    import scala.jdk.CollectionConverters._
    val base = Paths.get(dir)
    if (!Files.isDirectory(base)) Set.empty
    else {
      val walk = Files.walk(base)
      try walk.iterator().asScala
        .filter(f => Files.isRegularFile(f))
        .map(f => (base.relativize(f).toString, Files.size(f),
          Files.getLastModifiedTime(f).toMillis))
        .toSet
      finally walk.close()
    }
  }

  test("fold over batches == full rebuild; standing state never rewritten") {
    val root = Files.createTempDirectory("idx_maint").toString
    val maint = new IndexMaintenance(spark, root, 3)

    maint.processBatch(0, chunk(0))
    val afterB0 = snapshot(s"$root/fps/0") ++ snapshot(s"$root/delta/0")
    assert(afterB0.nonEmpty)

    maint.processBatch(1, chunk(1))
    val afterB1 = snapshot(s"$root/fps/1") ++ snapshot(s"$root/delta/1")

    maint.processBatch(2, chunk(2))

    // the scale contract: later batches SCAN earlier fps/delta shards,
    // they never rewrite or re-materialize them (the r10/r11 shape
    // re-checkpointed the whole accumulated fp union every batch)
    assert(snapshot(s"$root/fps/0") ++ snapshot(s"$root/delta/0") == afterB0,
      "batch 1/2 modified batch 0's persisted state")
    assert(snapshot(s"$root/fps/1") ++ snapshot(s"$root/delta/1") == afterB1,
      "batch 2 modified batch 1's persisted state")

    assert(maint.committedIds == Seq(0L, 1L, 2L))
    val full = comps(Dedup.simhashComponents(docs, 3))
    val folded = comps(maint.currentIndex())
    assert(folded == full, s"fold diverged from rebuild: " +
      s"missing=${(full -- folded).take(5)} extra=${(folded -- full).take(5)}")
  }

  test("replaying a committed batch is a no-op; a crashed batch self-heals") {
    val root = Files.createTempDirectory("idx_maint_replay").toString
    val m1 = new IndexMaintenance(spark, root, 3)
    m1.processBatch(0, chunk(0))
    m1.processBatch(1, chunk(1))
    val afterB1 = snapshot(s"$root/fps/1") ++ snapshot(s"$root/delta/1")

    // "restart": a NEW instance over the same root replays batch 1
    // (foreachBatch replay after a kill between processBatch and the
    // source-offset commit) — the marker short-circuits, nothing is
    // rewritten
    val m2 = new IndexMaintenance(spark, root, 3)
    m2.processBatch(1, chunk(1))
    assert(snapshot(s"$root/fps/1") ++ snapshot(s"$root/delta/1") == afterB1,
      "replay of a committed batch must not rewrite its state")

    // crash MID-batch-2: fps written, delta half-written, NO marker.
    // The replay must overwrite both and commit.
    Dedup.simhashFingerprints(chunk(2).select(col("doc_id"), col("text")))
      .write.mode("overwrite").parquet(s"$root/fps/2")
    Files.createDirectories(Paths.get(s"$root/delta/2"))
    Files.write(Paths.get(s"$root/delta/2/part-garbage.parquet"),
      "not a parquet file".getBytes("UTF-8"))
    assert(m2.committedIds == Seq(0L, 1L))
    m2.processBatch(2, chunk(2))
    assert(m2.committedIds == Seq(0L, 1L, 2L))

    val full = comps(Dedup.simhashComponents(docs, 3))
    assert(comps(m2.currentIndex()) == full)
  }

  test("an empty ingest batch is legal and leaves the index unchanged") {
    val root = Files.createTempDirectory("idx_maint_empty").toString
    val maint = new IndexMaintenance(spark, root, 3)
    maint.processBatch(0, chunk(0))
    val before = comps(maint.currentIndex())
    // empty file from the source: no fps, empty delta — both parquet
    // reads must survive on the explicit schemas
    maint.processBatch(1, docs.limit(0))
    maint.processBatch(2, chunk(1))
    assert(maint.committedIds == Seq(0L, 1L, 2L))
    val after = comps(maint.currentIndex())
    val expect = comps(Dedup.simhashComponents(
      docs.where(pmod(col("doc_id"), lit(3)) =!= 2), 3))
    assert(after == expect, s"fold with an empty batch diverged: " +
      s"missing=${(expect -- after).take(5)} extra=${(after -- expect).take(5)}")
    assert(before.map(_._1).subsetOf(after.map(_._1)),
      "batch-0 nodes must survive the empty batch")
  }

  test("minhash maintenance folds to the minhash full rebuild") {
    val root = Files.createTempDirectory("idx_maint_mh").toString
    val maint = new IndexMaintenance(spark, root,
      IndexMaintenance.MinhashJaccard(0.9))
    (0 until 3).foreach(b => maint.processBatch(b, chunk(b)))
    val full = comps(Dedup.minhashComponents(docs, 0.9))
    val folded = comps(maint.currentIndex())
    assert(folded == full, s"minhash fold diverged from rebuild: " +
      s"missing=${(full -- folded).take(5)} extra=${(folded -- full).take(5)}")
  }

  test("compaction truncates the delta log and preserves the fold exactly") {
    val root = Files.createTempDirectory("idx_maint_compact").toString
    val batches = 24
    def mb(b: Int): DataFrame = docs.where(pmod(col("doc_id"), lit(batches)) === b)

    // compactEvery=4 -> a snapshot after every 4th committed batch, each
    // truncating everything it covers. Process half, then RESUME with a
    // fresh instance across the compaction points.
    val m1 = new IndexMaintenance(spark, root, IndexMaintenance.Simhash(3), compactEvery = 4)
    (0 until 12).foreach(b => m1.processBatch(b, mb(b)))

    // batch 11 was a compaction point. With the DEFERRED sweep
    // (r15 verdict #1, serve-while-compact) the snapshot at 11 keeps
    // everything the PREVIOUS snapshot (7) still covered for one cycle:
    // deltas 8..11 and base/7 survive; deltas <= 7 and base/3 are gone
    val deltaDirs = Option(new java.io.File(s"$root/delta").listFiles())
      .map(_.map(_.getName).toSet).getOrElse(Set.empty[String])
    assert(deltaDirs == Set("8", "9", "10", "11"),
      s"compaction at 11 must keep only the post-prev-snapshot deltas, got: $deltaDirs")
    val baseDirs = new java.io.File(s"$root/base").listFiles().map(_.getName).toSet
    assert(baseDirs == Set("7", "11"),
      s"expected snapshots 7 (deferred) and 11, got $baseDirs")

    // marker ROLLUP (r14 verdict #1): the covered meta/<b> files are
    // swept with the deltas — the snapshot marker (upTo=11, count=12) is
    // their only record, and a fresh instance restores from it alone
    val metaFiles = Option(new java.io.File(s"$root/meta").listFiles())
      .map(_.map(_.getName).toSet).getOrElse(Set.empty[String])
    assert(metaFiles.isEmpty,
      s"batch 11's compaction must roll up every covered marker, left: $metaFiles")
    val restored = new IndexMaintenance(spark, root, IndexMaintenance.Simhash(3), compactEvery = 4)
    assert(restored.coveredUpTo.contains(11L) && restored.committedCount == 12
      && restored.committedIds.isEmpty && restored.isCommitted(0L)
      && restored.isCommitted(11L) && !restored.isCommitted(12L),
      "rolled-up state must restore from the snapshot marker alone")

    // plant UNMARKED snapshot debris (a crash between a snapshot write
    // and its basemeta commit): the next compaction point must sweep it
    // — it has no marker, so only the sweep covers it (r12 advice).
    // id 9 is never a real snapshot id in this cadence (3,7,11,...)
    Files.createDirectories(Paths.get(s"$root/base/9"))
    Files.write(Paths.get(s"$root/base/9/part-junk.parquet"), Array[Byte](1, 2, 3))

    val m2 = new IndexMaintenance(spark, root, IndexMaintenance.Simhash(3), compactEvery = 4)
    (12 until batches).foreach(b => m2.processBatch(b, mb(b)))

    // the fold is byte-identical to the full rebuild, and only the last
    // snapshot plus its deferred predecessor remain on disk (the debris
    // at base/9 was swept by the first m2 compaction)
    val full = comps(Dedup.simhashComponents(docs, 3))
    val folded = comps(m2.currentIndex())
    assert(folded == full, s"compacted fold diverged: " +
      s"missing=${(full -- folded).take(5)} extra=${(folded -- full).take(5)}")
    val baseDirs2 = new java.io.File(s"$root/base").listFiles().map(_.getName).toSet
    assert(baseDirs2 == Set("19", "23"),
      s"expected snapshots 19 (deferred) and 23, got $baseDirs2")
  }

  test("deleteBatch: standing rows vanish and the masked corpus no longer " +
      "attracts post-delete ingest into the deleted doc's component") {
    // three synthetic docs: A and B identical (a guaranteed simhash dup
    // pair), C unrelated; A and C ingest first, A is deleted, then B
    // arrives. Without fps masking B would pair with A's fingerprint and
    // enter A's component; with it B has no partners, and since only
    // docs WITH edges live in the index, B must be absent entirely.
    val text = "the quick brown fox jumps over the lazy dog again and again"
    val other = "completely unrelated words about spark shuffles and parquet"
    def df(rows: (Long, String)*) =
      spark.createDataFrame(rows).toDF("doc_id", "text")

    val root = Files.createTempDirectory("idx_maint_del").toString
    val m = new IndexMaintenance(spark, root, IndexMaintenance.Simhash(3))
    m.processBatch(0L, df(100L -> text, 300L -> other))
    m.processBatch(1L, df(101L -> text)) // 101 pairs with 100
    assert(comps(m.currentIndex()) == Set((100L, 100L), (101L, 100L)))

    m.deleteBatch(2L, df(100L -> text).select("doc_id"))
    assert(comps(m.currentIndex()) == Set((101L, 100L)),
      "the deleted node's row vanishes; survivors keep their labels")

    m.processBatch(3L, df(102L -> text)) // a dup of the DELETED doc
    val after = comps(m.currentIndex())
    assert(after.exists(_._1 == 102L),
      "102 must pair with the surviving dup 101")
    assert(!after.exists(p => p._1 == 102L && p._2 == 100L) ||
        after.contains((101L, 100L)),
      "102's label must come from live pairing, not the deleted doc's row")
    assert(!after.exists(_._1 == 100L), "the deleted doc never reappears")

    // the control run without the delete: same corpus, 100 present
    val root2 = Files.createTempDirectory("idx_maint_del_ctl").toString
    val m2 = new IndexMaintenance(spark, root2, IndexMaintenance.Simhash(3))
    m2.processBatch(0L, df(100L -> text, 300L -> other))
    m2.processBatch(1L, df(101L -> text))
    m2.processBatch(3L, df(102L -> text))
    assert(comps(m2.currentIndex()).exists(_._1 == 100L))
  }

  test("deleteBatch: a doc with NO surviving dup partner stops matching " +
      "entirely (the takedown contract)") {
    val text = "some very specific sentence that only these two docs share"
    def df(rows: (Long, String)*) =
      spark.createDataFrame(rows).toDF("doc_id", "text")
    val root = Files.createTempDirectory("idx_maint_del2").toString
    val m = new IndexMaintenance(spark, root, IndexMaintenance.Simhash(3))
    m.processBatch(0L, df(200L -> text))
    m.deleteBatch(1L, df(200L -> text).select("doc_id"))
    m.processBatch(2L, df(201L -> text)) // dup of the deleted doc only
    assert(comps(m.currentIndex()).isEmpty,
      "with the only partner deleted and masked, the new doc has no edges")
  }

  test("streaming kill/resume lands byte-identical to the uninterrupted run") {
    // stage the corpus as 3 single-file chunks so the file source feeds
    // one chunk per trigger
    val staged = Files.createTempDirectory("idx_maint_staged").toString
    (0 until 3).foreach { c =>
      val tmp = s"$staged/_tmp"
      chunk(c).coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      val tgt = Paths.get(staged, f"chunk$c%02d.parquet")
      Files.move(part.toPath, tgt, java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      assert(tgt.toFile.setLastModified(1700000000000L + c * 60000L))
    }
    val schema = docs.schema

    def drain(root: String, ckpt: String, failAfterBatch: Option[Long]): Unit = {
      val maint = new IndexMaintenance(spark, root, 3)
      val killed = new java.util.concurrent.atomic.AtomicBoolean(false)
      val q = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(staged)
        .writeStream
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (b: DataFrame, id: Long) =>
          maint.processBatch(id, b)
          // kill AFTER the state committed but BEFORE Spark commits the
          // source offset — the replay-prone window
          if (failAfterBatch.contains(id) && killed.compareAndSet(false, true))
            throw new RuntimeException("injected kill")
          ()
        }
        .start()
      try q.awaitTermination()
      catch {
        case e: StreamingQueryException =>
          // only the injected kill is expected; a clean drain rethrows
          if (failAfterBatch.isEmpty) throw e
      }
    }

    val rootA = Files.createTempDirectory("idx_maint_kill").toString
    val ckptA = Files.createTempDirectory("idx_maint_kill_ckpt").toString
    drain(rootA, ckptA, failAfterBatch = Some(1L)) // dies after batch 1 commits
    assert(new IndexMaintenance(spark, rootA, 3).committedIds == Seq(0L, 1L),
      "kill point: batches 0,1 committed, batch 2 never ran")
    drain(rootA, ckptA, failAfterBatch = None)     // resume from the checkpoint

    val rootB = Files.createTempDirectory("idx_maint_clean").toString
    val ckptB = Files.createTempDirectory("idx_maint_clean_ckpt").toString
    drain(rootB, ckptB, failAfterBatch = None)     // uninterrupted control run

    val resumed = comps(new IndexMaintenance(spark, rootA, 3).currentIndex())
    val clean = comps(new IndexMaintenance(spark, rootB, 3).currentIndex())
    val full = comps(Dedup.simhashComponents(docs, 3))
    assert(resumed == clean, "kill/resume diverged from the uninterrupted run")
    assert(resumed == full, "drained index diverged from the full rebuild")
  }
}
