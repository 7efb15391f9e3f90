package graft

import java.nio.file.Files
import java.util.concurrent.TimeUnit

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** CLI surface: config parsing (reference Configuration.java semantics)
  * and the end-to-end CSV job entry point. */
class MainSpec extends AnyFunSuite with BeforeAndAfterAll {

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

  test("config defaults mirror the reference (ic=500, uc=500, k=10, unit=ms)") {
    val c = Config.parse(Array("-i", "/x", "-ws", "3600000")).toOption.get
    assert(c.itemCut == 500 && c.userCut == 500 && c.topK == 10)
    assert(c.windowUnit == TimeUnit.MILLISECONDS && c.windowMs == 3600000L)
  }

  test("config full form, hex seed, window units") {
    val c = Config.parse(Array("--input", "/x", "--skip-cuts", "--item-cut", "7",
      "--user-cut", "9", "--top-k", "3", "--window-size", "2",
      "--window-unit", "DAYS", "--seed", "0xC0FFEE")).toOption.get
    assert(c.skipCuts && c.itemCut == 7 && c.userCut == 9 && c.topK == 3)
    assert(c.windowMs == 2L * 86400000L)
    assert(c.seed == 0xC0FFEEL)
  }

  test("config rejects missing input / unknown args") {
    assert(Config.parse(Array("-ws", "1")).isLeft)
    assert(Config.parse(Array("-i", "/x", "-ws", "1", "--bogus")).isLeft)
  }

  test("config accepts the reference's full default command line incl. -bt (Configuration.java:181-182)") {
    // buffer-timeout is accepted-and-ignored: Flink's network buffer
    // timeout has no analogue; the microbatch trigger interval plays
    // that latency/throughput role here
    val c = Config.parse(Array("-i", "/x", "-ic", "500", "-uc", "500", "-k", "10",
      "-ws", "3600000", "-wu", "MILLISECONDS", "-bt", "100", "-s", "42")).toOption.get
    assert(c.itemCut == 500 && c.topK == 10 && c.seed == 42L)
    val c2 = Config.parse(Array("-i", "/x", "-ws", "1", "--buffer-timeout", "5")).toOption.get
    assert(c2.windowMs == 1L)
  }

  test("malformed flag values produce the usage message, not a bare exception (r5 #8)") {
    for (bad <- Seq(
        Array("-i", "/x", "-ws", "1", "-bt", "nan"),
        Array("-i", "/x", "-ws", "1", "-ic", "many"),
        Array("-i", "/x", "-ws", "oops"),
        Array("-i", "/x", "-ws", "1", "-s", "0xZZ"),
        Array("-i", "/x", "-ws", "1", "-wu", "FORTNIGHTS"))) {
      val r = Config.parse(bad)
      assert(r.isLeft, s"expected Left for ${bad.mkString(" ")}")
      assert(r.swap.toOption.get.contains("usage:"),
        s"error must include usage for ${bad.mkString(" ")}")
    }
    assert(Config.parse(Array("-h")).isLeft) // help is also the usage path
  }

  test("end-to-end CSV job: known tiny dataset produces the expected top-K") {
    // users 1 and 2 both interact with items 10 and 20 -> strong cooc
    val lines = Seq(
      "1,10,1000", "1,20,2000", "2,10,3000", "2,20,4000", "3,30,5000")
    val dir = Files.createTempDirectory("graft_csv").toFile
    val f = new java.io.File(dir, "interactions.csv")
    Files.write(f.toPath, lines.mkString("\n").getBytes)
    val c = Config.parse(Array("-i", f.getAbsolutePath, "-sc", "-ws", "1",
      "-k", "5")).toOption.get
    val result = Main.run(spark, c).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getInt(2), r.getDouble(3)))
    // items 10 and 20 co-occur (count 2); item 30 has no pairs
    val items = result.map(_._1).toSet
    assert(items == Set(10, 20))
    assert(result.filter(_._1 == 10).head._3 == 20)
    assert(result.filter(_._1 == 20).head._3 == 10)
    assert(result.forall(_._4 > 0.0))
  }

  test("streaming mode (-st) equals batch mode with skip-cuts; sampled streaming runs") {
    val lines = (1 to 30).flatMap(u => (1 to 8).map(i => s"$u,${i % 6},${u * 1000 + i * 10}"))
    val dir = Files.createTempDirectory("graft_csv_st").toFile
    val f = new java.io.File(dir, "i.csv")
    Files.write(f.toPath, lines.mkString("\n").getBytes)
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getInt(2), r.getDouble(3))).toSet
    val base = Config.parse(Array("-i", f.getAbsolutePath, "-sc", "-ws", "1", "-k", "5"))
      .toOption.get
    // streaming drain == batch planner on the same input (nocuts identity)
    assert(rows(Main.runStreaming(spark, base.copy(streaming = true)))
      == rows(Main.run(spark, base)))
    // sampled streaming mode (tight cuts, refunds per microbatch) runs
    val sampled = Config.parse(Array("-i", f.getAbsolutePath, "-ws", "1", "-wu", "HOURS",
      "-ic", "10", "-uc", "2", "-s", "42", "--streaming")).toOption.get
    assert(sampled.streaming && Main.runStreaming(spark, sampled).count() > 0)
  }

  test("-st -cp: a run KILLED mid-stream resumes from checkpoint to the uninterrupted result, exactly once") {
    // 4 files with distinct mod-times -> 4 deterministic microbatches
    // under maxFilesPerTrigger=1; tight cuts + fixed seed so the sampled
    // (stateful, RNG-keyed) path is what must survive the kill
    val lines = (1 to 24).flatMap(u => (1 to 6).map(i => s"$u,${i % 4},${u * 1000 + i * 10}"))
    val dir = Files.createTempDirectory("graft_resume").toFile
    lines.grouped(lines.size / 4 + 1).zipWithIndex.foreach { case (chunk, idx) =>
      val f = new java.io.File(dir, f"part$idx%02d.csv")
      Files.write(f.toPath, chunk.mkString("\n").getBytes)
      assert(f.setLastModified(1700000000000L + idx * 60000L))
    }
    def cfg(ckpt: String) = Config.parse(Array(
      "-i", dir.getAbsolutePath, "-st", "-cp", ckpt,
      "-ws", "1", "-wu", "HOURS", "-ic", "12", "-uc", "2", "-s", "42")).toOption.get
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getInt(2), r.getDouble(3))).toSet

    // reference run: same config, fresh checkpoint, never interrupted
    val expected = rows(Main.runStreaming(spark,
      cfg(Files.createTempDirectory("graft_ckpt_ref").toString)))

    // interrupted run: crash AFTER batch 1's state snapshot commits but
    // BEFORE Spark commits its offsets — the exactly-once window
    val ckpt = Files.createTempDirectory("graft_ckpt").toString
    val killed = intercept[Exception] {
      Main.runStreaming(spark, cfg(ckpt), onBatch = (id, _) =>
        if (id == 1) throw new RuntimeException("injected kill after batch 1"))
    }
    assert(killed.getMessage.contains("injected kill")
      || Option(killed.getCause).exists(_.getMessage.contains("injected kill")))

    // resume with the SAME checkpoint: batch 1 is re-delivered (offsets
    // were never committed) but must be SKIPPED (its effects are already
    // in the restored state); 2..3 process fresh
    val seen = scala.collection.mutable.ArrayBuffer[(Long, Boolean)]()
    val resumed = rows(Main.runStreaming(spark, cfg(ckpt),
      onBatch = (id, processed) => seen.synchronized { seen += id -> processed; () }))
    assert(seen.toList == List(1L -> false, 2L -> true, 3L -> true),
      s"resume must replay-skip batch 1 and process only 2..3: $seen")
    assert(resumed == expected,
      "kill+resume must equal the uninterrupted run (sampled path, same seed)")
  }

  test("corrupt newest commit marker: restore falls back to the last parsable commit") {
    // Build a committed checkpoint (4 files -> batches 0..3, one marker
    // each), then truncate the NEWEST marker to empty — the shape a kill
    // leaves behind if the atomic-rename protocol is ever bypassed.
    // Restore must treat it as uncommitted and fall back to batch 2, not
    // throw and permanently block resume (r9 advice item 1).
    val lines = (1 to 12).flatMap(u => (1 to 4).map(i => s"$u,${i % 3},${u * 1000 + i * 10}"))
    val dir = Files.createTempDirectory("graft_corrupt").toFile
    lines.grouped(lines.size / 4 + 1).zipWithIndex.foreach { case (chunk, idx) =>
      val f = new java.io.File(dir, f"part$idx%02d.csv")
      Files.write(f.toPath, chunk.mkString("\n").getBytes)
      assert(f.setLastModified(1700000000000L + idx * 60000L))
    }
    val ckpt = Files.createTempDirectory("graft_ckpt_corrupt").toString
    val full = Main.runStreaming(spark, Config.parse(Array(
      "-i", dir.getAbsolutePath, "-st", "-cp", ckpt,
      "-ws", "1", "-wu", "HOURS", "-sc", "-k", "5")).toOption.get)
    assert(full.count() > 0)
    val metaDir = java.nio.file.Paths.get(ckpt, "graft-state", "meta")
    val ids = java.nio.file.Files.list(metaDir).iterator().asScala
      .map(_.getFileName.toString).filter(_.forall(_.isDigit)).map(_.toLong).toSeq.sorted
    assert(ids == Seq(0L, 1L, 2L, 3L), s"expected markers 0..3, got $ids")
    Files.write(metaDir.resolve("3"), Array.empty[Byte]) // truncate newest
    val st = new graft.streaming.StreamingCooc.State(spark)
    val restored = graft.streaming.StreamingCooc.restoreState(spark, st, ckpt)
    assert(restored.contains(2L),
      s"restore must skip the unparsable marker 3 and land on 2, got $restored")
    // and a checkpoint whose ONLY marker is corrupt restores to fresh-start
    Seq("0", "1", "2").foreach(id => java.nio.file.Files.delete(metaDir.resolve(id)))
    val st2 = new graft.streaming.StreamingCooc.State(spark)
    assert(graft.streaming.StreamingCooc.restoreState(spark, st2, ckpt).isEmpty,
      "all-corrupt markers must mean fresh start, not a crash")
  }

  test("sampled mode from CLI runs and respects cuts") {
    val lines = (1 to 50).flatMap(u => (1 to 10).map(i => s"$u,${i % 5},${u * 100 + i}"))
    val dir = Files.createTempDirectory("graft_csv2").toFile
    val f = new java.io.File(dir, "i.csv")
    Files.write(f.toPath, lines.mkString("\n").getBytes)
    val c = Config.parse(Array("-i", f.getAbsolutePath, "-ws", "1", "-wu", "HOURS",
      "-ic", "20", "-uc", "3", "-s", "42")).toOption.get
    val result = Main.run(spark, c)
    assert(result.count() > 0)
  }
}
