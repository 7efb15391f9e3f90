package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/**
 * Contract tests for the DSv2 interactions source: the properties the
 * reference's file monitor guarantees and a generic text scan cannot —
 * per-file line order, (mod-time, name) planning order, unsplittable
 * files — plus DSv2 column pruning and loud malformed-input failure.
 */
class InteractionsSourceSpec extends AnyFunSuite with BeforeAndAfterAll {

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
    dir = Files.createTempDirectory("dsv2_src").toString
    // two files; the LEXICALLY LATER name gets the EARLIER mod-time, so
    // name order and mod-time order disagree — planning must follow mtime
    write("b_old.txt", Seq("1,10,1000", "1,11,2000", "2,10,3000"), mtime = 1700000000000L)
    write("a_new.txt", Seq("3,12,4000", "", "4,12,5000"), mtime = 1700000060000L)
  }

  private def write(name: String, lines: Seq[String], mtime: Long): Unit = {
    val p = Paths.get(dir, name)
    Files.write(p, lines.mkString("\n").getBytes(StandardCharsets.UTF_8))
    p.toFile.setLastModified(mtime)
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def read() = spark.read.format("graft-interactions").load(dir)

  test("schema, row content, blank-line skip") {
    val rows = read().select(col("user"), col("item"), unix_millis(col("ts")).as("ms"))
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2))).toSet
    assert(rows == Set((1, 10, 1000L), (1, 11, 2000L), (2, 10, 3000L),
      (3, 12, 4000L), (4, 12, 5000L)))
  }

  test("one partition per file, planned in (mod-time, name) order; per-file line order kept") {
    val parts = read()
      .select(org.apache.spark.sql.functions.spark_partition_id().as("pid"),
        col("user"), col("item"))
      .collect().groupBy(_.getInt(0))
      .view.mapValues(_.map(r => (r.getInt(1), r.getInt(2))).toSeq).toMap
    assert(parts.keySet == Set(0, 1), s"expected 2 file partitions, got $parts")
    // partition 0 = the OLDER file (b_old) despite the later name
    assert(parts(0) == Seq((1, 10), (1, 11), (2, 10)),
      s"mod-time-first planning + in-file order broken: ${parts(0)}")
    assert(parts(1) == Seq((3, 12), (4, 12)), s"in-file order broken: ${parts(1)}")
  }

  test("column pruning reaches the reader (BatchScan output shrinks to the projection)") {
    val p = read().select(col("user")).queryExecution.executedPlan.toString
    val scanLine = p.linesIterator.filter(_.contains("BatchScan")).mkString
    assert(scanLine.contains("[user#") && !scanLine.contains("item#") &&
      !scanLine.contains("ts#"), s"pruning not pushed: $scanLine")
  }

  test("count(*) prunes to an empty read schema and still counts lines") {
    assert(read().count() == 5L)
  }

  test("malformed line fails loudly, not silently as nulls") {
    val bad = Files.createTempDirectory("dsv2_bad").toString
    Files.write(Paths.get(bad, "x.txt"), "1,10,1000\nnot-a-line\n".getBytes)
    val e = intercept[org.apache.spark.SparkException] {
      spark.read.format("graft-interactions").load(bad).collect()
    }
    assert(e.getMessage.contains("malformed") ||
      Option(e.getCause).exists(_.getMessage.contains("malformed")))
  }

  test("single-file load works (path = file, not directory)") {
    val one = spark.read.format("graft-interactions").load(s"$dir/b_old.txt")
    assert(one.count() == 3L)
  }

  test("a caller-supplied divergent schema fails loudly (the format's schema is fixed)") {
    val wrong = new org.apache.spark.sql.types.StructType()
      .add("a", org.apache.spark.sql.types.StringType)
    val e = intercept[Exception] {
      spark.read.schema(wrong).format("graft-interactions").load(dir).collect()
    }
    assert(e.getMessage.contains("fixed schema") || e.getMessage.toLowerCase.contains("schema"),
      s"unexpected: ${e.getMessage}")
  }

  private def runAvailableNow(path: String, ckpt: Option[String] = None,
      maxFiles: Option[Int] = None): Seq[(Long, Seq[(Int, Int)])] = {
    val batches = scala.collection.mutable.ArrayBuffer[(Long, Seq[(Int, Int)])]()
    val reader = spark.readStream.format("graft-interactions")
    maxFiles.foreach(n => reader.option("maxFilesPerTrigger", n))
    val w = reader.load(path)
      .writeStream
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
        val rows = df.select(col("user"), col("item")).collect()
          .map(r => (r.getInt(0), r.getInt(1))).toSeq
        batches.synchronized { batches += id -> rows }
        ()
      }
    ckpt.foreach(c => w.option("checkpointLocation", c))
    val q = w.start()
    q.awaitTermination()
    batches.toSeq.sortBy(_._1)
  }

  test("MICRO_BATCH_READ: one file per trigger, (mod-time, name) admission order, streaming == batch") {
    val batches = runAvailableNow(dir).filter(_._2.nonEmpty)
    assert(batches.map(_._2) == Seq(
      Seq((1, 10), (1, 11), (2, 10)), // b_old first: earlier mod-time wins over name order
      Seq((3, 12), (4, 12))),
      s"expected one mod-time-ordered file per trigger, got $batches")
  }

  test("maxFilesPerTrigger widens admission but keeps (mod-time, name) order; bad values fail loudly") {
    // both files admitted in ONE trigger, still mod-time-ordered within it
    // (partitions are planned in admission order, so collect order is the
    // per-file concatenation)
    val wide = runAvailableNow(dir, maxFiles = Some(2)).filter(_._2.nonEmpty)
    assert(wide.map(_._2) == Seq(
      Seq((1, 10), (1, 11), (2, 10), (3, 12), (4, 12))),
      s"expected one 2-file batch in admission order, got $wide")
    // a cap above the pending count drains everything in one trigger too
    val huge = runAvailableNow(dir, maxFiles = Some(100)).filter(_._2.nonEmpty)
    assert(huge.map(_._2) == wide.map(_._2),
      s"expected a single drained batch, got $huge")
    val e = intercept[Exception] {
      spark.read.format("graft-interactions")
        .option("maxFilesPerTrigger", "0").load(dir).collect()
    }
    assert(e.getMessage.contains("maxFilesPerTrigger must be positive"), e.getMessage)
  }

  /** Last micro-batch's physical plan through the public explain(). */
  private def streamingPlan(pruned: Boolean): String = {
    val reader = spark.readStream.format("graft-interactions")
    val src = (if (pruned) reader.option("columns", "item") else reader).load(dir)
    val q = src.select(col("item"))
      .writeStream.format("noop")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val baos = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(baos)) { q.explain() }
    baos.toString
  }

  test("the `columns` option prunes the STREAMING reader; without it Spark plans the full schema") {
    // Spark's micro-batch planner does NOT run V2 scan pushdown for
    // streaming relations: a plain readStream scans all three fields
    // even under a one-column projection...
    val unpruned = streamingPlan(pruned = false)
      .linesIterator.filter(_.contains("MicroBatchScan")).mkString
    assert(unpruned.contains("user#") && unpruned.contains("item#") && unpruned.contains("ts#"),
      s"expected the full-schema streaming scan (planner behavior changed?): $unpruned")
    // ...so the source offers a table-schema projection option, which
    // must reach the streaming scan (the reader then never parses the
    // dropped fields)
    val prunedScan = streamingPlan(pruned = true)
      .linesIterator.filter(_.contains("MicroBatchScan")).mkString
    assert(prunedScan.nonEmpty && prunedScan.contains("item#") &&
      !prunedScan.contains("user#") && !prunedScan.contains("ts#"),
      s"columns option did not prune the streaming scan: $prunedScan")
  }

  test("columns option: unknown names fail loudly; batch read honors the projection") {
    val e = intercept[Exception] {
      spark.read.format("graft-interactions").option("columns", "item,bogus").load(dir).collect()
    }
    assert(e.getMessage.contains("unknown columns"), e.getMessage)
    val rows = spark.read.format("graft-interactions").option("columns", "user,item")
      .load(dir).collect()
    assert(rows.forall(_.length == 2) && rows.length == 5)
  }

  test("streaming offset watermark: restart from checkpoint ingests only files past the watermark") {
    val d2 = Files.createTempDirectory("dsv2_stream").toString
    val ckpt = Files.createTempDirectory("dsv2_ckpt").toString
    def put(name: String, lines: Seq[String], mtime: Long): Unit = {
      val p = Paths.get(d2, name)
      Files.write(p, lines.mkString("\n").getBytes(StandardCharsets.UTF_8))
      assert(p.toFile.setLastModified(mtime))
    }
    put("one.txt", Seq("1,10,1000"), 1700000000000L)
    put("two.txt", Seq("2,11,2000"), 1700000060000L)
    val first = runAvailableNow(d2, Some(ckpt))
    assert(first.flatMap(_._2) == Seq((1, 10), (2, 11)))
    // a file at the already-committed watermark must be ignored; one past
    // it must be the ONLY thing the resumed query reads
    put("zero_late.txt", Seq("9, 9, 1"), 1700000000000L)
    put("three.txt", Seq("3,12,3000"), 1700000120000L)
    val resumed = runAvailableNow(d2, Some(ckpt))
    assert(resumed.flatMap(_._2) == Seq((3, 12)),
      s"resume must skip committed files and mod-time-stale arrivals: $resumed")
  }
}
