package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.operators.{SkewJoin, Tables}

/**
 * Scale-technique semantics: bucketed co-located joins (no shuffle),
 * salted skew joins (identical output), and watermark-driven late-data
 * dropping (the reference's late filter, #6/#7).
 */
class ScaleSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val sfDir = "/root/testdata/sf0.001"
  @transient private var spark: SparkSession = _
  private val warehouse = Files.createTempDirectory("graft_wh").toString

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir", warehouse)
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("bucketed tables co-locate the join: no shuffle exchange in the plan") {
    val l = Tables.table(spark, sfDir, "lineitem")
      .select(col("l_orderkey"), col("l_quantity"))
    val o = Tables.table(spark, sfDir, "orders")
      .select(col("o_orderkey"), col("o_totalprice"))
    l.write.mode("overwrite").bucketBy(4, "l_orderkey").saveAsTable("li_b")
    o.write.mode("overwrite").bucketBy(4, "o_orderkey").saveAsTable("or_b")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ path
    try {
      val joined = spark.table("li_b")
        .join(spark.table("or_b"), col("l_orderkey") === col("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join should not shuffle:\n${plan.take(1500)}")
      // and it still computes the right thing
      val expected = l.join(o, col("l_orderkey") === col("o_orderkey")).count()
      assert(joined.count() == expected)
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }

  test("salted join output == plain join output (inner and left_outer)") {
    val l = Tables.table(spark, sfDir, "lineitem")
      .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"))
    val r = Tables.table(spark, sfDir, "supplier")
      .select(col("s_suppkey").as("l_suppkey"), col("s_name"))
    def key(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getInt(2), x.getString(3))).toSet

    val plain = key(l.join(r, Seq("l_suppkey")))
    val salted = key(SkewJoin.saltedJoin(l, r, "l_suppkey", salt = 8))
    assert(salted == plain)
    assert(plain.nonEmpty)
  }

  test("PrefixScan.runningMaxExclusive == global-window running max, without the all-to-one window") {
    val ev = Tables.table(spark, sfDir, "events").select(col("event_id"), col("ts"))
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("event_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val expected = ev.withColumn("wm", max(col("ts")).over(w))
      .collect().map(r => r.getLong(0) -> Option(r.get(2))).toMap
    val scanned = graft.operators.PrefixScan
      .runningMaxExclusive(ev, "event_id", "ts", "wm")
    val got = scanned.collect().map(r => r.getLong(0) -> Option(r.get(2))).toMap
    assert(got == expected)
    // the big input must NOT pass through an unpartitioned WindowExec:
    // every Window over it is keyed by spark_partition_id()
    val plan = scanned.queryExecution.executedPlan.toString
    assert(!plan.contains("windowspecdefinition(event_id"),
      s"found a global window over the input:\n${plan.take(1200)}")
  }

  test("salted join rejects right/full outer (salt-fold duplicate null rows)") {
    val l = Tables.table(spark, sfDir, "lineitem").select(col("l_suppkey"))
    val r = Tables.table(spark, sfDir, "supplier")
      .select(col("s_suppkey").as("l_suppkey"), col("s_name"))
    intercept[IllegalArgumentException] {
      SkewJoin.saltedJoin(l, r, "l_suppkey", salt = 4, joinType = "right_outer")
    }
    intercept[IllegalArgumentException] {
      SkewJoin.saltedJoin(l, r, "l_suppkey", salt = 4, joinType = "full")
    }
  }

  test("source/sink round-trips: json, csv, orc preserve the interaction table") {
    val dir = Files.createTempDirectory("graft_io").toString
    val src = graft.operators.Cooccurrence.interactions(spark, sfDir)
      .select(col("user"), col("item"), unix_millis(col("ts")).as("ts_ms"))
    val expected = src.collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2))).toSet

    src.write.mode("overwrite").json(s"$dir/j")
    val fromJson = spark.read
      .schema("user INT, item INT, ts_ms LONG").json(s"$dir/j")
    assert(fromJson.collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2))).toSet == expected)

    src.write.mode("overwrite").option("header", "true").csv(s"$dir/c")
    val fromCsv = spark.read
      .option("header", "true").schema("user INT, item INT, ts_ms LONG").csv(s"$dir/c")
    assert(fromCsv.collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2))).toSet == expected)

    src.write.mode("overwrite").orc(s"$dir/o")
    val fromOrc = spark.read.orc(s"$dir/o")
    assert(fromOrc.collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2))).toSet == expected)
  }

  test("partitionBy write: readback scan prunes to the filtered partition") {
    val dir = Files.createTempDirectory("graft_part").toString
    val ev = graft.operators.Tables.events(spark, sfDir)
      .withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
    ev.write.mode("overwrite").partitionBy("day").parquet(dir)
    val day = ev.select(min(col("day"))).head.getString(0)
    val back = spark.read.parquet(dir).where(col("day") === day)
    assert(back.count() == ev.where(col("day") === day).count())
    // the day predicate must land in PartitionFilters (directory pruning),
    // not PushedFilters (row-group skipping after listing everything) —
    // the filter list prints even when empty, so match day INSIDE it
    val plan = back.queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*day".r.findFirstIn(plan).isDefined,
      s"day filter not applied at partition level:\n${plan.take(1200)}")
  }

  test("compaction: many small files -> byte-sized few, rows preserved, no-shuffle coalesce") {
    val tmp = Files.createTempDirectory("graft_compact").toString
    val small = s"$tmp/small"; val out = s"$tmp/compacted"
    // 64 tiny files
    Tables.table(spark, sfDir, "documents").repartition(64)
      .write.mode("overwrite").parquet(small)
    val fs = new org.apache.hadoop.fs.Path(small)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val inFiles = fs.listStatus(new org.apache.hadoop.fs.Path(small))
      .count(_.getPath.getName.startsWith("part-"))
    assert(inFiles == 64)
    val bytes = fs.getContentSummary(new org.apache.hadoop.fs.Path(small)).getLength
    val target = bytes / 3 + 1 // expect ~3 output files
    val outFiles = graft.operators.Compaction.compactParquet(spark, small, out, target)
    assert(outFiles <= 4 && outFiles >= 2, s"got $outFiles files")
    assert(spark.read.parquet(out).count() ==
      Tables.table(spark, sfDir, "documents").count())
  }

  test("watermark drops late events from the streaming windowed agg") {
    val sp = spark; import sp.implicits._
    implicit val sq = spark.sqlContext
    val ms = MemoryStream[(Long, Double)]
    val events = ms.toDF().toDF("ts_ms", "value")
      .select(timestamp_millis(col("ts_ms")).as("ts"), col("value"))
    val agg = events
      .withWatermark("ts", "0 seconds")
      .groupBy(window(col("ts"), "1 hour").as("w"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").cast("long").as("ws"), col("n"))
    val name = s"late_${System.nanoTime()}"
    val q = agg.writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append()).start()
    val H = 3600L * 1000
    // batch 1: two events in hour 0, one in hour 2 -> watermark to hour 2
    ms.addData((10L * 1000, 1.0), (20L * 1000, 1.0), (2 * H + 1000, 1.0))
    q.processAllAvailable()
    // batch 2: a LATE event back in hour 0 (watermark is already hour 2)
    // and one in hour 3 to advance/flush
    ms.addData((30L * 1000, 1.0), (3 * H + 1000, 1.0))
    q.processAllAvailable()
    ms.addData((5 * H, 1.0)) // push watermark so hour-2/3 windows flush
    q.processAllAvailable()
    q.stop()
    val byWindow = spark.table(name).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // hour-0 window closed with 2 events; the late third was DROPPED
    assert(byWindow(0L) == 2L, s"late event leaked into closed window: $byWindow")
    assert(byWindow(2 * 3600L) == 1L && byWindow(3 * 3600L) == 1L)
  }

  test("AQE re-plans a shuffle join to broadcast when the filtered side turns out tiny") {
    // the planner may NOT broadcast (threshold -1 — the honest setup
    // when planning-time stats can't be trusted); at RUNTIME the filter
    // leaves a handful of rows and AQE converts the sort-merge join to
    // a broadcast join via its OWN threshold
    // (spark.sql.adaptive.autoBroadcastJoinThreshold) — the re-plan
    // that saves the big-side shuffle at 100 TB. Assert on the final
    // adaptive plan.
    val prior = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val priorAqe = spark.conf.getOption("spark.sql.adaptive.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "1MB")
    try {
      val o = Tables.table(spark, sfDir, "orders")
        .where(col("o_totalprice") > 450000.0) // runtime-tiny side
        .select(col("o_orderkey"))
      val joined = Tables.table(spark, sfDir, "lineitem")
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .agg(count(lit(1)).as("n"))
      joined.collect() // executes -> adaptive plan finalizes
      val p = joined.queryExecution.executedPlan.toString
      assert(p.contains("AdaptiveSparkPlan isFinalPlan=true"), p.take(800))
      assert(p.contains("BroadcastHashJoin"),
        s"AQE should have converted the join to broadcast:\n${p.take(2000)}")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prior)
      priorAqe match {
        case Some(v) => spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", v)
        case None => spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
      }
    }
  }

  test("streaming checkpoint resume: second drain processes ONLY new files (exactly-once offsets)") {
    import java.nio.file.{Files => JFiles, Paths}
    import java.nio.file.attribute.FileTime
    val sp = spark; import sp.implicits._
    val srcDir = JFiles.createTempDirectory("graft_ckpt_src").toString
    val ckpt = JFiles.createTempDirectory("graft_ckpt").toString
    val sinkDir = JFiles.createTempDirectory("graft_ckpt_sink").toString
    def writeFile(rows: Seq[(Long, Long)], name: String, mtimeMs: Long): Unit = {
      val stage = JFiles.createTempDirectory("graft_ckpt_stage").toString
      rows.toDF("id", "v").coalesce(1).write.mode("overwrite").parquet(stage)
      val part = JFiles.list(Paths.get(stage)).toArray.map(_.asInstanceOf[java.nio.file.Path])
        .find(_.getFileName.toString.endsWith(".parquet")).get
      val target = Paths.get(srcDir, name)
      JFiles.copy(part, target)
      JFiles.setLastModifiedTime(target, FileTime.fromMillis(mtimeMs))
    }
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("v", org.apache.spark.sql.types.LongType)))
    def drain(): Seq[Long] = {
      val batches = scala.collection.mutable.ArrayBuffer[Long]()
      val q = spark.readStream.schema(schema).parquet(srcDir)
        .writeStream
        .option("checkpointLocation", ckpt)
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
          batches += batchId
          batch.write.mode("overwrite").parquet(s"$sinkDir/batch=$batchId")
          ()
        }
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      batches.toSeq
    }
    val now = System.currentTimeMillis()
    writeFile(Seq((1L, 10L), (2L, 20L)), "f1.parquet", now - 60000)
    val b1 = drain()
    // new file arrives; SAME checkpoint -> only the delta is processed
    writeFile(Seq((3L, 30L)), "f2.parquet", now)
    val b2 = drain()
    assert(b2.nonEmpty && b2.forall(b => !b1.contains(b)),
      s"resume must continue batch ids, not replay: first=$b1 second=$b2")
    val all = spark.read.parquet(sinkDir).select("id", "v").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(all == Map(1L -> 10L, 2L -> 20L, 3L -> 30L),
      s"exactly-once union of both drains expected, got $all")
  }
}
