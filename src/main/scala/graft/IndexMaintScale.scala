package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Tables}
import graft.streaming.IndexMaintenance

/**
 * Measurement main for the streaming index-maintenance fix (round 12):
 * per-batch merge cost must be INDEPENDENT OF BATCH COUNT. The corpus is
 * split into N equal ingest batches and folded into the index twice:
 *
 *  - mode `maint`: [[IndexMaintenance]] — per-batch persisted fp shard +
 *    delta log; standing state is scanned, never re-materialized.
 *  - mode `naive`: the r10/r11 foreachBatch fold, reproduced verbatim —
 *    the accumulated fingerprint union is re-localCheckpointed every
 *    batch, so batch b re-materializes all b prior batches' fps
 *    (quadratic total work over the run).
 *
 * Both modes produce the identical final index (asserted). One JSON line
 * with per-batch walls: under `naive` the wall grows with the batch
 * index; under `maint` it stays flat.
 *
 * Env: SPARK_GRAFT_SF_DIR (corpus), SPARK_GRAFT_BATCHES (default 24),
 * SPARK_GRAFT_MODE (maint | naive | both, default both).
 */
object IndexMaintScale {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val batches = sys.env.getOrElse("SPARK_GRAFT_BATCHES", "24").toInt
    val mode = sys.env.getOrElse("SPARK_GRAFT_MODE", "both")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // scale-proxy cell: cap the stats-based broadcast threshold so the
    // standing INDEX no longer auto-broadcasts (as it cannot at 100 TB)
    // while structurally-small sides still can — exposes which shapes
    // re-shuffle the index per batch once it outgrows a broadcast
    sys.env.get("SPARK_GRAFT_BROADCAST_KB").foreach { kb =>
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", (kb.toLong * 1024).toString)
      spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", (kb.toLong * 1024).toString)
    }

    val docs = Tables.table(spark, sfDir, "documents")
      .select("doc_id", "text").localCheckpoint(true)
    def chunk(b: Int): DataFrame =
      docs.where(pmod(col("doc_id"), lit(batches)) === b)

    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    // total shuffle WRITE bytes per run (task-level sums — see
    // ShuffleProbe for why StageInfo.taskMetrics is not usable): the r13
    // fold/refresh rewrite claims the per-batch O(index) exchanges are
    // gone, and this is the number that shows it
    val shuffleWrite = new java.util.concurrent.atomic.AtomicLong()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (te.taskMetrics != null)
          shuffleWrite.addAndGet(te.taskMetrics.shuffleWriteMetrics.bytesWritten)
    })
    def shuffleDelta(f: => Unit): Long = {
      org.apache.spark.sql.graftbridge.ListenerBridge.waitUntilEmpty(spark.sparkContext)
      val s0 = shuffleWrite.get()
      f
      org.apache.spark.sql.graftbridge.ListenerBridge.waitUntilEmpty(spark.sparkContext)
      shuffleWrite.get() - s0
    }
    // RETAINED executor storage (cached/checkpointed RDD blocks) — the
    // state a mode carries INTO the next batch. The baseline (the docs
    // checkpoint above + suite noise) is subtracted per-run; the
    // quantity that must stay flat is the growth across batches.
    def storageMb(): Double =
      spark.sparkContext.getRDDStorageInfo.map(_.memSize).sum / 1e6

    // optional compaction cadence for the maint mode (default: the
    // class default, which never triggers within these horizons)
    val compactEvery = sys.env.get("SPARK_GRAFT_COMPACT_EVERY").map(_.toInt)

    def runMaint(): (Seq[Double], Seq[Double], Seq[Long], Set[(Long, Long)]) = {
      val root = java.nio.file.Files.createTempDirectory("maint_scale").toString
      val maint = compactEvery match {
        case Some(k) => new IndexMaintenance(spark, root,
          IndexMaintenance.Simhash(3), compactEvery = k)
        case None => new IndexMaintenance(spark, root, 3)
      }
      val ws = scala.collection.mutable.ArrayBuffer.empty[(Double, Double, Long)]
      (0 until batches).foreach { b =>
        var w = 0.0
        val sh = shuffleDelta { w = timed(maint.processBatch(b, chunk(b))) }
        ws += ((w, storageMb(), sh))
      }
      (ws.map(_._1).toSeq, ws.map(_._2).toSeq, ws.map(_._3).toSeq,
        maint.currentIndex().collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet)
    }

    def runNaive(): (Seq[Double], Seq[Double], Seq[Long], Set[(Long, Long)]) = {
      var comps = spark.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](),
        new org.apache.spark.sql.types.StructType()
          .add("node", org.apache.spark.sql.types.LongType)
          .add("comp", org.apache.spark.sql.types.LongType))
      var fpsSoFar: Option[DataFrame] = None
      val ws = scala.collection.mutable.ArrayBuffer.empty[(Double, Double, Long)]
      (0 until batches).foreach { b =>
        var w = 0.0
        val sh = shuffleDelta {
          w = timed {
            val newFps = Dedup.simhashFingerprints(chunk(b))
              .withColumn("inc", lit(true)).localCheckpoint(true)
            val all = fpsSoFar.map(_.unionByName(newFps)).getOrElse(newFps)
            comps = Dedup.simhashComponentsRefreshFromFps(all, 3, comps)
            fpsSoFar = Some(all.withColumn("inc", lit(false)).localCheckpoint(true))
          }
        }
        ws += ((w, storageMb(), sh))
      }
      (ws.map(_._1).toSeq, ws.map(_._2).toSeq, ws.map(_._3).toSeq,
        comps.collect().map(r => (r.getLong(0), r.getLong(1))).toSet)
    }

    val full = Dedup.simhashComponents(docs, 3).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

    def report(tag: String, walls: Seq[Double], storage: Seq[Double],
        shuffle: Seq[Long], idx: Set[(Long, Long)]): Unit = {
      require(idx == full, s"$tag index diverged from the full rebuild")
      def fmt(xs: Seq[Double]) = xs.map(x => f"$x%.3f").mkString(",")
      val firstQ = walls.take(batches / 4)
      val lastQ = walls.takeRight(batches / 4)
      def med(xs: Seq[Double]) = xs.sorted.apply((xs.size - 1) / 2)
      println(
        s"""{"metric":"index_maint_scale","mode":"$tag","sf":"$sfDir",""" +
        s""""batches":$batches,"walls":[${fmt(walls)}],""" +
        s""""first_quartile_median":${f"${med(firstQ)}%.3f"},""" +
        s""""last_quartile_median":${f"${med(lastQ)}%.3f"},""" +
        s""""total":${f"${walls.sum}%.2f"},""" +
        s""""storage_mb":[${fmt(storage)}],""" +
        s""""storage_growth_mb":${f"${storage.last - storage.head}%.3f"},""" +
        s""""shuffle_write_mb":[${fmt(shuffle.map(_ / 1e6))}],""" +
        s""""shuffle_write_total_mb":${f"${shuffle.sum / 1e6}%.1f"}}""")
    }

    if (mode == "maint" || mode == "both") {
      val (w, s, sh, idx) = runMaint(); report("maint", w, s, sh, idx)
    }
    if (mode == "naive" || mode == "both") {
      val (w, s, sh, idx) = runNaive(); report("naive", w, s, sh, idx)
    }
    spark.stop()
  }
}
