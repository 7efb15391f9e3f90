package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{IvfIndex, PqIndex}
import graft.streaming.{AnnMaintenance, IvfPqMaintenance}

/**
 * Measurement main for the streaming ANN maintenance loop
 * ([[graft.streaming.AnnMaintenance]]) — the ANN twin of
 * [[IndexMaintScale]], run under the same decade protocol (r14 verdict
 * item 6): split the embeddings corpus into N equal ingest batches, fold
 * them into a standing IVF index, and record per batch
 *
 *  - wall seconds (must stay FLAT in the batch index: the fold is
 *    O(batch) assignment against frozen centroids + one shard write +
 *    one marker; nothing scans the standing state except compaction),
 *  - total shuffle-write bytes (task-level sums),
 *  - retained executor storage (cached/checkpointed blocks — the
 *    maintenance loop holds NO driver/executor state between batches;
 *    its state is the filesystem),
 *  - `meta/` marker-file count (r14 verdict item 1: markers ROLL UP at
 *    compaction, so under `compact` mode the count is bounded by
 *    compactEvery forever; under `nocompact` it grows one per batch but
 *    is LISTED only once, at instance startup),
 *  - retained bytes under the index root (snapshot-plus-tail vs
 *    one-dir-per-batch storage shape).
 *
 * After the drain the final index is asserted byte-equal (as a
 * (vec_id, cluster) set) to the frozen-centroid batch rebuild — the
 * same contract the `stream_ann_index_refresh` oracle replays — and a
 * FRESH instance is constructed over the drained root to time the
 * resume state-load (one `meta/` + `basemeta/` listing; the quantity
 * the marker rollup bounds).
 *
 * One JSON line per mode. Env: SPARK_GRAFT_SF_DIR (corpus),
 * SPARK_GRAFT_BATCHES (default 24), SPARK_GRAFT_MODE
 * (compact | nocompact | both, default both), SPARK_GRAFT_COMPACT_EVERY
 * (cadence for `compact` mode, default 8), SPARK_GRAFT_NLISTS /
 * SPARK_GRAFT_ITERS (index params, defaults 16 / 3),
 * SPARK_GRAFT_KIND=ivf|ivfpq|ivfpqres|sq (which maintenance loop: the IVF
 * assignment index, the full IVFADC single table — batch 0 then
 * additionally fits the PQ codebooks and every later batch also
 * encodes — or the SQ8 code table; default ivf), and
 * SPARK_GRAFT_REFIT_AT (r16: an IN-STREAM REFIT point for any kind —
 * at that batch the loop retrains on the corpus-so-far and commits the
 * re-encoded corpus as a snapshot; the refit batch's wall is reported
 * separately as the priced amortized-rebuild cost, the rebuild contract
 * switches to models fit on chunks 0..refitAt, and post-refit batches
 * must return to the flat O(batch) regime; default -1 = none; for
 * kind=graph, SPARK_GRAFT_NLISTS2 re-sizes the list count at the refit
 * — the sqrt(N) growth rule — via a fresh instance over the same root,
 * and the rebuild contract moves to the re-sized geometry), and
 * SPARK_GRAFT_DELETE_EVERY (r16: every k-th batch commits a TOMBSTONE
 * batch instead of ingest — deleting a slice of the previous chunk —
 * so the decade protocol covers the delete verb: per-batch walls stay
 * flat, the drained index must equal the rebuild over the KEPT corpus;
 * default -1 = none; mutually exclusive with REFIT_AT).
 */
object AnnMaintScale {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val batches = sys.env.getOrElse("SPARK_GRAFT_BATCHES", "24").toInt
    val mode = sys.env.getOrElse("SPARK_GRAFT_MODE", "both")
    val compactEvery = sys.env.getOrElse("SPARK_GRAFT_COMPACT_EVERY", "8").toInt
    val nLists = sys.env.getOrElse("SPARK_GRAFT_NLISTS", "16").toInt
    val iters = sys.env.getOrElse("SPARK_GRAFT_ITERS", "3").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val embs = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select("vec_id", "embedding").localCheckpoint(true)
    val nVecs = embs.count()
    def chunk(b: Int): DataFrame =
      embs.where(pmod(col("vec_id"), lit(batches)) === b)

    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
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
    def storageMb(): Double =
      spark.sparkContext.getRDDStorageInfo.map(_.memSize).sum / 1e6
    val fs = new Path("/").getFileSystem(spark.sparkContext.hadoopConfiguration)
    def fileCount(dir: Path): Int =
      if (fs.exists(dir)) fs.listStatus(dir).length else 0
    def bytesUnder(dir: Path): Long =
      if (fs.exists(dir)) fs.getContentSummary(dir).getLength else 0L

    val kind = sys.env.getOrElse("SPARK_GRAFT_KIND", "ivf")
    val refitAt = sys.env.getOrElse("SPARK_GRAFT_REFIT_AT", "-1").toInt
    // r16: the graph kind's refit may RE-SIZE the list count — the
    // sqrt(N) growth rule applied at the periodic refit, which is the
    // documented remedy for fixed-geometry reverse-volume drift (the
    // per-batch reverse candidate volume is |B|·N·nProbe/nLists, so a
    // bootstrap-sized nLists drifts linearly as the corpus grows)
    val nLists2 = sys.env.getOrElse("SPARK_GRAFT_NLISTS2", nLists.toString).toInt
    require(nLists2 == nLists || (kind == "graph" && refitAt >= 0),
      "SPARK_GRAFT_NLISTS2 re-sizes the graph kind's refit only")

    // r16: a TOMBSTONE schedule — every deleteEvery-th batch is a DELETE
    // batch instead of ingest (its chunk is never fed; it deletes the
    // vec_id % 3 == 0 slice of the PREVIOUS batch's chunk). Exercises
    // the delete verb under the same decade protocol: per-batch wall
    // must stay flat (a delete is one key-shard write + marker; its
    // cost shows up only as the compaction fold's anti-join).
    val deleteEvery = sys.env.getOrElse("SPARK_GRAFT_DELETE_EVERY", "-1").toInt
    require(deleteEvery != 0 && deleteEvery != 1,
      "SPARK_GRAFT_DELETE_EVERY must be >= 2 (or -1 = none)")
    require(deleteEvery < 0 || refitAt < 0,
      "run the delete and refit cells separately")
    def isDeleteBatch(b: Int): Boolean =
      deleteEvery > 0 && b > 0 && b % deleteEvery == deleteEvery - 1
    val delBatches = (0 until batches).filter(isDeleteBatch)
    def delPred(b: Int) =
      pmod(col("vec_id"), lit(batches)) === (b - 1) && col("vec_id") % 3 === 0
    // the corpus the drained index must equal: chunks of delete batches
    // were never ingested, deleted slices are gone
    val kept =
      if (delBatches.isEmpty) embs
      else embs.where(
        !pmod(col("vec_id"), lit(batches)).isin(delBatches.map(_.toLong): _*) &&
          !delBatches.map(delPred).reduce(_ || _))

    // the rebuild contract: models fit on the bootstrap batch alone —
    // or, with a refit point, on chunks 0..refitAt (the corpus-so-far
    // the refit retrained on) — the whole kept corpus assigned/encoded
    // against them
    val fitShard =
      if (refitAt < 0) chunk(0)
      else embs.where(pmod(col("vec_id"), lit(batches)) <= refitAt)
    require(kind != "graph" || deleteEvery < 0,
      "graph deletes are gate-oracled (mask semantics: no refill until " +
        "refit, so the drained graph is not a plain kept-corpus rebuild)")
    lazy val bootCents = IvfIndex.buildIndex(fitShard,
      if (kind == "graph" && refitAt >= 0) nLists2 else nLists, iters)._1
    val expect: Set[(Long, Long)] = kind match {
      case "graph" =>
        // the full frozen-centroid kNN-graph rebuild's (node, dst) set —
        // the most expensive ANN read, which is the point: the loop
        // below must reach the same graph in O(batch) steps. Data-sized
        // |Q| -> the shuffled-join regime (broadcastProbes=false), per
        // the knnJoinFrom scale contract
        IvfIndex.knnJoinFrom(bootCents,
            IvfIndex.assignBatch(embs, bootCents), lit(true), 5, 4,
            broadcastProbes = false)
          .select("query_id", "vec_id").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
      case "sq" =>
        val (stats, _) = graft.operators.SqIndex.buildSq(fitShard)
        graft.operators.SqIndex.encodeBatch(kept, stats)
          .select("vec_id", "recon2").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
      case _ =>
        IvfIndex.assignBatch(kept, bootCents)
          .select("vec_id", "cluster").collect()
          .map(r => (r.getLong(0), r.getInt(1).toLong)).toSet
    }

    def run(tag: String, every: Int): Unit = {
      val root = java.nio.file.Files.createTempDirectory(s"ann_maint_$tag").toString
      val (process, refit, delete, drained, committed) = kind match {
        case "graph" =>
          var m = new graft.streaming.KnnGraphMaintenance(spark, root,
            nLists, iters, k = 5, nProbe = 4, compactEvery = every)
          def proc(b: Long, df: DataFrame): Unit = m.processBatch(b, df)
          def ref(b: Long, df: DataFrame): Unit = {
            // the RE-SIZE verb: hand the root to a new instance at the
            // grown list count (single-writer handover); its refit
            // publishes the new geometry and swaps the routing watermark
            if (nLists2 != nLists)
              m = new graft.streaming.KnnGraphMaintenance(spark, root,
                nLists2, iters, k = 5, nProbe = 4, compactEvery = every)
            m.refitBatch(b, df)
          }
          def noVerb(b: Long, df: DataFrame): Unit =
            throw new UnsupportedOperationException(
              "graph kind: ingest+refit only")
          (proc _, ref _, noVerb _, () => m.currentGraph(),
            () => new graft.streaming.KnnGraphMaintenance(spark, root,
              if (refitAt >= 0) nLists2 else nLists, iters, k = 5,
              nProbe = 4, compactEvery = every).committedCount)
        case "ivfpq" =>
          val m = new IvfPqMaintenance(spark, root, nLists, iters,
            compactEvery = every)
          (m.processBatch _, m.refitBatch _, m.deleteBatch _,
            () => m.currentTable(),
            () => new IvfPqMaintenance(spark, root, nLists, iters,
              compactEvery = every).committedCount)
        case "ivfpqres" =>
          val m = new IvfPqMaintenance(spark, root, nLists, iters,
            compactEvery = every, residual = true)
          (m.processBatch _, m.refitBatch _, m.deleteBatch _,
            () => m.currentTable(),
            () => new IvfPqMaintenance(spark, root, nLists, iters,
              compactEvery = every, residual = true).committedCount)
        case "sq" =>
          val m = new graft.streaming.SqMaintenance(spark, root,
            compactEvery = every)
          (m.processBatch _, m.refitBatch _, m.deleteBatch _,
            () => m.currentCodes(),
            () => new graft.streaming.SqMaintenance(spark, root,
              compactEvery = every).committedCount)
        case _ =>
          val m = new AnnMaintenance(spark, root, nLists, iters, every)
          (m.processBatch _, m.refitBatch _, m.deleteBatch _,
            () => m.currentIndex(),
            () => new AnnMaintenance(spark, root, nLists, iters,
              every).committedCount)
      }
      val ws = scala.collection.mutable.ArrayBuffer.empty[(Double, Double, Long, Int)]
      var refitWall = -1.0
      (0 until batches).foreach { b =>
        var w = 0.0
        val sh = shuffleDelta {
          w = timed {
            if (b == refitAt)
              refit(b, embs.where(pmod(col("vec_id"), lit(batches)) <= b))
            else if (isDeleteBatch(b))
              delete(b, embs.where(delPred(b)).select("vec_id"))
            else process(b, chunk(b))
          }
        }
        if (b == refitAt) refitWall = w
        ws += ((w, storageMb(), sh, fileCount(new Path(s"$root/meta"))))
      }
      val got: Set[(Long, Long)] =
        if (kind == "graph")
          drained().select(col("node"), col("dst"))
            .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        else {
          val keyCol = if (kind == "sq") "recon2" else "cluster"
          drained().select(col("vec_id"), col(keyCol).cast("long"))
            .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        }
      require(got == expect, s"$tag drained index diverged from the batch rebuild")
      // the ivfpq table's codes must also equal the frozen-books encode
      if (kind == "ivfpq") {
        val (books, _) = PqIndex.buildPq(fitShard, 8, 16, 2)
        val expCodes = PqIndex.encodeBatch(kept, books)
          .select("vec_id", "code_0").collect()
          .map(r => (r.getLong(0), r.getInt(1))).toSet
        val gotCodes = drained().select("vec_id", "code_0").collect()
          .map(r => (r.getLong(0), r.getInt(1))).toSet
        require(gotCodes == expCodes, s"$tag drained codes diverged")
      }
      // ...and the residual table's codes the frozen residual-books encode
      if (kind == "ivfpqres") {
        val assignedFit = IvfIndex.assignBatch(fitShard, bootCents)
        val (books, _) = PqIndex.buildResPq(assignedFit, bootCents, 8, 16, 2)
        val expCodes = PqIndex.encodeResBatch(
            IvfIndex.assignBatch(kept, bootCents), bootCents, books)
          .select("vec_id", "code_0").collect()
          .map(r => (r.getLong(0), r.getInt(1))).toSet
        val gotCodes = drained().select("vec_id", "code_0").collect()
          .map(r => (r.getLong(0), r.getInt(1))).toSet
        require(gotCodes == expCodes, s"$tag drained residual codes diverged")
      }
      // resume cost: a fresh instance's one-time state load over the
      // drained root (this is what the marker rollup keeps bounded)
      var resumeS = 0.0
      resumeS = timed { require(committed() == batches.toLong) }
      // the refit batch is a PRICED rebuild, not part of the flat
      // O(batch) regime — report it separately, keep the quartile
      // medians over the steady-state batches
      val walls = ws.map(_._1).toSeq
      val steady = walls.zipWithIndex.collect {
        case (w, i) if i != refitAt && !isDeleteBatch(i) => w
      }
      def fmt(xs: Seq[Double]) = xs.map(x => f"$x%.3f").mkString(",")
      def med(xs: Seq[Double]) = xs.sorted.apply((xs.size - 1) / 2)
      val q = math.max(1, batches / 4)
      println(
        s"""{"metric":"ann_maint_scale","kind":"$kind","mode":"$tag","sf":"$sfDir","n_vecs":$nVecs,""" +
        s""""batches":$batches,"compact_every":$every,"n_lists":$nLists,""" +
        s""""n_lists2":$nLists2,""" +
        s""""refit_at":$refitAt,"refit_wall_s":${f"$refitWall%.3f"},""" +
        s""""delete_every":$deleteEvery,"n_delete_batches":${delBatches.size},""" +
        s""""walls":[${fmt(walls)}],""" +
        s""""first_quartile_median":${f"${med(steady.take(q))}%.3f"},""" +
        s""""last_quartile_median":${f"${med(steady.takeRight(q))}%.3f"},""" +
        s""""total":${f"${walls.sum}%.2f"},""" +
        s""""storage_mb":[${fmt(ws.map(_._2).toSeq)}],""" +
        s""""storage_growth_mb":${f"${ws.last._2 - ws.head._2}%.3f"},""" +
        s""""shuffle_write_total_mb":${f"${ws.map(_._3).sum / 1e6}%.1f"},""" +
        s""""meta_files":[${ws.map(_._4).mkString(",")}],""" +
        s""""meta_files_final":${ws.last._4},""" +
        s""""shard_dirs_final":${fileCount(new Path(kind match {
          case "ivf" => s"$root/assign"
          case "graph" => s"$root/graph/edges"
          case _ => s"$root/codes"
        }))},""" +
        s""""root_mb_final":${f"${bytesUnder(new Path(root)) / 1e6}%.1f"},""" +
        s""""resume_state_load_s":${f"$resumeS%.3f"}}""")
    }

    if (mode == "compact" || mode == "both") run("compact", compactEvery)
    if (mode == "nocompact" || mode == "both")
      run("nocompact", Int.MaxValue / 2)
    spark.stop()
  }
}
