package graft

import java.nio.file.{Files, Paths}
import java.nio.file.attribute.FileTime

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

import graft.operators.{Cooccurrence, Sampling}
import graft.streaming.StreamingOps

/**
 * Refund-cycle parity queries (round-7; SURVEY §7.4.1, reference
 * FeedbackSource.java:16-69 + ItemInteractionCounterTwoInputStreamOperator
 * .java:94-116): run the full item-cut → user-reservoir → refund machinery
 * with TIGHT cuts chosen so the refund path fires for every sampled
 * interaction and is still exactly SQL-expressible (kMax = 0 makes the
 * reservoir's reject-and-refund branch deterministic — see
 * Sampling.itemCutFlags). Two forms share one DuckDB oracle:
 *
 *  - cooc_item_cut_refunds: the batch window loop (refunds fold between
 *    event-time windows — the repo's exact-semantics contract);
 *  - stream_item_cut_refunds: the same step driven through Structured
 *    Streaming foreachBatch with ONE FILE PER WINDOW, so refunds cross
 *    real microbatch boundaries. Equality with the batch oracle proves
 *    the streaming refund fold happens at the right boundary — the
 *    divergence the round-6 verdict asked to pin down is zero when the
 *    microbatch partitioning matches the window partitioning.
 */
object ExtQueries22 {

  private val WindowMs = 7L * 86400000L // weekly: ~5 windows on the testdata
  private val FMax = 20 // binds on >half the (item, week) groups at sf0.01
  private val Seed = 42L

  /** Shared output shape: every interaction with its sample flag. */
  private def flagsOut(flags: DataFrame): DataFrame =
    flags
      .select(
        expr(s"tsMs DIV $WindowMs").as("wnd"),
        col("item"), col("user"), col("tsMs").as("ts_ms"),
        when(col("sample"), 1).otherwise(0).as("sampled"))
      .orderBy(col("wnd"), col("item"), col("ts_ms"), col("user"), col("sampled"))

  /**
   * Streaming form: stage one parquet file per event-time window (mtime
   * ascending in window order, so the file monitor forwards them oldest
   * first — reference ContinuousFileMonitoringFunction.java:266-294),
   * then drain with maxFilesPerTrigger=1: each microbatch IS one window,
   * and the refund fold carries item counts across REAL microbatch
   * boundaries through the driver-held state tables.
   */
  private def streamItemCutRefunds(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val inter = Cooccurrence.interactions(s, dir)
      .withColumn("wnd", (unix_millis(col("ts")) / WindowMs).cast("long"))
    val windows = inter.select($"wnd").distinct().as[Long].collect().sorted
    val stageDir = Files.createTempDirectory("stream_refunds_").toString
    try {
      windows.zipWithIndex.foreach { case (w, i) =>
        val tmp = s"$stageDir/_tmp"
        inter.where(col("wnd") === w).select(col("user"), col("item"), col("ts"))
          .coalesce(1).write.mode("overwrite").parquet(tmp)
        val part = Files.list(Paths.get(tmp))
          .filter(_.getFileName.toString.endsWith(".parquet")).findFirst
          .orElseThrow(() => new IllegalStateException(s"no part file in $tmp"))
        val tgt = Paths.get(stageDir, f"w$i%05d.parquet")
        Files.move(part, tgt)
        Files.setLastModifiedTime(tgt, FileTime.fromMillis(1700000000000L + i * 60000L))
        Files.list(Paths.get(tmp)).forEach(p => Files.delete(p))
        Files.delete(Paths.get(tmp))
      }
      var itemState = s.emptyDataset[Sampling.ItemCount]
      var userState = s.emptyDataset[Sampling.UserState]
      val batches = scala.collection.mutable.ArrayBuffer[DataFrame]()
      val q = StreamingOps.eventsStream(s, stageDir, glob = "*.parquet")
        .writeStream
        .outputMode(OutputMode.Update())
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (b: DataFrame, batchId: Long) =>
          val evs = b.select(col("user").cast("int").as("user"),
            col("item").cast("int").as("item"),
            unix_millis(col("ts")).as("ts")).as[Sampling.Interaction]
          val (flags, is, us) = Sampling.processWindowFlags(
            evs, itemState, userState, FMax, kMax = 0, Seed, batchId)
          itemState = is
          userState = us
          // result-sized (one row per interaction in the file); checkpoint
          // cuts lineage back to the window step's own checkpoint
          batches += flags.toDF().localCheckpoint(true)
          ()
        }
        .start()
      q.awaitTermination()
      require(batches.size == windows.length,
        s"stream_item_cut_refunds: ${windows.length} staged files must drain as " +
          s"${windows.length} microbatches (one window each), saw ${batches.size}")
      flagsOut(batches.reduce(_ unionAll _))
    } finally {
      // staged input is consumed (flags are checkpointed) — remove it
      val d = Paths.get(stageDir)
      if (Files.exists(d)) {
        Files.walk(d).sorted(java.util.Comparator.reverseOrder())
          .forEach(p => Files.deleteIfExists(p))
      }
    }
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // batch window loop: refunds fold between event-time windows
    "cooc_item_cut_refunds" -> ((s, dir) =>
      flagsOut(Sampling.itemCutFlags(
        Cooccurrence.interactions(s, dir), FMax, kMax = 0, Seed, WindowMs))),

    // streaming foreachBatch: refunds fold between real microbatches
    "stream_item_cut_refunds" -> ((s, dir) => streamItemCutRefunds(s, dir))
  )

  /** kMax = 0 refunds every sampled slot before the next window, so the
    * exact machine semantics reduce to first-fMax per (item, window) in
    * (ts, user) fold order — any refund timing bug breaks later windows. */
  private val refundsOracle =
    s"""WITH ev AS (
       |  SELECT user_id AS usr,
       |         CAST(json_extract_string(props, 'k') AS INT) AS item,
       |         epoch_ms(ts) AS ts_ms
       |  FROM events),
       |ranked AS (
       |  SELECT ts_ms // $WindowMs AS wnd, item, usr, ts_ms,
       |         ROW_NUMBER() OVER (PARTITION BY item, ts_ms // $WindowMs
       |                            ORDER BY ts_ms, usr) AS rn
       |  FROM ev)
       |SELECT wnd, item, usr AS "user", ts_ms,
       |       CASE WHEN rn <= $FMax THEN 1 ELSE 0 END AS sampled
       |FROM ranked
       |ORDER BY wnd, item, ts_ms, usr, sampled""".stripMargin

  def oracleSql: Map[String, String] = Map(
    "cooc_item_cut_refunds" -> refundsOracle,
    "stream_item_cut_refunds" -> refundsOracle
  )
}
