package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType, StringType, StructField, StructType}

/**
 * Round-7 wave: streaming statistics — analytics that usually get
 * recomputed from scratch, maintained incrementally instead.
 *
 *  - stream_trend_merge: the per-type regression slope maintained over
 *    the stream. Regression sufficient statistics are NOT mergeable
 *    from partial DAILY counts (a day can span microbatches), so the
 *    standing state is the (type, day, count) table — each microbatch's
 *    partial daily counts merge in (mv_merge discipline, union +
 *    re-aggregate of keyed partials, never a rescan), and the slope is
 *    computed from the standing table at the end with the SAME
 *    integer-LS helper as the batch query. Oracle = identical SQL to
 *    trend_slope_by_type: the merge must be exactly invisible.
 *  - stream_daily_percentiles: exact daily value quantiles over the
 *    stream via MERGEABLE HISTOGRAMS — the streaming windowed agg
 *    counts (day, centi-quantized value) cells (Append mode, 0-delay
 *    watermark, closed days only), and p50/p95 are exact rank
 *    statistics over each day's histogram (the gap_stats discipline:
 *    integer order statistics, no float interpolation). State per day
 *    is bounded by the value domain, not the event count.
 */
object ExtQueries33 {

  /** The streaming regression merge, glob-parameterized so the spec can
    * drive it across genuinely separate microbatches (one per file). */
  private[graft] def trendMerge(s: SparkSession, dir: String, glob: String): DataFrame = {
    var mv = s.createDataFrame(
      s.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(
        StructField("event_type", StringType),
        StructField("x", IntegerType),
        StructField("y", LongType))))
    val q = graft.streaming.StreamingOps.eventsStream(s, dir, glob)
      .writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        mv = mv.unionAll(ExtQueries31.dailyCounts(batch))
          .groupBy(col("event_type"), col("x"))
          .agg(sum(col("y")).as("y"))
          .localCheckpoint(true) // bound lineage across batches
        ()
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    ExtQueries31.slopeFromDaily(mv)
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    "stream_trend_merge" -> ((s, dir) => trendMerge(s, dir, "events.parquet")),

    "stream_daily_percentiles" -> ((s, dir) => {
      val hist = graft.streaming.StreamingOps.withStreamWidth(s, dir) {
        val ev = graft.streaming.StreamingOps.eventsStream(s, dir)
        graft.streaming.StreamingOps.runToMemory(
          ev.withWatermark("ts", "0 seconds")
            .groupBy(window(col("ts"), "1 day").as("w"),
              expr("CAST(FLOOR(value * 100) AS BIGINT)").as("v_centi"))
            .agg(count(lit(1)).as("cnt"))
            .select(date_format(col("w.start"), "yyyy-MM-dd").as("day"),
              col("v_centi"), col("cnt")),
          s"dperc_${System.nanoTime()}",
          org.apache.spark.sql.streaming.OutputMode.Append())
      }
      // exact rank stats over each closed day's value histogram: the
      // scan is per-day over DISTINCT centi values, never raw events
      val wDay = Window.partitionBy(col("day"))
      val wCum = wDay.orderBy(col("v_centi"))
        .rowsBetween(Window.unboundedPreceding, 0)
      hist
        .withColumn("n_day", sum(col("cnt")).over(wDay))
        .withColumn("cum", sum(col("cnt")).over(wCum))
        .groupBy(col("day"))
        .agg(max(col("n_day")).as("n_day"),
          min(when(col("cum") * 2 >= col("n_day"), col("v_centi"))).as("p50_centi"),
          min(when(col("cum") * 20 >= col("n_day") * 19, col("v_centi"))).as("p95_centi"))
        .orderBy(col("day"))
    })
  )

  def oracleSql: Map[String, String] = Map(

    // the streaming merge must be exactly invisible
    "stream_trend_merge" -> ExtQueries31.oracleSql("trend_slope_by_type"),

    "stream_daily_percentiles" ->
      """WITH closed AS (
        |  SELECT strftime(ts, '%Y-%m-%d') AS day,
        |         CAST(FLOOR(value * 100) AS BIGINT) AS v_centi
        |  FROM events
        |  WHERE strftime(ts, '%Y-%m-%d') < (SELECT strftime(MAX(ts), '%Y-%m-%d') FROM events)),
        |h AS (SELECT day, v_centi, COUNT(*) AS cnt FROM closed GROUP BY 1, 2),
        |c AS (SELECT day, v_centi, cnt,
        |             SUM(cnt) OVER (PARTITION BY day) AS n_day,
        |             SUM(cnt) OVER (PARTITION BY day ORDER BY v_centi
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |      FROM h)
        |SELECT day, CAST(MAX(n_day) AS BIGINT) AS n_day,
        |       MIN(CASE WHEN cum * 2 >= n_day THEN v_centi END) AS p50_centi,
        |       MIN(CASE WHEN cum * 20 >= n_day * 19 THEN v_centi END) AS p95_centi
        |FROM c GROUP BY day ORDER BY day""".stripMargin
  )
}
