package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Tables

/**
 * Round-7 wave: rolling engagement — the 7-day rolling MAU / daily DAU
 * / stickiness report. Rolling DISTINCT counts don't fold into a frame
 * window (distinct isn't subtractable), so the rolling set is built
 * with Spark's SLIDING event-time windows: every event lands in 7
 * overlapping (7-day, 1-day-slide) windows and each window takes one
 * distinct-count — shuffle volume is 7× the per-(user, day) DEDUPED
 * rows, not 7× raw events. Stickiness = DAU/MAU on the ppm grid.
 */
object ExtQueries36 {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    "rolling_mau" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      // dedup FIRST: (user, day) rows drive both sides
      val userDays = ev.select(col("user_id"), to_date(col("ts")).as("d")).distinct()
      val daily = userDays.groupBy(col("d"))
        .agg(count(lit(1)).as("dau"))
      val rolling = userDays
        .groupBy(window(col("d").cast("timestamp"), "7 days", "1 day").as("w"),
          col("user_id"))
        .agg(lit(1).as("one"))
        .groupBy(col("w"))
        .agg(count(lit(1)).as("mau7"))
        .select(date_format(expr("w.end - INTERVAL 1 DAY"), "yyyy-MM-dd").as("day"),
          col("mau7"))
      daily
        .select(date_format(col("d"), "yyyy-MM-dd").as("day"), col("dau"))
        .join(rolling, "day")
        .select(col("day"), col("dau"), col("mau7"),
          expr("(dau * 1000000) DIV mau7").as("stickiness_ppm"))
        .orderBy(col("day"))
    })
  )

  def oracleSql: Map[String, String] = Map(

    "rolling_mau" ->
      """WITH ud AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
        |daily AS (SELECT d, COUNT(*) AS dau FROM ud GROUP BY d),
        |mau AS (
        |  SELECT a.d, COUNT(DISTINCT b.user_id) AS mau7
        |  FROM daily a JOIN ud b ON b.d BETWEEN a.d - 6 AND a.d
        |  GROUP BY a.d)
        |SELECT strftime(daily.d, '%Y-%m-%d') AS day, CAST(dau AS BIGINT) AS dau,
        |       CAST(mau7 AS BIGINT) AS mau7,
        |       (CAST(dau AS BIGINT) * 1000000) // CAST(mau7 AS BIGINT) AS stickiness_ppm
        |FROM daily JOIN mau ON daily.d = mau.d
        |ORDER BY day""".stripMargin
  )
}
