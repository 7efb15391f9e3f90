package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{PortableHash, Tables}

/**
 * Round-7 wave: product-analytics compositions — each combines two
 * already-oracled primitives into the report teams actually run.
 * Integer-grid discipline throughout (ppt/ppm via integer DIV on
 * non-negative operands only).
 *
 *  - anomaly_seasonal_ratio: seasonal-naive volume monitoring — each
 *    (type, day) count as a ratio (ppt) to that type's day-of-week
 *    mean; flags outside [0.5x, 2x]. The EWMA chart's complement for
 *    weekly-periodic streams; runs on day-aggregated rows.
 *  - session_funnel: the view→click→purchase funnel WITHIN a single
 *    session (30-min gap rule) — strict in-session ordering, counted
 *    over sessions, not users.
 *  - funnel_by_arm: the time-bounded funnel split by the deterministic
 *    A/B assignment — per-arm deadline conversion (the experiment
 *    readout funnel_timebound + ab_assign_eval compose into).
 *  - hour_dow_heatmap: the hour × day-of-week activity heatmap with
 *    within-total share ppm.
 */
object ExtQueries37 {

  private val ClickWithinUs = 3600L * 1000000L
  private val PurchaseWithinUs = 24L * 3600L * 1000000L

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    "anomaly_seasonal_ratio" -> ((s, dir) => {
      val daily = Tables.events(s, dir)
        .groupBy(col("event_type"), to_date(col("ts")).as("d"))
        .agg(count(lit(1)).as("n"))
        .withColumn("dow", dayofweek(col("d")))
      val dowMean = daily.groupBy(col("event_type"), col("dow"))
        .agg(sum(col("n")).as("sum_n"), count(lit(1)).as("n_days"))
      daily.join(dowMean, Seq("event_type", "dow"))
        .select(col("event_type"), date_format(col("d"), "yyyy-MM-dd").as("day"),
          col("dow"), col("n"),
          expr("(n * 1000 * n_days) DIV sum_n").as("ratio_ppt"))
        .withColumn("is_anomaly",
          (col("ratio_ppt") < 500 || col("ratio_ppt") > 2000).cast("int"))
        .orderBy(col("event_type"), col("day"))
    }),

    "session_funnel" -> ((s, dir) => {
      val byUser = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val running = byUser.rowsBetween(
        org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
      val sess = Tables.events(s, dir)
        .withColumn("tus", expr("unix_micros(ts)"))
        .withColumn("prev", lag(col("tus"), 1).over(byUser))
        .withColumn("brk",
          when(col("prev").isNull || col("tus") - col("prev") >= 1800L * 1000000L, 1L)
            .otherwise(0L))
        .withColumn("session_id", sum(col("brk")).over(running))
      val perSession = sess.groupBy(col("user_id"), col("session_id"))
        .agg(min(when(col("event_type") === "view", col("tus"))).as("tv"),
          min(when(col("event_type") === "click", col("tus"))).as("tc0"),
          min(when(col("event_type") === "purchase", col("tus"))).as("tp0"))
      // strict order: click after first view, purchase after that click —
      // approximated at session grain by min-ts comparisons
      val staged = perSession
        .withColumn("has_v", col("tv").isNotNull.cast("long"))
        .withColumn("has_vc",
          (col("tv").isNotNull && col("tc0").isNotNull && col("tc0") > col("tv")).cast("long"))
        .withColumn("has_vcp",
          (col("tv").isNotNull && col("tc0").isNotNull && col("tc0") > col("tv")
            && col("tp0").isNotNull && col("tp0") > col("tc0")).cast("long"))
      staged.agg(count(lit(1)).as("n_sessions"),
          sum(col("has_v")).as("viewed"),
          sum(col("has_vc")).as("clicked_after_view"),
          sum(col("has_vcp")).as("purchased_after_click"))
    }),

    "funnel_by_arm" -> ((s, dir) => {
      val e = Tables.events(s, dir)
        .select(col("user_id"), col("event_type"), expr("unix_micros(ts)").as("tus"))
        .withColumn("arm",
          when(PortableHash.hMod(concat(lit("ab1|"), col("user_id").cast("string"))) % 2 === 0,
            "A").otherwise("B"))
      // checkpoints as in funnel_timebound: each user-bounded stage feeds
      // the next stage AND its arm rollup
      val t1 = e.where(col("event_type") === "view")
        .groupBy(col("arm"), col("user_id")).agg(min(col("tus")).as("t1"))
        .localCheckpoint()
      val t2 = e.where(col("event_type") === "click")
        .join(t1.drop("arm"), "user_id")
        .where(col("tus") > col("t1") && col("tus") <= col("t1") + lit(ClickWithinUs))
        .groupBy(col("arm"), col("user_id")).agg(min(col("tus")).as("t2"))
        .localCheckpoint()
      val t3 = e.where(col("event_type") === "purchase")
        .join(t2.drop("arm"), "user_id")
        .where(col("tus") > col("t2") && col("tus") <= col("t2") + lit(PurchaseWithinUs))
        .groupBy(col("arm"), col("user_id")).agg(min(col("tus")).as("t3"))
      // left joins: an arm with zero conversions at a later stage must
      // still report, with zeros
      t1.groupBy(col("arm")).agg(count(lit(1)).as("viewed"))
        .join(t2.groupBy(col("arm")).agg(count(lit(1)).as("c1")), Seq("arm"), "left_outer")
        .join(t3.groupBy(col("arm")).agg(count(lit(1)).as("p1")), Seq("arm"), "left_outer")
        .select(col("arm"), col("viewed"),
          coalesce(col("c1"), lit(0L)).as("clicked_1h"),
          coalesce(col("p1"), lit(0L)).as("purchased_24h"))
        .withColumn("full_conv_ppm", expr("(purchased_24h * 1000000) DIV viewed"))
        .orderBy(col("arm"))
    }),

    "hour_dow_heatmap" -> ((s, dir) => {
      val cells = Tables.events(s, dir)
        .groupBy(dayofweek(col("ts")).as("dow"), hour(col("ts")).as("hr"))
        .agg(count(lit(1)).as("n"))
      cells.crossJoin(broadcast(cells.agg(sum(col("n")).as("total"))))
        .select(col("dow"), col("hr"), col("n"),
          expr("(n * 1000000) DIV total").as("share_ppm"))
        .orderBy(col("dow"), col("hr"))
    })
  )

  def oracleSql: Map[String, String] = Map(

    "anomaly_seasonal_ratio" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS d, COUNT(*) AS n,
        |         CAST(strftime(ts, '%w') AS INT) + 1 AS dow
        |  FROM events GROUP BY 1, 2, 4),
        |dm AS (SELECT event_type, dow, CAST(SUM(n) AS BIGINT) AS sum_n,
        |              COUNT(*) AS n_days
        |       FROM daily GROUP BY 1, 2)
        |SELECT daily.event_type, strftime(d, '%Y-%m-%d') AS day, daily.dow, n,
        |       (n * 1000 * n_days) // sum_n AS ratio_ppt,
        |       CASE WHEN (n * 1000 * n_days) // sum_n < 500
        |              OR (n * 1000 * n_days) // sum_n > 2000 THEN 1 ELSE 0 END AS is_anomaly
        |FROM daily JOIN dm ON daily.event_type = dm.event_type AND daily.dow = dm.dow
        |ORDER BY daily.event_type, day""".stripMargin,

    "session_funnel" ->
      """WITH o AS (
        |  SELECT user_id, event_id, ts, event_type, epoch_us(ts) AS tus,
        |         LAG(epoch_us(ts)) OVER (PARTITION BY user_id
        |                                 ORDER BY ts, event_id) AS prev
        |  FROM events),
        |b AS (SELECT *, CASE WHEN prev IS NULL OR tus - prev >= 1800000000
        |                     THEN 1 ELSE 0 END AS brk FROM o),
        |se AS (SELECT *, SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        |       FROM b),
        |ps AS (
        |  SELECT user_id, session_id,
        |         MIN(CASE WHEN event_type = 'view' THEN tus END) AS tv,
        |         MIN(CASE WHEN event_type = 'click' THEN tus END) AS tc0,
        |         MIN(CASE WHEN event_type = 'purchase' THEN tus END) AS tp0
        |  FROM se GROUP BY 1, 2)
        |SELECT COUNT(*) AS n_sessions,
        |       CAST(SUM(CASE WHEN tv IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS viewed,
        |       CAST(SUM(CASE WHEN tv IS NOT NULL AND tc0 IS NOT NULL AND tc0 > tv
        |                     THEN 1 ELSE 0 END) AS BIGINT) AS clicked_after_view,
        |       CAST(SUM(CASE WHEN tv IS NOT NULL AND tc0 IS NOT NULL AND tc0 > tv
        |                      AND tp0 IS NOT NULL AND tp0 > tc0
        |                     THEN 1 ELSE 0 END) AS BIGINT) AS purchased_after_click
        |FROM ps""".stripMargin,

    "funnel_by_arm" ->
      s"""WITH e AS (
         |  SELECT user_id, event_type, epoch_us(ts) AS tus,
         |         CASE WHEN ${PortableHash.hModSql("'ab1|'||CAST(user_id AS VARCHAR)")} % 2 = 0
         |              THEN 'A' ELSE 'B' END AS arm
         |  FROM events),
         |t1 AS (SELECT arm, user_id, MIN(tus) AS t1 FROM e
         |       WHERE event_type = 'view' GROUP BY 1, 2),
         |t2 AS (SELECT t1.arm, e.user_id, MIN(e.tus) AS t2 FROM e
         |       JOIN t1 ON e.user_id = t1.user_id
         |       WHERE e.event_type = 'click' AND e.tus > t1.t1
         |         AND e.tus <= t1.t1 + $ClickWithinUs GROUP BY 1, 2),
         |t3 AS (SELECT t2.arm, e.user_id, MIN(e.tus) AS t3 FROM e
         |       JOIN t2 ON e.user_id = t2.user_id
         |       WHERE e.event_type = 'purchase' AND e.tus > t2.t2
         |         AND e.tus <= t2.t2 + $PurchaseWithinUs GROUP BY 1, 2),
         |f AS (
         |  SELECT a.arm, a.viewed,
         |         COALESCE(b.clicked_1h, 0) AS clicked_1h,
         |         COALESCE(c.purchased_24h, 0) AS purchased_24h FROM
         |    (SELECT arm, COUNT(*) AS viewed FROM t1 GROUP BY arm) a
         |    LEFT JOIN (SELECT arm, COUNT(*) AS clicked_1h FROM t2 GROUP BY arm) b
         |      ON a.arm = b.arm
         |    LEFT JOIN (SELECT arm, COUNT(*) AS purchased_24h FROM t3 GROUP BY arm) c
         |      ON a.arm = c.arm)
         |SELECT arm, viewed, clicked_1h, purchased_24h,
         |       (purchased_24h * 1000000) // viewed AS full_conv_ppm
         |FROM f ORDER BY arm""".stripMargin,

    "hour_dow_heatmap" ->
      """WITH c AS (
        |  SELECT CAST(strftime(ts, '%w') AS INT) + 1 AS dow,
        |         CAST(strftime(ts, '%H') AS INT) AS hr, COUNT(*) AS n
        |  FROM events GROUP BY 1, 2),
        |t AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM c)
        |SELECT dow, hr, n, (n * 1000000) // total AS share_ppm
        |FROM c CROSS JOIN t ORDER BY dow, hr""".stripMargin
  )
}
