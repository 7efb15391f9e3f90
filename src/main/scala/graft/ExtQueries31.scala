package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.Tables

/**
 * Round-7 wave: trend/seasonality statistics and join-surface
 * completions. Integer-grid discipline throughout (ppm/centi via
 * integer DIV); signed divisions route through an explicit
 * sign × magnitude split because DuckDB's `//` floors while Spark's
 * `DIV` truncates — they disagree on negative operands.
 *
 *  - trend_slope_by_type: per-event-type least-squares slope of the
 *    daily count over the day index (is activity growing?); the
 *    regression runs on day-aggregated rows (bounded by the span).
 *  - dow_profile: day-of-week seasonality per event type with the
 *    within-type share (ppm).
 *  - join_asof_tolerance: the as-of join with a max-staleness cap
 *    (30 days) — the feature-store "don't serve stale features" rule;
 *    matches beyond the horizon fall back to the sentinel.
 *  - repeat_rate: per item, purchasers vs repeat purchasers (ppm) —
 *    the basic loyalty/consumable signal.
 *  - session_stats: corpus-level session-length distribution with the
 *    EXACT rank-based median and p90 via a length histogram
 *    (cumulative over DISTINCT lengths — bounded by the max session
 *    length, never a scan over raw sessions).
 */
object ExtQueries31 {

  /** Per-(type, day-index) counts — the regression's mergeable input. */
  private[graft] def dailyCounts(events: DataFrame): DataFrame =
    events.groupBy(col("event_type"),
      datediff(to_date(col("ts")), lit("2024-01-01").cast("date")).as("x"))
      .agg(count(lit(1)).as("y"))

  /** Integer least-squares slope over (x, y) daily rows per type; shared
    * by the batch query and the streaming merge (they must agree exactly). */
  private[graft] def slopeFromDaily(daily: DataFrame): DataFrame =
    daily.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("x") * col("y")).as("sxy"))
      .withColumn("num", expr("n * sxy - sx * sy"))
      // greatest(_, 1): a single-day series has zero x-variance and a
      // zero numerator — slope 0, not an ANSI division error
      .withColumn("den", expr("greatest(n * sxx - sx * sx, 1)"))
      .select(col("event_type"), col("n").as("n_days"),
        expr("""CASE WHEN num >= 0 THEN (num * 1000000) DIV den
               |     ELSE -((-num * 1000000) DIV den) END""".stripMargin)
          .as("slope_ppm_per_day"),
        expr("sy DIV n").as("mean_daily"))
      .orderBy(col("event_type"))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    "trend_slope_by_type" -> ((s, dir) =>
      slopeFromDaily(dailyCounts(Tables.events(s, dir)))),

    "dow_profile" -> ((s, dir) => {
      val d = Tables.events(s, dir)
        .groupBy(col("event_type"), dayofweek(col("ts")).as("dow"))
        .agg(count(lit(1)).as("n"))
      val tot = d.groupBy(col("event_type")).agg(sum(col("n")).as("n_type"))
      d.join(broadcast(tot), "event_type")
        .select(col("event_type"), col("dow"), col("n"),
          expr("(n * 1000000) DIV n_type").as("share_ppm"))
        .orderBy(col("event_type"), col("dow"))
    }),

    "join_asof_tolerance" -> ((s, dir) => {
      val e = Tables.events(s, dir)
        .select(col("event_id"), col("user_id"), to_date(col("ts")).as("ed"))
      val o = Tables.table(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"))
      val w = Window.partitionBy(col("event_id"))
        .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
      e.join(o,
          col("user_id") === col("o_custkey")
            && col("o_orderdate") <= col("ed")
            && datediff(col("ed"), to_date(col("o_orderdate"))) <= 30,
          "left_outer")
        .withColumn("rn", row_number().over(w))
        .where(col("rn") === 1)
        .select(col("event_id"), col("user_id"),
          coalesce(col("o_orderkey"), lit(-1L)).as("asof_order"),
          coalesce(date_format(col("o_orderdate"), "yyyy-MM-dd"), lit("none")).as("asof_date"))
        .orderBy(col("event_id"))
    }),

    "repeat_rate" -> ((s, dir) => {
      val perUserItem = Tables.events(s, dir)
        .where(col("event_type") === "purchase")
        .select(col("user_id"),
          get_json_object(col("props"), "$.k").cast("int").as("item"))
        .groupBy(col("item"), col("user_id")).agg(count(lit(1)).as("k"))
      perUserItem.groupBy(col("item"))
        .agg(count(lit(1)).as("n_buyers"),
          sum(when(col("k") >= 2, 1L).otherwise(0L)).as("n_repeat"))
        .where(col("n_buyers") >= 3)
        .select(col("item"), col("n_buyers"), col("n_repeat"),
          expr("(n_repeat * 1000000) DIV n_buyers").as("repeat_ppm"))
        .orderBy(col("item"))
    }),

    "session_stats" -> ((s, dir) => {
      val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val running = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val sessLen = Tables.events(s, dir)
        .withColumn("tus", expr("unix_micros(ts)"))
        .withColumn("prev", lag(col("tus"), 1).over(byUser))
        .withColumn("brk",
          when(col("prev").isNull || col("tus") - col("prev") >= 1800L * 1000000L, 1L)
            .otherwise(0L))
        .withColumn("session_id", sum(col("brk")).over(running))
        .groupBy(col("user_id"), col("session_id"))
        .agg(count(lit(1)).as("len"))
      // length HISTOGRAM: the rank scan runs over distinct lengths
      // (bounded by the max session length), never over raw sessions.
      // The checkpoint matters: totals, median, and p90 are all derived
      // from the histogram, so the expensive session windows run ONCE —
      // the plan has exactly one user-keyed exchange (PlanSpec locks it;
      // the pre-fix shape recomputed the session subtree five times).
      val hist = sessLen.groupBy(col("len")).agg(count(lit(1)).as("cnt"))
        .localCheckpoint()
      val wc = Window.orderBy(col("len")).rowsBetween(Window.unboundedPreceding, 0)
      val cum = hist.withColumn("cum", sum(col("cnt")).over(wc))
      val tot = hist.agg(coalesce(sum(col("cnt")), lit(0L)).as("n_sessions"),
        coalesce(sum(col("len") * col("cnt")), lit(0L)).as("total_events"))
      val withTot = cum.crossJoin(broadcast(tot))
      val med = withTot.where(col("cum") * 2 >= col("n_sessions"))
        .agg(min(col("len")).as("median_len"))
      val p90 = withTot.where(col("cum") * 10 >= col("n_sessions") * 9)
        .agg(min(col("len")).as("p90_len"))
      // greatest(_, 1): an empty event stream yields a 0-session corpus
      // (total is 0 too) — report 0, not an ANSI division error
      tot.crossJoin(broadcast(med)).crossJoin(broadcast(p90))
        .select(col("n_sessions"), col("total_events"),
          col("median_len"), col("p90_len"),
          expr("(total_events * 100) DIV greatest(n_sessions, 1)")
            .as("events_per_session_centi"))
    })
  )

  def oracleSql: Map[String, String] = Map(

    "trend_slope_by_type" ->
      """WITH daily AS (
        |  SELECT event_type,
        |         (CAST(ts AS DATE) - DATE '2024-01-01') AS x,
        |         COUNT(*) AS y
        |  FROM events GROUP BY 1, 2),
        |s AS (SELECT event_type, COUNT(*) AS n,
        |             CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
        |             CAST(SUM(x*x) AS BIGINT) AS sxx,
        |             CAST(SUM(x*y) AS BIGINT) AS sxy
        |      FROM daily GROUP BY 1),
        |m AS (SELECT *, n * sxy - sx * sy AS num,
        |              GREATEST(n * sxx - sx * sx, 1) AS den FROM s)
        |SELECT event_type, n AS n_days,
        |       CASE WHEN num >= 0 THEN (num * 1000000) // den
        |            ELSE -((-num * 1000000) // den) END AS slope_ppm_per_day,
        |       sy // n AS mean_daily
        |FROM m ORDER BY event_type""".stripMargin,

    "dow_profile" ->
      """WITH d AS (
        |  SELECT event_type, CAST(strftime(ts, '%w') AS INT) + 1 AS dow, COUNT(*) AS n
        |  FROM events GROUP BY 1, 2),
        |t AS (SELECT event_type, CAST(SUM(n) AS BIGINT) AS n_type FROM d GROUP BY 1)
        |SELECT d.event_type, dow, n, (n * 1000000) // n_type AS share_ppm
        |FROM d JOIN t ON d.event_type = t.event_type
        |ORDER BY d.event_type, dow""".stripMargin,

    "join_asof_tolerance" ->
      """WITH j AS (
        |  SELECT e.event_id, e.user_id, o.o_orderkey, o.o_orderdate,
        |         ROW_NUMBER() OVER (PARTITION BY e.event_id
        |                            ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
        |  FROM events e
        |  LEFT JOIN orders o
        |    ON e.user_id = o.o_custkey AND o.o_orderdate <= CAST(e.ts AS DATE)
        |   AND (CAST(e.ts AS DATE) - CAST(o.o_orderdate AS DATE)) <= 30)
        |SELECT event_id, user_id,
        |       COALESCE(o_orderkey, -1) AS asof_order,
        |       COALESCE(strftime(o_orderdate, '%Y-%m-%d'), 'none') AS asof_date
        |FROM j WHERE rn = 1 ORDER BY event_id""".stripMargin,

    "repeat_rate" ->
      """WITH pui AS (
        |  SELECT CAST(json_extract_string(props, 'k') AS INT) AS item,
        |         user_id, COUNT(*) AS k
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2)
        |SELECT item, COUNT(*) AS n_buyers,
        |       CAST(SUM(CASE WHEN k >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_repeat,
        |       (CAST(SUM(CASE WHEN k >= 2 THEN 1 ELSE 0 END) AS BIGINT) * 1000000)
        |         // COUNT(*) AS repeat_ppm
        |FROM pui GROUP BY item HAVING COUNT(*) >= 3
        |ORDER BY item""".stripMargin,

    "session_stats" ->
      """WITH o AS (
        |  SELECT user_id, event_id, ts, epoch_us(ts) AS tus,
        |         LAG(epoch_us(ts)) OVER (PARTITION BY user_id
        |                                 ORDER BY ts, event_id) AS prev
        |  FROM events),
        |b AS (SELECT *, CASE WHEN prev IS NULL OR tus - prev >= 1800000000
        |                     THEN 1 ELSE 0 END AS brk FROM o),
        |se AS (SELECT *, SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        |       FROM b),
        |sl AS (SELECT user_id, session_id, COUNT(*) AS len FROM se GROUP BY 1, 2),
        |h AS (SELECT len, COUNT(*) AS cnt FROM sl GROUP BY len),
        |c AS (SELECT len, SUM(cnt) OVER (ORDER BY len
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum FROM h),
        |t AS (SELECT COUNT(*) AS n_sessions,
        |             CAST(COALESCE(SUM(len), 0) AS BIGINT) AS total_events
        |      FROM sl)
        |SELECT n_sessions, total_events,
        |       (SELECT MIN(len) FROM c WHERE cum * 2 >= (SELECT n_sessions FROM t))
        |         AS median_len,
        |       (SELECT MIN(len) FROM c WHERE cum * 10 >= 9 * (SELECT n_sessions FROM t))
        |         AS p90_len,
        |       (total_events * 100) // GREATEST(n_sessions, 1) AS events_per_session_centi
        |FROM t""".stripMargin
  )
}
