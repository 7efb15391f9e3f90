package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.Tables

/**
 * Round-7 wave: temporal product analytics + storage introspection.
 *
 *  - funnel_timebound: the ordered view→click→purchase funnel with
 *    per-step conversion DEADLINES (click within 1 h of the first view,
 *    purchase within 24 h of the qualifying click) — the time-bounded
 *    form of funnel_steps; all timestamp math in integer micros.
 *  - session_paths: most common in-session event-type trigrams
 *    (30-minute-gap sessions, same break rule as sessionize_batch) —
 *    per-user windows only, then one grouped count.
 *  - item_persistence: for each item, how many days it stayed in the
 *    daily top-20 by event count (day-partitioned rank windows — the
 *    partition key is the day, never a global order).
 *  - zonemap_prune: per-chunk min/max zone maps over orders (chunks =
 *    insertion-keyed key ranges) and which chunks a date predicate can
 *    skip — the data-skipping math behind partition/file pruning, made
 *    inspectable; includes realized in-chunk selectivity (ppm).
 *  - text_zipf_fit: least-squares Zipf slope over the top-200 word
 *    frequencies in log-log space, ln quantized to the centi grid
 *    before any sum (DSIR discipline) so the fit is integer-exact and
 *    engine-portable; the head is a bounded TakeOrdered, never a
 *    global sort of the vocabulary.
 */
object ExtQueries30 {

  private val ClickWithinUs = 3600L * 1000000L        // 1 hour
  private val PurchaseWithinUs = 24L * 3600L * 1000000L // 24 hours

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    "funnel_timebound" -> ((s, dir) => {
      val e = Tables.events(s, dir)
        .select(col("user_id"), col("event_type"), expr("unix_micros(ts)").as("tus"))
      // checkpoint each user-bounded stage: t1 feeds t2 AND the final
      // count, t2 feeds t3 AND the count — without materialization the
      // events scan re-runs five times (no exchange reuse across the
      // differently-filtered subtrees)
      val t1 = e.where(col("event_type") === "view")
        .groupBy("user_id").agg(min(col("tus")).as("t1"))
        .localCheckpoint()
      val t2 = e.where(col("event_type") === "click").join(t1, "user_id")
        .where(col("tus") > col("t1") && col("tus") <= col("t1") + lit(ClickWithinUs))
        .groupBy("user_id").agg(min(col("tus")).as("t2"))
        .localCheckpoint()
      val t3 = e.where(col("event_type") === "purchase").join(t2, "user_id")
        .where(col("tus") > col("t2") && col("tus") <= col("t2") + lit(PurchaseWithinUs))
        .groupBy("user_id").agg(min(col("tus")).as("t3"))
      // greatest(_, 1): an empty upstream stage must yield rate 0, not an
      // ANSI division-by-zero (the numerator is 0 whenever it fires)
      t1.agg(count(lit(1)).as("viewed"))
        .crossJoin(t2.agg(count(lit(1)).as("clicked_1h")))
        .crossJoin(t3.agg(count(lit(1)).as("purchased_24h")))
        .select(col("viewed"), col("clicked_1h"), col("purchased_24h"),
          expr("(clicked_1h * 1000000) DIV greatest(viewed, 1)").as("click_conv_ppm"),
          expr("(purchased_24h * 1000000) DIV greatest(clicked_1h, 1)").as("purchase_conv_ppm"))
    }),

    "session_paths" -> ((s, dir) => {
      val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val running = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val sess = Tables.events(s, dir)
        .withColumn("tus", expr("unix_micros(ts)"))
        .withColumn("prev", lag(col("tus"), 1).over(byUser))
        .withColumn("brk",
          when(col("prev").isNull || col("tus") - col("prev") >= 1800L * 1000000L, 1L)
            .otherwise(0L))
        .withColumn("session_id", sum(col("brk")).over(running))
      val inSess = Window.partitionBy(col("user_id"), col("session_id"))
        .orderBy(col("ts"), col("event_id"))
      sess
        .withColumn("t2", lead(col("event_type"), 1).over(inSess))
        .withColumn("t3", lead(col("event_type"), 2).over(inSess))
        .where(col("t3").isNotNull)
        .select(concat_ws(">", col("event_type"), col("t2"), col("t3")).as("trigram"))
        .groupBy(col("trigram")).agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("trigram"))
        .limit(20)
    }),

    "item_persistence" -> ((s, dir) => {
      val daily = Tables.events(s, dir)
        .select(date_format(col("ts"), "yyyy-MM-dd").as("day"),
          get_json_object(col("props"), "$.k").cast("int").as("item"))
        .groupBy(col("day"), col("item")).agg(count(lit(1)).as("n"))
      val byDay = Window.partitionBy(col("day")).orderBy(col("n").desc, col("item"))
      daily.withColumn("rnk", row_number().over(byDay))
        .where(col("rnk") <= 20)
        .groupBy(col("item"))
        .agg(count(lit(1)).as("days_in_top"),
          min(col("day")).as("first_day"),
          max(col("day")).as("last_day"))
        .orderBy(col("days_in_top").desc, col("item"))
        .limit(50)
    }),

    "zonemap_prune" -> ((s, dir) => {
      val base = Tables.table(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderdate"),
          when(col("o_orderdate") >= lit("1997-03-01").cast("timestamp")
            && col("o_orderdate") < lit("1997-06-01").cast("timestamp"), 1L)
            .otherwise(0L).as("hit"))
      def zones(layout: String, chunk: org.apache.spark.sql.Column) =
        base.groupBy(lit(layout).as("layout"), chunk.as("chunk_id"))
          .agg(count(lit(1)).as("n"),
            date_format(min(col("o_orderdate")), "yyyy-MM-dd").as("min_date"),
            date_format(max(col("o_orderdate")), "yyyy-MM-dd").as("max_date"),
            sum(col("hit")).as("n_match"))
      // 'keyrange' = insertion-ordered chunks (dates uncorrelated → zone
      // maps span everything, nothing prunes); 'datesort' = date-clustered
      // chunks (the layout a sort/Z-order produces → tight maps, pruning
      // works). Same predicate, same data — the layout is the difference.
      zones("keyrange", expr("o_orderkey DIV 1000"))
        .unionAll(zones("datesort",
          expr("datediff(o_orderdate, DATE'1995-01-01') DIV 90")))
        .select(col("layout"), col("chunk_id"), col("n"), col("min_date"), col("max_date"),
          when(col("max_date") < "1997-03-01" || col("min_date") >= "1997-06-01", 1)
            .otherwise(0).as("skippable"),
          expr("(n_match * 1000000) DIV n").as("select_ppm"))
        .orderBy(col("layout"), col("chunk_id"))
    }),

    "text_zipf_fit" -> ((s, dir) => {
      val top = Tables.table(s, dir, "documents")
        .select(explode(split(col("text"), " ")).as("word"))
        .groupBy(col("word")).agg(count(lit(1)).as("f"))
        .orderBy(col("f").desc, col("word"))
        .limit(200)
      // bounded head (<= 200 rows): the rank window runs on a
      // driver-bounded set, not the full vocabulary
      val ranked = top.withColumn("r",
        row_number().over(Window.orderBy(col("f").desc, col("word"))))
        .select(expr("CAST(FLOOR(LN(r) * 100) AS BIGINT)").as("x"),
          expr("CAST(FLOOR(LN(f) * 100) AS BIGINT)").as("y"))
      // Zipf slope is negative; DuckDB's // floors while Spark's DIV
      // truncates, and they disagree on negatives — so compute the
      // positive MAGNITUDE (freq falls with rank ⇒ sx*sy > n*sxy) with
      // positive-only integer divisions and negate at the end.
      ranked.agg(count(lit(1)).as("n"),
          sum(col("x")).as("sx"), sum(col("y")).as("sy"),
          sum(col("x") * col("x")).as("sxx"),
          sum(col("x") * col("y")).as("sxy"))
        // greatest(_, 1): a single-rank head has zero x-variance (the
        // fit is degenerate, numerator is 0 too) — emit 0, not an ANSI
        // division error
        .withColumn("mag_ppm",
          expr("((sx * sy - n * sxy) * 1000000) DIV greatest(n * sxx - sx * sx, 1)"))
        .select(col("n"),
          (-col("mag_ppm")).as("slope_ppm"),
          expr("(sy * 1000000 + mag_ppm * sx) DIV (n * 1000000)").as("intercept_centi"))
    })
  )

  def oracleSql: Map[String, String] = Map(

    "funnel_timebound" ->
      s"""WITH t1 AS (SELECT user_id, MIN(epoch_us(ts)) AS t1 FROM events
         |            WHERE event_type = 'view' GROUP BY 1),
         |t2 AS (SELECT e.user_id, MIN(epoch_us(e.ts)) AS t2 FROM events e
         |       JOIN t1 ON e.user_id = t1.user_id
         |       WHERE e.event_type = 'click' AND epoch_us(e.ts) > t1.t1
         |         AND epoch_us(e.ts) <= t1.t1 + $ClickWithinUs GROUP BY 1),
         |t3 AS (SELECT e.user_id, MIN(epoch_us(e.ts)) AS t3 FROM events e
         |       JOIN t2 ON e.user_id = t2.user_id
         |       WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > t2.t2
         |         AND epoch_us(e.ts) <= t2.t2 + $PurchaseWithinUs GROUP BY 1),
         |c AS (SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM t1) AS viewed,
         |             (SELECT CAST(COUNT(*) AS BIGINT) FROM t2) AS clicked_1h,
         |             (SELECT CAST(COUNT(*) AS BIGINT) FROM t3) AS purchased_24h)
         |SELECT viewed, clicked_1h, purchased_24h,
         |       (clicked_1h * 1000000) // GREATEST(viewed, 1) AS click_conv_ppm,
         |       (purchased_24h * 1000000) // GREATEST(clicked_1h, 1) AS purchase_conv_ppm
         |FROM c""".stripMargin,

    "session_paths" ->
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
        |tri AS (
        |  SELECT event_type || '>' ||
        |         LEAD(event_type, 1) OVER w || '>' ||
        |         LEAD(event_type, 2) OVER w AS trigram,
        |         LEAD(event_type, 2) OVER w AS t3
        |  FROM se
        |  WINDOW w AS (PARTITION BY user_id, session_id ORDER BY ts, event_id))
        |SELECT trigram, COUNT(*) AS n FROM tri WHERE t3 IS NOT NULL
        |GROUP BY trigram ORDER BY n DESC, trigram LIMIT 20""".stripMargin,

    "item_persistence" ->
      """WITH daily AS (
        |  SELECT strftime(ts, '%Y-%m-%d') AS day,
        |         CAST(json_extract_string(props, 'k') AS INT) AS item,
        |         COUNT(*) AS n
        |  FROM events GROUP BY day, item),
        |ranked AS (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY day ORDER BY n DESC, item) AS rnk
        |  FROM daily)
        |SELECT item, COUNT(*) AS days_in_top,
        |       MIN(day) AS first_day, MAX(day) AS last_day
        |FROM ranked WHERE rnk <= 20
        |GROUP BY item ORDER BY days_in_top DESC, item LIMIT 50""".stripMargin,

    "zonemap_prune" ->
      """WITH base AS (
        |  SELECT o_orderkey, o_orderdate,
        |         CASE WHEN o_orderdate >= TIMESTAMP '1997-03-01'
        |               AND o_orderdate < TIMESTAMP '1997-06-01'
        |              THEN 1 ELSE 0 END AS hit
        |  FROM orders),
        |c AS (
        |  SELECT 'keyrange' AS layout, o_orderkey // 1000 AS chunk_id,
        |         COUNT(*) AS n,
        |         strftime(MIN(o_orderdate), '%Y-%m-%d') AS min_date,
        |         strftime(MAX(o_orderdate), '%Y-%m-%d') AS max_date,
        |         CAST(SUM(hit) AS BIGINT) AS n_match
        |  FROM base GROUP BY 1, 2
        |  UNION ALL
        |  SELECT 'datesort' AS layout,
        |         (CAST(o_orderdate AS DATE) - DATE '1995-01-01') // 90 AS chunk_id,
        |         COUNT(*) AS n,
        |         strftime(MIN(o_orderdate), '%Y-%m-%d') AS min_date,
        |         strftime(MAX(o_orderdate), '%Y-%m-%d') AS max_date,
        |         CAST(SUM(hit) AS BIGINT) AS n_match
        |  FROM base GROUP BY 1, 2)
        |SELECT layout, chunk_id, n, min_date, max_date,
        |       CASE WHEN max_date < '1997-03-01' OR min_date >= '1997-06-01'
        |            THEN 1 ELSE 0 END AS skippable,
        |       (n_match * 1000000) // n AS select_ppm
        |FROM c ORDER BY layout, chunk_id""".stripMargin,

    "text_zipf_fit" ->
      """WITH wf AS (
        |  SELECT word, COUNT(*) AS f FROM (
        |    SELECT unnest(string_split(text, ' ')) AS word FROM documents)
        |  GROUP BY word ORDER BY f DESC, word LIMIT 200),
        |rk AS (SELECT f, ROW_NUMBER() OVER (ORDER BY f DESC, word) AS r FROM wf),
        |xy AS (SELECT CAST(FLOOR(LN(r) * 100) AS BIGINT) AS x,
        |              CAST(FLOOR(LN(f) * 100) AS BIGINT) AS y FROM rk),
        |s AS (SELECT COUNT(*) AS n, CAST(SUM(x) AS BIGINT) AS sx,
        |             CAST(SUM(y) AS BIGINT) AS sy,
        |             CAST(SUM(x*x) AS BIGINT) AS sxx,
        |             CAST(SUM(x*y) AS BIGINT) AS sxy FROM xy),
        |m AS (SELECT *, ((sx * sy - n * sxy) * 1000000)
        |                  // GREATEST(n * sxx - sx * sx, 1) AS mag_ppm FROM s)
        |SELECT n, -mag_ppm AS slope_ppm,
        |       (sy * 1000000 + mag_ppm * sx) // (n * 1000000) AS intercept_centi
        |FROM m""".stripMargin
  )
}
