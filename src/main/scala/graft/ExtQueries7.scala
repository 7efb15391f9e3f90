package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.operators.Tables

/**
 * Round-4 third wave: the source/sink surface beyond the parquet scan —
 * CSV / JSON / ORC write-read roundtrips (format fidelity is a
 * correctness property of the engine, checked against the original
 * table's oracle), a partitioned sink whose read-back prunes
 * partitions, a corpus unigram-LM cross-entropy score, a chained
 * stateful streaming distinct (dedup -> windowed agg), and a
 * bin-blocked interval-overlap join (IntervalJoin).
 *
 * Sink scale posture: the partitioned write is the 100 TB layout
 * contract — day-partitioned events mean a day-filtered query reads
 * 1/30th of the data (partition pruning happens at file listing, before
 * any I/O); all sinks write under one per-JVM temp root with overwrite
 * semantics, so repeated runs stay disk-bounded.
 */
object ExtQueries7 {

  private def tmpDir(name: String): String = graft.operators.Sinks.dir(name)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // CSV sink + source roundtrip: types survive via explicit read
    // schema (CSV is untyped); doubles survive via Java's round-trip
    // double formatting. Oracle = the original table.
    "csv_roundtrip" -> ((s, dir) => {
      val part = Tables.table(s, dir, "part")
      val out = tmpDir("csv_roundtrip")
      part.write.mode("overwrite").option("header", "true").csv(out)
      s.read.option("header", "true").schema(part.schema).csv(out)
        .orderBy(col("p_partkey"))
    }),

    // JSON sink + source roundtrip (schema-on-read with the original
    // schema; timestamps via the default ISO format).
    "json_roundtrip" -> ((s, dir) => {
      val orders = Tables.table(s, dir, "orders")
      val out = tmpDir("json_roundtrip")
      orders.write.mode("overwrite").json(out)
      s.read.schema(orders.schema).json(out)
        .orderBy(col("o_orderkey"))
    }),

    // ORC sink + source roundtrip (typed columnar format — exact by
    // construction; exercises the second columnar code path).
    "orc_roundtrip" -> ((s, dir) => {
      val li = Tables.table(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
          col("l_returnflag"), col("l_shipdate"))
      val out = tmpDir("orc_roundtrip")
      li.write.mode("overwrite").orc(out)
      s.read.orc(out).orderBy(col("l_orderkey"), col("l_linenumber"))
    }),

    // day-partitioned parquet sink, then a day-filtered read-back: the
    // filter binds to the partition COLUMN, so pruning happens at file
    // listing (PartitionFilters in the scan, zero I/O on other days) —
    // the layout contract that makes time-scoped queries cheap at
    // 100 TB.
    "sink_partitioned_prune" -> ((s, dir) => {
      val out = tmpDir("sink_partitioned")
      Tables.events(s, dir)
        .withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
        .write.mode("overwrite").partitionBy("day").parquet(out)
      s.read.parquet(out)
        .where(col("day") === "2024-01-05")
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast(DecimalType(20, 4))).cast("double").as("sum_value"))
        .orderBy(col("event_type"))
    }),

    // corpus unigram-LM cross-entropy per doc: -mean ln p(w) under the
    // corpus unigram distribution — the cheap LM-quality proxy (high =
    // rare-word-heavy). Token counts are one hash agg; the per-token
    // -ln p values ride the 1e-6 decimal grid so the doc mean is
    // order-independent.
    "text_lm_score" -> ((s, dir) => {
      val toks = Tables.table(s, dir, "documents")
        .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      val tot = toks.agg(count(lit(1)).as("tot"))
      val cnt = toks.groupBy("w").agg(count(lit(1)).as("cnt"))
      toks.where(col("doc_id") % 5 === 4)
        .join(broadcast(cnt), "w").crossJoin(broadcast(tot))
        .withColumn("nlp", round(-log(col("cnt").cast("double") / col("tot")), 6)
          .cast(DecimalType(24, 6)))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_tokens"),
          round((sum(col("nlp")).cast("double") / count(lit(1))), 4).as("lm_score"))
        .orderBy("doc_id")
    }),

    // chained stateful streaming: per-day distinct users via streaming
    // dedup (watermark-bounded state) re-aggregated by a windowed count
    // — the second two-stateful-operator shape (dedup -> agg).
    "stream_windowed_distinct" -> ((s, dir) =>
      graft.streaming.StreamingOps.streamWindowedDistinct(s, dir)),

    // aggregate-as-window-function: rolling median of the trailing 10
    // events per user (exact interpolated percentile over a rows
    // frame) — keyed partitions only, no global sort.
    "window_rolling_median" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        .rowsBetween(-9, 0)
      Tables.events(s, dir)
        .where(col("user_id") % 10 === 2)
        .select(col("event_id"), col("user_id"),
          round(expr("percentile(value, 0.5)").over(w), 4).as("med_10"))
        .orderBy(col("event_id"))
    }),

    // BPE-style pretokenization counts: letter runs / digit runs /
    // punctuation runs via regexp_extract_all over deterministically
    // enriched text (the corpus is bare words, so markers are
    // synthesized the same way on both sides). Lookahead-free pattern —
    // portable between Java regex and RE2.
    "text_pretokenize" -> ((s, dir) =>
      Tables.table(s, dir, "documents")
        .where(col("doc_id") % 5 === 1)
        .select(col("doc_id"),
          concat(col("text"), lit(" #"), col("doc_id"), lit(" v2.0, (beta)!"))
            .as("t"))
        .select(col("doc_id"),
          size(expr("regexp_extract_all(t, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]+', 0)"))
            .as("n_tokens"),
          size(expr("regexp_extract_all(t, '[A-Za-z]+', 0)")).as("n_alpha"),
          size(expr("regexp_extract_all(t, '[0-9]+', 0)")).as("n_num"),
          size(expr("regexp_extract_all(t, '[^A-Za-z0-9 ]+', 0)")).as("n_other"))
        .orderBy("doc_id")),

    // observed metrics on a streaming pipeline (Dataset.observe) — the
    // reference's accumulator surface (SURVEY §6: work-proxy counters
    // logged per run) in Structured Streaming form: counters ride the
    // query, summed across microbatches from the progress events.
    "stream_observe_metrics" -> ((s, dir) =>
      graft.streaming.StreamingOps.streamObserveMetrics(s, dir)),

    // custom session windows on transformWithState with EVENT-TIME
    // TIMERS (the reference's operator model: buffer per key, fire at
    // the watermark) — same closed-session oracle as the
    // session_window-based stream_session_agg, so the two independent
    // implementations cross-check each other.
    "stream_session_timers" -> ((s, dir) =>
      graft.streaming.SessionStream.sessionAgg(s, dir)),

    // interval-overlap join WITHOUT an equi key: 7-day order-fulfilment
    // intervals x overlapping 15-day promo windows, bin-blocked
    // (IntervalJoin) so the theta join becomes an equi-join on 10-day
    // bins with each pair emitted exactly once (canonical-bin rule —
    // no distinct).
    "join_interval_binned" -> ((s, dir) => {
      val o = Tables.table(s, dir, "orders")
        .select(col("o_orderkey"),
          expr("unix_date(CAST(o_orderdate AS DATE))").cast("long").as("ls"))
        .withColumn("le", col("ls") + 7)
      val base = o.agg(min(col("ls")).as("d0"))
      val wins = s.range(0, 20).crossJoin(broadcast(base))
        .select(col("id").as("w_id"),
          (col("d0") + col("id") * 10).as("rs"),
          (col("d0") + col("id") * 10 + 15).as("re"))
      graft.operators.IntervalJoin.overlapBinned(o, broadcast(wins), 10L)
        .select(col("o_orderkey"), col("w_id"),
          (least(col("le"), col("re")) - greatest(col("ls"), col("rs")))
            .as("overlap_days"))
        .orderBy(col("o_orderkey"), col("w_id"))
    })
  )

  def oracleSql: Map[String, String] = Map(

    "csv_roundtrip" ->
      "SELECT * FROM part ORDER BY p_partkey",

    "json_roundtrip" ->
      "SELECT * FROM orders ORDER BY o_orderkey",

    "orc_roundtrip" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag, l_shipdate
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "sink_partitioned_prune" ->
      """SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(20,4))) AS DOUBLE) AS sum_value
        |FROM events WHERE CAST(ts AS DATE) = DATE '2024-01-05'
        |GROUP BY event_type ORDER BY event_type""".stripMargin,

    "text_lm_score" ->
      """WITH tok AS (SELECT doc_id, UNNEST(string_split(text, ' ')) AS w FROM documents),
        |tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS tot FROM tok),
        |cnt AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS cnt FROM tok GROUP BY 1),
        |sc AS (SELECT t.doc_id,
        |         CAST(round(-ln(CAST(c.cnt AS DOUBLE) / tot.tot), 6) AS DECIMAL(24,6)) AS nlp
        |       FROM tok t JOIN cnt c ON t.w = c.w CROSS JOIN tot
        |       WHERE t.doc_id % 5 = 4)
        |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
        |  round(CAST(SUM(nlp) AS DOUBLE) / COUNT(*), 4) AS lm_score
        |FROM sc GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // append-mode chained stateful ops emit only watermark-closed
    // windows: the day containing max(ts) is still open at the drain's
    // end -> excluded (same contract as stream_two_level_agg)
    "stream_windowed_distinct" ->
      """WITH mx AS (SELECT strftime(MAX(ts), '%Y-%m-%d') AS lastday FROM events)
        |SELECT strftime(ts, '%Y-%m-%d') AS day,
        |       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
        |FROM events WHERE strftime(ts, '%Y-%m-%d') < (SELECT lastday FROM mx)
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "window_rolling_median" ->
      """SELECT event_id, user_id,
        |  round(quantile_cont(value, 0.5) OVER (PARTITION BY user_id
        |    ORDER BY ts, event_id
        |    ROWS BETWEEN 9 PRECEDING AND CURRENT ROW), 4) AS med_10
        |FROM events WHERE user_id % 10 = 2
        |ORDER BY event_id""".stripMargin,

    "text_pretokenize" ->
      """WITH d AS (SELECT doc_id,
        |             text || ' #' || CAST(doc_id AS VARCHAR) || ' v2.0, (beta)!' AS t
        |           FROM documents WHERE doc_id % 5 = 1)
        |SELECT doc_id,
        |  CAST(len(regexp_extract_all(t, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]+')) AS INT) AS n_tokens,
        |  CAST(len(regexp_extract_all(t, '[A-Za-z]+')) AS INT) AS n_alpha,
        |  CAST(len(regexp_extract_all(t, '[0-9]+')) AS INT) AS n_num,
        |  CAST(len(regexp_extract_all(t, '[^A-Za-z0-9 ]+')) AS INT) AS n_other
        |FROM d ORDER BY doc_id""".stripMargin,

    // -1 sentinels mirror the drain's empty-input degradation
    "stream_observe_metrics" ->
      """SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
        |  CAST(COALESCE(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END), 0)
        |    AS BIGINT) AS n_purchase,
        |  COALESCE(MIN(event_id), -1) AS min_event,
        |  COALESCE(MAX(event_id), -1) AS max_event
        |FROM events""".stripMargin,

    // same closed-session contract as stream_session_agg (sessions
    // whose end = last event + gap <= global max ts)
    "stream_session_timers" ->
      """WITH o AS (
        |  SELECT user_id, ts,
        |         CASE WHEN LAG(ts) OVER w IS NULL
        |                OR ts - LAG(ts) OVER w >= INTERVAL 30 MINUTE
        |              THEN 1 ELSE 0 END AS brk
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        |sgrp AS (
        |  SELECT user_id, ts,
        |         SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
        |                        ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM o),
        |sess AS (
        |  SELECT user_id, sid, COUNT(*) AS n_events,
        |         MAX(ts) + INTERVAL 30 MINUTE AS send
        |  FROM sgrp GROUP BY user_id, sid),
        |closed AS (
        |  SELECT * FROM sess WHERE send <= (SELECT MAX(ts) FROM events))
        |SELECT user_id, COUNT(*) AS n_sessions, CAST(SUM(n_events) AS BIGINT) AS n_events,
        |       MAX(n_events) AS max_session_events
        |FROM closed GROUP BY user_id ORDER BY user_id""".stripMargin,

    // independent derivation: plain theta join (the binned equi-join
    // must produce exactly the naive overlap set)
    "join_interval_binned" ->
      """WITH o AS (SELECT o_orderkey,
        |             CAST(datediff('day', DATE '1970-01-01',
        |               CAST(o_orderdate AS DATE)) AS BIGINT) AS ls
        |           FROM orders),
        |oi AS (SELECT o_orderkey, ls, ls + 7 AS le FROM o),
        |base AS (SELECT MIN(ls) AS d0 FROM oi),
        |w AS (SELECT CAST(i AS BIGINT) AS w_id, d0 + i * 10 AS rs,
        |        d0 + i * 10 + 15 AS re
        |      FROM base, UNNEST(range(0, 20)) r(i))
        |SELECT oi.o_orderkey, w.w_id,
        |  CAST(LEAST(oi.le, w.re) - GREATEST(oi.ls, w.rs) AS BIGINT) AS overlap_days
        |FROM oi JOIN w ON oi.ls < w.re AND w.rs < oi.le
        |ORDER BY oi.o_orderkey, w.w_id""".stripMargin
  )
}
