package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.operators.{DeterministicSample, Tables}

/**
 * Round-2 surface widening: grouping sets, the full analytic-window
 * function family (rank/dense_rank/ntile/lag/lead, RANGE frames), cross
 * join, unpivot/melt, complex-type scalars (struct/map), regex scalars,
 * higher-order array functions, JSON extraction, deterministic
 * hash-gated sampling (Bernoulli + stratified), and the sliding-window
 * streaming aggregation.
 *
 * Same float discipline as SparkEntry: decimal sums, rounded
 * transcendentals, total orders everywhere a window needs determinism.
 */
object ExtQueries2 {

  /** Stratified sampling rates shared between query and oracle. */
  private val StratRates =
    Map("click" -> 5, "view" -> 2, "purchase" -> 50, "signup" -> 50)
  private val StratDefault = 20

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // GROUPING SETS — the generalization of rollup/cube (reference has
    // neither; Spark 4 exposes it natively on Dataset)
    "grouping_sets" -> ((s, dir) =>
      Tables.table(s, dir, "lineitem")
        .groupingSets(
          Seq(Seq(col("l_returnflag"), col("l_linestatus")),
            Seq(col("l_returnflag")), Seq()),
          col("l_returnflag"), col("l_linestatus"))
        .agg(grouping_id().as("gid"), count(lit(1)).as("n"),
          sum(col("l_quantity").cast(DecimalType(20, 4))).cast("double").as("qty"))
        .select(col("gid"), col("l_returnflag"), col("l_linestatus"), col("n"), col("qty"))
        .orderBy(col("gid"), col("l_returnflag"), col("l_linestatus"))),

    // analytic window family: rank/dense_rank over a tie-carrying order
    // (rank values are tie-stable), ntile/lag/lead over a total order
    "window_rank_funcs" -> ((s, dir) => {
      val l = Tables.table(s, dir, "lineitem").where(col("l_suppkey") <= 5)
      val wq = Window.partitionBy(col("l_suppkey")).orderBy(col("l_quantity"))
      val wt = Window.partitionBy(col("l_suppkey"))
        .orderBy(col("l_extendedprice"), col("l_orderkey"), col("l_linenumber"))
      l.select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
          rank().over(wq).as("rnk"),
          dense_rank().over(wq).as("drnk"),
          ntile(4).over(wt).as("nt"),
          // coalesce to a sentinel: NULL doubles turn into NaN on the
          // oracle's pandas path and would hash-mismatch Spark's null
          coalesce(lag(col("l_extendedprice"), 1).over(wt), lit(-1.0)).as("lag_p"),
          coalesce(lead(col("l_extendedprice"), 1).over(wt), lit(-1.0)).as("lead_p"))
        .orderBy(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"))
    }),

    // RANGE frame (value-based, deterministic under ties): per supplier,
    // how many line items fall within 5 quantity units below this one
    "window_range_frame" -> ((s, dir) => {
      val l = Tables.table(s, dir, "lineitem").where(col("l_suppkey") <= 5)
      val w = Window.partitionBy(col("l_suppkey")).orderBy(col("l_quantity"))
        .rangeBetween(-5, 0)
      l.select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
          col("l_quantity"),
          count(lit(1)).over(w).as("range_n"),
          sum(col("l_quantity")).over(w).as("range_qty"))
        .orderBy(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"))
    }),

    // cross join (cartesian) — the only join shape not yet declared
    "join_cross" -> ((s, dir) =>
      Tables.table(s, dir, "nation")
        .crossJoin(Tables.table(s, dir, "region"))
        .groupBy(col("r_name"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("r_name"))),

    // unpivot/melt — wide-to-long reshaping (pivot's inverse)
    "unpivot_measures" -> ((s, dir) =>
      Tables.table(s, dir, "lineitem").where(col("l_suppkey") <= 3)
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_quantity"), col("l_discount"), col("l_tax"))
        .unpivot(
          Array(col("l_orderkey"), col("l_linenumber")),
          Array(col("l_quantity"), col("l_discount"), col("l_tax")),
          "measure", "val")
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("measure"))),

    // struct/map complex-type scalars: build + field access + keys
    "scalar_map_struct" -> ((s, dir) => {
      val st = struct(col("c_name").as("nm"), col("c_acctbal").as("bal"))
      val mp = map(lit("seg"), col("c_mktsegment"), lit("name"), col("c_name"))
      Tables.table(s, dir, "customer")
        .select(col("c_custkey"),
          st.getField("nm").as("sname"),
          st.getField("bal").as("sbal"),
          element_at(mp, "seg").as("seg_m"),
          concat_ws(",", array_sort(map_keys(mp))).as("m_keys"),
          size(mp).as("m_size"))
        .orderBy(col("c_custkey"))
    }),

    // regex scalar family
    "scalar_regex" -> ((s, dir) =>
      Tables.table(s, dir, "customer")
        .select(col("c_custkey"),
          regexp_extract(col("c_name"), "([0-9]+)", 1).as("digits"),
          col("c_name").rlike("00[0-9]").as("has_00x"),
          regexp_count(col("c_name"), lit("0")).as("n_zero"))
        .orderBy(col("c_custkey"))),

    // higher-order array functions: transform / filter / aggregate
    "scalar_array_hof" -> ((s, dir) => {
      val w = split(col("text"), " ")
      Tables.table(s, dir, "documents")
        .select(col("doc_id"),
          size(filter(w, x => length(x) > 4)).as("n_long"),
          aggregate(transform(w, x => length(x)), lit(0),
            (acc, x) => acc + x).as("chars_sum"),
          array_max(transform(w, x => length(x))).as("max_len"),
          concat_ws(",", slice(array_sort(w), 1, 3)).as("first3"))
        .orderBy(col("doc_id"))
    }),

    // JSON extraction: typed from_json + path extraction + predicate
    "json_parse" -> ((s, dir) =>
      Tables.events(s, dir)
        .select(col("event_id"),
          from_json(col("props"),
            org.apache.spark.sql.types.StructType.fromDDL("k INT"))
            .getField("k").as("k_typed"),
          get_json_object(col("props"), "$.k").cast("int").as("k_path"),
          col("props").contains("\"k\"").as("has_k"))
        .orderBy(col("event_id"))),

    // deterministic hash-gated Bernoulli sample: same selected set on
    // any partitioning, any cluster, any engine (oracle reproduces it)
    "sample_bernoulli" -> ((s, dir) =>
      DeterministicSample.bernoulli(
          Tables.events(s, dir), col("event_id").cast("string"), 10)
        .select(col("event_id"))
        .orderBy(col("event_id"))),

    // stratified variant: per-event_type rates via broadcast join
    "sample_stratified" -> ((s, dir) =>
      DeterministicSample.stratified(
          Tables.events(s, dir), col("event_type"),
          col("event_id").cast("string"), StratRates, StratDefault)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("event_type"))),

    // sliding windows through Structured Streaming (overlapping-window
    // state the reference lacks; tumbling covered by stream_windowed_agg)
    "stream_sliding_agg" -> ((s, dir) =>
      graft.streaming.StreamingOps.streamSlidingAgg(s, dir)),

    // session windows through Structured Streaming (merging-window state)
    "stream_session_agg" -> ((s, dir) =>
      graft.streaming.StreamingOps.streamSessionAgg(s, dir))
  )

  def oracleSql: Map[String, String] = Map(
    "grouping_sets" ->
      """SELECT GROUPING(l_returnflag, l_linestatus) AS gid,
        |       l_returnflag, l_linestatus, COUNT(*) AS n,
        |       CAST(SUM(CAST(l_quantity AS DECIMAL(20,4))) AS DOUBLE) AS qty
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
        |ORDER BY gid, l_returnflag, l_linestatus""".stripMargin,

    "window_rank_funcs" ->
      """WITH l AS (SELECT * FROM lineitem WHERE l_suppkey <= 5)
        |SELECT l_suppkey, l_orderkey, l_linenumber,
        |       RANK() OVER wq AS rnk,
        |       DENSE_RANK() OVER wq AS drnk,
        |       NTILE(4) OVER wt AS nt,
        |       COALESCE(LAG(l_extendedprice, 1) OVER wt, -1.0) AS lag_p,
        |       COALESCE(LEAD(l_extendedprice, 1) OVER wt, -1.0) AS lead_p
        |FROM l
        |WINDOW wq AS (PARTITION BY l_suppkey ORDER BY l_quantity),
        |       wt AS (PARTITION BY l_suppkey
        |              ORDER BY l_extendedprice, l_orderkey, l_linenumber)
        |ORDER BY l_suppkey, l_orderkey, l_linenumber""".stripMargin,

    "window_range_frame" ->
      """WITH l AS (SELECT * FROM lineitem WHERE l_suppkey <= 5)
        |SELECT l_suppkey, l_orderkey, l_linenumber, l_quantity,
        |       COUNT(*) OVER w AS range_n,
        |       SUM(l_quantity) OVER w AS range_qty
        |FROM l
        |WINDOW w AS (PARTITION BY l_suppkey ORDER BY l_quantity
        |             RANGE BETWEEN 5 PRECEDING AND CURRENT ROW)
        |ORDER BY l_suppkey, l_orderkey, l_linenumber""".stripMargin,

    "join_cross" ->
      """SELECT r_name, COUNT(*) AS n FROM nation CROSS JOIN region
        |GROUP BY r_name ORDER BY r_name""".stripMargin,

    "unpivot_measures" ->
      """SELECT l_orderkey, l_linenumber, measure, val FROM (
        |  SELECT l_orderkey, l_linenumber, 'l_quantity' AS measure, l_quantity AS val
        |  FROM lineitem WHERE l_suppkey <= 3
        |  UNION ALL
        |  SELECT l_orderkey, l_linenumber, 'l_discount', l_discount
        |  FROM lineitem WHERE l_suppkey <= 3
        |  UNION ALL
        |  SELECT l_orderkey, l_linenumber, 'l_tax', l_tax
        |  FROM lineitem WHERE l_suppkey <= 3)
        |ORDER BY l_orderkey, l_linenumber, measure""".stripMargin,

    "scalar_map_struct" ->
      """SELECT c_custkey, c_name AS sname, c_acctbal AS sbal,
        |       c_mktsegment AS seg_m, 'name,seg' AS m_keys, 2 AS m_size
        |FROM customer ORDER BY c_custkey""".stripMargin,

    "scalar_regex" ->
      """SELECT c_custkey,
        |       regexp_extract(c_name, '([0-9]+)', 1) AS digits,
        |       regexp_matches(c_name, '00[0-9]') AS has_00x,
        |       CAST(len(regexp_extract_all(c_name, '0')) AS INT) AS n_zero
        |FROM customer ORDER BY c_custkey""".stripMargin,

    "scalar_array_hof" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS wd FROM documents)
        |SELECT doc_id,
        |       CAST(len(list_filter(wd, x -> length(x) > 4)) AS INT) AS n_long,
        |       CAST(list_sum(list_transform(wd, x -> length(x))) AS INT) AS chars_sum,
        |       CAST(list_max(list_transform(wd, x -> length(x))) AS INT) AS max_len,
        |       array_to_string(list_sort(wd)[1:3], ',') AS first3
        |FROM t ORDER BY doc_id""".stripMargin,

    "json_parse" ->
      """SELECT event_id,
        |       CAST(json_extract_string(props, 'k') AS INT) AS k_typed,
        |       CAST(json_extract_string(props, 'k') AS INT) AS k_path,
        |       props LIKE '%"k"%' AS has_k
        |FROM events ORDER BY event_id""".stripMargin,

    "sample_bernoulli" -> {
      val gate = DeterministicSample.bernoulliGateSql("CAST(event_id AS VARCHAR)", 10)
      s"""SELECT event_id FROM events WHERE $gate ORDER BY event_id"""
    },

    "sample_stratified" -> {
      val gate = DeterministicSample.stratifiedGateSql(
        "event_type", "CAST(event_id AS VARCHAR)", StratRates, StratDefault)
      s"""SELECT event_type, COUNT(*) AS n FROM events WHERE $gate
         |GROUP BY event_type ORDER BY event_type""".stripMargin
    },

    "stream_sliding_agg" ->
      """WITH ev AS (SELECT date_trunc('day', ts) AS d0, event_type FROM events),
        |x AS (SELECT unnest([d0, d0 - INTERVAL 1 DAY]) AS ws, event_type FROM ev)
        |SELECT strftime(ws, '%Y-%m-%d') AS wstart, event_type, COUNT(*) AS n
        |FROM x GROUP BY wstart, event_type ORDER BY wstart, event_type""".stripMargin,

    // lag/cumsum sessionization restricted to CLOSED sessions (session
    // end = last event + gap <= global max ts) — append-mode streaming
    // emits exactly those; each key's trailing session stays open
    "stream_session_agg" ->
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
        |FROM closed GROUP BY user_id ORDER BY user_id""".stripMargin
  )
}
