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
      graft.streaming.StreamingOps.streamSessionAgg(s, dir)),

    // reference #6 in streaming form: transformWithState item-cut (first
    // fMax per item in event-time order); same oracle as cooc_item_cut
    "stream_item_cut" -> ((s, dir) =>
      graft.streaming.ItemCutStream.sampled(s, dir, fMax = 50)),

    // watermarked stream-stream join (reference §2.1(a): keyed two-input
    // connect = co-partitioned stream join); time-range-bounded state
    "stream_stream_join" -> ((s, dir) =>
      graft.streaming.StreamingOps.streamStreamJoin(s, dir)),

    // exact two-phase heavy hitters: Misra-Gries candidates (O(k)/
    // partition, no shuffle) -> broadcast semi-join recount -> threshold;
    // only candidate-matching rows ever shuffle
    "heavy_hitters" -> ((s, dir) => {
      val items = Tables.events(s, dir)
        .select(get_json_object(col("props"), "$.k").cast("int").as("item"))
      operators.HeavyHitters.exact(items, col("item"), threshold = 120)
        .select(col("key").cast("int").as("item"), col("n"))
        .orderBy(col("item"))
    }),

    // SQL frontend over the native LLR expression (GraftExtensions):
    // per event_type, LLR association between the type and value > 50
    "sql_llr" -> ((s, dir) => {
      GraftExtensions.register(s)
      Tables.events(s, dir).createOrReplaceTempView("events_v")
      s.sql("""
        WITH c AS (
          SELECT event_type,
                 SUM(CASE WHEN value > 50 THEN 1 ELSE 0 END) AS k11,
                 SUM(CASE WHEN value <= 50 THEN 1 ELSE 0 END) AS k12
          FROM events_v GROUP BY event_type),
        t AS (SELECT SUM(k11) AS t11, SUM(k12) AS t12 FROM c)
        SELECT event_type, k11, k12, t11 - k11 AS k21, t12 - k12 AS k22,
               ROUND(llr(k11, k12, t11 - k11, t12 - k12), 4) AS score
        FROM c CROSS JOIN t ORDER BY event_type""")
    })
  )

  /** DuckDB mirror of LogLikelihood.logLikelihoodRatio (xLogX(0)=0,
    * negatives clamped) — same shape as the cooc_llr_topk oracle. */
  private def llrSqlExpr(k11: String, k12: String, k21: String, k22: String): String = {
    def xlx(e: String) = s"(CASE WHEN ($e) = 0 THEN 0 ELSE ($e) * LN($e) END)"
    val all = xlx(s"$k11+$k12+$k21+$k22")
    s"""(2.0 * GREATEST(0.0,
       |  ($all - ${xlx(s"$k11+$k12")} - ${xlx(s"$k21+$k22")}) +
       |  ($all - ${xlx(s"$k11+$k21")} - ${xlx(s"$k12+$k22")}) -
       |  ($all - ${xlx(k11)} - ${xlx(k12)} - ${xlx(k21)} - ${xlx(k22)})))""".stripMargin
  }

  def oracleSql: Map[String, String] = Map(
    "heavy_hitters" ->
      """WITH i AS (SELECT CAST(json_extract_string(props, 'k') AS INT) AS item FROM events)
        |SELECT item, COUNT(*) AS n FROM i WHERE item IS NOT NULL GROUP BY item
        |HAVING COUNT(*) >= 120 ORDER BY item""".stripMargin,

    "stream_stream_join" ->
      """SELECT a.event_id AS l_id, b.event_id AS r_id
        |FROM events a JOIN events b
        |  ON a.user_id = b.user_id
        | AND a.event_type = 'view' AND b.event_type = 'purchase'
        | AND b.ts >= a.ts AND b.ts <= a.ts + INTERVAL 1 HOUR
        | AND a.event_id != b.event_id
        |ORDER BY l_id, r_id""".stripMargin,

    // identical to the batch cooc_item_cut oracle: the streaming
    // transformWithState fold must reproduce the batch first-fMax cut
    "stream_item_cut" ->
      """WITH ev AS (
        |  SELECT event_id, user_id AS usr,
        |         CAST(json_extract_string(props, 'k') AS INT) AS item, ts
        |  FROM events),
        |ranked AS (
        |  SELECT item, event_id, usr,
        |         ROW_NUMBER() OVER (PARTITION BY item ORDER BY ts, event_id) AS rn
        |  FROM ev)
        |SELECT item, event_id, usr AS "user" FROM ranked WHERE rn <= 50
        |ORDER BY item, event_id""".stripMargin,

    "sql_llr" ->
      s"""WITH c AS (
         |  SELECT event_type,
         |         SUM(CASE WHEN value > 50 THEN 1 ELSE 0 END) AS k11r,
         |         SUM(CASE WHEN value <= 50 THEN 1 ELSE 0 END) AS k12r
         |  FROM events GROUP BY event_type),
         |t AS (SELECT SUM(k11r) AS t11, SUM(k12r) AS t12 FROM c),
         |x AS (
         |  SELECT event_type, CAST(k11r AS BIGINT) AS k11, CAST(k12r AS BIGINT) AS k12,
         |         CAST(t11 - k11r AS BIGINT) AS k21, CAST(t12 - k12r AS BIGINT) AS k22
         |  FROM c CROSS JOIN t)
         |SELECT event_type, k11, k12, k21, k22,
         |       ROUND(${llrSqlExpr("k11", "k12", "k21", "k22")}, 4) AS score
         |FROM x ORDER BY event_type""".stripMargin,

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
