package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.operators.Cooccurrence

/**
 * Driver contract — maps every declared operator (SURVEY.md §2.2) to a
 * runnable query over the driver testdata plus an equivalent DuckDB oracle.
 *
 * Float discipline for oracle hash-matching:
 *  - sums/avgs of double columns go through DECIMAL so both engines compute
 *    the exact same value (double summation order is engine-dependent);
 *  - transcendental results (LLR, cosine) are rounded to 4 decimals, and any
 *    rank computed over them uses the *rounded* value with an explicit
 *    integer tiebreak, so top-K membership is engine-independent.
 */
object SparkEntry {

  private def table(spark: SparkSession, dir: String, name: String): DataFrame =
    graft.operators.Tables.table(spark, dir, name)

  /** Flagship query on sf=0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Cooccurrence.llrTopK(spark, "/root/testdata/sf0.001", 10)

  // ---------------------------------------------------------------------------
  // queries — one per implemented operator from SURVEY.md §2
  // ---------------------------------------------------------------------------

  /** Shadow guard: query/oracle registries concatenate maps from every
    * ExtQueries file — a reused name would silently REPLACE the earlier
    * entry (and drop its oracle from the gate). Fail loudly instead. */
  private def mergeDisjoint[V](parts: Seq[Map[String, V]]): Map[String, V] = {
    val merged = parts.reduce(_ ++ _)
    if (merged.size != parts.map(_.size).sum) {
      val dups = parts.flatMap(_.keys).groupBy(identity)
        .collect { case (k, ks) if ks.size > 1 => k }
      throw new IllegalStateException(
        s"duplicate query names across ExtQueries files: ${dups.mkString(", ")}")
    }
    merged
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    mergeDisjoint(baseQueries +: Seq(ExtQueries.queries, ExtQueries2.queries, ExtQueries3.queries, ExtQueries4.queries, ExtQueries5.queries, ExtQueries6.queries, ExtQueries7.queries, ExtQueries8.queries, ExtQueries9.queries, ExtQueries10.queries, ExtQueries11.queries, ExtQueries12.queries, ExtQueries13.queries, ExtQueries14.queries, ExtQueries15.queries, ExtQueries16.queries, ExtQueries17.queries, ExtQueries18.queries, ExtQueries19.queries, ExtQueries20.queries, ExtQueries21.queries, ExtQueries22.queries, ExtQueries23.queries, ExtQueries24.queries, ExtQueries25.queries, ExtQueries26.queries, ExtQueries27.queries, ExtQueries28.queries, ExtQueries29.queries, ExtQueries30.queries, ExtQueries31.queries, ExtQueries32.queries, ExtQueries33.queries, ExtQueries34.queries, ExtQueries35.queries, ExtQueries36.queries, ExtQueries37.queries, ExtQueries38.queries, ExtQueries39.queries, ExtQueries40.queries, ExtQueries41.queries, ExtQueries42.queries, ExtQueries43.queries, ExtQueries44.queries, ExtQueries45.queries, ExtQueries46.queries, ExtQueries47.queries, ExtQueries48.queries, ExtQueries49.queries, ExtQueries50.queries, ExtQueries51.queries, ExtQueries52.queries, ExtQueries53.queries, ExtQueries54.queries, ExtQueries55.queries, ExtQueries56.queries, ExtQueries57.queries, ExtQueries58.queries, ExtQueries59.queries, ExtQueries60.queries, ExtQueries61.queries))

  private def baseQueries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // --- co-occurrence pipeline (SURVEY §2 #4..#14, batch skip-cuts mode) ---
    "cooc_parse" -> ((s, dir) =>
      Cooccurrence.interactions(s, dir)
        .select(col("user"), col("item"), date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("ts_s"))
        .orderBy(col("ts_s"), col("user"), col("item"))),

    "cooc_pairs" -> ((s, dir) =>
      Cooccurrence.coocCounts(Cooccurrence.interactions(s, dir))
        .orderBy(col("item"), col("other"))),

    "cooc_rowsums" -> ((s, dir) =>
      Cooccurrence.rowSums(Cooccurrence.coocCounts(Cooccurrence.interactions(s, dir)))
        .orderBy(col("item"))),

    "cooc_llr_topk" -> ((s, dir) => Cooccurrence.llrTopK(s, dir, 10)),

    // Sampled pipeline with cuts >= data size: must equal the skip-cuts
    // batch result EXACTLY (the reference's own equivalence property) —
    // same oracle SQL as cooc_llr_topk.
    "cooc_sampled_nocuts_llr" -> ((s, dir) =>
      graft.operators.Sampling.llrTopKSampled(s, dir,
        fMax = 1000000, kMax = 1000000, seed = 42L, windowMs = 86400000L, k = 10)),

    // Real cuts, BOTH binding: item cut + user reservoir + refund cycle
    // live. Oracled since r13 — the portable hash draw (Sampling.drawFor)
    // lets the DuckDB oracle replay the identical sample window by window
    // (Sampling.sampledLlrOracleSql); semantics also covered by
    // SamplingSpec at fold grain.
    "cooc_sampled_llr" -> ((s, dir) =>
      graft.operators.Sampling.llrTopKSampled(s, dir,
        fMax = 60, kMax = 20, seed = 42L, windowMs = 86400000L, k = 10)),

    // item-cut, deterministic first-fMax-arrivals-per-item variant
    // (SURVEY §2 #6; arrival order == ascending ts in the reference)
    "cooc_item_cut" -> ((s, dir) => {
      val ev = table(s, dir, "events")
        .select(col("event_id"),
          col("user_id").cast("int").as("user"),
          get_json_object(col("props"), "$.k").cast("int").as("item"),
          col("ts"))
      val w = Window.partitionBy(col("item")).orderBy(col("ts"), col("event_id"))
      ev.withColumn("rn", row_number().over(w))
        .where(col("rn") <= 50)
        .select(col("item"), col("event_id"), col("user"))
        .orderBy(col("item"), col("event_id"))
    }),

    // user-cut, deterministic first-kMax variant (SURVEY §2 #7 append bound)
    "cooc_user_cut" -> ((s, dir) => {
      val ev = table(s, dir, "events")
        .select(col("event_id"),
          col("user_id").cast("int").as("user"),
          get_json_object(col("props"), "$.k").cast("int").as("item"),
          col("ts"))
      val w = Window.partitionBy(col("user")).orderBy(col("ts"), col("event_id"))
      ev.withColumn("rn", row_number().over(w))
        .where(col("rn") <= 100)
        .select(col("user"), col("event_id"), col("item"))
        .orderBy(col("user"), col("event_id"))
    }),

    // late-data drop (SURVEY §2 #6/#7 late filter): an event is late iff some
    // earlier-ingested event (by event_id) already carried a ts >= its ts.
    // The running watermark is a distributed two-level prefix scan
    // (PrefixScan) — not a global unpartitioned Window, which funnels
    // every row through one partition.
    "cooc_late_drop" -> ((s, dir) => {
      val ev = table(s, dir, "events")
        .select(col("event_id"), col("ts"))
      graft.operators.PrefixScan.runningMaxExclusive(ev, "event_id", "ts", "wm")
        .where(col("wm").isNull || col("ts") > col("wm"))
        .select(col("event_id"))
        .orderBy(col("event_id"))
    }),

    // tumbling event-time window aggregation (SURVEY §2 #10 analog)
    "windowed_agg" -> ((s, dir) =>
      table(s, dir, "events")
        .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("day"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast(DecimalType(20, 4))).cast("double").as("sum_value"))
        .orderBy(col("day"), col("event_type"))),

    // per-group top-K via rank (SURVEY §2 #14 relational form)
    "group_topk" -> ((s, dir) => {
      val cnt = table(s, dir, "events")
        .select(col("user_id"), get_json_object(col("props"), "$.k").cast("int").as("item"))
        .groupBy(col("user_id"), col("item")).agg(count(lit(1)).as("n"))
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("n").desc, col("item").asc)
      cnt.withColumn("rnk", row_number().over(w))
        .where(col("rnk") <= 3)
        .select(col("user_id"), col("rnk"), col("item"), col("n"))
        .orderBy(col("user_id"), col("rnk"))
    }),

    // --- relational surface over the TPC-H-ish tables ---
    "q1_agg" -> ((s, dir) =>
      table(s, dir, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity").cast(DecimalType(20, 4))).cast("double").as("sum_qty"),
          sum(col("l_extendedprice").cast(DecimalType(20, 4))).cast("double").as("sum_base_price"),
          // scale-8 product sums exceed 2^53 unscaled at bench SFs; round
          // the EXACT decimal to scale 2 first so the decimal->double
          // conversion is an exactly-representable division in any engine
          sum((col("l_extendedprice").cast(DecimalType(20, 4)) *
            (lit(BigDecimal(1)).cast(DecimalType(20, 4)) - col("l_discount").cast(DecimalType(20, 4)))))
            .cast(DecimalType(38, 2)).cast("double").as("sum_disc_price"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))),

    "q3_join" -> ((s, dir) => {
      val c = table(s, dir, "customer").where(col("c_mktsegment") === "BUILDING")
      val o = table(s, dir, "orders")
      val l = table(s, dir, "lineitem")
      c.join(o, col("c_custkey") === col("o_custkey"))
        .join(l, col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("o_orderkey"))
        .agg(sum((col("l_extendedprice").cast(DecimalType(20, 4)) *
          (lit(BigDecimal(1)).cast(DecimalType(20, 4)) - col("l_discount").cast(DecimalType(20, 4)))))
          .cast(DecimalType(38, 2)).cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("o_orderkey"))
        .limit(10)
    }),

    "broadcast_join" -> ((s, dir) => {
      val l = table(s, dir, "lineitem")
      val p = table(s, dir, "part")
      val sup = table(s, dir, "supplier")
      l.join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("p_brand"), col("s_name"))
        .agg(count(lit(1)).as("n"),
          sum(col("l_quantity").cast(DecimalType(20, 4))).cast("double").as("qty"))
        .orderBy(col("p_brand"), col("s_name"))
    }),

    "join_semi" -> ((s, dir) => {
      val c = table(s, dir, "customer")
      val o = table(s, dir, "orders").where(col("o_totalprice") > 100000)
      c.join(o, col("c_custkey") === col("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))
    }),

    "join_anti" -> ((s, dir) => {
      val c = table(s, dir, "customer")
      val o = table(s, dir, "orders")
      c.join(o, col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))
    }),

    "join_outer" -> ((s, dir) => {
      val n = table(s, dir, "nation")
      val c = table(s, dir, "customer")
      n.join(c, col("c_nationkey") === col("n_nationkey"), "left_outer")
        .groupBy(col("n_name"))
        .agg(count(col("c_custkey")).as("n_customers"))
        .orderBy(col("n_name"))
    }),

    "sort_limit" -> ((s, dir) =>
      table(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
        .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
        .limit(20)),

    "distinct_agg" -> ((s, dir) =>
      table(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(countDistinct(col("l_orderkey")).as("n_orders"),
          countDistinct(col("l_suppkey")).as("n_supps"))
        .orderBy(col("l_returnflag"))),

    "rollup_agg" -> ((s, dir) =>
      table(s, dir, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(grouping_id().as("gid"), count(lit(1)).as("n"))
        .select(col("gid"), col("l_returnflag"), col("l_linestatus"), col("n"))
        .orderBy(col("gid"), col("l_returnflag"), col("l_linestatus"))),

    "setop_union" -> ((s, dir) => {
      val a = table(s, dir, "orders").where(col("o_orderstatus") === "F").select(col("o_custkey"))
      val b = table(s, dir, "orders").where(col("o_totalprice") > 200000).select(col("o_custkey"))
      a.union(b).distinct().orderBy(col("o_custkey"))
    }),

    "setop_intersect" -> ((s, dir) => {
      val a = table(s, dir, "lineitem").select(col("l_suppkey").as("k"))
      val b = table(s, dir, "supplier").where(col("s_acctbal") > 0).select(col("s_suppkey").as("k"))
      a.intersect(b).orderBy(col("k"))
    }),

    "setop_except" -> ((s, dir) => {
      val a = table(s, dir, "customer").select(col("c_custkey").as("k"))
      val b = table(s, dir, "orders").select(col("o_custkey").as("k"))
      a.except(b).orderBy(col("k"))
    }),

    "window_running" -> ((s, dir) => {
      val l = table(s, dir, "lineitem").where(col("l_suppkey") <= 3)
      val w = Window.partitionBy(col("l_suppkey"))
        .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
      l.select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
          col("l_quantity").cast(DecimalType(20, 4)).as("qty_d"),
          col("l_shipdate"))
        .withColumn("running_qty",
          sum(col("qty_d")).over(w.rowsBetween(Window.unboundedPreceding, 0)).cast("double"))
        .withColumn("rn", row_number().over(w))
        .select(col("l_suppkey"), col("rn"), col("l_orderkey"), col("l_linenumber"), col("running_qty"))
        .orderBy(col("l_suppkey"), col("rn"))
    }),

    "scalar_string" -> ((s, dir) =>
      table(s, dir, "customer")
        .select(col("c_custkey"),
          upper(col("c_name")).as("uname"),
          substring(col("c_name"), 1, 8).as("prefix"),
          length(col("c_name")).as("name_len"),
          concat_ws("|", col("c_name"), col("c_mktsegment")).as("joined"))
        .orderBy(col("c_custkey"))),

    "scalar_date" -> ((s, dir) =>
      table(s, dir, "orders")
        .select(col("o_orderkey"),
          year(col("o_orderdate")).as("y"),
          month(col("o_orderdate")).as("m"),
          dayofmonth(col("o_orderdate")).as("d"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("ds"))
        .orderBy(col("o_orderkey"))),

    "scalar_math" -> ((s, dir) =>
      table(s, dir, "events")
        .select(col("event_id"),
          round(abs(col("value")), 2).as("abs_v"),
          floor(col("value")).cast("long").as("floor_v"),
          round(sqrt(abs(col("value"))), 4).as("sqrt_v"),
          round(ln(abs(col("value")) + 1), 4).as("ln_v"),
          pmod(col("event_id"), lit(7)).as("mod_v"))
        .orderBy(col("event_id"))),

    "case_when" -> ((s, dir) =>
      table(s, dir, "orders")
        .select(col("o_orderkey"),
          when(col("o_totalprice") < 50000, "small")
            .when(col("o_totalprice") < 150000, "medium")
            .otherwise("large").as("bucket"))
        .groupBy(col("bucket")).agg(count(lit(1)).as("n"))
        .orderBy(col("bucket"))),

    "explode_words" -> ((s, dir) =>
      table(s, dir, "documents")
        .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
        .groupBy(col("word")).agg(count(lit(1)).as("n"))
        .orderBy(col("word")))
  )

  // ---------------------------------------------------------------------------
  // oracleSql — DuckDB-runnable equivalents (same column names!)
  // ---------------------------------------------------------------------------

  /** Shared SQL fragment: parsed interactions from the events table. */
  private[graft] val interSql =
    "SELECT user_id AS usr, CAST(json_extract_string(props, 'k') AS INT) AS item, ts FROM events"

  /** Shared SQL fragment: the co-occurrence pair counts (C matrix).
    * cnt is CAST to BIGINT: DuckDB SUM(int) yields HUGEINT, which the
    * driver's pandas/arrow bridge turns into float64 -> hash mismatch. */
  private[graft] val pairsSql =
    s"""WITH inter AS ($interSql),
       |pu AS (SELECT usr, item, COUNT(*) AS n FROM inter GROUP BY usr, item),
       |pairs AS (
       |  SELECT a.item AS item, b.item AS other,
       |         CAST(SUM(CASE WHEN a.item = b.item THEN a.n * (a.n - 1) ELSE a.n * b.n END) AS BIGINT) AS cnt
       |  FROM pu a JOIN pu b ON a.usr = b.usr
       |  GROUP BY a.item, b.item
       |  HAVING SUM(CASE WHEN a.item = b.item THEN a.n * (a.n - 1) ELSE a.n * b.n END) > 0)
       |""".stripMargin

  /** LLR top-K rank tail over a CTE chain that ends in
    * `pairs(item, other, cnt)` — shared by every pipeline variant
    * (skip-cuts, sampled-nocuts, and the r13 replayed sampled pipeline). */
  private[graft] val llrRankTailSql: String =
    """, rs AS (SELECT item, SUM(cnt) AS row_sum FROM pairs GROUP BY item),
      |tot AS (SELECT SUM(cnt) AS total FROM pairs),
      |contingency AS (
      |  SELECT p.item, p.other, p.cnt AS k11,
      |         ri.row_sum - p.cnt AS k12,
      |         ro.row_sum - p.cnt AS k21,
      |         t.total + p.cnt - (ri.row_sum - p.cnt) - (ro.row_sum - p.cnt) AS k22
      |  FROM pairs p
      |  JOIN rs ri ON p.item = ri.item
      |  JOIN rs ro ON p.other = ro.item
      |  CROSS JOIN tot t),
      |scored AS (
      |  SELECT item, other, ROUND(2.0 * GREATEST(0.0,
      |      ((CASE WHEN k11+k12+k21+k22 = 0 THEN 0 ELSE (k11+k12+k21+k22) * LN(k11+k12+k21+k22) END
      |        - (CASE WHEN k11+k12 = 0 THEN 0 ELSE (k11+k12) * LN(k11+k12) END)
      |        - (CASE WHEN k21+k22 = 0 THEN 0 ELSE (k21+k22) * LN(k21+k22) END)) +
      |       (CASE WHEN k11+k12+k21+k22 = 0 THEN 0 ELSE (k11+k12+k21+k22) * LN(k11+k12+k21+k22) END
      |        - (CASE WHEN k11+k21 = 0 THEN 0 ELSE (k11+k21) * LN(k11+k21) END)
      |        - (CASE WHEN k12+k22 = 0 THEN 0 ELSE (k12+k22) * LN(k12+k22) END)) -
      |       (CASE WHEN k11+k12+k21+k22 = 0 THEN 0 ELSE (k11+k12+k21+k22) * LN(k11+k12+k21+k22) END
      |        - (CASE WHEN k11 = 0 THEN 0 ELSE k11 * LN(k11) END)
      |        - (CASE WHEN k12 = 0 THEN 0 ELSE k12 * LN(k12) END)
      |        - (CASE WHEN k21 = 0 THEN 0 ELSE k21 * LN(k21) END)
      |        - (CASE WHEN k22 = 0 THEN 0 ELSE k22 * LN(k22) END)))), 4) AS score
      |  FROM contingency),
      |ranked AS (
      |  SELECT item, other, score,
      |         ROW_NUMBER() OVER (PARTITION BY item ORDER BY score DESC, other) AS rnk
      |  FROM scored)
      |SELECT item, rnk, other, score FROM ranked WHERE rnk <= 10
      |ORDER BY item, rnk""".stripMargin

  /** Full LLR top-K oracle — shared by the skip-cuts batch pipeline and the
    * sampled pipeline with cuts >= data size (they must agree exactly). */
  private[graft] val llrTopKFullSql: String = pairsSql + llrRankTailSql

  def oracleSql: Map[String, String] =
    mergeDisjoint(baseOracleSql +: Seq(ExtQueries.oracleSql, ExtQueries2.oracleSql, ExtQueries3.oracleSql, ExtQueries4.oracleSql, ExtQueries5.oracleSql, ExtQueries6.oracleSql, ExtQueries7.oracleSql, ExtQueries8.oracleSql, ExtQueries9.oracleSql, ExtQueries10.oracleSql, ExtQueries11.oracleSql, ExtQueries12.oracleSql, ExtQueries13.oracleSql, ExtQueries14.oracleSql, ExtQueries15.oracleSql, ExtQueries16.oracleSql, ExtQueries17.oracleSql, ExtQueries18.oracleSql, ExtQueries19.oracleSql, ExtQueries20.oracleSql, ExtQueries21.oracleSql, ExtQueries22.oracleSql, ExtQueries23.oracleSql, ExtQueries24.oracleSql, ExtQueries25.oracleSql, ExtQueries26.oracleSql, ExtQueries27.oracleSql, ExtQueries28.oracleSql, ExtQueries29.oracleSql, ExtQueries30.oracleSql, ExtQueries31.oracleSql, ExtQueries32.oracleSql, ExtQueries33.oracleSql, ExtQueries34.oracleSql, ExtQueries35.oracleSql, ExtQueries36.oracleSql, ExtQueries37.oracleSql, ExtQueries38.oracleSql, ExtQueries39.oracleSql, ExtQueries40.oracleSql, ExtQueries41.oracleSql, ExtQueries42.oracleSql, ExtQueries43.oracleSql, ExtQueries44.oracleSql, ExtQueries45.oracleSql, ExtQueries46.oracleSql, ExtQueries47.oracleSql, ExtQueries48.oracleSql, ExtQueries49.oracleSql, ExtQueries50.oracleSql, ExtQueries51.oracleSql, ExtQueries52.oracleSql, ExtQueries53.oracleSql, ExtQueries54.oracleSql, ExtQueries55.oracleSql, ExtQueries56.oracleSql, ExtQueries57.oracleSql, ExtQueries58.oracleSql, ExtQueries59.oracleSql, ExtQueries60.oracleSql, ExtQueries61.oracleSql))

  private def baseOracleSql: Map[String, String] = Map(
    "cooc_parse" ->
      s"""WITH inter AS ($interSql)
         |SELECT usr AS "user", item, strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s
         |FROM inter ORDER BY ts_s, "user", item""".stripMargin,

    "cooc_pairs" -> (pairsSql + "SELECT item, other, cnt FROM pairs ORDER BY item, other"),

    "cooc_rowsums" -> (pairsSql +
      "SELECT item, CAST(SUM(cnt) AS BIGINT) AS row_sum FROM pairs GROUP BY item ORDER BY item"),

    "cooc_llr_topk" -> llrTopKFullSql,

    // sampled pipeline with cuts >= data size reduces to the exact batch result
    "cooc_sampled_nocuts_llr" -> llrTopKFullSql,

    // full sampled pipeline with LIVE cuts: the oracle replays item cut,
    // reservoir (portable hash draw), refunds, and delta emission, then
    // ranks through the same LLR tail
    "cooc_sampled_llr" -> graft.operators.Sampling.sampledLlrOracleSql(
      interSql, fMax = 60, kMax = 20, seed = 42L, windowMs = 86400000L,
      llrRankTail = llrRankTailSql),

    "cooc_item_cut" ->
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

    "cooc_user_cut" ->
      """WITH ev AS (
        |  SELECT event_id, user_id AS usr,
        |         CAST(json_extract_string(props, 'k') AS INT) AS item, ts
        |  FROM events),
        |ranked AS (
        |  SELECT usr, event_id, item,
        |         ROW_NUMBER() OVER (PARTITION BY usr ORDER BY ts, event_id) AS rn
        |  FROM ev)
        |SELECT usr AS "user", event_id, item FROM ranked WHERE rn <= 100
        |ORDER BY "user", event_id""".stripMargin,

    "cooc_late_drop" ->
      """WITH w AS (
        |  SELECT event_id, ts,
        |         MAX(ts) OVER (ORDER BY event_id
        |                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS wm
        |  FROM events)
        |SELECT event_id FROM w WHERE wm IS NULL OR ts > wm ORDER BY event_id""".stripMargin,

    "windowed_agg" ->
      """SELECT strftime(ts, '%Y-%m-%d') AS day, event_type, COUNT(*) AS n,
        |       CAST(SUM(CAST(value AS DECIMAL(20,4))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY day, event_type ORDER BY day, event_type""".stripMargin,

    "group_topk" ->
      """WITH cnt AS (
        |  SELECT user_id, CAST(json_extract_string(props, 'k') AS INT) AS item, COUNT(*) AS n
        |  FROM events GROUP BY user_id, item),
        |ranked AS (
        |  SELECT user_id, item, n,
        |         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY n DESC, item) AS rnk
        |  FROM cnt)
        |SELECT user_id, rnk, item, n FROM ranked WHERE rnk <= 3
        |ORDER BY user_id, rnk""".stripMargin,

    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |       CAST(SUM(CAST(l_quantity AS DECIMAL(20,4))) AS DOUBLE) AS sum_qty,
        |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(20,4))) AS DOUBLE) AS sum_base_price,
        |       CAST(round(SUM(CAST(l_extendedprice AS DECIMAL(20,4)) *
        |                (CAST(1 AS DECIMAL(20,4)) - CAST(l_discount AS DECIMAL(20,4)))),
        |            2) AS DOUBLE)
        |         AS sum_disc_price,
        |       COUNT(*) AS count_order
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q3_join" ->
      """SELECT o_orderkey,
        |       CAST(round(SUM(CAST(l_extendedprice AS DECIMAL(20,4)) *
        |                (CAST(1 AS DECIMAL(20,4)) - CAST(l_discount AS DECIMAL(20,4)))),
        |            2) AS DOUBLE)
        |         AS revenue
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |GROUP BY o_orderkey
        |ORDER BY revenue DESC, o_orderkey LIMIT 10""".stripMargin,

    "broadcast_join" ->
      """SELECT p_brand, s_name, COUNT(*) AS n,
        |       CAST(SUM(CAST(l_quantity AS DECIMAL(20,4))) AS DOUBLE) AS qty
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |GROUP BY p_brand, s_name ORDER BY p_brand, s_name""".stripMargin,

    "join_semi" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c_custkey AND o_totalprice > 100000)
        |ORDER BY c_custkey""".stripMargin,

    "join_anti" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,

    "join_outer" ->
      """SELECT n_name, COUNT(c_custkey) AS n_customers
        |FROM nation LEFT JOIN customer ON c_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin,

    "sort_limit" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
        |ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber LIMIT 20""".stripMargin,

    "distinct_agg" ->
      """SELECT l_returnflag, COUNT(DISTINCT l_orderkey) AS n_orders,
        |       COUNT(DISTINCT l_suppkey) AS n_supps
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "rollup_agg" ->
      """SELECT GROUPING(l_returnflag, l_linestatus) AS gid,
        |       l_returnflag, l_linestatus, COUNT(*) AS n
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY gid, l_returnflag, l_linestatus""".stripMargin,

    "setop_union" ->
      """SELECT DISTINCT o_custkey FROM (
        |  SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        |  UNION ALL
        |  SELECT o_custkey FROM orders WHERE o_totalprice > 200000)
        |ORDER BY o_custkey""".stripMargin,

    "setop_intersect" ->
      """SELECT l_suppkey AS k FROM lineitem
        |INTERSECT
        |SELECT s_suppkey AS k FROM supplier WHERE s_acctbal > 0
        |ORDER BY k""".stripMargin,

    "setop_except" ->
      """SELECT c_custkey AS k FROM customer
        |EXCEPT
        |SELECT o_custkey AS k FROM orders
        |ORDER BY k""".stripMargin,

    "window_running" ->
      """WITH l AS (SELECT * FROM lineitem WHERE l_suppkey <= 3)
        |SELECT l_suppkey,
        |       ROW_NUMBER() OVER w AS rn,
        |       l_orderkey, l_linenumber,
        |       CAST(SUM(CAST(l_quantity AS DECIMAL(20,4)))
        |            OVER (PARTITION BY l_suppkey
        |                  ORDER BY l_shipdate, l_orderkey, l_linenumber
        |                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
        |         AS running_qty
        |FROM l
        |WINDOW w AS (PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber)
        |ORDER BY l_suppkey, rn""".stripMargin,

    "scalar_string" ->
      """SELECT c_custkey, UPPER(c_name) AS uname, SUBSTR(c_name, 1, 8) AS prefix,
        |       LENGTH(c_name) AS name_len,
        |       CONCAT_WS('|', c_name, c_mktsegment) AS joined
        |FROM customer ORDER BY c_custkey""".stripMargin,

    "scalar_date" ->
      """SELECT o_orderkey, CAST(EXTRACT(year FROM o_orderdate) AS INT) AS y,
        |       CAST(EXTRACT(month FROM o_orderdate) AS INT) AS m,
        |       CAST(EXTRACT(day FROM o_orderdate) AS INT) AS d,
        |       strftime(o_orderdate, '%Y-%m-%d') AS ds
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "scalar_math" ->
      """SELECT event_id, ROUND(ABS(value), 2) AS abs_v,
        |       CAST(FLOOR(value) AS BIGINT) AS floor_v,
        |       ROUND(SQRT(ABS(value)), 4) AS sqrt_v,
        |       ROUND(LN(ABS(value) + 1), 4) AS ln_v,
        |       event_id % 7 AS mod_v
        |FROM events ORDER BY event_id""".stripMargin,

    "case_when" ->
      """SELECT CASE WHEN o_totalprice < 50000 THEN 'small'
        |            WHEN o_totalprice < 150000 THEN 'medium'
        |            ELSE 'large' END AS bucket, COUNT(*) AS n
        |FROM orders GROUP BY bucket ORDER BY bucket""".stripMargin,

    "explode_words" ->
      """SELECT word, COUNT(*) AS n FROM (
        |  SELECT unnest(string_split(text, ' ')) AS word FROM documents)
        |GROUP BY word ORDER BY word""".stripMargin
  )
}
