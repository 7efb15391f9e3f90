package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.{Cooccurrence, PortableHash, PrefixScan, Tables}

/**
 * Round-7 wave: decision-support operators over the co-occurrence /
 * event-stream data model. All rate/ratio outputs are integer-scaled
 * (ppm / centi via integer DIV) so both engines compute bit-identical
 * values — no float division anywhere.
 *
 *  - assoc_rules: market-basket association rules (support/confidence/
 *    lift) — the classic rule-mining view of the same per-user item
 *    baskets the reference's co-occurrence matrix is built from
 *    (reference: UserInteractionCounterOneInputStreamOperator.java
 *    pair generation; scoring swaps LLR for support/conf/lift).
 *  - graph_degree_hist: degree distribution of the item co-occurrence
 *    graph — the standard sanity chart for the matrix the reference
 *    maintains (row size ⇔ vertex degree).
 *  - sample_weighted_systematic: fixed-size weighted sample via
 *    systematic (cumulative-bucket) selection over a portable-hash
 *    order — pure integer arithmetic, exactly K picks counting
 *    multiplicity, built on the distributed two-level PrefixScan.
 *  - ab_assign_eval: deterministic experiment assignment (portable
 *    hash → arm) + per-arm conversion metrics.
 *  - text_readability_lix: LIX-style readability on the integer grid
 *    (fixed 12-word pseudo-sentences: the synthetic corpus carries no
 *    punctuation).
 *  - hazard_table: discrete time-to-first-purchase hazard (survival
 *    analysis table) with right-censoring at a user's last event.
 */
object ExtQueries29 {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Association rules at min-support 5 baskets. Scale posture: the
    // per-user basket self-join fans out per-user DISTINCT items squared
    // (bounded by the kMax user cut in the sampled pipeline); item
    // counts and the basket total are vocab-/scalar-sized → broadcast.
    "assoc_rules" -> ((s, dir) => {
      val inter = Cooccurrence.interactions(s, dir).where(col("item").isNotNull)
      val baskets = inter.select(col("user"), col("item")).distinct()
      val nu = baskets.agg(countDistinct(col("user")).as("nu"))
      val ic = baskets.groupBy(col("item")).agg(count(lit(1)).as("ni"))
      val pairs = baskets.as("a")
        .join(baskets.as("b"),
          col("a.user") === col("b.user") && col("a.item") < col("b.item"))
        .groupBy(col("a.item").as("item_a"), col("b.item").as("item_b"))
        .agg(count(lit(1)).as("n_ab"))
        .where(col("n_ab") >= 5)
      pairs
        .join(broadcast(ic.select(col("item").as("item_a"), col("ni").as("n_a"))), "item_a")
        .join(broadcast(ic.select(col("item").as("item_b"), col("ni").as("n_b"))), "item_b")
        .crossJoin(broadcast(nu))
        .select(col("item_a"), col("item_b"), col("n_ab"), col("n_a"), col("n_b"),
          expr("(n_ab * 1000000) DIV nu").as("supp_ppm"),
          expr("(n_ab * 1000000) DIV n_a").as("conf_ab_ppm"),
          expr("(n_ab * 1000000) DIV n_b").as("conf_ba_ppm"),
          expr("(n_ab * nu * 1000000) DIV (n_a * n_b)").as("lift_ppm"))
        .orderBy(col("lift_ppm").desc, col("item_a"), col("item_b"))
        .limit(100)
    }),

    // Degree distribution of the co-occurrence graph (off-diagonal row
    // entries per item → histogram). Two hash aggs over the pair table.
    "graph_degree_hist" -> ((s, dir) =>
      Cooccurrence.coocCounts(Cooccurrence.interactions(s, dir))
        .where(col("item") =!= col("other"))
        .groupBy(col("item")).agg(count(lit(1)).as("deg"))
        .groupBy(col("deg")).agg(count(lit(1)).as("n_items"))
        .orderBy(col("deg"))),

    // Weighted systematic sample of K=25 (by n_chars mass): order docs by
    // portable hash, take the exclusive weight prefix (distributed
    // two-level scan — no global window), and pick every crossing of a
    // total/K stride. Exactly K picks counting multiplicity; a doc with
    // w > total/K can be picked more than once (n_copies). Integer-exact.
    "sample_weighted_systematic" -> ((s, dir) => {
      val docs = Tables.table(s, dir, "documents")
        .select(col("doc_id"), col("n_chars").cast("long").as("w"),
          (PortableHash.hMod(concat(lit("ws|"), col("doc_id").cast("string")))
            * lit(16777216L) + col("doc_id")).as("pos"))
      val cum = PrefixScan.runningSumExclusive(docs, "pos", "w", "cum")
      val tot = docs.agg(sum(col("w")).as("total"))
      cum.crossJoin(broadcast(tot))
        .withColumn("n_copies",
          expr("(((cum + w) * 25) DIV total) - ((cum * 25) DIV total)"))
        .where(col("n_copies") >= 1)
        .select(col("doc_id"), col("w"), col("n_copies"))
        .orderBy(col("doc_id"))
    }),

    // Deterministic A/B assignment (hash of user id → arm) + per-arm
    // conversion funnel. One user-keyed agg, then a 2-row arm agg.
    "ab_assign_eval" -> ((s, dir) => {
      val perUser = Tables.events(s, dir)
        .groupBy(col("user_id"))
        .agg(max(when(col("event_type") === "purchase", 1).otherwise(0)).as("converted"),
          count(lit(1)).as("n_events"))
        .withColumn("arm",
          when(PortableHash.hMod(concat(lit("ab1|"), col("user_id").cast("string"))) % 2 === 0,
            "A").otherwise("B"))
      perUser.groupBy(col("arm"))
        .agg(count(lit(1)).as("n_users"),
          sum(col("converted")).as("n_converted"),
          sum(col("n_events")).as("n_events"))
        .select(col("arm"), col("n_users"), col("n_converted"), col("n_events"),
          expr("(n_converted * 1000000) DIV n_users").as("conv_ppm"),
          expr("(n_events * 100) DIV n_users").as("events_per_user_centi"))
        .orderBy(col("arm"))
    }),

    // LIX readability on the integer grid. The corpus has no sentence
    // punctuation, so sentences are fixed 12-word blocks (documented
    // proxy); long word = >= 6 chars per the LIX definition.
    // lix_centi = 100*(words/sentence) + 100*(100*longwords/words).
    "text_readability_lix" -> ((s, dir) =>
      Tables.table(s, dir, "documents")
        .select(col("doc_id"), split(col("text"), " ").as("ws"))
        .select(col("doc_id"),
          size(col("ws")).cast("long").as("n_words"),
          expr("CAST(size(filter(ws, x -> length(x) >= 6)) AS BIGINT)").as("longwords"))
        .withColumn("n_sent", expr("(n_words + 11) DIV 12"))
        .select(col("doc_id"), col("n_words"), col("longwords"),
          expr("((n_words * 100) DIV n_sent) + ((longwords * 10000) DIV n_words)")
            .as("lix_centi"))
        .orderBy(col("doc_id"))),

    // Discrete hazard of first purchase: per user, days from first event
    // to first purchase (or censoring at the last event). at_risk(d) =
    // users still unconverted and uncensored entering day d. The running
    // sum over DAY-AGGREGATED rows is bounded by the day span (30 here),
    // so the unpartitioned window runs over ≤ span rows — same
    // pre-aggregate-then-scan shape as ewma_anomaly, never over raw rows.
    "hazard_table" -> ((s, dir) => {
      val pu = Tables.events(s, dir)
        .groupBy(col("user_id"))
        .agg(min(expr("unix_micros(ts)")).as("first_us"),
          max(expr("unix_micros(ts)")).as("last_us"),
          min(when(col("event_type") === "purchase", expr("unix_micros(ts)"))).as("conv_us"))
      val spans = pu.select(
        when(col("conv_us").isNotNull, 1).otherwise(0).as("converted"),
        when(col("conv_us").isNotNull, expr("(conv_us - first_us) DIV 86400000000"))
          .otherwise(expr("(last_us - first_us) DIV 86400000000")).as("day"))
      // checkpoint the day-bounded aggregate: the total and the risk-set
      // scan both derive from it, so the events scan runs ONCE
      val byDay = spans.groupBy(col("day"))
        .agg(sum(col("converted")).as("n_conv"),
          count(lit(1)).as("n_day"))
        .withColumn("n_censor", col("n_day") - col("n_conv"))
        .localCheckpoint()
      val total = byDay.agg(coalesce(sum(col("n_day")), lit(0L)).as("n_total"))
      val w = Window.orderBy(col("day")).rowsBetween(Window.unboundedPreceding, -1)
      byDay.crossJoin(broadcast(total))
        .withColumn("n_at_risk",
          col("n_total") - coalesce(sum(col("n_day")).over(w), lit(0L)))
        .select(col("day"), col("n_at_risk"), col("n_conv"), col("n_censor"),
          expr("(n_conv * 1000000) DIV n_at_risk").as("hazard_ppm"))
        .orderBy(col("day"))
    })
  )

  def oracleSql: Map[String, String] = Map(

    "assoc_rules" ->
      s"""WITH inter AS (${SparkEntry.interSql}),
         |b AS (SELECT DISTINCT usr, item FROM inter WHERE item IS NOT NULL),
         |n AS (SELECT COUNT(DISTINCT usr) AS nu FROM b),
         |ic AS (SELECT item, COUNT(*) AS ni FROM b GROUP BY item),
         |p AS (SELECT a.item AS item_a, c.item AS item_b, COUNT(*) AS n_ab
         |      FROM b a JOIN b c ON a.usr = c.usr AND a.item < c.item
         |      GROUP BY a.item, c.item HAVING COUNT(*) >= 5)
         |SELECT item_a, item_b, n_ab, ia.ni AS n_a, ib.ni AS n_b,
         |       (n_ab * 1000000) // nu AS supp_ppm,
         |       (n_ab * 1000000) // ia.ni AS conf_ab_ppm,
         |       (n_ab * 1000000) // ib.ni AS conf_ba_ppm,
         |       (n_ab * nu * 1000000) // (ia.ni * ib.ni) AS lift_ppm
         |FROM p JOIN ic ia ON p.item_a = ia.item
         |       JOIN ic ib ON p.item_b = ib.item
         |       CROSS JOIN n
         |ORDER BY lift_ppm DESC, item_a, item_b LIMIT 100""".stripMargin,

    "graph_degree_hist" -> (SparkEntry.pairsSql +
      """SELECT deg, COUNT(*) AS n_items FROM (
        |  SELECT item, COUNT(*) AS deg FROM pairs WHERE item <> other GROUP BY item)
        |GROUP BY deg ORDER BY deg""".stripMargin),

    "sample_weighted_systematic" ->
      s"""WITH d AS (
         |  SELECT doc_id, CAST(n_chars AS BIGINT) AS w,
         |         ${PortableHash.hModSql("'ws|'||CAST(doc_id AS VARCHAR)")} * 16777216
         |           + doc_id AS pos
         |  FROM documents),
         |t AS (SELECT CAST(SUM(w) AS BIGINT) AS total FROM d),
         |c AS (SELECT doc_id, w,
         |        CAST(COALESCE(SUM(w) OVER (ORDER BY pos
         |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum
         |      FROM d)
         |SELECT doc_id, w,
         |       (((cum + w) * 25) // total) - ((cum * 25) // total) AS n_copies
         |FROM c CROSS JOIN t
         |WHERE (((cum + w) * 25) // total) - ((cum * 25) // total) >= 1
         |ORDER BY doc_id""".stripMargin,

    "ab_assign_eval" ->
      s"""WITH pu AS (
         |  SELECT user_id,
         |         MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS converted,
         |         COUNT(*) AS n_events,
         |         CASE WHEN ${PortableHash.hModSql("'ab1|'||CAST(user_id AS VARCHAR)")} % 2 = 0
         |              THEN 'A' ELSE 'B' END AS arm
         |  FROM events GROUP BY user_id)
         |SELECT arm, COUNT(*) AS n_users,
         |       CAST(SUM(converted) AS BIGINT) AS n_converted,
         |       CAST(SUM(n_events) AS BIGINT) AS n_events,
         |       (CAST(SUM(converted) AS BIGINT) * 1000000) // COUNT(*) AS conv_ppm,
         |       (CAST(SUM(n_events) AS BIGINT) * 100) // COUNT(*) AS events_per_user_centi
         |FROM pu GROUP BY arm ORDER BY arm""".stripMargin,

    "text_readability_lix" ->
      """WITH s AS (
        |  SELECT doc_id,
        |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
        |         CAST(len(list_filter(string_split(text, ' '),
        |                              x -> length(x) >= 6)) AS BIGINT) AS longwords
        |  FROM documents),
        |t AS (SELECT doc_id, n_words, longwords, (n_words + 11) // 12 AS n_sent FROM s)
        |SELECT doc_id, n_words, longwords,
        |       ((n_words * 100) // n_sent) + ((longwords * 10000) // n_words) AS lix_centi
        |FROM t ORDER BY doc_id""".stripMargin,

    "hazard_table" ->
      """WITH pu AS (
        |  SELECT user_id, MIN(epoch_us(ts)) AS first_us, MAX(epoch_us(ts)) AS last_us,
        |         MIN(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END) AS conv_us
        |  FROM events GROUP BY user_id),
        |s AS (
        |  SELECT CASE WHEN conv_us IS NOT NULL THEN 1 ELSE 0 END AS converted,
        |         CASE WHEN conv_us IS NOT NULL THEN (conv_us - first_us) // 86400000000
        |              ELSE (last_us - first_us) // 86400000000 END AS day
        |  FROM pu),
        |d AS (SELECT day, CAST(SUM(converted) AS BIGINT) AS n_conv,
        |             COUNT(*) AS n_day FROM s GROUP BY day),
        |c AS (SELECT day, n_conv, n_day - n_conv AS n_censor,
        |        (SELECT COUNT(*) FROM s)
        |          - CAST(COALESCE(SUM(n_day) OVER (ORDER BY day
        |              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
        |          AS n_at_risk
        |      FROM d)
        |SELECT day, n_at_risk, n_conv, n_censor,
        |       (n_conv * 1000000) // n_at_risk AS hazard_ppm
        |FROM c ORDER BY day""".stripMargin
  )
}
