package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.operators.Tables

/**
 * Round-7 wave: mixture temperature and the nearest as-of join.
 *
 *  - mix_temperature: temperature-scaled source sampling weights
 *    (w_i ∝ share_i^(1/T), here T=2 i.e. sqrt) — the standard
 *    rebalancing used for multilingual/multi-domain LLM mixes
 *    (up-weights small sources, down-weights dominant ones). Float
 *    discipline: sqrt is IEEE correctly-rounded on both engines (unlike
 *    pow, whose libm differs), the rounded weights are summed through
 *    DECIMAL, and the final ratios divide exactly-representable
 *    decimal casts — bit-stable cross-engine.
 *  - join_asof_nearest: nearest order in EITHER time direction per
 *    event (the bidirectional completion of join_asof backward /
 *    join_asof_forward): same per-event window-rank-over-user-equi-join
 *    shape, ranked by (|Δdays|, direction-stable tiebreaks).
 */
object ExtQueries25 {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    "mix_temperature" -> ((s, dir) => {
      val d = Tables.table(s, dir, "documents")
        .groupBy(col("source"))
        .agg(sum(col("n_chars")).as("toks"), count(lit(1)).as("n_docs"))
      val tot = d.agg(sum(col("toks")).as("tot"))
      val withShare = d.crossJoin(broadcast(tot))
        .withColumn("share", col("toks") * lit(1.0) / col("tot"))
        // sqrt is correctly rounded (IEEE 754) — portable; pin the grid
        // before the cross-source normalization sum
        .withColumn("w_raw", round(sqrt(col("share")), 9).cast(DecimalType(12, 9)))
      val wsum = withShare.agg(sum(col("w_raw")).as("wsum"))
      withShare.crossJoin(broadcast(wsum))
        .select(col("source"), col("n_docs"), col("toks"),
          round(col("share"), 6).as("share"),
          round(col("w_raw").cast("double") / col("wsum").cast("double"), 6)
            .as("weight"),
          // boost > 1 = up-weighted by the temperature (small sources)
          round(col("w_raw").cast("double") / col("wsum").cast("double")
            / (col("toks") * lit(1.0) / col("tot")), 4).as("boost"))
        .orderBy(col("source"))
    }),

    "join_asof_nearest" -> ((s, dir) => {
      val e = Tables.events(s, dir)
        .select(col("event_id"), col("user_id"), to_date(col("ts")).as("ed"))
      val o = Tables.table(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"))
      val w = Window.partitionBy(col("event_id"))
        .orderBy(col("dist"), col("o_orderdate"), col("o_orderkey"))
      e.join(o, col("user_id") === col("o_custkey"), "left_outer")
        .withColumn("dist", abs(datediff(col("o_orderdate"), col("ed"))))
        .withColumn("rn", row_number().over(w))
        .where(col("rn") === 1)
        .select(col("event_id"), col("user_id"),
          coalesce(col("o_orderkey"), lit(-1L)).as("nearest_order"),
          coalesce(date_format(col("o_orderdate"), "yyyy-MM-dd"), lit("none"))
            .as("nearest_date"),
          coalesce(col("dist"), lit(-1)).cast("long").as("dist_days"))
        .orderBy(col("event_id"))
    })
  )

  def oracleSql: Map[String, String] = Map(

    "mix_temperature" ->
      """WITH d AS (SELECT source, CAST(SUM(n_chars) AS BIGINT) AS toks,
        |                  COUNT(*) AS n_docs
        |           FROM documents GROUP BY source),
        |t AS (SELECT SUM(toks) AS tot FROM d),
        |w AS (SELECT source, n_docs, toks, toks * 1.0 / tot AS share,
        |        CAST(round(sqrt(toks * 1.0 / tot), 9) AS DECIMAL(12,9)) AS w_raw
        |      FROM d CROSS JOIN t),
        |ws AS (SELECT SUM(w_raw) AS wsum FROM w)
        |SELECT source, n_docs, toks, round(share, 6) AS share,
        |       round(CAST(w_raw AS DOUBLE) / CAST(wsum AS DOUBLE), 6) AS weight,
        |       round(CAST(w_raw AS DOUBLE) / CAST(wsum AS DOUBLE) / share, 4) AS boost
        |FROM w CROSS JOIN ws ORDER BY source""".stripMargin,

    "join_asof_nearest" ->
      """WITH j AS (
        |  SELECT e.event_id, e.user_id, o.o_orderkey, o.o_orderdate,
        |         abs(date_diff('day', CAST(e.ts AS DATE), o.o_orderdate)) AS dist
        |  FROM events e LEFT JOIN orders o ON e.user_id = o.o_custkey),
        |r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY event_id
        |        ORDER BY dist, o_orderdate, o_orderkey) AS rn FROM j)
        |SELECT event_id, user_id,
        |       COALESCE(o_orderkey, -1) AS nearest_order,
        |       COALESCE(strftime(o_orderdate, '%Y-%m-%d'), 'none') AS nearest_date,
        |       CAST(COALESCE(dist, -1) AS BIGINT) AS dist_days
        |FROM r WHERE rn = 1 ORDER BY event_id""".stripMargin
  )
}
