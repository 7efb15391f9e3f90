package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.operators.{Dedup, DedupIndex, Tables}

/**
 * Round-8 wave: dedup-aware training-set construction — the numbers a
 * curation team derives from cluster structure when deciding what
 * actually enters the training mix.
 *
 *  - dedup_sample_weights: per-source effective corpus size under
 *    cluster-downweighting (each doc weighted 1/|its near-dup cluster|,
 *    the SemDeDup-style de-biasing of repeated content). Integer ppm
 *    arithmetic so both engines agree bit-for-bit.
 *  - token_dedup_savings: tokens before vs after keeping one
 *    representative per near-dup cluster — the "dedup saved X% of
 *    tokens" headline metric, per source.
 *  - quality_gate_by_source: per-source quality gate at the 70th
 *    percentile (distinct-token-ratio score, percent_rank over a
 *    deterministic (score, doc_id) total order) — top-of-distribution
 *    filtering that adapts to each feed's own quality profile.
 *
 * Scale posture: all three are one documents scan + the shared
 * simhash/CC machinery (which runs on the distinct-fingerprint graph);
 * the per-source aggregates are group-bounded, and the quality gate's
 * window partitions by source — never a global sort.
 */
object ExtQueries39 {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    "dedup_sample_weights" -> ((s, dir) => {
      val docs = Tables.table(s, dir, "documents")
      val comps = DedupIndex.simhashComponents(s, dir, 3)
        .withColumnRenamed("node", "doc_id")
      val sizes = comps.groupBy(col("comp")).agg(count(lit(1)).as("csize"))
      docs.select(col("doc_id"), col("source"))
        .join(comps, Seq("doc_id"), "left_outer")
        .join(sizes, Seq("comp"), "left_outer")
        .select(col("source"), coalesce(col("csize"), lit(1L)).as("csize"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(expr("1000000 DIV csize")).as("effective_ppm_sum"))
        .select(col("source"), col("n_docs"), col("effective_ppm_sum"),
          expr("effective_ppm_sum DIV n_docs").as("mean_weight_ppm"))
        .orderBy(col("source"))
    }),

    "token_dedup_savings" -> ((s, dir) => {
      val docs = Tables.table(s, dir, "documents")
      val comps = DedupIndex.simhashComponents(s, dir, 3)
        .withColumnRenamed("node", "doc_id")
      // cluster representative = the min-id member, which IS the comp
      // label; docs outside any cluster are their own representative
      val toks = docs.select(col("doc_id"), col("source"),
        size(split(col("text"), " ")).cast("long").as("n_tok"))
      toks.join(comps, Seq("doc_id"), "left_outer")
        .select(col("source"), col("n_tok"),
          (col("comp").isNull || col("comp") === col("doc_id")).as("kept"))
        .groupBy(col("source"))
        .agg(sum(col("n_tok")).as("total_tokens"),
          sum(when(col("kept"), col("n_tok")).otherwise(0L)).as("kept_tokens"))
        .select(col("source"), col("total_tokens"), col("kept_tokens"),
          expr("((total_tokens - kept_tokens) * 1000) DIV total_tokens").as("saved_pm"))
        .orderBy(col("source"))
    }),

    "quality_gate_by_source" -> ((s, dir) => {
      val docs = Tables.table(s, dir, "documents")
      val ws = split(col("text"), " ")
      val scored = docs.select(col("doc_id"), col("source"),
        (size(array_distinct(ws)).cast("double") / size(ws)).as("score"))
      val w = Window.partitionBy(col("source"))
        .orderBy(col("score"), col("doc_id"))
      scored.withColumn("pr", percent_rank().over(w))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_total"),
          sum(when(col("pr") >= 0.7, 1L).otherwise(0L)).as("n_kept"),
          round(min(when(col("pr") >= 0.7, col("score"))), 6).as("gate_score"))
        .orderBy(col("source"))
    })
  )

  /** Shared recursive-CC oracle prefix over the simhash pair CTEs:
    * binds `comp(doc_id, comp)`. */
  private val compCtes: String =
    s"""${ExtQueries.simhashPairsCtes},
       |sel AS (SELECT doc_a, doc_b FROM pairs
       |        WHERE bit_count(xor(fp_a, fp_b)) <= 3),
       |e AS (SELECT doc_a AS src, doc_b AS dst FROM sel
       |      UNION SELECT doc_b, doc_a FROM sel),
       |nodes AS (SELECT DISTINCT src AS node FROM e),
       |reach(node, lab) AS (
       |  SELECT node, node FROM nodes
       |  UNION
       |  SELECT e.dst, r.lab FROM reach r JOIN e ON e.src = r.node),
       |comp AS (SELECT node AS doc_id, MIN(lab) AS comp FROM reach GROUP BY node)""".stripMargin

  def oracleSql: Map[String, String] = Map(

    "dedup_sample_weights" ->
      s"""WITH RECURSIVE $compCtes,
         |sizes AS (SELECT comp, COUNT(*) AS csize FROM comp GROUP BY comp),
         |wt AS (SELECT d.source, COALESCE(s.csize, 1) AS csize
         |       FROM documents d
         |       LEFT JOIN comp c ON c.doc_id = d.doc_id
         |       LEFT JOIN sizes s ON s.comp = c.comp)
         |SELECT source, COUNT(*) AS n_docs,
         |       CAST(SUM(1000000 // csize) AS BIGINT) AS effective_ppm_sum,
         |       CAST(SUM(1000000 // csize) AS BIGINT) // COUNT(*) AS mean_weight_ppm
         |FROM wt GROUP BY source ORDER BY source""".stripMargin,

    "token_dedup_savings" ->
      s"""WITH RECURSIVE $compCtes,
         |toks AS (SELECT doc_id, source,
         |                CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
         |         FROM documents),
         |k AS (SELECT t.source, t.n_tok,
         |             (c.comp IS NULL OR c.comp = t.doc_id) AS kept
         |      FROM toks t LEFT JOIN comp c ON c.doc_id = t.doc_id)
         |SELECT source, CAST(SUM(n_tok) AS BIGINT) AS total_tokens,
         |       CAST(SUM(CASE WHEN kept THEN n_tok ELSE 0 END) AS BIGINT) AS kept_tokens,
         |       ((CAST(SUM(n_tok) AS BIGINT)
         |           - CAST(SUM(CASE WHEN kept THEN n_tok ELSE 0 END) AS BIGINT)) * 1000)
         |         // CAST(SUM(n_tok) AS BIGINT) AS saved_pm
         |FROM k GROUP BY source ORDER BY source""".stripMargin,

    "quality_gate_by_source" ->
      """WITH sc AS (SELECT doc_id, source,
        |              CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
        |                / len(string_split(text, ' ')) AS score
        |            FROM documents),
        |pr AS (SELECT source, score,
        |              PERCENT_RANK() OVER (PARTITION BY source
        |                                   ORDER BY score, doc_id) AS pr
        |       FROM sc)
        |SELECT source, COUNT(*) AS n_total,
        |       CAST(SUM(CASE WHEN pr >= 0.7 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
        |       round(MIN(CASE WHEN pr >= 0.7 THEN score END), 6) AS gate_score
        |FROM pr GROUP BY source ORDER BY source""".stripMargin
  )
}
