package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.{PortableHash, Tables}

/**
 * Round-7 wave: evaluation utilities — fixed-size uniform corpus
 * sampling and score calibration.
 *
 *  - global_sample_k: a deterministic fixed-SIZE uniform sample (the
 *    "pick exactly 100 docs for human eval" primitive; Bernoulli gates
 *    give a fixed RATE, not a fixed size). Selection = first K by
 *    portable hash — a distributed TakeOrdered (per-partition heaps +
 *    driver merge of K rows), never a global sort; identical sample on
 *    any engine/partitioning.
 *  - calibration_bins: reliability-diagram bins for a predicted score
 *    against observed labels — the eval that catches a well-ranked but
 *    mis-calibrated quality classifier. Score = integer stopword rate
 *    (per-mille, exact), label = lang='en' (stopword hits genuinely
 *    predict English); deciles via ntile over a fully tie-broken order
 *    (both engines split remainder buckets identically by position).
 */
object ExtQueries26 {

  private val SampleK = 100

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    "global_sample_k" -> ((s, dir) => {
      val d = Tables.table(s, dir, "documents")
        .withColumn("hv",
          PortableHash.hMod(concat(lit("gsk|"), col("doc_id").cast("string"))))
      d.orderBy(col("hv"), col("doc_id")).limit(SampleK)
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_in_sample"),
          sum(col("doc_id")).as("sum_ids"),
          sum(col("n_chars")).as("sum_chars"))
        .orderBy(col("source"))
    }),

    "calibration_bins" -> ((s, dir) => {
      val words = split(col("text"), " ")
      val nStop = size(filter(words,
        w => w.isin(graft.operators.TextAnalysis.EnStopwords: _*)))
      val scored = Tables.table(s, dir, "documents")
        .select(col("doc_id"),
          (nStop * 1000L).cast("long").as("nstop_k"),
          size(words).cast("long").as("nw"),
          when(col("lang") === "en", 1L).otherwise(0L).as("is_en"))
        .select(col("doc_id"), expr("nstop_k DIV nw").as("score_pm"), col("is_en"))
      // deciles via the distributed two-level-scan NTILE (bit-equal to
      // the oracle's NTILE window, but never funnels all docs into one
      // partition — the ranked set is document-cardinality)
      graft.operators.PrefixScan
        .ntileDistributed(scored, "score_pm", Seq("doc_id"), 10, "decile")
        .groupBy(col("decile"))
        .agg(count(lit(1)).as("n"),
          min(col("score_pm")).as("min_score"),
          max(col("score_pm")).as("max_score"),
          sum(col("is_en")).as("n_pos"),
          round(sum(col("is_en")) * lit(1.0) / count(lit(1)), 4).as("pos_rate"))
        .orderBy(col("decile"))
    })
  )

  def oracleSql: Map[String, String] = {
    val stop = graft.operators.TextAnalysis.EnStopwords
      .map(s => s"'$s'").mkString(", ")
    Map(

      "global_sample_k" -> {
        val hv = PortableHash.hModSql("'gsk|' || CAST(doc_id AS VARCHAR)")
        s"""WITH h AS (SELECT source, doc_id, n_chars, $hv AS hv FROM documents),
           |r AS (SELECT * FROM h ORDER BY hv, doc_id LIMIT ${SampleK})
           |SELECT source, COUNT(*) AS n_in_sample,
           |       CAST(SUM(doc_id) AS BIGINT) AS sum_ids,
           |       CAST(SUM(n_chars) AS BIGINT) AS sum_chars
           |FROM r GROUP BY source ORDER BY source""".stripMargin
      },

      "calibration_bins" ->
        s"""WITH t AS (
           |  SELECT doc_id,
           |         CAST(len(list_filter(string_split(text, ' '),
           |             w -> w IN ($stop))) * 1000
           |           // len(string_split(text, ' ')) AS BIGINT) AS score_pm,
           |         CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS is_en
           |  FROM documents),
           |b AS (SELECT *, NTILE(10) OVER (ORDER BY score_pm, doc_id) AS decile FROM t)
           |SELECT decile, COUNT(*) AS n,
           |       MIN(score_pm) AS min_score, MAX(score_pm) AS max_score,
           |       CAST(SUM(is_en) AS BIGINT) AS n_pos,
           |       round(SUM(is_en) * 1.0 / COUNT(*), 4) AS pos_rate
           |FROM b GROUP BY decile ORDER BY decile""".stripMargin
    )
  }
}
