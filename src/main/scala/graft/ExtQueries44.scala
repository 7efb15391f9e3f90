package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.Tables

/**
 * Round-12 wave: exact repeated-SPAN analysis — the positional,
 * exact-substring half of corpus dedup (Lee et al. 2022, "Deduplicating
 * Training Data Makes Language Models Better", the ExactSubstr
 * component), at word-window grain. Distinct from the existing shingle
 * JACCARD family: those measure document SIMILARITY over distinct
 * shingle SETS; this measures duplicated token MASS — every window
 * position counts, including self-repetition inside one document, which
 * is exactly what span-level dedup would cut from the training mix.
 *
 *  - text_dup_spans: per doc, the fraction of its 8-word window
 *    positions whose exact text occurs >= 2 times corpus-wide.
 *  - text_top_spans: the most-repeated spans with occurrence and
 *    document counts — the boilerplate report a curation pass reads.
 *
 * Plan shape at 100 TB: one scan + doc-partitioned lead window builds
 * positional spans; one hash shuffle on the span counts occurrences;
 * the dup flag comes back via a join on span whose build side is the
 * FILTERED repeated-span set (boilerplate is sparse relative to the
 * corpus — AQE broadcasts when it fits); one per-doc hash aggregation.
 * Nothing is ever doc x doc.
 */
object ExtQueries44 {

  private val SpanWords = 8

  /** Positional 8-word spans: (doc_id, span), one row per window
    * POSITION (no distinct — mass, not membership). */
  private def spans(s: SparkSession, dir: String): DataFrame = {
    val w = Tables.table(s, dir, "documents").select(col("doc_id"),
      posexplode(split(col("text"), " ")).as(Seq("pos", "word")))
    val win = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val parts = (0 until SpanWords).map(i =>
      if (i == 0) col("word") else lead(col("word"), i).over(win))
    w.select(col("doc_id"), concat_ws(" ", parts: _*).as("span"),
        parts.last.isNotNull.as("__full"))
      .where(col("__full")).drop("__full")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    "text_dup_spans" -> ((s, dir) => {
      val sp = spans(s, dir).localCheckpoint(true) // two consumers below
      val repeated = sp.groupBy(col("span")).agg(count(lit(1)).as("c"))
        .where(col("c") >= 2)
        .select(col("span"), lit(1).as("dup"))
      sp.join(repeated, Seq("span"), "left_outer")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_windows"),
          sum(coalesce(col("dup"), lit(0))).cast("long").as("n_dup"))
        .select(col("doc_id"), col("n_windows"), col("n_dup"),
          round(col("n_dup") * lit(1.0) / col("n_windows"), 4).as("dup_frac"))
        .orderBy(col("doc_id"))
    }),

    "text_top_spans" -> ((s, dir) => {
      spans(s, dir)
        .groupBy(col("span"))
        .agg(count(lit(1)).as("n_occ"),
          count_distinct(col("doc_id")).as("n_docs"))
        .where(col("n_occ") >= 2)
        .orderBy(col("n_occ").desc, col("span"))
        .limit(20)
    })
  )

  def oracleSql: Map[String, String] = {
    val spanExpr = (0 until SpanWords).map(i => s"w[i+$i]").mkString(" || ' ' || ")
    val spCte =
      s"""wd AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
         |sp AS (SELECT doc_id, $spanExpr AS span
         |       FROM wd, UNNEST(range(1, len(w) - ${SpanWords - 2})) r(i))""".stripMargin
    Map(
      "text_dup_spans" ->
        s"""WITH $spCte,
           |c AS (SELECT span, COUNT(*) AS c FROM sp GROUP BY span)
           |SELECT sp.doc_id,
           |       COUNT(*) AS n_windows,
           |       CAST(SUM(CASE WHEN c.c >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup,
           |       ROUND(SUM(CASE WHEN c.c >= 2 THEN 1 ELSE 0 END) * 1.0
           |             / COUNT(*), 4) AS dup_frac
           |FROM sp JOIN c USING (span)
           |GROUP BY sp.doc_id ORDER BY sp.doc_id""".stripMargin,

      "text_top_spans" ->
        s"""WITH $spCte
           |SELECT span, COUNT(*) AS n_occ, COUNT(DISTINCT doc_id) AS n_docs
           |FROM sp GROUP BY span HAVING COUNT(*) >= 2
           |ORDER BY n_occ DESC, span LIMIT 20""".stripMargin
    )
  }
}
