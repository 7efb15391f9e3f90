package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.Tables

/**
 * Rounds 12-13: exact repeated-SPAN analysis and the span-cut transform —
 * the positional, exact-substring half of corpus dedup (Lee et al. 2022,
 * "Deduplicating Training Data Makes Language Models Better", the
 * ExactSubstr component), at word-window grain. Distinct from the existing
 * shingle JACCARD family: those measure document SIMILARITY over distinct
 * shingle SETS; this measures duplicated token MASS — every window
 * position counts, including self-repetition inside one document, which
 * is exactly what span-level dedup cuts from the training mix.
 *
 *  - text_dup_spans: per doc, the fraction of its 8-word window
 *    positions whose exact text occurs >= 2 times corpus-wide.
 *  - text_top_spans: the most-repeated spans with occurrence and
 *    document counts — the boilerplate report a curation pass reads.
 *  - text_span_cut: the TRANSFORM — every word covered by any
 *    corpus-repeated window is excised (overlapping windows coalesce),
 *    emitting the cut document plus kept/total word accounting.
 *  - text_span_savings: the corpus-level token-savings report of that
 *    transform (the number Lee et al. headline).
 *
 * Plan shape at 100 TB: spans are keyed by a 128-BIT hash pair (two
 * independent-seed xxhash64 columns) the moment they are formed — the
 * ~50-byte span STRING never shuffles and is never materialized
 * corpus-wide (the r12 shape localCheckpointed one string row per
 * corpus token: an executor-storage cliff, then 6x the needed shuffle
 * volume). 128 bits, not 64 (r13 verdict #2): at ~1e13 window positions
 * a single 64-bit key expects millions of birthday collisions, each one
 * falsely marking a span corpus-repeated and text_span_cut then
 * excising legitimate text; at 128 bits the expected collision count at
 * the same scale is ~1e-12 — the family stays exact-in-practice at the
 * stated posture for the price of 8 extra bytes per key row. Counting,
 * the repeated-set semi-join, and the coverage join all move 16-byte
 * keys; the only strings that survive an
 * exchange are one per (span, doc) partial for the 20-row top report,
 * and the per-doc rebuild in the cut transform (inherent to emitting
 * documents). Recomputing the span projection for a second consumer is
 * one scan + one doc-partitioned window — cheaper than storing it.
 * Nothing is ever doc x doc.
 */
object ExtQueries44 {

  private val SpanWords = 8

  /** Per-word rows with the 8-word window STRING starting at each
    * position: (doc_id, pos, word, span) — span is null for the last
    * SpanWords-1 positions (incomplete window). The string exists only
    * inside this projection; consumers hash or aggregate it away before
    * any exchange. */
  private def wordSpans(s: SparkSession, dir: String): DataFrame = {
    val w = Tables.table(s, dir, "documents").select(col("doc_id"),
      posexplode(split(col("text"), " ")).as(Seq("pos", "word")))
    val win = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val parts = (0 until SpanWords).map(i =>
      if (i == 0) col("word") else lead(col("word"), i).over(win))
    w.select(col("doc_id"), col("pos"), col("word"),
      when(parts.last.isNotNull, concat_ws(" ", parts: _*)).as("span"))
  }

  /** The 128-bit span key: two xxhash64 halves over DIFFERENT inputs
    * (bare span; salt-prefixed span) — independent functions of the
    * span, so a collision needs both halves to collide at once.
    * Null-guarded: xxhash64(null) is the SEED, not null, so unguarded
    * keys would alias every incomplete tail window onto one bogus key. */
  private def spanKey(span: Column): Seq[Column] = Seq(
    when(span.isNotNull, xxhash64(span)).as("h1"),
    when(span.isNotNull, xxhash64(lit("graft-span-k2"), span)).as("h2"))

  /** Hashed positional spans: (doc_id, pos, h1, h2) — one 16-byte key
    * row per full window position. This is the only shape the span
    * family shuffles. */
  private def spanHashes(s: SparkSession, dir: String): DataFrame =
    wordSpans(s, dir).where(col("span").isNotNull)
      .select(col("doc_id") +: col("pos") +: spanKey(col("span")): _*)

  /** Distinct 128-bit keys of corpus-repeated spans (>= 2 occurrences). */
  private def repeatedHashes(sp: DataFrame): DataFrame =
    sp.groupBy(col("h1"), col("h2")).agg(count(lit(1)).as("c"))
      .where(col("c") >= 2).select(col("h1"), col("h2"))

  /** Per-word coverage frame: (doc_id, pos, word, cv) where cv = 1 iff
    * the word lies inside any corpus-repeated window (a repeated span
    * STARTS within the SpanWords-1 positions at or before it —
    * overlapping spans coalesce by construction of the running max). */
  private def coverage(s: SparkSession, dir: String): DataFrame = {
    val sp = spanHashes(s, dir)
    // semi-join words' window hash against the repeated set: the build
    // side is the FILTERED repeated-hash set (sparse relative to the
    // corpus — AQE broadcasts it when it fits), keys are 8 bytes
    val dup = repeatedHashes(sp).withColumn("dup", lit(1))
    val flagged = wordSpans(s, dir)
      .select(col("doc_id") +: col("pos") +: col("word") +:
        spanKey(col("span")): _*)
      .join(dup, Seq("h1", "h2"), "left_outer")
      .select(col("doc_id"), col("pos"), col("word"),
        coalesce(col("dup"), lit(0)).as("is_start"))
    val win = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
      .rowsBetween(-(SpanWords - 1), Window.currentRow)
    flagged.select(col("doc_id"), col("pos"), col("word"),
      max(col("is_start")).over(win).as("cv"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    "text_dup_spans" -> ((s, dir) => {
      // two consumers of the hashed span stream; recomputing it is one
      // scan + one doc-partitioned window per consumer — no corpus-wide
      // materialization (r12 verdict #1)
      val sp = spanHashes(s, dir).select(col("doc_id"), col("h1"), col("h2"))
      val repeated = repeatedHashes(spanHashes(s, dir)).withColumn("dup", lit(1))
      sp.join(repeated, Seq("h1", "h2"), "left_outer")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_windows"),
          sum(coalesce(col("dup"), lit(0))).cast("long").as("n_dup"))
        .select(col("doc_id"), col("n_windows"), col("n_dup"),
          round(col("n_dup") * lit(1.0) / col("n_windows"), 4).as("dup_frac"))
        .orderBy(col("doc_id"))
    }),

    "text_top_spans" -> ((s, dir) => {
      // two passes so span STRINGS only ever shuffle for spans already
      // known repeated: pass 1 counts keys (16-byte rows), pass 2
      // semi-joins the stream against the sparse repeated set (AQE
      // broadcasts it) and aggregates strings for those rows alone
      val rep = repeatedHashes(spanHashes(s, dir))
      wordSpans(s, dir).where(col("span").isNotNull)
        .select(col("doc_id") +: col("span") +: spanKey(col("span")): _*)
        .join(rep, Seq("h1", "h2"), "left_semi")
        .groupBy(col("h1"), col("h2"))
        .agg(count(lit(1)).as("n_occ"),
          count_distinct(col("doc_id")).as("n_docs"),
          min(col("span")).as("span"))
        .select(col("span"), col("n_occ"), col("n_docs"))
        .orderBy(col("n_occ").desc, col("span"))
        .limit(20)
    }),

    "text_span_cut" -> ((s, dir) => {
      // the ExactSubstr TRANSFORM: emit each doc with every covered word
      // excised. The per-doc rebuild (collect kept words in position
      // order) is the one place strings re-materialize — inherent to
      // emitting documents, grouped on the window's own doc partitioning
      coverage(s, dir)
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_words"),
          sum(lit(1) - col("cv")).cast("long").as("n_kept"),
          array_join(transform(
            array_sort(collect_list(when(col("cv") === 0,
              struct(col("pos"), col("word"))))),
            x => x("word")), " ").as("kept_text"))
        .orderBy(col("doc_id"))
    }),

    "text_span_savings" -> ((s, dir) =>
      // corpus-level token-savings report: one global aggregate over the
      // coverage frame, no per-doc text rebuild
      coverage(s, dir)
        .agg(count(lit(1)).as("n_words"),
          sum(col("cv")).cast("long").as("n_cut"),
          round(sum(col("cv")) * lit(1.0) / count(lit(1)), 4).as("cut_frac"),
          count_distinct(when(col("cv") === 1, col("doc_id"))).as("n_docs_affected")))
  )

  def oracleSql: Map[String, String] = {
    val spanExpr = (0 until SpanWords).map(i => s"w[i+$i]").mkString(" || ' ' || ")
    val spCte =
      s"""wd AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
         |sp AS (SELECT doc_id, i - 1 AS pos, $spanExpr AS span
         |       FROM wd, UNNEST(range(1, len(w) - ${SpanWords - 2})) r(i))""".stripMargin
    val covCte =
      s"""$spCte,
         |rep AS (SELECT span FROM sp GROUP BY span HAVING COUNT(*) >= 2),
         |st AS (SELECT doc_id, pos FROM sp JOIN rep USING (span)),
         |words AS (SELECT doc_id, i - 1 AS pos, w[i] AS word
         |          FROM wd, UNNEST(range(1, len(w) + 1)) r(i)),
         |cov AS (
         |  SELECT f.doc_id, f.pos, f.word,
         |         MAX(f.is_start) OVER (PARTITION BY f.doc_id ORDER BY f.pos
         |             ROWS BETWEEN ${SpanWords - 1} PRECEDING AND CURRENT ROW) AS cv
         |  FROM (SELECT words.doc_id, words.pos, words.word,
         |               CASE WHEN st.pos IS NULL THEN 0 ELSE 1 END AS is_start
         |        FROM words LEFT JOIN st
         |          ON st.doc_id = words.doc_id AND st.pos = words.pos) f)""".stripMargin
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
           |ORDER BY n_occ DESC, span LIMIT 20""".stripMargin,

      "text_span_cut" ->
        s"""WITH $covCte
           |SELECT doc_id, COUNT(*) AS n_words,
           |       CAST(SUM(CASE WHEN cv = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           |       COALESCE(string_agg(CASE WHEN cv = 0 THEN word END, ' '
           |                           ORDER BY pos), '') AS kept_text
           |FROM cov GROUP BY doc_id ORDER BY doc_id""".stripMargin,

      "text_span_savings" ->
        s"""WITH $covCte
           |SELECT COUNT(*) AS n_words,
           |       CAST(SUM(cv) AS BIGINT) AS n_cut,
           |       ROUND(SUM(cv) * 1.0 / COUNT(*), 4) AS cut_frac,
           |       COUNT(DISTINCT CASE WHEN cv = 1 THEN doc_id END) AS n_docs_affected
           |FROM cov""".stripMargin
    )
  }
}
