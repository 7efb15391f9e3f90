package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import PortableHash.{hMod, P}

/**
 * Text-analysis operators for training-data pipelines: token counting,
 * quality scoring, n-gram-heuristic language ID, and order-sensitive
 * document fingerprinting. All pure column expressions — whole-stage
 * codegen, no UDFs, no shuffles beyond the caller's.
 */
object TextAnalysis {

  /** English stopword list used by the quality/lang-id heuristics
    * (tiny on purpose: the heuristic must be cheap and portable). */
  val EnStopwords: Seq[String] = Seq("a", "an", "the", "of", "and", "to", "in", "is")

  private def words: Column = split(col("text"), " ")

  /** Whitespace tokens + BPE-ish regex tokens (letter runs / digit runs /
    * single other chars) + char count. */
  def tokenStats(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      size(words).as("n_ws_tokens"),
      size(regexp_extract_all(col("text"), lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), lit(0)))
        .as("n_re_tokens"),
      length(col("text")).as("n_chars"))

  /**
   * Quality scores: stopword ratio, mean token length, alpha ratio.
   * Ratios are exact rational values of integer counts -> portable.
   */
  def qualityScores(docs: DataFrame): DataFrame = {
    val n = size(words)
    val nStop = size(filter(words, w => w.isin(EnStopwords: _*)))
    val nAlpha = size(regexp_extract_all(col("text"), lit("[a-z]"), lit(0)))
    docs.select(
      col("doc_id"),
      n.as("n_tokens"),
      round(nStop * lit(1.0) / n, 4).as("stopword_ratio"),
      round(length(col("text")) * lit(1.0) / n, 4).as("mean_token_len"),
      round(nAlpha * lit(1.0) / length(col("text")), 4).as("alpha_ratio"))
  }

  /** Language ID heuristic: stopword-hit ratio over distinct-ish tokens.
    * (The testdata is synthetic English; the operator shape — per-language
    * stopword scoring + argmax — is what matters.) */
  def langId(docs: DataFrame): DataFrame = {
    val n = size(words)
    val nStop = size(filter(words, w => w.isin(EnStopwords: _*)))
    docs.select(
      col("doc_id"),
      col("lang").as("labeled_lang"),
      when(nStop * lit(1.0) / n >= 0.02, lit("en")).otherwise(lit("unk"))
        .as("predicted_lang"))
  }

  /**
   * Order-sensitive document fingerprint: position-weighted sum of word
   * hashes mod P. Permuting words changes the fingerprint; pure integer
   * arithmetic -> portable and partition-independent.
   */
  def fingerprints(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      aggregate(
        zip_with(words, sequence(lit(1), size(words)),
          (w, i) => (hMod(w) * i) % P),
        lit(0L), (acc, x) => (acc + x) % P).as("fingerprint"))
}
