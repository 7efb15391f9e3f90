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

  /**
   * Published-ruleset quality gate in the Gopher/Dolma style (Rae et al.
   * 2021, appendix A1.1): per-doc metrics plus one boolean per rule and
   * the conjunction. Complementary to `qualityScores` (raw signals) and
   * the fixed-weight classifier (`quality_classify`): this is the
   * hard-threshold rule family production corpus filters actually ship.
   * All rules but the repetition one are single-scan column expressions;
   * the top-word fraction needs one (doc_id, word) hash aggregation.
   */
  def gopherRules(docs: DataFrame): DataFrame = {
    val n = size(words)
    // total word chars = chars minus the single-space separators
    val wchars = length(regexp_replace(col("text"), lit(" "), lit("")))
    val nAlphaW = size(filter(words, w => w.rlike("[a-z]")))
    val stopHits = size(array_intersect(
      array_distinct(words), array(EnStopwords.map(lit): _*)))
    val metrics = docs.select(
      col("doc_id"), n.as("n_words"),
      round(wchars * lit(1.0) / n, 4).as("mean_wlen"),
      round(nAlphaW * lit(1.0) / n, 4).as("alpha_frac"),
      stopHits.as("stop_hits"))
    val topCnt = docs
      .select(col("doc_id"), explode(words).as("word"))
      .groupBy(col("doc_id"), col("word")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id")).agg(max(col("c")).as("top_cnt"))
    metrics.join(topCnt, Seq("doc_id"))
      .withColumn("top_frac", round(col("top_cnt") * lit(1.0) / col("n_words"), 4))
      .drop("top_cnt")
      .withColumn("pass_len", col("n_words").between(50, 100000))
      .withColumn("pass_wlen", col("mean_wlen").between(3.0, 10.0))
      .withColumn("pass_alpha", col("alpha_frac") >= 0.8)
      .withColumn("pass_stop", col("stop_hits") >= 2)
      .withColumn("pass_rep", col("top_frac") <= 0.2)
      .withColumn("pass", col("pass_len") && col("pass_wlen") &&
        col("pass_alpha") && col("pass_stop") && col("pass_rep"))
  }

  /**
   * DSIR-style importance weights (Xie et al. 2023, "Data Selection for
   * Language Models via Importance Resampling"): fit hashed-unigram
   * bag-of-words models on a target domain and on the raw corpus, then
   * score every raw doc by its importance log-ratio
   * sum_w [ln p_target(bucket(w)) - ln p_raw(bucket(w))] (add-1
   * smoothed). The ratio per bucket is quantized to integer micro-nats
   * via the engine-portable floor(x*1e6 + 0.5) BEFORE the per-doc sum,
   * so doc weights are exact integers — no float-summation-order
   * divergence between engines or partitionings.
   *
   * Scale shape: two corpus scans (bucket histogram, then per-doc sum),
   * one buckets-sized (64-row) broadcast, one doc-keyed hash agg. The
   * bucket histogram is a map-side-combined agg on a 64-value key — no
   * skew possible. Selection of the top-N docs is the caller's
   * TakeOrderedAndProject, never a full sort.
   */
  def dsirWeights(docs: DataFrame, targetSource: String, buckets: Int = 64): DataFrame = {
    val w = docs
      .select(col("doc_id"), col("source"), explode(words).as("word"))
      .withColumn("b", hMod(col("word")) % buckets)
    val hist = w.groupBy(col("b")).agg(
      count(lit(1)).as("s_cnt"),
      sum(when(col("source") === targetSource, 1L).otherwise(0L)).as("t_cnt"))
    val tot = hist.agg(sum(col("s_cnt")).as("s_tot"), sum(col("t_cnt")).as("t_tot"))
    // counts and totals are exact BIGINTs; the products stay < 2^53 far
    // beyond sf10, so the DOUBLE ratio is exact and ln() is the only
    // inexact step — quantized immediately.
    val ratios = hist.crossJoin(broadcast(tot)).select(
      col("b"),
      floor(log(
        ((col("t_cnt") + 1) * (col("s_tot") + buckets)).cast("double") /
          ((col("s_cnt") + 1) * (col("t_tot") + buckets)).cast("double")) * 1e6 + 0.5)
        .cast("long").as("r_micro"))
    w.join(broadcast(ratios), Seq("b"))
      .groupBy(col("doc_id")).agg(sum(col("r_micro")).as("w_micro"))
  }
}
