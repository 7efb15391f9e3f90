package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{BpeTrainer, Tables}

/**
 * Round-6 ninth wave.
 *
 *  - lm_bigram_nll:    bigram language model trained on the corpus
 *                      split, held-out docs scored by exact integer
 *                      micro-nat negative log likelihood — the
 *                      perplexity-filter shape (CCNet/Wikipedia-LM
 *                      filtering) with engine-exact arithmetic.
 *  - stream_stream_outer: watermarked LEFT OUTER stream-stream join —
 *                      unmatched left rows emit with nulls once the
 *                      watermark passes their join window.
 *  - bpe_roundtrip:    losslessness harness — decode(encode(doc))
 *                      reassembles the exact original characters.
 *  - approx_distinct_rollup: HLL sketch mergeability — per-day sketches
 *                      union-merged equal the directly-built sketch
 *                      (the property that makes sketch rollups valid at
 *                      100 TB), plus a 5% error bound vs exact.
 */
object ExtQueries19 {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Bigram LM scoring: train on doc_id % 5 != 4 (the standing split),
    // score the held-out shard. p(w2|w1) = (c(w1,w2)+1) / (c(w1·)+V)
    // add-1 smoothed over the train bigram table; per-bigram NLL is
    // quantized to integer micro-nats (floor(x*1e6+0.5)) BEFORE the
    // per-doc sum, so doc scores are exact BIGINTs — the DSIR
    // discipline. Corpus scans are scan-shaped (the bigram expansion is
    // an array transform, no self-join); the model tables join by
    // bigram/unigram key; totals broadcast.
    "lm_bigram_nll" -> ((s, dir) => {
      val docs = Tables.table(s, dir, "documents")
      val bigrams = docs.select(col("doc_id"), split(col("text"), " ").as("ws"))
        .select(col("doc_id"),
          explode(transform(sequence(lit(1), size(col("ws")) - 1),
            i => struct(element_at(col("ws"), i).as("w1"),
              element_at(col("ws"), i + 1).as("w2")))).as("bg"))
        .select(col("doc_id"), col("bg.w1").as("w1"), col("bg.w2").as("w2"))
      val train = bigrams.where(col("doc_id") % 5 =!= 4)
      val c12 = train.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c12"))
      val c1 = train.groupBy(col("w1")).agg(count(lit(1)).as("c1"))
      val v = docs.where(col("doc_id") % 5 =!= 4)
        .select(explode(split(col("text"), " ")).as("w"))
        .agg(countDistinct(col("w")).as("v"))
      bigrams.where(col("doc_id") % 5 === 4)
        .join(c12, Seq("w1", "w2"), "left")
        .join(c1, Seq("w1"), "left")
        .crossJoin(broadcast(v))
        .select(col("doc_id"),
          floor(-log((coalesce(col("c12"), lit(0L)) + 1).cast("double") /
            (coalesce(col("c1"), lit(0L)) + col("v")).cast("double")) * 1e6 + 0.5)
            .cast("long").as("nll_micro"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_bigrams"), sum(col("nll_micro")).as("nll_micro"))
        .orderBy(col("doc_id"))
    }),

    // LEFT OUTER stream-stream join: views left, purchases right, same
    // user within [l_ts, l_ts+1h]. Unmatched views emit (l_id, null)
    // after the watermark passes l_ts + 1h — state eviction IS the null
    // emission trigger. The oracle mirrors that semantics exactly: a
    // view too close to the final watermark (min of the two inputs' max
    // event times) is still buffered when the drain ends and must not
    // appear as unmatched.
    "stream_stream_outer" -> ((s, dir) =>
      graft.streaming.StreamingOps.streamStreamOuterJoin(s, dir)),

    // BPE losslessness: rebuilding every document from its token
    // sequence must reproduce the exact original characters (merges
    // never cross word boundaries, tokens partition each word). The
    // oracle asserts the all-true verdict — same soundness-harness
    // pattern as ann_ivf_sound.
    "bpe_roundtrip" -> ((s, dir) => {
      val docs = Tables.table(s, dir, "documents")
      val toks = BpeTrainer.tokenize(docs, BpeTrainer.train(docs, 12))
      val rebuilt = toks.groupBy(col("doc_id"))
        .agg(array_join(transform(
          array_sort(collect_list(struct(col("pos"), col("token")))),
          x => x.getField("token")), "").as("rebuilt"))
      // every word carries the Sennrich end-of-word marker, so the exact
      // reconstruction target is the text with spaces (and the end)
      // replaced by EndMark
      val expected = concat(
        regexp_replace(col("text"), lit(" "), lit(BpeTrainer.EndMark)),
        lit(BpeTrainer.EndMark))
      docs.join(rebuilt, Seq("doc_id"))
        .select(col("doc_id"), (col("rebuilt") === expected).as("lossless"))
        .orderBy(col("doc_id"))
    }),

    // HLL sketch mergeability: per-day user sketches union-merged across
    // days — the rollup that lets 100 TB pipelines build distinct counts
    // from per-partition sketches without a re-scan. The merged estimate
    // is a pure function of the union's register state (register-wise
    // max: associative, commutative, partition/order-independent), so it
    // must be bit-identical however the daily sketches were built —
    // asserted by rebuilding from a repartitioned input. (It is NOT
    // asserted equal to the directly-built sketch's estimate: a direct
    // build uses the order-dependent HIP estimator, which a union
    // legitimately discards.) Both estimates must sit within the lgK=12
    // error bound of the exact count.
    "approx_distinct_rollup" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
        .select(date_format(col("ts"), "yyyy-MM-dd").as("day"), col("user_id"))
      def mergedEst(e: DataFrame): DataFrame = e
        .groupBy(col("day")).agg(hll_sketch_agg(col("user_id")).as("sk"))
        .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
      val m1 = mergedEst(ev).select(col("est").as("est_merged"))
      val m2 = mergedEst(ev.repartition(7)).select(col("est").as("est_merged2"))
      val direct = ev.agg(
        hll_sketch_estimate(hll_sketch_agg(col("user_id"))).as("est_direct"),
        countDistinct(col("user_id")).as("exact"))
      m1.crossJoin(m2).crossJoin(direct)
        .select(
          (col("est_merged") === col("est_merged2"))
            .as("merge_partition_independent"),
          (abs(col("est_merged") - col("exact")) <= col("exact") * 0.05)
            .as("merged_within_5pct"),
          (abs(col("est_direct") - col("exact")) <= col("exact") * 0.05)
            .as("direct_within_5pct"))
    })
  )

  def oracleSql: Map[String, String] = Map(

    "lm_bigram_nll" ->
      """WITH tok AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS w,
        |         generate_subscripts(string_split(text, ' '), 1) AS pos
        |  FROM documents),
        |big AS (
        |  SELECT a.doc_id, a.w AS w1, b.w AS w2
        |  FROM tok a JOIN tok b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1),
        |c12 AS (SELECT w1, w2, COUNT(*) AS c12 FROM big WHERE doc_id % 5 <> 4 GROUP BY w1, w2),
        |c1 AS (SELECT w1, COUNT(*) AS c1 FROM big WHERE doc_id % 5 <> 4 GROUP BY w1),
        |v AS (SELECT COUNT(DISTINCT w) AS v FROM tok WHERE doc_id % 5 <> 4),
        |nll AS (
        |  SELECT b.doc_id,
        |         CAST(floor(-ln(CAST(COALESCE(c12.c12, 0) + 1 AS DOUBLE) /
        |                        CAST(COALESCE(c1.c1, 0) + v.v AS DOUBLE)) * 1000000 + 0.5)
        |              AS BIGINT) AS nll_micro
        |  FROM big b
        |  LEFT JOIN c12 ON b.w1 = c12.w1 AND b.w2 = c12.w2
        |  LEFT JOIN c1 ON b.w1 = c1.w1
        |  CROSS JOIN v
        |  WHERE b.doc_id % 5 = 4)
        |SELECT doc_id, COUNT(*) AS n_bigrams, CAST(SUM(nll_micro) AS BIGINT) AS nll_micro
        |FROM nll GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "stream_stream_outer" ->
      """WITH l AS (SELECT event_id AS l_id, user_id, ts FROM events WHERE event_type = 'view'),
        |r AS (SELECT event_id AS r_id, user_id, ts FROM events WHERE event_type = 'purchase'),
        |wm AS (SELECT LEAST((SELECT MAX(ts) FROM l), (SELECT MAX(ts) FROM r)) AS w),
        |m AS (
        |  SELECT l.l_id, r.r_id
        |  FROM l JOIN r ON l.user_id = r.user_id
        |    AND r.ts >= l.ts AND r.ts <= l.ts + INTERVAL 1 HOUR
        |    AND l.l_id <> r.r_id),
        |unmatched AS (
        |  SELECT l.l_id, CAST(-1 AS BIGINT) AS r_id
        |  FROM l CROSS JOIN wm
        |  WHERE NOT EXISTS (SELECT 1 FROM m WHERE m.l_id = l.l_id)
        |    AND l.ts + INTERVAL 1 HOUR < wm.w)
        |SELECT l_id, r_id FROM m
        |UNION ALL SELECT l_id, r_id FROM unmatched
        |ORDER BY l_id, r_id""".stripMargin,

    "bpe_roundtrip" ->
      "SELECT doc_id, true AS lossless FROM documents ORDER BY doc_id",

    "approx_distinct_rollup" ->
      """SELECT true AS merge_partition_independent,
        |       true AS merged_within_5pct, true AS direct_within_5pct""".stripMargin
  )
}
