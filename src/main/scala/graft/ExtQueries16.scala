package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.operators.{Dedup, DedupIndex, Similarity, Tables, TextAnalysis}

/**
 * Round-6 sixth wave: curation + evaluation operators for a training-data
 * pipeline, plus the one named 100 TB technique not yet exercised in the
 * repo — bucketed co-located joins.
 *
 *  - join_bucketed:     bucketBy(8, key) + sortBy on both sides, then a
 *                       sort-merge join that reads co-located buckets with
 *                       NO shuffle exchange on the join key (PlanSpec-locked).
 *  - dedup_keep_best:   canonical-document selection per duplicate group —
 *                       CC groups over SimHash pairs, argmax quality.
 *  - ann_recall:        recall@10 of the multi-probe LSH index vs the exact
 *                       scan, fully oracled (both sides deterministic).
 *  - hard_negatives:    contrastive mining — nearest cross-label neighbors
 *                       per query vector.
 *  - knn_classify_eval: leave-one-out 3-NN cosine classification accuracy
 *                       per label over the embedding corpus.
 *  - text_fertility:    tokens-per-word ratio by predicted language — the
 *                       tokenizer-cost lens on the langid split.
 *  - stream_simhash_dedup: online near-dup filter — band-keyed
 *                       transformWithState, first-arrival-wins.
 *  - preference_pairs:  RLHF-style (chosen, rejected) pair mining per user.
 *  - cooc_pmi_topk:     PMI in the LLR rescorer's scoring slot.
 */
object ExtQueries16 {

  /** Eval set for knn_classify_eval: every 20th vector under a hard id
    * cap — a FIXED-SIZE sample (<= 100 vectors), so eval x corpus work is
    * linear in the corpus. The first cut used stride alone; the sf0.1→sf1
    * soak showed the 46x superlinear blowup (eval and corpus both 10x →
    * pairs 100x) that a growing eval set causes — the cap must BIND, not
    * just exist. */
  private val EvalStride = 20
  private val EvalIdCap = 2000L
  private val KnnK = 3

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Bucketed co-located join: both sides written bucketBy(8, joinkey) +
    // sortBy into catalog tables, then sort-merge-joined. With matching
    // bucket counts Spark reads bucket i of each side on the same task —
    // NO Exchange on the join key appears in the plan (the scale win:
    // repeated joins on a pre-bucketed fact table never re-shuffle it).
    // coalesce(1) before write => exactly one file per bucket, so the
    // bucket-local sort order is usable as-is (a local-demo knob: at
    // real scale you keep write parallelism, accept multiple files per
    // bucket, and the SMJ re-sorts bucket-locally — still no exchange).
    "join_bucketed" -> ((s, dir) => {
      val tag = "bj_" + java.lang.Integer.toHexString(dir.hashCode)
      val base = new java.io.File(
        System.getProperty("java.io.tmpdir"), "graft_bucketed").getAbsolutePath
      val liT = s"${tag}_lineitem"
      val ordT = s"${tag}_orders"
      Tables.table(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_quantity"),
          col("l_extendedprice"), col("l_discount"))
        .coalesce(1)
        .write.mode("overwrite").format("parquet")
        .option("path", s"$base/$liT")
        .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .saveAsTable(liT)
      Tables.table(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderpriority"))
        .coalesce(1)
        .write.mode("overwrite").format("parquet")
        .option("path", s"$base/$ordT")
        .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .saveAsTable(ordT)
      s.table(liT)
        .hint("merge")
        .join(s.table(ordT), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(
          count(lit(1)).as("n_lines"),
          sum(col("l_quantity").cast(DecimalType(20, 4))).cast("double").as("sum_qty"),
          sum((col("l_extendedprice").cast(DecimalType(20, 4)) *
            (lit(BigDecimal(1)).cast(DecimalType(20, 4)) -
              col("l_discount").cast(DecimalType(20, 4)))))
            .cast(DecimalType(38, 2)).cast("double").as("revenue"))
        .orderBy(col("o_orderpriority"))
    }),

    // Canonical-doc selection per duplicate group: the step after
    // near-dup detection — of each connected component keep the
    // highest-quality member (distinct-token ratio; ties -> lowest id).
    // CC is the bounded label-propagation loop; scoring is scan-shaped;
    // selection is a per-component window (partitioned, never global).
    "dedup_keep_best" -> ((s, dir) => {
      val d = Tables.table(s, dir, "documents")
      val comp = DedupIndex.simhashComponents(s, dir, 3)
      val ws = split(col("text"), " ")
      val scored = d.select(col("doc_id"),
        (size(array_distinct(ws)).cast("double") / size(ws)).as("score"))
      val j = comp.join(scored, col("node") === col("doc_id"))
      val w = Window.partitionBy(col("comp"))
        .orderBy(col("score").desc, col("doc_id"))
      j.withColumn("rn", row_number().over(w))
        .withColumn("n_members", count(lit(1)).over(Window.partitionBy(col("comp"))))
        .where(col("rn") === 1)
        .select(col("comp"), col("doc_id").as("keep_doc"),
          col("n_members"), round(col("score"), 6).as("score"))
        .orderBy(col("comp"))
    }),

    // Index-quality evaluation: recall@10 of the multi-probe LSH ANN
    // against the exact scan, per query. Both sides are deterministic
    // (fixed hyperplane signs, integer-quantized scores), so the oracle
    // replays the entire computation — the recall NUMBERS are oracled,
    // not just row counts. Left join (not inner) so recall=0 still rows.
    "ann_recall" -> ((s, dir) => {
      val emb = Tables.table(s, dir, "embeddings")
      val exact = Similarity.bruteForceTopK(emb, ExtQueries.AnnQueries, 10)
        .select(col("query_id"), col("vec_id"))
      val lsh = Similarity.lshTopK(emb, ExtQueries.AnnQueries, 10, dims = 64, nPlanes = 4)
        .select(col("query_id"), col("vec_id"), lit(1).as("hit"))
      exact.join(lsh, Seq("query_id", "vec_id"), "left")
        .groupBy(col("query_id"))
        .agg(count(lit(1)).as("n_exact"),
          count(col("hit")).as("n_hit"))
        .select(col("query_id"), col("n_exact"), col("n_hit"),
          round(col("n_hit") * lit(1.0) / col("n_exact"), 4).as("recall"))
        .orderBy(col("query_id"))
    }),

    // Contrastive hard-negative mining: for each query vector its top-3
    // most-similar vectors with a DIFFERENT label — the batch-mining
    // step of contrastive training. Query set broadcasts; the corpus
    // scans once; per-query window rank is partitioned by query.
    "hard_negatives" -> ((s, dir) => {
      val emb = Tables.table(s, dir, "embeddings")
      val corpus = Similarity.quantizedWithNorm(emb)
        .join(emb.select(col("vec_id"), col("label")), Seq("vec_id"))
      val q = corpus
        .where(col("vec_id").isin(ExtQueries.AnnQueries: _*))
        .select(col("vec_id").as("query_id"), col("qv").as("qqv"),
          col("norm").as("qnorm"), col("label").as("qlabel"))
      val scored = corpus
        .join(broadcast(q),
          col("vec_id") =!= col("query_id") && col("label") =!= col("qlabel"))
        .select(col("query_id"), col("vec_id"), col("label"),
          round(Similarity.cosineFromParts(
            Similarity.dotQ(col("qqv"), col("qv")),
            col("qnorm"), col("norm")), 4).as("cos"))
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col("cos").desc, col("vec_id"))
      scored.withColumn("rnk", row_number().over(w))
        .where(col("rnk") <= 3)
        .select(col("query_id"), col("rnk"), col("vec_id"), col("label"), col("cos"))
        .orderBy(col("query_id"), col("rnk"))
    }),

    // Leave-one-out 3-NN classification accuracy per label: the standard
    // embedding-quality eval. Eval set = every 20th vector under a fixed
    // id cap (bounded by construction — the broadcast side cannot grow
    // with the corpus); majority vote with deterministic tiebreak (vote
    // count desc, then smaller label). Corpus scans once against the
    // broadcast eval set.
    "knn_classify_eval" -> ((s, dir) => {
      val emb = Tables.table(s, dir, "embeddings")
      val corpus = Similarity.quantizedWithNorm(emb)
        .join(emb.select(col("vec_id"), col("label")), Seq("vec_id"))
      val eval = corpus
        .where(pmod(col("vec_id"), lit(EvalStride)) === 0 && col("vec_id") < EvalIdCap)
        .select(col("vec_id").as("eval_id"), col("qv").as("qqv"),
          col("norm").as("qnorm"), col("label").as("true_label"))
      val scored = corpus
        .join(broadcast(eval), col("vec_id") =!= col("eval_id"))
        .select(col("eval_id"), col("true_label"), col("vec_id"), col("label"),
          round(Similarity.cosineFromParts(
            Similarity.dotQ(col("qqv"), col("qv")),
            col("qnorm"), col("norm")), 4).as("cos"))
      val wTop = Window.partitionBy(col("eval_id"))
        .orderBy(col("cos").desc, col("vec_id"))
      val votes = scored.withColumn("rnk", row_number().over(wTop))
        .where(col("rnk") <= KnnK)
        .groupBy(col("eval_id"), col("true_label"), col("label"))
        .agg(count(lit(1)).as("n_votes"))
      val wVote = Window.partitionBy(col("eval_id"))
        .orderBy(col("n_votes").desc, col("label"))
      votes.withColumn("vr", row_number().over(wVote))
        .where(col("vr") === 1)
        .groupBy(col("true_label"))
        .agg(count(lit(1)).as("n_eval"),
          sum(when(col("label") === col("true_label"), 1L).otherwise(0L)).as("n_correct"))
        .select(col("true_label").as("label"), col("n_eval"), col("n_correct"),
          round(col("n_correct") * lit(1.0) / col("n_eval"), 4).as("accuracy"))
        .orderBy(col("label"))
    }),

    // PMI-scored co-occurrence top-K: same sparse-C + broadcast-row-sums
    // pipeline as the LLR rescorer with pointwise mutual information in
    // the scoring slot — the rescorer is pluggable, the plan posture is
    // unchanged (one pair aggregation, tiny broadcasts, partitioned rank).
    "cooc_pmi_topk" -> ((s, dir) =>
      graft.operators.Cooccurrence.pmiTopK(s, dir, 10)),

    // Preference-pair construction (RLHF-style): per user with >= 2
    // events, the highest- and lowest-valued interactions become the
    // (chosen, rejected) pair with its margin. One shuffle on user_id,
    // max_by/min_by aggregates with deterministic id tiebreaks — no
    // window sort, no per-user explode.
    "preference_pairs" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
        .select(col("user_id"), col("event_id"), col("value"))
        .where(col("value").isNotNull && col("user_id").isNotNull)
      ev.groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_events"),
          max(struct(col("value"), col("event_id"))).as("best"),
          min(struct(col("value"), col("event_id"))).as("worst"))
        .where(col("n_events") >= 2)
        .select(col("user_id"),
          col("best.event_id").as("chosen_event"),
          col("worst.event_id").as("rejected_event"),
          round(col("best.value") - col("worst.value"), 4).as("margin"))
        .orderBy(col("user_id"))
    }),

    // Streaming SimHash near-dup filter: documents stream in, each is
    // checked against its 4 fingerprint-band buckets in keyed state and
    // dropped if an earlier near-dup (hamming <= 3) was admitted —
    // first-arrival-wins online dedup, the streaming analogue of the
    // batch banded join. Output: the admitted doc_ids.
    "stream_simhash_dedup" -> ((s, dir) =>
      graft.streaming.SimhashDedupStream.kept(s, dir, maxHamming = 3)),

    // Tokenizer fertility by predicted language: BPE-ish regex tokens per
    // whitespace word, aggregated over the langid split — the
    // tokenizer-cost profile a multilingual corpus is balanced against.
    // One scan, one tiny hash aggregate.
    "text_fertility" -> ((s, dir) => {
      val ws = split(col("text"), " ")
      val nStop = size(filter(ws, w => w.isin(TextAnalysis.EnStopwords: _*)))
      val pred = when(nStop * lit(1.0) / size(ws) >= 0.02, lit("en"))
        .otherwise(lit("unk"))
      Tables.table(s, dir, "documents")
        .select(pred.as("predicted_lang"),
          size(ws).cast("long").as("ws_tok"),
          size(regexp_extract_all(col("text"), lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), lit(0)))
            .cast("long").as("re_tok"))
        .groupBy(col("predicted_lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("ws_tok")).as("n_ws_tokens"),
          sum(col("re_tok")).as("n_re_tokens"))
        .select(col("predicted_lang"), col("n_docs"),
          col("n_ws_tokens"), col("n_re_tokens"),
          round(col("n_re_tokens") * lit(1.0) / col("n_ws_tokens"), 6).as("fertility"))
        .orderBy(col("predicted_lang"))
    })
  )

  def oracleSql: Map[String, String] = Map(

    "join_bucketed" ->
      """SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_lines,
        |       CAST(SUM(CAST(l_quantity AS DECIMAL(20,4))) AS DOUBLE) AS sum_qty,
        |       CAST(round(SUM(CAST(l_extendedprice AS DECIMAL(20,4)) *
        |                (CAST(1 AS DECIMAL(20,4)) - CAST(l_discount AS DECIMAL(20,4)))),
        |            2) AS DOUBLE) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "dedup_keep_best" ->
      s"""WITH RECURSIVE ${ExtQueries.simhashPairsCtes},
         |sel AS (SELECT doc_a, doc_b FROM pairs
         |        WHERE bit_count(xor(fp_a, fp_b)) <= 3),
         |e AS (SELECT doc_a AS src, doc_b AS dst FROM sel
         |      UNION SELECT doc_b, doc_a FROM sel),
         |nodes AS (SELECT DISTINCT src AS node FROM e),
         |reach(node, lab) AS (
         |  SELECT node, node FROM nodes
         |  UNION
         |  SELECT e.dst, r.lab FROM reach r JOIN e ON e.src = r.node),
         |comp AS (SELECT node AS doc_id, MIN(lab) AS comp FROM reach GROUP BY node),
         |sc AS (SELECT doc_id,
         |              CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
         |                / len(string_split(text, ' ')) AS score
         |       FROM documents),
         |j AS (SELECT c.comp, c.doc_id, s.score
         |      FROM comp c JOIN sc s ON s.doc_id = c.doc_id),
         |r AS (SELECT comp, doc_id, score,
         |             ROW_NUMBER() OVER (PARTITION BY comp
         |                                ORDER BY score DESC, doc_id) AS rn,
         |             COUNT(*) OVER (PARTITION BY comp) AS n_members
         |      FROM j)
         |SELECT comp, doc_id AS keep_doc, CAST(n_members AS BIGINT) AS n_members,
         |       round(score, 6) AS score
         |FROM r WHERE rn = 1 ORDER BY comp""".stripMargin,

    "ann_recall" -> {
      val qs = ExtQueries.AnnQueries.mkString(", ")
      s"""WITH ${ExtQueries.quantSql},
         |bk AS (SELECT vec_id, qv, n2, ${ExtQueries.bucketSql(0 until 4)} AS bucket FROM qn),
         |probes AS (
         |  SELECT vec_id AS query_id, qv AS qqv, n2 AS qn2,
         |         unnest([bucket, xor(bucket, 1), xor(bucket, 2),
         |                 xor(bucket, 4), xor(bucket, 8)]) AS bucket
         |  FROM bk WHERE vec_id IN ($qs)),
         |lscored AS (
         |  SELECT p.query_id, c.vec_id,
         |         ROUND(list_inner_product(p.qqv, c.qv) / (sqrt(p.qn2) * sqrt(c.n2)), 4) AS cos
         |  FROM probes p JOIN bk c ON c.bucket = p.bucket AND c.vec_id != p.query_id),
         |lranked AS (
         |  SELECT query_id, vec_id,
         |         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS rnk
         |  FROM lscored),
         |lsh AS (SELECT query_id, vec_id FROM lranked WHERE rnk <= 10),
         |escored AS (
         |  SELECT qq.vec_id AS query_id, c.vec_id,
         |         ROUND(list_inner_product(qq.qv, c.qv) / (sqrt(qq.n2) * sqrt(c.n2)), 4) AS cos
         |  FROM qn qq JOIN qn c ON c.vec_id != qq.vec_id
         |  WHERE qq.vec_id IN ($qs)),
         |eranked AS (
         |  SELECT query_id, vec_id,
         |         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS rnk
         |  FROM escored),
         |ex AS (SELECT query_id, vec_id FROM eranked WHERE rnk <= 10)
         |SELECT e.query_id, CAST(COUNT(*) AS BIGINT) AS n_exact,
         |       CAST(COUNT(l.vec_id) AS BIGINT) AS n_hit,
         |       round(COUNT(l.vec_id) * 1.0 / COUNT(*), 4) AS recall
         |FROM ex e LEFT JOIN lsh l
         |  ON l.query_id = e.query_id AND l.vec_id = e.vec_id
         |GROUP BY e.query_id ORDER BY e.query_id""".stripMargin
    },

    "hard_negatives" -> {
      val qs = ExtQueries.AnnQueries.mkString(", ")
      s"""WITH ${ExtQueries.quantSql},
         |lb AS (SELECT vec_id, label FROM embeddings),
         |scored AS (
         |  SELECT q.vec_id AS query_id, c.vec_id, cl.label,
         |         ROUND(list_inner_product(q.qv, c.qv) / (sqrt(q.n2) * sqrt(c.n2)), 4) AS cos
         |  FROM qn q
         |  JOIN lb ql ON ql.vec_id = q.vec_id
         |  JOIN qn c ON c.vec_id != q.vec_id
         |  JOIN lb cl ON cl.vec_id = c.vec_id AND cl.label <> ql.label
         |  WHERE q.vec_id IN ($qs)),
         |ranked AS (
         |  SELECT query_id, vec_id, label, cos,
         |         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS rnk
         |  FROM scored)
         |SELECT query_id, rnk, vec_id, label, cos FROM ranked
         |WHERE rnk <= 3 ORDER BY query_id, rnk""".stripMargin
    },

    "knn_classify_eval" ->
      s"""WITH ${ExtQueries.quantSql},
         |lb AS (SELECT vec_id, label FROM embeddings),
         |ev AS (SELECT q.vec_id AS eval_id, q.qv, q.n2, lb.label AS true_label
         |       FROM qn q JOIN lb ON lb.vec_id = q.vec_id
         |       WHERE q.vec_id % $EvalStride = 0 AND q.vec_id < $EvalIdCap),
         |scored AS (
         |  SELECT e.eval_id, e.true_label, c.vec_id, cl.label,
         |         ROUND(list_inner_product(e.qv, c.qv) / (sqrt(e.n2) * sqrt(c.n2)), 4) AS cos
         |  FROM ev e
         |  JOIN qn c ON c.vec_id != e.eval_id
         |  JOIN lb cl ON cl.vec_id = c.vec_id),
         |top AS (
         |  SELECT eval_id, true_label, label,
         |         ROW_NUMBER() OVER (PARTITION BY eval_id ORDER BY cos DESC, vec_id) AS rnk
         |  FROM scored),
         |votes AS (
         |  SELECT eval_id, true_label, label, COUNT(*) AS n_votes
         |  FROM top WHERE rnk <= $KnnK GROUP BY eval_id, true_label, label),
         |pred AS (
         |  SELECT eval_id, true_label, label,
         |         ROW_NUMBER() OVER (PARTITION BY eval_id
         |                            ORDER BY n_votes DESC, label) AS vr
         |  FROM votes)
         |SELECT true_label AS label, CAST(COUNT(*) AS BIGINT) AS n_eval,
         |       CAST(SUM(CASE WHEN label = true_label THEN 1 ELSE 0 END) AS BIGINT) AS n_correct,
         |       round(SUM(CASE WHEN label = true_label THEN 1 ELSE 0 END) * 1.0 / COUNT(*), 4)
         |         AS accuracy
         |FROM pred WHERE vr = 1
         |GROUP BY true_label ORDER BY label""".stripMargin,

    "cooc_pmi_topk" -> (SparkEntry.pairsSql +
      """, rs AS (SELECT item, SUM(cnt) AS row_sum FROM pairs GROUP BY item),
        |tot AS (SELECT SUM(cnt) AS total FROM pairs),
        |scored AS (
        |  SELECT p.item, p.other,
        |         ROUND(LN((CAST(p.cnt AS DOUBLE) * t.total) /
        |                  (CAST(ri.row_sum AS DOUBLE) * ro.row_sum)), 4) AS score
        |  FROM pairs p
        |  JOIN rs ri ON p.item = ri.item
        |  JOIN rs ro ON p.other = ro.item
        |  CROSS JOIN tot t),
        |ranked AS (
        |  SELECT item, other, score,
        |         ROW_NUMBER() OVER (PARTITION BY item ORDER BY score DESC, other) AS rnk
        |  FROM scored)
        |SELECT item, rnk, other, score FROM ranked WHERE rnk <= 10
        |ORDER BY item, rnk""".stripMargin),

    "preference_pairs" ->
      """WITH e AS (
        |  SELECT user_id, event_id, value FROM events
        |  WHERE value IS NOT NULL AND user_id IS NOT NULL),
        |r AS (
        |  SELECT user_id, event_id, value,
        |         ROW_NUMBER() OVER (PARTITION BY user_id
        |                            ORDER BY value DESC, event_id DESC) AS rb,
        |         ROW_NUMBER() OVER (PARTITION BY user_id
        |                            ORDER BY value ASC, event_id ASC) AS rw,
        |         COUNT(*) OVER (PARTITION BY user_id) AS n
        |  FROM e)
        |SELECT b.user_id, b.event_id AS chosen_event, w.event_id AS rejected_event,
        |       round(b.value - w.value, 4) AS margin
        |FROM (SELECT * FROM r WHERE rb = 1) b
        |JOIN (SELECT * FROM r WHERE rw = 1) w USING (user_id)
        |WHERE b.n >= 2
        |ORDER BY user_id""".stripMargin,

    "stream_simhash_dedup" ->
      s"""WITH ${ExtQueries.simhashPairsCtes},
         |dups AS (SELECT DISTINCT doc_b FROM pairs
         |         WHERE bit_count(xor(fp_a, fp_b)) <= 3)
         |SELECT doc_id FROM documents
         |WHERE doc_id NOT IN (SELECT doc_b FROM dups)
         |ORDER BY doc_id""".stripMargin,

    "text_fertility" -> {
      val stop = TextAnalysis.EnStopwords.map(w => s"'$w'").mkString(", ")
      s"""WITH t AS (
         |  SELECT CASE WHEN len(list_filter(string_split(text, ' '), x -> x IN ($stop)))
         |                   * 1.0 / len(string_split(text, ' ')) >= 0.02
         |              THEN 'en' ELSE 'unk' END AS predicted_lang,
         |         CAST(len(string_split(text, ' ')) AS BIGINT) AS ws_tok,
         |         CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS BIGINT) AS re_tok
         |  FROM documents)
         |SELECT predicted_lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
         |       CAST(SUM(ws_tok) AS BIGINT) AS n_ws_tokens,
         |       CAST(SUM(re_tok) AS BIGINT) AS n_re_tokens,
         |       round(SUM(re_tok) * 1.0 / SUM(ws_tok), 6) AS fertility
         |FROM t GROUP BY predicted_lang ORDER BY predicted_lang""".stripMargin
    }
  )
}
