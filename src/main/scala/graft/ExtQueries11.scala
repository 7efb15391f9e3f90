package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.{PortableHash, PrefixScan, Tables}

/**
 * Round-6 wave: the curation steps between "scored corpus" and "training
 * shards" — duplicated-span detection (substring-granular dedup, the
 * n-gram form of Lee et al. 2022's exact-substring dedup), domain-mixture
 * weighting, quality-ordered token-budget selection, a model-style quality
 * classifier, SCD1 merge-upsert maintenance, and shard manifests with
 * engine-portable checksums.
 *
 * Cross-engine determinism notes:
 *   - The classifier squashes with the ALGEBRAIC sigmoid z/(1+|z|), not
 *     exp(): libm exp and JVM StrictMath can differ in the last ulp, and
 *     a hash-compared oracle has no tolerance. Pure +,*,/ are IEEE-exact
 *     on both engines.
 *   - Token-budget selection totals are compared on integer token counts;
 *     the only doubles are the order key and the 0.4 budget fraction,
 *     computed by the same IEEE ops on both sides.
 */
object ExtQueries11 {

  private val GramN = 10

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Duplicated 10-word spans across documents — substring-granularity
    // exact dedup (the n-gram window form of suffix-array substring dedup:
    // any >=10-word duplicated substring contains a duplicated 10-gram, so
    // the gram table is the candidate index for span removal). One explode
    // + one hash aggregation on the gram: corpus-linear, no pairwise work;
    // HAVING n_docs >= 2 bounds the output to actually-duplicated spans.
    "dedup_substring" -> ((s, dir) => {
      val d = Tables.table(s, dir, "documents")
        .select(col("doc_id"), split(col("text"), " ").as("w"))
        .where(size(col("w")) >= GramN)
      d.select(col("doc_id"),
          explode(transform(sequence(lit(0), size(col("w")) - GramN),
            i => array_join(slice(col("w"), i + 1, lit(GramN)), " "))).as("gram"))
        .groupBy(col("gram"))
        .agg(countDistinct(col("doc_id")).as("n_docs"),
          count(lit(1)).as("n_occ"),
          min(col("doc_id")).as("first_doc"))
        .where(col("n_docs") >= 2)
        .orderBy(col("gram"))
    }),

    // Domain-mixture weighting: per-source token mass and the sampling
    // weight that equalizes source contributions (uniform target mix,
    // capped at 1 — no upsampling). The whole query is one scan + a
    // 20-row aggregate crossed with a 1-row total: scan-shaped at 100 TB.
    "mix_domains" -> ((s, dir) => {
      val per = Tables.table(s, dir, "documents")
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(size(split(col("text"), " ")).cast("long")).as("n_tokens"))
      val tot = per.agg(sum(col("n_tokens")).as("t_total"),
        count(lit(1)).as("n_sources"))
      per.crossJoin(broadcast(tot))
        .select(col("source"), col("n_docs"), col("n_tokens"),
          round(least(lit(1.0),
            (col("t_total").cast("double") / col("n_sources")) / col("n_tokens")),
            6).as("weight"))
        .orderBy(col("source"))
    }),

    // Quality-ordered selection under a token budget (keep the best docs
    // until 40% of corpus tokens): the core curation primitive behind
    // "train on the top-X% by quality". The global running sum over the
    // quality order uses the two-level PrefixScan, NOT an unpartitioned
    // window — no single-partition sort at corpus scale. The order key
    // folds (score desc, doc_id) into one unique double so both engines
    // order identically.
    "select_token_budget" -> ((s, dir) => {
      val base = Tables.table(s, dir, "documents")
        .select(col("doc_id"), split(col("text"), " ").as("w"))
        .select(col("doc_id"), size(col("w")).cast("long").as("n_tok"),
          (size(array_distinct(col("w"))).cast("double") / size(col("w"))).as("score"))
        .withColumn("ord", (lit(1.0) - col("score")) * lit(1e9) + col("doc_id"))
      val tot = base.agg(sum(col("n_tok")).as("t_total"))
      PrefixScan.runningSumExclusive(base, "ord", "n_tok", "cum_ex")
        .crossJoin(broadcast(tot))
        .where(col("cum_ex") + col("n_tok") <= lit(0.4) * col("t_total"))
        .select(col("doc_id"), col("n_tok"),
          (col("cum_ex") + col("n_tok")).as("cum_tokens"),
          round(col("score"), 6).as("score"))
        .orderBy(col("cum_tokens"))
    }),

    // Model-style quality classifier: fixed-weight linear model over
    // cheap lexical features, squashed with the algebraic sigmoid
    // z/(1+|z|) (exact on both engines — see object scaladoc). The
    // fasttext-quality-filter archetype with a deterministic stand-in
    // model; scan-shaped, fully codegen.
    "quality_classify" -> ((s, dir) => {
      val w = split(col("text"), " ")
      val nW = size(w).cast("double")
      val wlen = (col("n_chars").cast("double") - (nW - 1)) / nW
      val distinctRatio = size(array_distinct(w)).cast("double") / nW
      val stopRatio = size(filter(w, x => x === "the" || x === "a")).cast("double") / nW
      val z = lit(-3.0) + lit(0.8) * wlen + lit(2.0) * distinctRatio - lit(1.5) * stopRatio
      Tables.table(s, dir, "documents")
        .select(col("doc_id"),
          round(lit(0.5) + lit(0.5) * z / (lit(1.0) + abs(z)), 6).as("score"),
          (z >= 0).as("keep"))
        .orderBy(col("doc_id"))
    }),

    // SCD1 MERGE maintenance: apply latest-wins changes (derived from each
    // customer's most recent order; finalized status deletes the row,
    // anything else updates the balance) onto the customer snapshot. The
    // change table reduces to one row per key via a partitioned window
    // rank, then one equi-join applies it — the batch form of upsert-sink
    // maintenance, two shuffles total on the merge key.
    "merge_upsert" -> ((s, dir) => {
      val latest = Tables.table(s, dir, "orders")
        .withColumn("rn", row_number().over(Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)))
        .where(col("rn") === 1)
        .select(col("o_custkey"),
          when(col("o_orderstatus") === "F", lit("D")).otherwise(lit("U")).as("op"),
          col("o_totalprice").as("new_bal"))
      Tables.table(s, dir, "customer")
        .join(latest, col("c_custkey") === col("o_custkey"), "left")
        .where(col("op").isNull || col("op") =!= "D")
        .select(col("c_custkey"),
          when(col("op") === "U", col("new_bal")).otherwise(col("c_acctbal")).as("bal"),
          coalesce(col("op"), lit("K")).as("last_op"))
        .orderBy(col("c_custkey"))
    }),

    // Shard manifest: hash-assign docs to 16 output shards and emit the
    // per-shard manifest row (counts, token mass, id range, an
    // order-insensitive content checksum from the portable 60-bit hash
    // mod P summed — sums of 2^31-bounded values over any realistic shard
    // stay far from the 2^63 line). The write-side integrity artifact for
    // distributed shard production; one scan + 16-row aggregate.
    "shard_manifest" -> ((s, dir) =>
      Tables.table(s, dir, "documents")
        .groupBy(pmod(col("doc_id"), lit(16)).cast("int").as("shard"))
        .agg(count(lit(1)).as("n_docs"),
          sum(size(split(col("text"), " ")).cast("long")).as("n_tokens"),
          min(col("doc_id")).as("min_doc"),
          max(col("doc_id")).as("max_doc"),
          sum(PortableHash.hMod(col("text"))).as("checksum"))
        .orderBy(col("shard")))
  )

  def oracleSql: Map[String, String] = Map(

    "dedup_substring" ->
      s"""WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
         |g AS (SELECT doc_id,
         |             array_to_string(ws[CAST(i + 1 AS INT):CAST(i + $GramN AS INT)], ' ') AS gram
         |      FROM w, UNNEST(generate_series(0, len(ws) - $GramN)) AS t(i)
         |      WHERE len(ws) >= $GramN)
         |SELECT gram, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
         |       CAST(COUNT(*) AS BIGINT) AS n_occ, MIN(doc_id) AS first_doc
         |FROM g GROUP BY gram HAVING COUNT(DISTINCT doc_id) >= 2
         |ORDER BY gram""".stripMargin,

    "mix_domains" ->
      """WITH per AS (
        |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |         CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
        |  FROM documents GROUP BY source),
        |tot AS (SELECT CAST(SUM(n_tokens) AS BIGINT) AS t_total,
        |               CAST(COUNT(*) AS BIGINT) AS n_sources FROM per)
        |SELECT source, n_docs, n_tokens,
        |       round(least(1.0, (CAST(t_total AS DOUBLE) / n_sources) / n_tokens), 6) AS weight
        |FROM per, tot ORDER BY source""".stripMargin,

    "select_token_budget" ->
      """WITH b AS (
        |  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
        |         CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
        |           / len(string_split(text, ' ')) AS score
        |  FROM documents),
        |o AS (SELECT doc_id, n_tok, score, (1.0 - score) * 1e9 + doc_id AS ord FROM b),
        |t AS (SELECT CAST(SUM(n_tok) AS BIGINT) AS t_total FROM o),
        |c AS (SELECT doc_id, n_tok, score,
        |             CAST(SUM(n_tok) OVER (ORDER BY ord) AS BIGINT) AS cum_tokens
        |      FROM o)
        |SELECT doc_id, n_tok, cum_tokens, round(score, 6) AS score
        |FROM c, t WHERE cum_tokens <= 0.4 * t_total
        |ORDER BY cum_tokens""".stripMargin,

    "quality_classify" ->
      """WITH f AS (
        |  SELECT doc_id,
        |         -3.0 + 0.8 * ((CAST(n_chars AS DOUBLE) - (len(string_split(text, ' ')) - 1))
        |                        / len(string_split(text, ' ')))
        |             + 2.0 * (CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
        |                        / len(string_split(text, ' ')))
        |             - 1.5 * (CAST(len(list_filter(string_split(text, ' '),
        |                               x -> x IN ('the', 'a'))) AS DOUBLE)
        |                        / len(string_split(text, ' '))) AS z
        |  FROM documents)
        |SELECT doc_id, round(0.5 + 0.5 * z / (1.0 + abs(z)), 6) AS score,
        |       z >= 0 AS keep
        |FROM f ORDER BY doc_id""".stripMargin,

    "merge_upsert" ->
      """WITH latest AS (
        |  SELECT o_custkey,
        |         CASE WHEN o_orderstatus = 'F' THEN 'D' ELSE 'U' END AS op,
        |         o_totalprice AS new_bal
        |  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY o_custkey
        |                    ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        |        FROM orders) WHERE rn = 1)
        |SELECT c_custkey,
        |       CASE WHEN op = 'U' THEN new_bal ELSE c_acctbal END AS bal,
        |       COALESCE(op, 'K') AS last_op
        |FROM customer LEFT JOIN latest ON c_custkey = o_custkey
        |WHERE op IS NULL OR op <> 'D'
        |ORDER BY c_custkey""".stripMargin,

    "shard_manifest" -> {
      val h = PortableHash.hModSql("text")
      s"""SELECT CAST(doc_id % 16 AS INT) AS shard,
         |       CAST(COUNT(*) AS BIGINT) AS n_docs,
         |       CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens,
         |       MIN(doc_id) AS min_doc, MAX(doc_id) AS max_doc,
         |       CAST(SUM($h) AS BIGINT) AS checksum
         |FROM documents GROUP BY 1 ORDER BY shard""".stripMargin
    }
  )
}
