package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Retrieval, Similarity, Tables}

/**
 * Round 16: RETRIEVAL COMPOSITION — the serving-side reads a training/
 * RAG pipeline runs against this corpus, composed from legs the engine
 * already oracles individually:
 *
 *  - retrieval_hybrid_rrf: HYBRID retrieval — the BM25 lexical ranking
 *    (text_bm25's scorer over a fixed term set) and the exact dense
 *    cosine ranking for a query document, fused by reciprocal-rank
 *    fusion (rrf = Σ 1/(60+rank); Cormack et al., SIGIR 2009 — the
 *    standard no-tuning combiner every hybrid search deployment ships).
 *    Both legs are top-50 lists; the fuse is a 100-row outer join —
 *    the expensive parts are the legs, which scan once each and never
 *    shuffle the corpus. Oracle: both leg CTEs + the fusion replayed.
 *
 *  - ann_maxsim_topk: LATE-INTERACTION scoring (the ColBERT shape:
 *    Khattab & Zaharia, SIGIR 2020) — each vector is decomposed into 8
 *    contiguous 8-dim sub-vector tokens; score(q, d) = Σ_i max_j
 *    dot(q_i, d_j). The 64 integer dots per pair run inside one
 *    codegen'd projection (higher-order array functions over the
 *    quantized grid — EXACT long arithmetic, no float discipline
 *    needed), on the same broadcast-queries/one-corpus-scan shape as
 *    the exact cosine scan. Oracle: token explode + MAX/SUM replay.
 */
object ExtQueries56 {

  private val Terms = Seq("key", "value", "table", "row", "scan")
  private val DenseQ = 3L // the dense leg's query document
  private val LegN = 50
  private val RrfK = 60

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.table(s, dir, "documents")
  private def embs(s: SparkSession, dir: String): DataFrame =
    Tables.table(s, dir, "embeddings")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    "retrieval_hybrid_rrf" -> ((s, dir) => {
      val sparse = Retrieval.rankLeg(
        Retrieval.bm25(docs(s, dir), Terms), "bm25", LegN)
      val dense = Similarity.bruteForceTopK(embs(s, dir), Seq(DenseQ), LegN)
        .select(col("vec_id").as("doc_id"), col("rnk"))
      Retrieval.rrfFuse(sparse, dense, RrfK, topN = 20)
        .orderBy(col("doc_id"))
    }),

    "ann_maxsim_topk" -> ((s, dir) =>
      Retrieval.maxSimTopK(embs(s, dir), ExtQueries.AnnQueries, 10)
        .orderBy(col("query_id"), col("rnk")))
  )

  def oracleSql: Map[String, String] = Map(

    // both legs + the fusion replayed: BM25 CTEs are text_bm25's, the
    // dense leg is the exact cosine ranking for doc 3, rrf adds two
    // fixed-order double terms (CAST keeps DuckDB's 1.0 literal out of
    // DECIMAL division)
    "retrieval_hybrid_rrf" ->
      s"""WITH tok AS (SELECT doc_id, UNNEST(string_split(text, ' ')) AS term FROM documents),
         |dl AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dl FROM tok GROUP BY 1),
         |st AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs, AVG(dl) AS avgdl FROM dl),
         |tf AS (SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf FROM tok
         |       WHERE term IN (${Terms.map(t => s"'$t'").mkString(",")}) GROUP BY 1, 2),
         |df AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY 1),
         |sc AS (SELECT tf.doc_id,
         |         ln((st.n_docs - df.df + 0.5) / (df.df + 0.5) + 1.0) * tf.tf * 2.2 /
         |           (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / st.avgdl)) AS tscore
         |       FROM tf JOIN df ON tf.term = df.term
         |       JOIN dl ON tf.doc_id = dl.doc_id CROSS JOIN st),
         |agg AS (SELECT doc_id,
         |          round(CAST(SUM(CAST(round(tscore, 8) AS DECIMAL(20,8))) AS DOUBLE), 4) AS bm25
         |        FROM sc GROUP BY 1),
         |sleg AS (SELECT doc_id, rnk FROM (
         |  SELECT doc_id, ROW_NUMBER() OVER (ORDER BY bm25 DESC, doc_id) AS rnk
         |  FROM agg) z WHERE rnk <= $LegN),
         |${ExtQueries.quantSql},
         |dsc AS (SELECT c.vec_id AS doc_id,
         |          ROUND(list_inner_product(q.qv, c.qv)
         |                / (sqrt(q.n2) * sqrt(c.n2)), 4) AS cos
         |        FROM qn q JOIN qn c ON c.vec_id != q.vec_id
         |        WHERE q.vec_id = $DenseQ),
         |dleg AS (SELECT doc_id, rnk FROM (
         |  SELECT doc_id, ROW_NUMBER() OVER (ORDER BY cos DESC, doc_id) AS rnk
         |  FROM dsc) z WHERE rnk <= $LegN),
         |fused AS (SELECT COALESCE(s.doc_id, d.doc_id) AS doc_id,
         |    ROUND(COALESCE(CAST(1.0 AS DOUBLE) / ($RrfK + s.rnk), 0)
         |        + COALESCE(CAST(1.0 AS DOUBLE) / ($RrfK + d.rnk), 0), 6) AS rrf,
         |    CAST(COALESCE(s.rnk, 0) AS BIGINT) AS srnk,
         |    CAST(COALESCE(d.rnk, 0) AS BIGINT) AS drnk
         |  FROM sleg s FULL OUTER JOIN dleg d ON d.doc_id = s.doc_id),
         |rk AS (SELECT *, ROW_NUMBER() OVER (ORDER BY rrf DESC, doc_id) AS frnk
         |       FROM fused)
         |SELECT doc_id, rrf, srnk, drnk FROM rk WHERE frnk <= 20
         |ORDER BY doc_id""".stripMargin,

    // token slices via list_slice on the quantized grid: everything is
    // exact long arithmetic — MAX per query token, SUM over query tokens
    "ann_maxsim_topk" ->
      s"""WITH ${ExtQueries.quantSql},
         |tokv AS (SELECT vec_id, i, list_slice(qv, i * 8 + 1, i * 8 + 8) AS tv
         |         FROM qn, UNNEST(range(0, 8)) t(i)),
         |qt AS (SELECT vec_id AS query_id, i, tv FROM tokv
         |       WHERE vec_id IN (${ExtQueries.AnnQueries.mkString(", ")})),
         |md AS (SELECT q.query_id, d.vec_id, q.i,
         |         MAX(CAST(list_inner_product(q.tv, d.tv) AS BIGINT)) AS m
         |       FROM qt q JOIN tokv d ON d.vec_id != q.query_id
         |       GROUP BY q.query_id, d.vec_id, q.i),
         |ms AS (SELECT query_id, vec_id, CAST(SUM(m) AS BIGINT) AS ms
         |       FROM md GROUP BY 1, 2),
         |r AS (SELECT query_id, vec_id, ms,
         |        ROW_NUMBER() OVER (PARTITION BY query_id
         |            ORDER BY ms DESC, vec_id) AS rnk
         |      FROM ms)
         |SELECT query_id, CAST(rnk AS BIGINT) AS rnk, vec_id, ms FROM r
         |WHERE rnk <= 10 ORDER BY query_id, rnk""".stripMargin
  )
}
