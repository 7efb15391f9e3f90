package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{AnnIndex, Similarity, SqIndex, Tables}

/**
 * Round 15, wave 2: SCALAR QUANTIZATION (SQ8) ANN
 * ([[graft.operators.SqIndex]]) — the third compression member of the
 * similarity toolbox (exact scan / LSH buckets / IVF lists / PQ codes /
 * SQ bytes), and the FAISS deployment default when recall matters more
 * than the last 4x of memory: 64 longs (512 B) become 64 single-byte
 * codes against per-dimension exact min/max stats. Everything is exact
 * integer arithmetic (requantize `((v-mn)*255) DIV rg`, reconstruct
 * `mn + (code*rg) DIV 255`, truncating division both engines share), one
 * ROUND(4) at the end — so all five queries hash-match a plain
 * (non-recursive!) DuckDB replay: unlike IVF/PQ there is no iterative
 * fit, which is exactly why SQ8 is the cheapest artifact to build and
 * refit at 100 TB (one aggregate scan).
 *
 *  - ann_sq_codes: the persistable artifact, relational shape (one row
 *    per vector x dimension).
 *  - ann_topk_sq: asymmetric top-10 — full query vectors, corpus rows
 *    reconstructed from their codes on the fly.
 *  - ann_sq_recall: recall@10 vs the exact scan (the eval before
 *    trusting the bytes; SQ8 should sit far above PQ8's number).
 *  - ann_sq_refresh: the lifecycle verb — stats FROZEN on the 80% base
 *    snapshot, the ingest shard encoded O(batch) against them
 *    (out-of-range values saturate, the standard SQ posture until a
 *    refit); output is the grown code table.
 *  - ann_topk_sq_refreshed: serving from the refreshed table.
 *  - ann_sq_recall_drift / ann_sq_refit: the last two lifecycle verbs
 *    (aged-stats recall vs exact; stats refit-and-swap) — with these,
 *    IVF, PQ and SQ all carry the full five-verb lifecycle.
 */
object ExtQueries49 {

  private def isIngest = col("vec_id") % 5 === 4 // 20% ingest shard

  private def embs(s: SparkSession, dir: String): DataFrame =
    Tables.table(s, dir, "embeddings")

  private def sqArt(s: SparkSession, dir: String): AnnIndex.Sq =
    AnnIndex.sq(s, dir)

  private def baseSq(s: SparkSession, dir: String): AnnIndex.Sq =
    AnnIndex.sqFiltered(s, dir, "notmod5", !isIngest)

  private def refreshedCodes(s: SparkSession, dir: String): (AnnIndex.Sq, DataFrame) = {
    val art = baseSq(s, dir)
    (art, AnnIndex.refreshedSqCodes(art, embs(s, dir).where(isIngest)))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    "ann_sq_codes" -> ((s, dir) =>
      SqIndex.codeTableFrom(sqArt(s, dir).codes)
        .orderBy(col("vec_id"), col("i"))),

    "ann_topk_sq" -> ((s, dir) => {
      val art = sqArt(s, dir)
      SqIndex.sqTopKFrom(art.stats, art.codes, embs(s, dir), ExtQueries.AnnQueries, 10)
        .orderBy(col("query_id"), col("rnk"))
    }),

    "ann_sq_recall" -> ((s, dir) => {
      val art = sqArt(s, dir)
      val sq = SqIndex.sqTopKFrom(art.stats, art.codes, embs(s, dir),
        ExtQueries.AnnQueries, 10)
      val exact = Similarity.bruteForceTopK(embs(s, dir), ExtQueries.AnnQueries, 10)
        .select(col("query_id"), col("vec_id")).withColumn("hit", lit(1))
      sq.select(col("query_id"), col("vec_id"))
        .join(exact, Seq("query_id", "vec_id"), "left_outer")
        .groupBy(col("query_id"))
        .agg(sum(coalesce(col("hit"), lit(0))).cast("long").as("n_hits"),
          round(sum(coalesce(col("hit"), lit(0))) / lit(10.0), 4).as("recall"))
        .orderBy(col("query_id"))
    }),

    "ann_sq_refresh" -> ((s, dir) => {
      val (_, codes) = refreshedCodes(s, dir)
      SqIndex.codeTableFrom(codes).orderBy(col("vec_id"), col("i"))
    }),

    "ann_topk_sq_refreshed" -> ((s, dir) => {
      val (art, codes) = refreshedCodes(s, dir)
      SqIndex.sqTopKFrom(art.stats, codes, embs(s, dir), ExtQueries.AnnQueries, 10)
        .orderBy(col("query_id"), col("rnk"))
    }),

    // SQ DRIFT RECALL: recall@10 of the AGED artifact (stats frozen on
    // the 80% base, corpus grown to 100% — out-of-range ingest values
    // saturate) vs the exact scan; the signal that triggers ann_sq_refit.
    "ann_sq_recall_drift" -> ((s, dir) => {
      val (art, codes) = refreshedCodes(s, dir)
      val aged = SqIndex.sqTopKFrom(art.stats, codes, embs(s, dir),
        ExtQueries.AnnQueries, 10)
      val exact = Similarity.bruteForceTopK(embs(s, dir), ExtQueries.AnnQueries, 10)
        .select(col("query_id"), col("vec_id")).withColumn("hit", lit(1))
      aged.select(col("query_id"), col("vec_id"))
        .join(exact, Seq("query_id", "vec_id"), "left_outer")
        .groupBy(col("query_id"))
        .agg(sum(coalesce(col("hit"), lit(0))).cast("long").as("n_hits"),
          round(sum(coalesce(col("hit"), lit(0))) / lit(10.0), 4).as("recall"))
        .orderBy(col("query_id"))
    }),

    // SQ REFIT-AND-SWAP: re-derive the stats on the grown corpus (one
    // aggregate scan - the family's cheapest refit) under the standard
    // key, swap out the aged entry, serve the refit code table.
    "ann_sq_refit" -> ((s, dir) => {
      AnnIndex.sqFiltered(s, dir, "agedsqr15", !isIngest)
      val refit = AnnIndex.refitSqTo(s, dir, "agedsqr15", !isIngest)
      SqIndex.codeTableFrom(refit.codes).orderBy(col("vec_id"), col("i"))
    })
  )

  /** The SQ replay parametrized by the FIT predicate: stats over the fit
    * shard only, codes/reconstructions over ALL vectors — the
    * frozen-stats refresh contract. Non-recursive (no iterative fit). */
  private[graft] def sqReplayBody(fitPred: String): String =
    s"""st AS (
       |  SELECT i, MIN(qv[i]) AS mn, MAX(qv[i]) AS mx
       |  FROM qn, UNNEST(range(1, len(qv) + 1)) t(i)
       |  WHERE $fitPred GROUP BY i),
       |sqc AS (
       |  SELECT v.vec_id, t.i,
       |         CASE WHEN s.mx > s.mn
       |              THEN LEAST(GREATEST(
       |                     ((v.qv[t.i] - s.mn) * 255) // (s.mx - s.mn), 0), 255)
       |              ELSE 0 END AS code,
       |         s.mn, s.mx
       |  FROM qn v, UNNEST(range(1, len(v.qv) + 1)) t(i), st s
       |  WHERE s.i = t.i),
       |sqr AS (
       |  SELECT vec_id, i, code,
       |         CASE WHEN mx > mn THEN mn + (code * (mx - mn)) // 255
       |              ELSE mn END AS r
       |  FROM sqc),
       |rv AS (
       |  SELECT vec_id, list(r ORDER BY i) AS rv,
       |         CAST(SUM(r * r) AS BIGINT) AS recon2
       |  FROM sqr GROUP BY vec_id)""".stripMargin

  private def codesSql(fitPred: String): String =
    s"""WITH ${ExtQueries.quantSql},
       |${sqReplayBody(fitPred)}
       |SELECT c.vec_id, c.i, CAST(c.code AS BIGINT) AS code, r.recon2
       |FROM sqc c JOIN rv r ON r.vec_id = c.vec_id
       |ORDER BY c.vec_id, c.i""".stripMargin

  private def topkSql(fitPred: String): String = {
    val qIn = ExtQueries.AnnQueries.mkString(", ")
    s"""WITH ${ExtQueries.quantSql},
       |${sqReplayBody(fitPred)},
       |scored AS (
       |  SELECT q.vec_id AS query_id, c.vec_id,
       |         ROUND(list_inner_product(q.qv, c.rv)
       |               / (sqrt(q.n2) * sqrt(c.recon2)), 4) AS score
       |  FROM qn q JOIN rv c ON c.vec_id != q.vec_id
       |  WHERE q.vec_id IN ($qIn)),
       |ranked AS (
       |  SELECT query_id, vec_id, score,
       |         ROW_NUMBER() OVER (PARTITION BY query_id
       |             ORDER BY score DESC, vec_id) AS rnk
       |  FROM scored)
       |SELECT query_id, rnk, vec_id, score FROM ranked WHERE rnk <= 10
       |ORDER BY query_id, rnk""".stripMargin
  }

  def oracleSql: Map[String, String] = {
    val qIn = ExtQueries.AnnQueries.mkString(", ")
    Map(
      "ann_sq_codes" -> codesSql("TRUE"),
      "ann_topk_sq" -> topkSql("TRUE"),
      "ann_sq_refresh" -> codesSql("vec_id % 5 != 4"),
      "ann_topk_sq_refreshed" -> topkSql("vec_id % 5 != 4"),
      // refit == a full rebuild fit on the whole grown corpus
      "ann_sq_refit" -> codesSql("TRUE"),

      // aged-stats recall vs the exact scan over the grown corpus
      "ann_sq_recall_drift" ->
        s"""WITH ${ExtQueries.quantSql},
           |${sqReplayBody("vec_id % 5 != 4")},
           |scored AS (
           |  SELECT q.vec_id AS query_id, c.vec_id,
           |         ROUND(list_inner_product(q.qv, c.rv)
           |               / (sqrt(q.n2) * sqrt(c.recon2)), 4) AS score
           |  FROM qn q JOIN rv c ON c.vec_id != q.vec_id
           |  WHERE q.vec_id IN ($qIn)),
           |sqranked AS (
           |  SELECT query_id, vec_id,
           |         ROW_NUMBER() OVER (PARTITION BY query_id
           |             ORDER BY score DESC, vec_id) AS rnk
           |  FROM scored),
           |exact AS (
           |  SELECT qq.vec_id AS query_id, c.vec_id,
           |         ROUND(list_inner_product(qq.qv, c.qv)
           |               / (sqrt(qq.n2) * sqrt(c.n2)), 4) AS cos
           |  FROM qn qq JOIN qn c ON c.vec_id != qq.vec_id
           |  WHERE qq.vec_id IN ($qIn)),
           |exranked AS (
           |  SELECT query_id, vec_id,
           |         ROW_NUMBER() OVER (PARTITION BY query_id
           |             ORDER BY cos DESC, vec_id) AS rnk
           |  FROM exact)
           |SELECT a.query_id,
           |       CAST(SUM(CASE WHEN e.vec_id IS NOT NULL THEN 1 ELSE 0 END)
           |            AS BIGINT) AS n_hits,
           |       ROUND(SUM(CASE WHEN e.vec_id IS NOT NULL THEN 1 ELSE 0 END)
           |             / 10.0, 4) AS recall
           |FROM (SELECT query_id, vec_id FROM sqranked WHERE rnk <= 10) a
           |LEFT JOIN (SELECT query_id, vec_id FROM exranked WHERE rnk <= 10) e
           |  ON e.query_id = a.query_id AND e.vec_id = a.vec_id
           |GROUP BY a.query_id ORDER BY a.query_id""".stripMargin,

      "ann_sq_recall" ->
        s"""WITH ${ExtQueries.quantSql},
           |${sqReplayBody("TRUE")},
           |scored AS (
           |  SELECT q.vec_id AS query_id, c.vec_id,
           |         ROUND(list_inner_product(q.qv, c.rv)
           |               / (sqrt(q.n2) * sqrt(c.recon2)), 4) AS score
           |  FROM qn q JOIN rv c ON c.vec_id != q.vec_id
           |  WHERE q.vec_id IN ($qIn)),
           |sqranked AS (
           |  SELECT query_id, vec_id,
           |         ROW_NUMBER() OVER (PARTITION BY query_id
           |             ORDER BY score DESC, vec_id) AS rnk
           |  FROM scored),
           |exact AS (
           |  SELECT qq.vec_id AS query_id, c.vec_id,
           |         ROUND(list_inner_product(qq.qv, c.qv)
           |               / (sqrt(qq.n2) * sqrt(c.n2)), 4) AS cos
           |  FROM qn qq JOIN qn c ON c.vec_id != qq.vec_id
           |  WHERE qq.vec_id IN ($qIn)),
           |exranked AS (
           |  SELECT query_id, vec_id,
           |         ROW_NUMBER() OVER (PARTITION BY query_id
           |             ORDER BY cos DESC, vec_id) AS rnk
           |  FROM exact)
           |SELECT a.query_id,
           |       CAST(SUM(CASE WHEN e.vec_id IS NOT NULL THEN 1 ELSE 0 END)
           |            AS BIGINT) AS n_hits,
           |       ROUND(SUM(CASE WHEN e.vec_id IS NOT NULL THEN 1 ELSE 0 END)
           |             / 10.0, 4) AS recall
           |FROM (SELECT query_id, vec_id FROM sqranked WHERE rnk <= 10) a
           |LEFT JOIN (SELECT query_id, vec_id FROM exranked WHERE rnk <= 10) e
           |  ON e.query_id = a.query_id AND e.vec_id = a.vec_id
           |GROUP BY a.query_id ORDER BY a.query_id""".stripMargin
    )
  }
}
