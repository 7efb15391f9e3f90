package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{AnnIndex, PqIndex, Similarity, Tables}

/**
 * Round 14, wave 2: PRODUCT QUANTIZATION ANN ([[graft.operators.PqIndex]])
 * — the memory-compression member of the similarity family (exact scan /
 * LSH buckets / IVF lists / PQ codes): 64-long vectors become 8
 * single-byte codes + shared 16-entry sub-codebooks, and queries score
 * via asymmetric distance (ADC) against the codes alone. Everything is
 * the r13 exact-arithmetic discipline — integer truncated-mean sub-k-means (DuckDB `//` semantics),
 * integer ADC dots, one final ROUND — so all three queries hash-match a
 * full DuckDB replay (8 parallel sub-k-means in one recursive CTE keyed
 * by subspace).
 *
 *  - ann_pq_codes: the persistable artifact — per vector, its 8 codes
 *    and exact reconstructed norm^2.
 *  - ann_topk_pq: ADC top-10 for the standard query set.
 *  - ann_pq_recall: recall@10 of the ADC ranking vs the exact scan —
 *    the eval a deployment reads before trusting the codes; BOTH
 *    rankings replayed in SQL.
 */
object ExtQueries47 {

  private[graft] val M = 8        // subspaces
  private[graft] val SubDim = 8   // dims per subspace (64 / M)
  private[graft] val Ksub = 16    // codes per subspace
  private[graft] val Iters = 2    // Lloyd iterations per sub-codebook

  private def embs(s: SparkSession, dir: String): DataFrame =
    Tables.table(s, dir, "embeddings")

  /** The standing PQ artifact — all three queries (and warm bench reps)
    * share one build via the [[graft.operators.AnnIndex]] memo. */
  private def pqArt(s: SparkSession, dir: String): AnnIndex.Pq =
    AnnIndex.pq(s, dir, M, Ksub, Iters)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    "ann_pq_codes" -> ((s, dir) =>
      PqIndex.codeTableFrom(pqArt(s, dir).codes, M)
        .orderBy(col("vec_id"))),

    "ann_topk_pq" -> ((s, dir) => {
      val art = pqArt(s, dir)
      PqIndex.adcTopKFrom(art.books, art.codes, embs(s, dir), ExtQueries.AnnQueries, 10)
        .orderBy(col("query_id"), col("rnk"))
    }),

    // IVFADC from the SINGLE standing table (r14 verdict #3): codes
    // stored with their IVF cluster — serving is one broadcast-probe
    // join onto the table, never a corpus-sized code shuffle; the DuckDB
    // oracle stitches BOTH replays over one qn
    "ann_topk_ivfpq" -> ((s, dir) => {
      val art = AnnIndex.ivfpq(s, dir, 16, 3, M, Ksub, Iters)
      PqIndex.ivfadcTopKFromTable(art.centroids, art.books, art.table,
          embs(s, dir), ExtQueries.AnnQueries, 10, nProbe = 4)
        .orderBy(col("query_id"), col("rnk"))
    }),

    "ann_pq_recall" -> ((s, dir) => {
      val art = pqArt(s, dir)
      val pq = PqIndex.adcTopKFrom(art.books, art.codes, embs(s, dir), ExtQueries.AnnQueries, 10)
      val exact = Similarity.bruteForceTopK(embs(s, dir), ExtQueries.AnnQueries, 10)
        .select(col("query_id"), col("vec_id")).withColumn("hit", lit(1))
      pq.select(col("query_id"), col("vec_id"))
        .join(exact, Seq("query_id", "vec_id"), "left_outer")
        .groupBy(col("query_id"))
        .agg(sum(coalesce(col("hit"), lit(0))).cast("long").as("n_hits"),
          round(sum(coalesce(col("hit"), lit(0))) / lit(10.0), 4).as("recall"))
        .orderBy(col("query_id"))
    })
  )

  /** The PQ replay: 8 sub-k-means advance together in one recursive CTE
    * keyed by subspace `s`; codes/reconstruction read the final books.
    * Same exactness argument as the IVF replay (ExtQueries.oracleSql
    * "ann_topk_ivf"), per subspace. */
  private val pqCtes: String =
    s"""${ExtQueries.quantSql},
       |$pqCtesBody""".stripMargin

  /** The PQ replay WITHOUT the leading quantSql — composable next to the
    * IVF replay body over the same `qn` (the IVFADC oracle). */
  private[graft] def pqCtesBody: String = pqReplayBody("TRUE")

  /** The PQ replay parametrized by the FIT predicate (which rows the
    * codebooks are trained on — the PQ twin of
    * [[ExtQueries46.ivfReplayBody]]): seeds are the ksub lowest vec_ids
    * OF THE FIT SHARD, the sub-k-means trains on the fit shard only, and
    * `codes`/`recon` encode ALL vectors against the final books — the
    * frozen-codebook ingest-refresh contract. `src` is the vector CTE
    * the subspaces slice (default the raw `qn`; the RESIDUAL IVFADC
    * oracle passes its residual CTE — ExtQueries53). */
  private[graft] def pqReplayBody(fitPred: String, src: String = "qn"): String = {
    s"""pqsub AS (
       |  SELECT vec_id, s, qv[s*$SubDim+1 : s*$SubDim+$SubDim] AS sq
       |  FROM $src, UNNEST(range(0, $M)) t(s)),
       |pqfit AS (SELECT vec_id, s, sq FROM pqsub
       |          WHERE vec_id IN (SELECT vec_id FROM $src WHERE $fitPred)),
       |pqseeds AS (
       |  SELECT s, CAST(ROW_NUMBER() OVER (PARTITION BY s ORDER BY vec_id) - 1
       |           AS BIGINT) AS c, sq AS cv
       |  FROM pqfit
       |  WHERE vec_id IN (SELECT vec_id FROM $src WHERE $fitPred
       |                   ORDER BY vec_id LIMIT $Ksub)),
       |pqkm(iter, s, c, cv) AS (
       |  SELECT CAST(0 AS BIGINT), s, c, cv FROM pqseeds
       |  UNION ALL
       |  (
       |  WITH dists AS (
       |    SELECT v.vec_id, v.s, v.sq, k2.c,
       |           list_inner_product(k2.cv, k2.cv)
       |             - 2 * list_inner_product(v.sq, k2.cv) AS d
       |    FROM pqfit v JOIN pqkm k2 ON k2.s = v.s),
       |  asg AS (
       |    SELECT vec_id, s, sq, c AS cl FROM (
       |      SELECT *, ROW_NUMBER() OVER (PARTITION BY s, vec_id ORDER BY d, c) AS rn
       |      FROM dists) x WHERE rn = 1),
       |  mean AS (
       |    SELECT s, cl, i, CAST(SUM(sq[i]) // COUNT(*) AS BIGINT) AS m
       |    FROM asg, UNNEST(range(1, len(sq) + 1)) t(i)
       |    GROUP BY s, cl, i),
       |  mlist AS (SELECT s, cl, list(m ORDER BY i) AS mv FROM mean GROUP BY s, cl)
       |  SELECT (SELECT MAX(k3.iter) FROM pqkm k3) + 1, pqkm.s, pqkm.c,
       |         COALESCE(ml.mv, pqkm.cv)
       |  FROM pqkm LEFT JOIN mlist ml ON ml.s = pqkm.s AND ml.cl = pqkm.c
       |  WHERE (SELECT MAX(k4.iter) FROM pqkm k4) < $Iters
       |  )
       |),
       |books AS (SELECT s, c, cv FROM pqkm WHERE iter = $Iters),
       |cdists AS (
       |  SELECT v.vec_id, v.s, b.c,
       |         list_inner_product(b.cv, b.cv)
       |           - 2 * list_inner_product(v.sq, b.cv) AS d,
       |         list_inner_product(b.cv, b.cv) AS cn2
       |  FROM pqsub v JOIN books b ON b.s = v.s),
       |codes AS (
       |  SELECT vec_id, s, c AS code, cn2 FROM (
       |    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id, s ORDER BY d, c) AS rn
       |    FROM cdists) x WHERE rn = 1),
       |recon AS (
       |  SELECT vec_id, CAST(SUM(cn2) AS BIGINT) AS recon2
       |  FROM codes GROUP BY vec_id)""".stripMargin
  }

  def oracleSql: Map[String, String] = {
    val codeCols = (0 until M).map(s =>
      s"CAST(MAX(CASE WHEN s = $s THEN code END) AS BIGINT) AS code_$s")
      .mkString(",\n       |       ")
    val qIn = ExtQueries.AnnQueries.mkString(", ")
    Map(
      "ann_pq_codes" ->
        s"""WITH RECURSIVE $pqCtes
           |SELECT c.vec_id,
           |       $codeCols,
           |       MAX(r.recon2) AS recon2
           |FROM codes c JOIN recon r ON r.vec_id = c.vec_id
           |GROUP BY c.vec_id ORDER BY c.vec_id""".stripMargin,

      "ann_topk_pq" ->
        s"""WITH RECURSIVE $pqCtes,
           |qsub AS (SELECT vec_id AS query_id, s, sq FROM pqsub
           |         WHERE vec_id IN ($qIn)),
           |qnorm AS (SELECT vec_id AS query_id, n2 AS qn2 FROM qn
           |          WHERE vec_id IN ($qIn)),
           |adc AS (
           |  SELECT q.query_id, x.vec_id,
           |         SUM(list_inner_product(q.sq, b.cv)) AS dot
           |  FROM qsub q
           |  JOIN codes x ON x.s = q.s AND x.vec_id != q.query_id
           |  JOIN books b ON b.s = x.s AND b.c = x.code
           |  GROUP BY q.query_id, x.vec_id),
           |scored AS (
           |  SELECT a.query_id, a.vec_id,
           |         ROUND(a.dot / (sqrt(qq.qn2) * sqrt(r.recon2)), 4) AS score
           |  FROM adc a
           |  JOIN qnorm qq ON qq.query_id = a.query_id
           |  JOIN recon r ON r.vec_id = a.vec_id),
           |ranked AS (
           |  SELECT query_id, vec_id, score,
           |         ROW_NUMBER() OVER (PARTITION BY query_id
           |             ORDER BY score DESC, vec_id) AS rnk
           |  FROM scored)
           |SELECT query_id, rnk, vec_id, score FROM ranked WHERE rnk <= 10
           |ORDER BY query_id, rnk""".stripMargin,

      // both replays share one qn; CTE names are disjoint by construction
      // (fitq/seeds/km/fin/fdists/indexed vs pqsub/pqseeds/pqkm/books/
      // cdists/codes/recon)
      "ann_topk_ivfpq" ->
        s"""WITH RECURSIVE ${ExtQueries.quantSql},
           |${ExtQueries46.ivfReplayBody("TRUE")},
           |$pqCtesBody,
           |probes AS (
           |  SELECT vec_id AS query_id, c AS cluster FROM (
           |    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, c) AS rn
           |    FROM fdists WHERE vec_id IN ($qIn)) x
           |  WHERE rn <= 4),
           |qsub AS (SELECT vec_id AS query_id, s, sq FROM pqsub
           |         WHERE vec_id IN ($qIn)),
           |qnorm AS (SELECT vec_id AS query_id, n2 AS qn2 FROM qn
           |          WHERE vec_id IN ($qIn)),
           |cand AS (
           |  SELECT p.query_id, v.vec_id FROM probes p
           |  JOIN indexed v ON v.cluster = p.cluster AND v.vec_id != p.query_id),
           |adc AS (
           |  SELECT c.query_id, c.vec_id,
           |         SUM(list_inner_product(q.sq, b.cv)) AS dot
           |  FROM cand c
           |  JOIN qsub q ON q.query_id = c.query_id
           |  JOIN codes x ON x.vec_id = c.vec_id AND x.s = q.s
           |  JOIN books b ON b.s = x.s AND b.c = x.code
           |  GROUP BY c.query_id, c.vec_id),
           |scored AS (
           |  SELECT a.query_id, a.vec_id,
           |         ROUND(a.dot / (sqrt(qq.qn2) * sqrt(r.recon2)), 4) AS score
           |  FROM adc a
           |  JOIN qnorm qq ON qq.query_id = a.query_id
           |  JOIN recon r ON r.vec_id = a.vec_id),
           |ranked AS (
           |  SELECT query_id, vec_id, score,
           |         ROW_NUMBER() OVER (PARTITION BY query_id
           |             ORDER BY score DESC, vec_id) AS rnk
           |  FROM scored)
           |SELECT query_id, rnk, vec_id, score FROM ranked WHERE rnk <= 10
           |ORDER BY query_id, rnk""".stripMargin,

      "ann_pq_recall" ->
        s"""WITH RECURSIVE $pqCtes,
           |qsub AS (SELECT vec_id AS query_id, s, sq FROM pqsub
           |         WHERE vec_id IN ($qIn)),
           |qnorm AS (SELECT vec_id AS query_id, n2 AS qn2 FROM qn
           |          WHERE vec_id IN ($qIn)),
           |adc AS (
           |  SELECT q.query_id, x.vec_id,
           |         SUM(list_inner_product(q.sq, b.cv)) AS dot
           |  FROM qsub q
           |  JOIN codes x ON x.s = q.s AND x.vec_id != q.query_id
           |  JOIN books b ON b.s = x.s AND b.c = x.code
           |  GROUP BY q.query_id, x.vec_id),
           |pqscored AS (
           |  SELECT a.query_id, a.vec_id,
           |         ROUND(a.dot / (sqrt(qq.qn2) * sqrt(r.recon2)), 4) AS score
           |  FROM adc a
           |  JOIN qnorm qq ON qq.query_id = a.query_id
           |  JOIN recon r ON r.vec_id = a.vec_id),
           |pqranked AS (
           |  SELECT query_id, vec_id,
           |         ROW_NUMBER() OVER (PARTITION BY query_id
           |             ORDER BY score DESC, vec_id) AS rnk
           |  FROM pqscored),
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
           |SELECT p.query_id,
           |       CAST(SUM(CASE WHEN e.vec_id IS NOT NULL THEN 1 ELSE 0 END)
           |            AS BIGINT) AS n_hits,
           |       ROUND(SUM(CASE WHEN e.vec_id IS NOT NULL THEN 1 ELSE 0 END)
           |             / 10.0, 4) AS recall
           |FROM (SELECT query_id, vec_id FROM pqranked WHERE rnk <= 10) p
           |LEFT JOIN (SELECT query_id, vec_id FROM exranked WHERE rnk <= 10) e
           |  ON e.query_id = p.query_id AND e.vec_id = p.vec_id
           |GROUP BY p.query_id ORDER BY p.query_id""".stripMargin
    )
  }
}
