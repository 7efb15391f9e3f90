package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{AnnIndex, ConnectedComponents, Dedup, IvfIndex,
  Retrieval, Tables}

/**
 * Round 16: pipeline composes over the standing index —
 *
 *  - dedup_semantic_ivf: SEMANTIC DEDUPLICATION end-to-end (the SemDeDup
 *    recipe, Abbas et al. 2023: cluster embeddings, pair within
 *    clusters, keep one representative per duplicate group): the
 *    standing IVF index is the clustering (already built, memoized,
 *    cluster-partitioned), within-cell pairs come from the capped
 *    blocking join (hot cells sub-split — never quadratic), duplicate
 *    GROUPS form by connected components over the pair graph, and the
 *    kept representative is the min vec_id per component. Output: the
 *    REMOVED members with the representative each duplicates — exactly
 *    what a curation pipeline writes back as a drop list. Every stage
 *    (k-means fit, capped blocking hash, exact cosine, CC) is replayed
 *    by the oracle.
 *
 *  - retrieval_hybrid_rrf_ivf: the hybrid-retrieval read SERVED FROM
 *    THE STANDING INDEX — same RRF fusion as retrieval_hybrid_rrf, but
 *    the dense leg is the IVF probe read (broadcast probes, only the
 *    probed lists scanned) instead of the exact corpus scan: the shape
 *    a deployment actually runs at 100 TB, where the dense leg must
 *    not be O(corpus). The sparse leg and the fuse are unchanged —
 *    leg quality is the only thing the index approximation touches.
 */
object ExtQueries57 {

  private val NLists = 16
  private val IvfIters = 3
  private val NProbe = 4
  private val Terms = Seq("key", "value", "table", "row", "scan")
  private val DenseQ = 3L
  private val LegN = 50
  private val RrfK = 60

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    "dedup_semantic_ivf" -> ((s, dir) => {
      val idx = AnnIndex.ivf(s, dir, NLists, IvfIters)
      val pairs = Dedup
        .embeddingNearDupsIvfCells(idx.assigned, 0.30, ExtQueries50.CellCap)
        .select(col("vec_a").as("doc_a"), col("vec_b").as("doc_b"))
      ConnectedComponents.components(pairs)
        .where(col("node") =!= col("comp"))
        .select(col("node").as("vec_id"), col("comp").as("kept_rep"))
        .orderBy(col("vec_id"))
    }),

    // LATE INTERACTION AT SCALE (the ColBERT serving pipeline): a cheap
    // single-vector first stage — the standing IVF probe read — yields
    // a 50-candidate shortlist per query; maxsim (8x8-dim sub-vector
    // tokens, exact long arithmetic) reranks ONLY the shortlist. The
    // token cross-product never touches a non-candidate row, so the
    // expensive scorer's cost is |Q|*50 pairs regardless of corpus size.
    "ann_maxsim_rerank" -> ((s, dir) => {
      val idx = AnnIndex.ivf(s, dir, NLists, IvfIters)
      val shortlist = IvfIndex
        .topKFrom(idx.centroids, idx.assigned, ExtQueries.AnnQueries, LegN, NProbe)
        .select(col("query_id"), col("vec_id"))
      Retrieval.maxSimRerank(Tables.table(s, dir, "embeddings"), shortlist,
          ExtQueries.AnnQueries, 10)
        .orderBy(col("query_id"), col("rnk"))
    }),

    "retrieval_hybrid_rrf_ivf" -> ((s, dir) => {
      val sparse = Retrieval.rankLeg(
        Retrieval.bm25(Tables.table(s, dir, "documents"), Terms), "bm25", LegN)
      val idx = AnnIndex.ivf(s, dir, NLists, IvfIters)
      val dense = IvfIndex
        .topKFrom(idx.centroids, idx.assigned, Seq(DenseQ), LegN, NProbe)
        .select(col("vec_id").as("doc_id"), col("rnk"))
      Retrieval.rrfFuse(sparse, dense, RrfK, topN = 20)
        .orderBy(col("doc_id"))
    })
  )

  def oracleSql: Map[String, String] = Map(

    // the full SemDeDup replay: capped IVF-cell pairs (shared CTEs) ->
    // thresholded edge list -> recursive min-label CC -> removed =
    // every node that is not its component's min
    "dedup_semantic_ivf" ->
      s"""WITH RECURSIVE ${ExtQueries50.ivfCellPairsCtes},
         |sel AS (SELECT vec_a, vec_b FROM pairs WHERE cosr >= 0.30),
         |e AS (SELECT vec_a AS src, vec_b AS dst FROM sel
         |      UNION SELECT vec_b, vec_a FROM sel),
         |cnodes AS (SELECT DISTINCT src AS node FROM e),
         |reach(node, lab) AS (
         |  SELECT node, node FROM cnodes
         |  UNION
         |  SELECT e.dst, r.lab FROM reach r JOIN e ON e.src = r.node)
         |SELECT node AS vec_id, MIN(lab) AS kept_rep FROM reach
         |GROUP BY node HAVING node != MIN(lab) ORDER BY vec_id""".stripMargin,

    // IVF shortlist (probe tail, rnk <= 50) -> maxsim over the shortlist
    // pairs only (token slices on the quantized grid, exact integers)
    "ann_maxsim_rerank" ->
      s"""WITH RECURSIVE ${ExtQueries.quantSql},
         |${ExtQueries46.ivfReplayBody("TRUE")},
         |probes AS (
         |  SELECT vec_id AS query_id, qv AS qqv, n2 AS qn2, c AS cluster FROM (
         |    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, c) AS rn
         |    FROM fdists WHERE vec_id IN (${ExtQueries.AnnQueries.mkString(", ")})) x
         |  WHERE rn <= $NProbe),
         |ivsc AS (
         |  SELECT p.query_id, v.vec_id,
         |         ROUND(list_inner_product(p.qqv, v.qv)
         |               / (sqrt(p.qn2) * sqrt(v.n2)), 4) AS cos
         |  FROM probes p JOIN indexed v
         |    ON v.cluster = p.cluster AND v.vec_id != p.query_id),
         |short AS (SELECT query_id, vec_id FROM (
         |  SELECT query_id, vec_id,
         |         ROW_NUMBER() OVER (PARTITION BY query_id
         |             ORDER BY cos DESC, vec_id) AS rnk
         |  FROM ivsc) z WHERE rnk <= $LegN),
         |tokv AS (SELECT vec_id, i, list_slice(qv, i * 8 + 1, i * 8 + 8) AS tv
         |         FROM qn, UNNEST(range(0, 8)) t(i)),
         |qt AS (SELECT vec_id AS query_id, i, tv FROM tokv
         |       WHERE vec_id IN (${ExtQueries.AnnQueries.mkString(", ")})),
         |md AS (SELECT s.query_id, s.vec_id, q.i,
         |         MAX(CAST(list_inner_product(q.tv, d.tv) AS BIGINT)) AS m
         |       FROM short s
         |       JOIN qt q ON q.query_id = s.query_id
         |       JOIN tokv d ON d.vec_id = s.vec_id
         |       GROUP BY s.query_id, s.vec_id, q.i),
         |ms AS (SELECT query_id, vec_id, CAST(SUM(m) AS BIGINT) AS ms
         |       FROM md GROUP BY 1, 2),
         |r AS (SELECT query_id, vec_id, ms,
         |        ROW_NUMBER() OVER (PARTITION BY query_id
         |            ORDER BY ms DESC, vec_id) AS rnk
         |      FROM ms)
         |SELECT query_id, CAST(rnk AS BIGINT) AS rnk, vec_id, ms FROM r
         |WHERE rnk <= 10 ORDER BY query_id, rnk""".stripMargin,

    // bm25 leg + the IVF probe-read dense leg (full-corpus fit replay +
    // probe/score/rank tail at nProbe=4, rnk <= 50) + the same fusion
    "retrieval_hybrid_rrf_ivf" ->
      s"""WITH RECURSIVE tok AS (SELECT doc_id, UNNEST(string_split(text, ' ')) AS term FROM documents),
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
         |${ExtQueries46.ivfReplayBody("TRUE")},
         |probes AS (
         |  SELECT vec_id AS query_id, qv AS qqv, n2 AS qn2, c AS cluster FROM (
         |    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, c) AS rn
         |    FROM fdists WHERE vec_id = $DenseQ) x
         |  WHERE rn <= $NProbe),
         |dsc AS (
         |  SELECT v.vec_id AS doc_id,
         |         ROUND(list_inner_product(p.qqv, v.qv)
         |               / (sqrt(p.qn2) * sqrt(v.n2)), 4) AS cos
         |  FROM probes p JOIN indexed v
         |    ON v.cluster = p.cluster AND v.vec_id != p.query_id),
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
         |ORDER BY doc_id""".stripMargin
  )
}
