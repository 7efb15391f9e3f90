package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{AnnIndex, Similarity, Tables}

/**
 * Round 16, wave 3: BATCHED / FILTERED / RANGE ANN SERVING — the serve
 * shapes a retrieval deployment needs beyond the literal-id top-k probe,
 * all from the SAME standing IVF index (no new builds: every query here
 * shares the memoized `ivf(16, 3)` artifact with ann_topk_ivf), all
 * fully replayed in DuckDB through the exact-k-means CTEs of
 * ExtQueries46.
 *
 *  - ann_knn_join: the batched kNN JOIN — top-k for every row of a
 *    query-side RELATION (a predicate, not an id list) in one plan.
 *    This is the 100 TB retrieval shape: |Q| is data-sized (kNN-graph
 *    construction, semantic dedup, hard-negative mining), so the serve
 *    must be a join, not a per-query loop. Candidates are pre-cut to k
 *    per (query, probed list) with NO extra shuffle (the pre-cut window
 *    runs under the probe join's own hash(cluster) partitioning), so
 *    the global top-k window moves |Q|·nProbe·k rows, never
 *    |Q|·list-size.
 *  - ann_knn_graph_stats / ann_knn_graph_mutual: the full-corpus kNN
 *    graph (queryPred = TRUE) reduced to its curation signals —
 *    indegree histogram (hub detection) and mutual-kNN edge count (the
 *    symmetric-neighbor graph SemDeDup-style pruning walks). The graph
 *    itself is |N|·k rows — these stay bounded aggregates on the query
 *    surface.
 *  - ann_radius_ivf: epsilon-ball (range) search — every probed-list
 *    neighbor with cos >= 0.2, rank-capped at 50/query so dense
 *    neighborhoods can't unbound the result.
 *  - ann_topk_ivf_filtered: serve-time metadata filtering (the FAISS
 *    IDSelector shape): the candidate predicate rides the inverted-list
 *    scan of the UNFILTERED standing index — pre-filter semantics, no
 *    per-predicate index build (contrast AnnIndex.ivfFiltered, which
 *    fits a dedicated index over a corpus subset).
 *  - ann_topk_mips: exact maximum-inner-product top-k — the correct
 *    ranking for dot-trained embedding models, where cosine is wrong.
 *    Integer dot on the e6 grid: the surface is bit-exact, no rounding.
 *  - ann_knn_join_external: the TRUE retrieval shape — a query batch
 *    that is NOT in the corpus (assignment computed on the fly, nothing
 *    self-excluded); fixture = reversed embeddings (norm-preserving
 *    permutation, so the oracle reuses n2 exactly).
 *  - ann_knn_join_recall: recall@k of the batched join vs the exact
 *    scan over the same query relation — every approximate serve here
 *    carries an oracled recall companion.
 *  - ann_topk_mips_ivf / ann_mips_ivf_recall: MIPS on the IVF path via
 *    the norm-augmentation reduction (one extra integer coordinate
 *    round(sqrt(maxN2 − |v|²)) makes augmented norms ~constant, queries
 *    carry 0 there, so augmented-cosine pruning is monotone in the raw
 *    inner product) — the indexed serve for dot-trained models, scored
 *    by the exact raw integer dot, with its oracled recall companion.
 *  - ann_probe_sweep: recall@10 at nProbe 1/2/4/8 from ONE probe
 *    assignment (probe rank rides the scored rows; configs are nested
 *    rank-filters) — the tuning curve a deployment reads before fixing
 *    nProbe, without four index scans.
 *  - ann_index_stats: list-balance health report (imbalance = max/mean
 *    list size) — the refit/re-size trigger alongside drift recall.
 *
 * Scale notes: the probe side of every serve is |Q|·nProbe rows and
 * broadcasts; at |Q| ~ corpus the same plan degrades to a shuffled join
 * on `cluster` with parallelism nLists — the reason nLists follows the
 * ~sqrt(N) FAISS sizing rule at scale (IvfIndex.knnJoinFrom scaladoc;
 * KnnJoinScale measures the rule).
 */
object ExtQueries52 {

  private val NLists = 16
  private val Iters = 3
  private val NProbe = 4
  private val K = 5
  private[graft] val RadiusMinCos = 0.2
  private[graft] val RadiusCap = 50

  private def embs(s: SparkSession, dir: String): DataFrame =
    Tables.table(s, dir, "embeddings")

  private def idx(s: SparkSession, dir: String) =
    AnnIndex.ivf(s, dir, NLists, Iters)

  /** The full-corpus kNN graph (every vector is a query). */
  private def graph(s: SparkSession, dir: String): DataFrame =
    AnnIndex.knnJoin(idx(s, dir), lit(true), K, NProbe)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    "ann_knn_join" -> ((s, dir) =>
      AnnIndex.knnJoin(idx(s, dir), col("vec_id") % 17 === 3, K, NProbe)
        .orderBy(col("query_id"), col("rnk"))),

    "ann_knn_graph_stats" -> ((s, dir) =>
      graph(s, dir)
        .groupBy(col("vec_id")).agg(count(lit(1)).as("indeg"))
        .groupBy(col("indeg")).agg(count(lit(1)).as("n_vecs"))
        .orderBy(col("indeg"))),

    "ann_knn_graph_mutual" -> ((s, dir) => {
      val edges = graph(s, dir).select(col("query_id"), col("vec_id"), col("cos"))
      val stats = edges.agg(count(lit(1)).as("n_edges"),
        round(min(col("cos")), 4).as("min_cos"),
        round(max(col("cos")), 4).as("max_cos"))
      val mutual = edges.as("a").join(edges.as("b"),
          col("a.query_id") === col("b.vec_id") &&
            col("a.vec_id") === col("b.query_id") &&
            col("a.query_id") < col("a.vec_id"))
        .agg(count(lit(1)).as("n_mutual"))
      stats.crossJoin(broadcast(mutual)) // two single-row aggregates
    }),

    "ann_radius_ivf" -> ((s, dir) =>
      AnnIndex.radius(idx(s, dir), ExtQueries.AnnQueries, RadiusMinCos,
          NProbe, RadiusCap)
        .orderBy(col("query_id"), col("rnk"))),

    "ann_topk_ivf_filtered" -> ((s, dir) =>
      AnnIndex.topKFiltered(idx(s, dir), ExtQueries.AnnQueries, 10, NProbe,
          col("vec_id") % 3 =!= 1)
        .orderBy(col("query_id"), col("rnk"))),

    "ann_topk_mips" -> ((s, dir) =>
      Similarity.bruteForceTopKDot(embs(s, dir), ExtQueries.AnnQueries, 10)
        .orderBy(col("query_id"), col("rnk"))),

    // EXTERNAL query vectors (the true retrieval shape: the query batch
    // is not in the corpus, so assignment is computed, nothing is
    // self-excluded). Deterministic out-of-corpus fixture: the REVERSED
    // embeddings of vectors 0..4 — a coordinate permutation keeps the
    // norm exact (the oracle reuses n2) while the vector itself is not
    // a corpus member.
    "ann_knn_join_external" -> ((s, dir) => {
      val q = embs(s, dir)
        .where(col("vec_id").isin(ExtQueries.AnnQueries: _*))
        .select(col("vec_id").as("query_id"),
          reverse(col("embedding")).as("embedding"))
      AnnIndex.knnJoinExternal(idx(s, dir), q, 10, NProbe)
        .orderBy(col("query_id"), col("rnk"))
    }),

    // the tuning signal: recall@10 at nProbe 1/2/4/8 from ONE standing
    // artifact and one probe assignment (configs are nested prn-filters
    // of the widest scan — each provably a topKFrom serve at that n)
    "ann_probe_sweep" -> ((s, dir) =>
      AnnIndex.probeSweep(idx(s, dir), ExtQueries.AnnQueries, 10,
          Seq(1, 2, 4, 8))
        .orderBy(col("n_probe"))),

    // the ops health report: list balance of the standing index (the
    // refit/re-size trigger alongside drift recall)
    "ann_index_stats" -> ((s, dir) =>
      AnnIndex.indexStats(idx(s, dir))),

    // MIPS on the IVF path via the norm-augmentation reduction — the
    // transform ann_topk_mips's scaladoc points at, implemented: corpus
    // vectors get one extra coordinate round(sqrt(maxN2 - |v|^2)),
    // queries get 0, lists are fit in the augmented geometry, and
    // candidates are scored by the EXACT raw integer dot
    "ann_topk_mips_ivf" -> ((s, dir) =>
      AnnIndex.mipsTopK(AnnIndex.mipsIvf(s, dir, NLists, Iters),
          ExtQueries.AnnQueries, 10, NProbe)
        .orderBy(col("query_id"), col("rnk"))),

    "ann_mips_ivf_recall" -> ((s, dir) => {
      val exact = Similarity.bruteForceTopKDot(embs(s, dir),
          ExtQueries.AnnQueries, 10)
        .select(col("query_id"), col("vec_id"))
      val approx = AnnIndex.mipsTopK(AnnIndex.mipsIvf(s, dir, NLists, Iters),
          ExtQueries.AnnQueries, 10, NProbe)
        .select(col("query_id"), col("vec_id"), lit(1).as("hit"))
      exact.join(approx, Seq("query_id", "vec_id"), "left")
        .groupBy(col("query_id"))
        .agg(count(lit(1)).as("n_exact"), count(col("hit")).as("n_hit"))
        .select(col("query_id"), col("n_exact"), col("n_hit"),
          round(col("n_hit") * lit(1.0) / col("n_exact"), 4).as("recall"))
        .orderBy(col("query_id"))
    }),

    // recall@k of the batched kNN join vs the exact scan over the SAME
    // query relation — the soundness number for the join path (every
    // approximate serve here carries an oracled recall companion)
    "ann_knn_join_recall" -> ((s, dir) => {
      val pred = col("vec_id") % 17 === 3
      val exact = Similarity.bruteForceTopKWhere(embs(s, dir), pred, K)
        .select(col("query_id"), col("vec_id"))
      val approx = AnnIndex.knnJoin(idx(s, dir), pred, K, NProbe)
        .select(col("query_id"), col("vec_id"), lit(1).as("hit"))
      exact.join(approx, Seq("query_id", "vec_id"), "left")
        .groupBy(col("query_id"))
        .agg(count(lit(1)).as("n_exact"), count(col("hit")).as("n_hit"))
        .select(col("query_id"), col("n_exact"), col("n_hit"),
          round(col("n_hit") * lit(1.0) / col("n_exact"), 4).as("recall"))
        .orderBy(col("query_id"))
    })
  )

  /** probes/scored tail over ExtQueries46.ivfReplayBody's `indexed` +
    * `fdists` CTEs, parametrized by the query-side predicate and an
    * optional candidate-side predicate. */
  private def serveTail(queryPred: String, candPred: String = "TRUE"): String =
    s"""probes AS (
       |  SELECT vec_id AS query_id, qv AS qqv, n2 AS qn2, c AS cluster FROM (
       |    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, c) AS rn
       |    FROM fdists WHERE $queryPred) x
       |  WHERE rn <= $NProbe),
       |scored AS (
       |  SELECT p.query_id, v.vec_id,
       |         ROUND(list_inner_product(p.qqv, v.qv)
       |               / (sqrt(p.qn2) * sqrt(v.n2)), 4) AS cos
       |  FROM probes p JOIN indexed v
       |    ON v.cluster = p.cluster AND v.vec_id != p.query_id
       |  WHERE $candPred),
       |ranked AS (
       |  SELECT query_id, vec_id, cos,
       |         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS rnk
       |  FROM scored)""".stripMargin

  private val annIds = ExtQueries.AnnQueries.mkString(", ")

  def oracleSql: Map[String, String] = Map(

    "ann_knn_join" ->
      s"""WITH RECURSIVE ${ExtQueries46.ivfReplayCtes("TRUE")},
         |${serveTail("vec_id % 17 = 3")}
         |SELECT query_id, rnk, vec_id, cos FROM ranked WHERE rnk <= $K
         |ORDER BY query_id, rnk""".stripMargin,

    "ann_knn_graph_stats" ->
      s"""WITH RECURSIVE ${ExtQueries46.ivfReplayCtes("TRUE")},
         |${serveTail("TRUE")},
         |edges AS (SELECT query_id, vec_id, cos FROM ranked WHERE rnk <= $K),
         |indeg AS (SELECT vec_id, COUNT(*) AS indeg FROM edges GROUP BY vec_id)
         |SELECT indeg, COUNT(*) AS n_vecs FROM indeg GROUP BY indeg
         |ORDER BY indeg""".stripMargin,

    "ann_knn_graph_mutual" ->
      s"""WITH RECURSIVE ${ExtQueries46.ivfReplayCtes("TRUE")},
         |${serveTail("TRUE")},
         |edges AS (SELECT query_id, vec_id, cos FROM ranked WHERE rnk <= $K)
         |SELECT (SELECT COUNT(*) FROM edges) AS n_edges,
         |       (SELECT ROUND(MIN(cos), 4) FROM edges) AS min_cos,
         |       (SELECT ROUND(MAX(cos), 4) FROM edges) AS max_cos,
         |       (SELECT COUNT(*) FROM edges a JOIN edges b
         |          ON a.query_id = b.vec_id AND a.vec_id = b.query_id
         |         AND a.query_id < a.vec_id) AS n_mutual""".stripMargin,

    "ann_radius_ivf" ->
      s"""WITH RECURSIVE ${ExtQueries46.ivfReplayCtes("TRUE")},
         |${serveTail(s"vec_id IN ($annIds)")}
         |SELECT query_id, rnk, vec_id, cos FROM ranked
         |WHERE cos >= $RadiusMinCos AND rnk <= $RadiusCap
         |ORDER BY query_id, rnk""".stripMargin,

    "ann_topk_ivf_filtered" ->
      s"""WITH RECURSIVE ${ExtQueries46.ivfReplayCtes("TRUE")},
         |${serveTail(s"vec_id IN ($annIds)", "v.vec_id % 3 != 1")}
         |SELECT query_id, rnk, vec_id, cos FROM ranked WHERE rnk <= 10
         |ORDER BY query_id, rnk""".stripMargin,

    "ann_topk_mips" ->
      s"""WITH ${ExtQueries.quantSql},
         |scored AS (
         |  SELECT qq.vec_id AS query_id, c.vec_id,
         |         CAST(list_inner_product(qq.qv, c.qv) AS BIGINT) AS dot
         |  FROM qn qq JOIN qn c ON c.vec_id != qq.vec_id
         |  WHERE qq.vec_id IN ($annIds)),
         |ranked AS (
         |  SELECT query_id, vec_id, dot,
         |         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY dot DESC, vec_id) AS rnk
         |  FROM scored)
         |SELECT query_id, rnk, vec_id, dot FROM ranked WHERE rnk <= 10
         |ORDER BY query_id, rnk""".stripMargin,

    // external queries: reversed qv (elementwise quantization commutes
    // with the permutation), SAME n2 (permutation-invariant norm),
    // probe-assigned against the final centroids, no self-exclusion
    "ann_knn_join_external" ->
      s"""WITH RECURSIVE ${ExtQueries46.ivfReplayCtes("TRUE")},
         |rq AS (
         |  SELECT vec_id AS query_id, list_reverse(qv) AS qqv, n2 AS qn2
         |  FROM qn WHERE vec_id IN ($annIds)),
         |probes AS (
         |  SELECT query_id, qqv, qn2, c AS cluster FROM (
         |    SELECT r.*, f.c,
         |           ROW_NUMBER() OVER (PARTITION BY r.query_id ORDER BY
         |             list_inner_product(f.cv, f.cv)
         |               - 2 * list_inner_product(r.qqv, f.cv), f.c) AS rn
         |    FROM rq r CROSS JOIN fin f) x
         |  WHERE rn <= $NProbe),
         |scored AS (
         |  SELECT p.query_id, v.vec_id,
         |         ROUND(list_inner_product(p.qqv, v.qv)
         |               / (sqrt(p.qn2) * sqrt(v.n2)), 4) AS cos
         |  FROM probes p JOIN indexed v ON v.cluster = p.cluster),
         |ranked AS (
         |  SELECT query_id, vec_id, cos,
         |         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS rnk
         |  FROM scored)
         |SELECT query_id, rnk, vec_id, cos FROM ranked WHERE rnk <= 10
         |ORDER BY query_id, rnk""".stripMargin,

    // one scored CTE with probe rank kept; each config is a nested
    // prn-filter with its own ranking — the same nesting the Spark side
    // computes from one probe assignment
    "ann_probe_sweep" -> {
      val perN = Seq(1, 2, 4, 8).map { n =>
        s"""SELECT $n AS n_probe, COUNT(*) AS n_exact,
           |       COUNT(h.vec_id) AS n_hit,
           |       ROUND(COUNT(h.vec_id) * 1.0 / COUNT(*), 4) AS recall
           |FROM exact e LEFT JOIN (
           |  SELECT query_id, vec_id FROM (
           |    SELECT query_id, vec_id,
           |           ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS rnk
           |    FROM pscored WHERE prn <= $n) r WHERE rnk <= 10) h
           |  ON h.query_id = e.query_id AND h.vec_id = e.vec_id""".stripMargin
      }.mkString("\n|UNION ALL\n|".stripMargin)
      s"""WITH RECURSIVE ${ExtQueries46.ivfReplayCtes("TRUE")},
         |pprobes AS (
         |  SELECT vec_id AS query_id, qv AS qqv, n2 AS qn2, c AS cluster,
         |         rn AS prn FROM (
         |    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, c) AS rn
         |    FROM fdists WHERE vec_id IN ($annIds)) x
         |  WHERE rn <= 8),
         |pscored AS (
         |  SELECT p.query_id, p.prn, v.vec_id,
         |         ROUND(list_inner_product(p.qqv, v.qv)
         |               / (sqrt(p.qn2) * sqrt(v.n2)), 4) AS cos
         |  FROM pprobes p JOIN indexed v
         |    ON v.cluster = p.cluster AND v.vec_id != p.query_id),
         |escored AS (
         |  SELECT qq.vec_id AS query_id, c.vec_id,
         |         ROUND(list_inner_product(qq.qv, c.qv)
         |               / (sqrt(qq.n2) * sqrt(c.n2)), 4) AS cos
         |  FROM qn qq JOIN qn c ON c.vec_id != qq.vec_id
         |  WHERE qq.vec_id IN ($annIds)),
         |exact AS (
         |  SELECT query_id, vec_id FROM (
         |    SELECT query_id, vec_id,
         |           ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS rnk
         |    FROM escored) x WHERE rnk <= 10)
         |SELECT * FROM (
         |$perN
         |) ORDER BY n_probe""".stripMargin
    },

    "ann_index_stats" ->
      s"""WITH RECURSIVE ${ExtQueries46.ivfReplayCtes("TRUE")},
         |sizes AS (SELECT cluster, COUNT(*) AS sz FROM indexed GROUP BY cluster)
         |SELECT $NLists AS n_lists,
         |       COUNT(*) AS n_nonempty,
         |       CAST(SUM(sz) AS BIGINT) AS n_vectors,
         |       MIN(sz) AS min_sz, MAX(sz) AS max_sz,
         |       ROUND(MAX(sz) * 1.0 * $NLists / SUM(sz), 4) AS imbalance
         |FROM sizes""".stripMargin,

    // augmented replay: lists fit over aqn (one extra integer coordinate
    // round(sqrt(maxN2 - n2)) — IEEE sqrt + half-away-from-zero round on
    // both engines), query side [q, 0], candidates scored by the exact
    // raw integer dot
    "ann_topk_mips_ivf" ->
      s"""WITH RECURSIVE ${ExtQueries.quantSql},
         |aqn AS (
         |  SELECT vec_id,
         |         list_append(qv, CAST(round(sqrt(CAST(
         |           (SELECT MAX(n2) FROM qn) - n2 AS DOUBLE))) AS BIGINT)) AS qv,
         |         n2
         |  FROM qn),
         |${ExtQueries46.ivfReplayBody("TRUE", "aqn")},
         |rq AS (
         |  SELECT vec_id AS query_id, list_append(qv, CAST(0 AS BIGINT)) AS qqv
         |  FROM qn WHERE vec_id IN ($annIds)),
         |probes AS (
         |  SELECT query_id, qqv, c AS cluster FROM (
         |    SELECT r.*, f.c,
         |           ROW_NUMBER() OVER (PARTITION BY r.query_id ORDER BY
         |             list_inner_product(f.cv, f.cv)
         |               - 2 * list_inner_product(r.qqv, f.cv), f.c) AS rn
         |    FROM rq r CROSS JOIN fin f) x
         |  WHERE rn <= $NProbe),
         |scored AS (
         |  SELECT p.query_id, v.vec_id,
         |         CAST(list_inner_product(p.qqv, v.qv) AS BIGINT) AS dot
         |  FROM probes p JOIN indexed v
         |    ON v.cluster = p.cluster AND v.vec_id != p.query_id),
         |ranked AS (
         |  SELECT query_id, vec_id, dot,
         |         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY dot DESC, vec_id) AS rnk
         |  FROM scored)
         |SELECT query_id, rnk, vec_id, dot FROM ranked WHERE rnk <= 10
         |ORDER BY query_id, rnk""".stripMargin,

    "ann_mips_ivf_recall" ->
      s"""WITH RECURSIVE ${ExtQueries.quantSql},
         |aqn AS (
         |  SELECT vec_id,
         |         list_append(qv, CAST(round(sqrt(CAST(
         |           (SELECT MAX(n2) FROM qn) - n2 AS DOUBLE))) AS BIGINT)) AS qv,
         |         n2
         |  FROM qn),
         |${ExtQueries46.ivfReplayBody("TRUE", "aqn")},
         |rq AS (
         |  SELECT vec_id AS query_id, list_append(qv, CAST(0 AS BIGINT)) AS qqv
         |  FROM qn WHERE vec_id IN ($annIds)),
         |probes AS (
         |  SELECT query_id, qqv, c AS cluster FROM (
         |    SELECT r.*, f.c,
         |           ROW_NUMBER() OVER (PARTITION BY r.query_id ORDER BY
         |             list_inner_product(f.cv, f.cv)
         |               - 2 * list_inner_product(r.qqv, f.cv), f.c) AS rn
         |    FROM rq r CROSS JOIN fin f) x
         |  WHERE rn <= $NProbe),
         |hits AS (
         |  SELECT query_id, vec_id FROM (
         |    SELECT p.query_id, v.vec_id,
         |           ROW_NUMBER() OVER (PARTITION BY p.query_id ORDER BY
         |             list_inner_product(p.qqv, v.qv) DESC, v.vec_id) AS rnk
         |    FROM probes p JOIN indexed v
         |      ON v.cluster = p.cluster AND v.vec_id != p.query_id) x
         |  WHERE rnk <= 10),
         |escored AS (
         |  SELECT qq.vec_id AS query_id, c.vec_id,
         |         list_inner_product(qq.qv, c.qv) AS dot
         |  FROM qn qq JOIN qn c ON c.vec_id != qq.vec_id
         |  WHERE qq.vec_id IN ($annIds)),
         |exact AS (
         |  SELECT query_id, vec_id FROM (
         |    SELECT query_id, vec_id,
         |           ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY dot DESC, vec_id) AS rnk
         |    FROM escored) x WHERE rnk <= 10)
         |SELECT e.query_id, COUNT(*) AS n_exact, COUNT(h.vec_id) AS n_hit,
         |       ROUND(COUNT(h.vec_id) * 1.0 / COUNT(*), 4) AS recall
         |FROM exact e LEFT JOIN hits h
         |  ON h.query_id = e.query_id AND h.vec_id = e.vec_id
         |GROUP BY e.query_id ORDER BY e.query_id""".stripMargin,

    "ann_knn_join_recall" ->
      s"""WITH RECURSIVE ${ExtQueries46.ivfReplayCtes("TRUE")},
         |${serveTail("vec_id % 17 = 3")},
         |hits AS (SELECT query_id, vec_id FROM ranked WHERE rnk <= $K),
         |escored AS (
         |  SELECT qq.vec_id AS query_id, c.vec_id,
         |         ROUND(list_inner_product(qq.qv, c.qv)
         |               / (sqrt(qq.n2) * sqrt(c.n2)), 4) AS cos
         |  FROM qn qq JOIN qn c ON c.vec_id != qq.vec_id
         |  WHERE qq.vec_id % 17 = 3),
         |exact AS (
         |  SELECT query_id, vec_id FROM (
         |    SELECT query_id, vec_id,
         |           ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS rnk
         |    FROM escored) x WHERE rnk <= $K)
         |SELECT e.query_id, COUNT(*) AS n_exact, COUNT(h.vec_id) AS n_hit,
         |       ROUND(COUNT(h.vec_id) * 1.0 / COUNT(*), 4) AS recall
         |FROM exact e LEFT JOIN hits h
         |  ON h.query_id = e.query_id AND h.vec_id = e.vec_id
         |GROUP BY e.query_id ORDER BY e.query_id""".stripMargin
  )
}
