package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{PqIndex, Similarity, Tables}

/**
 * Round 16: OPQ-LITE — the variance-balancing dimension permutation for
 * PQ ([[graft.operators.PqIndex.dispersionPermutation]]): contiguous
 * subspace slicing lets one subspace hoard the high-energy dimensions
 * (its 16 codewords then carry most of the quantization error);
 * ranking dimensions by exact integer dispersion and dealing them
 * round-robin into the M subspaces balances the energy — the
 * permutation special case of Optimized Product Quantization (Ge et
 * al., CVPR 2013), chosen over the full learned rotation precisely
 * because a permutation of integers stays EXACTLY DuckDB-replayable
 * (a float rotation would break the engine's bit-exact oracle
 * discipline; its recall upside rides the same serving shape).
 *
 *  - ann_pq_opq_codes: the permuted code table — permutation CTE
 *    (dispersion rank + round-robin slot), sub-k-means replay over the
 *    PERMUTED vectors (pqReplayBody's src parameter), codes for all.
 *  - ann_pq_opq_recall: recall@10 of ADC serving over the permuted
 *    codes vs the exact cosine scan (cosine is permutation-invariant,
 *    so the exact leg ranks original vectors) — the measured value of
 *    the permutation, oracled like every other recall surface.
 *
 * Honest posture: energy balancing provably shrinks the per-subspace
 * spread (Ext58Spec) but its RECALL effect is corpus-dependent —
 * splitting correlated dimensions that contiguous slicing happened to
 * co-locate can offset the balance win (the full OPQ rotation exists
 * precisely to optimize this trade; the permutation is its replayable
 * projection). The engine's contract is the measurement, not the win:
 * run ann_pq_opq_recall against the plain-PQ recall on YOUR corpus
 * before switching (gate corpus: 0.34 vs ~0.3 at sf0.01-scale blobs,
 * a wash at sf0.001).
 */
object ExtQueries58 {

  import ExtQueries47.{M, Ksub, Iters}

  private def embs(s: SparkSession, dir: String): DataFrame =
    Tables.table(s, dir, "embeddings")

  private val artCache = new java.util.concurrent.ConcurrentHashMap[String,
    (Array[Array[Array[Double]]], DataFrame, DataFrame)]()

  /** Permutation + permuted artifact, MEMOIZED per corpus fingerprint
    * (the standing-artifact discipline: the codes and recall queries —
    * and warm bench reps — share one fit; codes are eagerly
    * checkpointed so the memo never replays the sub-k-means). */
  private def opqArt(s: SparkSession, dir: String)
      : (Array[Array[Array[Double]]], DataFrame, DataFrame) = {
    val fp = graft.operators.DedupIndex.fingerprint(s, s"$dir/embeddings.parquet")
    artCache.computeIfAbsent(s"$dir|$fp", { _ =>
      val e = embs(s, dir)
      val perm = PqIndex.dispersionPermutation(e, M)
      val permuted = PqIndex.permuteEmbeddings(e, perm)
      // buildPq already eagerly checkpoints the code table
      val (books, codes) = PqIndex.buildPq(permuted, M, Ksub, Iters)
      (books, codes, permuted)
    })
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    "ann_pq_opq_codes" -> ((s, dir) => {
      val (_, codes, _) = opqArt(s, dir)
      PqIndex.codeTableFrom(codes, M).orderBy(col("vec_id"))
    }),

    "ann_pq_opq_recall" -> ((s, dir) => {
      val (books, codes, permuted) = opqArt(s, dir)
      val adc = PqIndex
        .adcTopKFrom(books, codes, permuted, ExtQueries.AnnQueries, 10)
      val exact = Similarity
        .bruteForceTopK(embs(s, dir), ExtQueries.AnnQueries, 10)
        .select(col("query_id"), col("vec_id")).withColumn("hit", lit(1))
      adc.select(col("query_id"), col("vec_id"))
        .join(exact, Seq("query_id", "vec_id"), "left_outer")
        .groupBy(col("query_id"))
        .agg(sum(coalesce(col("hit"), lit(0))).cast("long").as("n_hits"),
          round(sum(coalesce(col("hit"), lit(0))) / lit(10.0), 4).as("recall"))
        .orderBy(col("query_id"))
    })
  )

  /** Dispersion-ranked round-robin permutation + the permuted vector CTE
    * `qnp` — dispersion n·Σx²−(Σx)² on the e3 sub-grid (exact BIGINT;
    * DuckDB `//` and Spark DIV both truncate toward zero), rank ties to
    * the lower dimension, slot (r % M)·subDim + r // M. */
  private def opqCtes: String = {
    val subDim = 64 / M
    s"""${ExtQueries.quantSql},
       |pdisp AS (
       |  SELECT i, COUNT(*) * SUM(xk * xk) - SUM(xk) * SUM(xk) AS d
       |  FROM (SELECT vec_id, i, qv[i] // 1000 AS xk
       |        FROM qn, UNNEST(range(1, 65)) t(i)) z
       |  GROUP BY i),
       |pslot AS (
       |  SELECT i, ((r % $M) * $subDim + r // $M) AS dst0 FROM (
       |    SELECT i, CAST(ROW_NUMBER() OVER (ORDER BY d DESC, i) - 1 AS BIGINT) AS r
       |    FROM pdisp) zz),
       |qnp AS (
       |  SELECT vec_id, list(qv[p.i] ORDER BY p.dst0) AS qv, n2
       |  FROM qn, pslot p GROUP BY vec_id, n2)""".stripMargin
  }

  def oracleSql: Map[String, String] = {
    val codeCols = (0 until M).map(s =>
      s"CAST(MAX(CASE WHEN s = $s THEN code END) AS BIGINT) AS code_$s")
      .mkString(",\n       |       ")
    val qIn = ExtQueries.AnnQueries.mkString(", ")
    Map(
      "ann_pq_opq_codes" ->
        s"""WITH RECURSIVE $opqCtes,
           |${ExtQueries47.pqReplayBody("TRUE", "qnp")}
           |SELECT c.vec_id,
           |       $codeCols,
           |       MAX(r.recon2) AS recon2
           |FROM codes c JOIN recon r ON r.vec_id = c.vec_id
           |GROUP BY c.vec_id ORDER BY c.vec_id""".stripMargin,

      "ann_pq_opq_recall" ->
        s"""WITH RECURSIVE $opqCtes,
           |${ExtQueries47.pqReplayBody("TRUE", "qnp")},
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
           |SELECT a.query_id,
           |       CAST(SUM(CASE WHEN e.vec_id IS NOT NULL THEN 1 ELSE 0 END)
           |            AS BIGINT) AS n_hits,
           |       ROUND(SUM(CASE WHEN e.vec_id IS NOT NULL THEN 1 ELSE 0 END)
           |             / 10.0, 4) AS recall
           |FROM (SELECT query_id, vec_id FROM pqranked WHERE rnk <= 10) a
           |LEFT JOIN (SELECT query_id, vec_id FROM exranked WHERE rnk <= 10) e
           |  ON e.query_id = a.query_id AND e.vec_id = a.vec_id
           |GROUP BY a.query_id ORDER BY a.query_id""".stripMargin
    )
  }
}
