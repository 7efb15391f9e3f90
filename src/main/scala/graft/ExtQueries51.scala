package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{AnnIndex, PqIndex, Similarity, Tables}

/**
 * Round 16, wave 1: IVFADC + EXACT REFINE — the canonical two-stage
 * FAISS serving shape (r15 verdict, missing #1): ADC over the standing
 * cluster-partitioned table shortlists r·k candidates per query (8 B of
 * codes per touched row, probe set broadcast), then ONLY the shortlist's
 * raw vectors are fetched by id (broadcast-hash probe of the embeddings
 * scan — the candidate set is |queries|·shortlist rows, never a shuffle)
 * and exact-scored for the final top-k. This closes the measured PQ
 * recall gap: ADC alone sits at recall@10 ≈ 0.2 on the shared corpus
 * (Ext47Spec), the refined serve at the IVF-pruning ceiling (≥ 0.9 —
 * Ext51Spec floor). Semantically the successor of the reference's
 * rescore-on-a-compact-sketch pattern
 * (ItemRowRescorerTwoInputStreamOperator.java:158-228).
 *
 *  - ann_topk_ivfpq_refined: the two-stage serve, fully replayed in
 *    DuckDB (IVF + PQ replays stitched over one qn; ROUND(4) ADC
 *    shortlist ranking with vec_id tiebreak, ROUND(4) exact re-rank).
 *  - ann_ivfpq_refined_recall: recall@10 of the refined serve vs the
 *    exact scan — the number that justifies the refine stage next to
 *    `ann_pq_recall`'s ≈0.2; both rankings replayed.
 *
 * Wave 2 — IN-STREAM REFIT drains (r15 verdict #3), one per maintenance
 * member: `stream_ivfpq_refit`, `stream_sq_refit`,
 * `stream_ann_index_refit`. Each drain bootstraps (gen 0), folds an
 * O(batch) shard through a live compaction, then REFITS at the last
 * batch — retrain on the corpus-so-far, publish generation 1, commit
 * the re-encode as a generation-stamped snapshot — so the drained table
 * equals the FULL-corpus rebuild replay (fit predicate TRUE), vs the
 * `stream_*_refresh` drains' frozen-batch-0 replays.
 *
 * Parameters (measured on the shared corpus): nProbe 6 (vs the plain
 * IVFADC serve's 4 — the IVF ceiling is 0.88@4 but 0.98@6) and
 * shortlist 10·k. The shortlist is the binding knob, not the probe
 * count: ADC ordering is noisy (that IS the recall gap), so the true
 * neighbors sit deep in the candidate ranking and probing MORE lists
 * with a fixed shortlist actually dilutes it (measured: nProbe 6/8/12 at
 * shortlist 50 → 0.84/0.76/0.72; at shortlist 100 → 0.96/0.94/0.94).
 * The FAISS analogue is IndexRefine's k_factor — r·k shortlist, refine,
 * keep k.
 */
object ExtQueries51 {

  private val NLists = 16
  private val IvfIters = 3
  private[graft] val NProbe = 6
  private[graft] val Shortlist = 100
  import ExtQueries47.{M, Ksub, Iters}

  private def embs(s: SparkSession, dir: String): DataFrame =
    Tables.table(s, dir, "embeddings")

  private def refined(s: SparkSession, dir: String): DataFrame = {
    val art = AnnIndex.ivfpq(s, dir, NLists, IvfIters, M, Ksub, Iters)
    PqIndex.ivfadcRefinedTopK(art.centroids, art.books, art.table,
      embs(s, dir), ExtQueries.AnnQueries, 10, NProbe, Shortlist)
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    "ann_topk_ivfpq_refined" -> ((s, dir) =>
      refined(s, dir).orderBy(col("query_id"), col("rnk"))),

    "ann_ivfpq_refined_recall" -> ((s, dir) => {
      val exact = Similarity.bruteForceTopK(embs(s, dir), ExtQueries.AnnQueries, 10)
        .select(col("query_id"), col("vec_id")).withColumn("hit", lit(1))
      refined(s, dir).select(col("query_id"), col("vec_id"))
        .join(exact, Seq("query_id", "vec_id"), "left_outer")
        .groupBy(col("query_id"))
        .agg(sum(coalesce(col("hit"), lit(0))).cast("long").as("n_hits"),
          round(sum(coalesce(col("hit"), lit(0))) / lit(10.0), 4).as("recall"))
        .orderBy(col("query_id"))
    }),

    // IN-STREAM REFIT (r15 verdict #3): the crash-safe IVFADC
    // maintenance drain with a REFIT POINT at the last batch — batch 0
    // bootstraps both models (gen 0), batch 1 is an O(batch) stitch
    // shard and triggers a live compaction (compactEvery=2), batch 2
    // retrains both models on the corpus-so-far (= the whole staged
    // source at that point), publishes them as generation 1 and commits
    // the re-encoded corpus as the batch's snapshot
    // ([[graft.streaming.IvfPqMaintenance.refitBatch]]). The drained
    // table must therefore equal the FULL-CORPUS rebuild — fit on ALL
    // vectors, encode ALL — which is exactly the stitched replay at fit
    // predicate TRUE (vs stream_ivfpq_refresh's frozen-batch-0 replay).
    "stream_ivfpq_refit" -> ((s, dir) => {
      import org.apache.spark.sql.streaming.Trigger
      val staged = ExtQueries46.stagedEmbChunks(s, dir)
      val schema = embs(s, dir).schema
      val root = graft.operators.Sinks.dir(
        "ivfpq_refit/run" + ivfpqRefitRuns.incrementAndGet())
      val maint = new graft.streaming.IvfPqMaintenance(s, root,
        NLists, IvfIters, M, Ksub, Iters, compactEvery = 2)
      val q = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(staged)
        .writeStream.trigger(Trigger.AvailableNow())
        .foreachBatch { (b: DataFrame, id: Long) =>
          // the refit trigger is a function of the batch id (the
          // foreachBatch replay contract); the retrain corpus is the
          // stream's SOURCE as of this batch — all three staged chunks
          if (id == 2L) maint.refitBatch(id, s.read.schema(schema).parquet(staged))
          else maint.processBatch(id, b)
          ()
        }
        .start()
      q.awaitTermination()
      maint.currentTable()
        .select(col("vec_id") +: col("cluster").cast("long").as("cluster") +:
          (0 until M).map(i => col(s"code_$i").cast("long").as(s"code_$i")) :+
          col("recon2"): _*)
        .orderBy(col("vec_id"))
    }),

    // The same in-stream refit verb on the raw-vector IVF member (the
    // family is symmetric: every maintenance stream can now retrain in
    // place). Drained index == full-corpus rebuild (fit ALL, assign
    // ALL) — the recursive IVF replay at fit predicate TRUE.
    "stream_ann_index_refit" -> ((s, dir) => {
      import org.apache.spark.sql.streaming.Trigger
      val staged = ExtQueries46.stagedEmbChunks(s, dir)
      val schema = embs(s, dir).schema
      val root = graft.operators.Sinks.dir(
        "ann_refit/run" + annRefitRuns.incrementAndGet())
      val maint = new graft.streaming.AnnMaintenance(s, root, NLists,
        IvfIters, compactEvery = 2)
      val q = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(staged)
        .writeStream.trigger(Trigger.AvailableNow())
        .foreachBatch { (b: DataFrame, id: Long) =>
          if (id == 2L) maint.refitBatch(id, s.read.schema(schema).parquet(staged))
          else maint.processBatch(id, b)
          ()
        }
        .start()
      q.awaitTermination()
      maint.currentIndex()
        .select(col("vec_id"), col("cluster").cast("long").as("cluster"))
        .orderBy(col("vec_id"))
    }),

    // The same in-stream refit verb on the cheapest family member:
    // SQ8's retrain is ONE aggregate scan, so the refit batch costs
    // little more than a compaction. Drained table == full-corpus
    // rebuild (stats fit on ALL, encode ALL) — the non-recursive SQ
    // replay at fit predicate TRUE.
    "stream_sq_refit" -> ((s, dir) => {
      import org.apache.spark.sql.streaming.Trigger
      val staged = ExtQueries46.stagedEmbChunks(s, dir)
      val schema = embs(s, dir).schema
      val root = graft.operators.Sinks.dir(
        "sq_refit/run" + sqRefitRuns.incrementAndGet())
      val maint = new graft.streaming.SqMaintenance(s, root, dims = 64,
        compactEvery = 2)
      val q = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(staged)
        .writeStream.trigger(Trigger.AvailableNow())
        .foreachBatch { (b: DataFrame, id: Long) =>
          if (id == 2L) maint.refitBatch(id, s.read.schema(schema).parquet(staged))
          else maint.processBatch(id, b)
          ()
        }
        .start()
      q.awaitTermination()
      graft.operators.SqIndex.codeTableFrom(maint.currentCodes())
        .orderBy(col("vec_id"), col("i"))
    })
  )

  private val ivfpqRefitRuns = new java.util.concurrent.atomic.AtomicLong()
  private val sqRefitRuns = new java.util.concurrent.atomic.AtomicLong()
  private val annRefitRuns = new java.util.concurrent.atomic.AtomicLong()

  /** The two-stage replay: the stitched IVF+PQ CTEs, an ADC shortlist of
    * `Shortlist` per query at `NProbe`, then the exact re-rank. Emits
    * CTEs up to `refranked` (query_id, vec_id, cos, rnk). */
  private def refinedCtes: String = {
    val qIn = ExtQueries.AnnQueries.mkString(", ")
    s"""${ExtQueries.quantSql},
       |${ExtQueries46.ivfReplayBody("TRUE")},
       |${ExtQueries47.pqCtesBody},
       |probes AS (
       |  SELECT vec_id AS query_id, c AS cluster FROM (
       |    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, c) AS rn
       |    FROM fdists WHERE vec_id IN ($qIn)) x
       |  WHERE rn <= $NProbe),
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
       |adcscored AS (
       |  SELECT a.query_id, a.vec_id,
       |         ROUND(a.dot / (sqrt(qq.qn2) * sqrt(r.recon2)), 4) AS score
       |  FROM adc a
       |  JOIN qnorm qq ON qq.query_id = a.query_id
       |  JOIN recon r ON r.vec_id = a.vec_id),
       |short AS (
       |  SELECT query_id, vec_id FROM (
       |    SELECT query_id, vec_id,
       |           ROW_NUMBER() OVER (PARTITION BY query_id
       |               ORDER BY score DESC, vec_id) AS srnk
       |    FROM adcscored) x WHERE srnk <= $Shortlist),
       |rescored AS (
       |  SELECT sh.query_id, sh.vec_id,
       |         ROUND(list_inner_product(q.qv, c.qv)
       |               / (sqrt(q.n2) * sqrt(c.n2)), 4) AS cos
       |  FROM short sh
       |  JOIN qn c ON c.vec_id = sh.vec_id
       |  JOIN qn q ON q.vec_id = sh.query_id),
       |refranked AS (
       |  SELECT query_id, vec_id, cos,
       |         ROW_NUMBER() OVER (PARTITION BY query_id
       |             ORDER BY cos DESC, vec_id) AS rnk
       |  FROM rescored)""".stripMargin
  }

  def oracleSql: Map[String, String] = {
    val qIn = ExtQueries.AnnQueries.mkString(", ")
    val codeCols = (0 until M).map(s =>
      s"CAST(MAX(CASE WHEN s = $s THEN code END) AS BIGINT) AS code_$s")
      .mkString(",\n       |       ")
    Map(
      // refit drain == full rebuild: both fits on the whole corpus
      "stream_ivfpq_refit" ->
        s"""WITH RECURSIVE ${ExtQueries.quantSql},
           |${ExtQueries46.ivfReplayBody("TRUE")},
           |${ExtQueries47.pqReplayBody("TRUE")}
           |SELECT i.vec_id, CAST(i.cluster AS BIGINT) AS cluster,
           |       $codeCols,
           |       MAX(r.recon2) AS recon2
           |FROM indexed i
           |JOIN codes c ON c.vec_id = i.vec_id
           |JOIN recon r ON r.vec_id = i.vec_id
           |GROUP BY i.vec_id, i.cluster ORDER BY i.vec_id""".stripMargin,

      // IVF refit drain == full rebuild: k-means fit on the whole corpus
      "stream_ann_index_refit" ->
        s"""WITH RECURSIVE ${ExtQueries46.ivfReplayCtes("TRUE")}
           |SELECT vec_id, CAST(cluster AS BIGINT) AS cluster FROM indexed
           |ORDER BY vec_id""".stripMargin,

      // SQ refit drain == full rebuild: stats fit on the whole corpus
      "stream_sq_refit" ->
        s"""WITH ${ExtQueries.quantSql},
           |${ExtQueries49.sqReplayBody("TRUE")}
           |SELECT c.vec_id, c.i, CAST(c.code AS BIGINT) AS code, r.recon2
           |FROM sqc c JOIN rv r ON r.vec_id = c.vec_id
           |ORDER BY c.vec_id, c.i""".stripMargin,

      "ann_topk_ivfpq_refined" ->
        s"""WITH RECURSIVE $refinedCtes
           |SELECT query_id, rnk, vec_id, cos FROM refranked WHERE rnk <= 10
           |ORDER BY query_id, rnk""".stripMargin,

      "ann_ivfpq_refined_recall" ->
        s"""WITH RECURSIVE $refinedCtes,
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
           |FROM (SELECT query_id, vec_id FROM refranked WHERE rnk <= 10) a
           |LEFT JOIN (SELECT query_id, vec_id FROM exranked WHERE rnk <= 10) e
           |  ON e.query_id = a.query_id AND e.vec_id = a.vec_id
           |GROUP BY a.query_id ORDER BY a.query_id""".stripMargin
    )
  }
}
