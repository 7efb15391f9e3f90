package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{AnnIndex, PqIndex, Similarity, Tables}

/**
 * Round 15: PQ/IVFADC lifecycle symmetry — the IVF index got its full
 * standing-artifact lifecycle in r14 (build / serve / O(batch) ingest
 * refresh / drift recall / refit-and-swap, ExtQueries46); this wave gives
 * the PRODUCT-QUANTIZATION family the same five verbs, so every member of
 * the ANN toolbox (exact scan, IVF lists, PQ codes, IVFADC compose) is
 * maintainable at 100 TB without a corpus-sized rebuild on ingest:
 *
 *  - ann_pq_refresh: 80/20 base/ingest split; codebooks are FIT ON THE
 *    BASE SNAPSHOT and frozen; the ingest shard is encoded against the
 *    frozen books (O(batch), one projection pass —
 *    [[graft.operators.PqIndex.encodeBatch]], the PQ twin of
 *    `IvfIndex.assignBatch`) and unioned with the standing code table.
 *    Oracle: PQ replay with the sub-k-means trained on the base shard
 *    only, codes over ALL vectors.
 *  - ann_topk_pq_refreshed: ADC top-10 SERVED from the refreshed code
 *    table (query 4 lives in the ingest shard — served-from-ingest rows
 *    are on the gate).
 *  - ann_pq_recall_drift: recall@10 of the AGED PQ artifact (base-fit
 *    books, grown corpus) vs the exact scan — the PQ drift signal that
 *    triggers ann_pq_refit; both rankings replayed.
 *  - ann_pq_refit: refit-and-swap — retrain the codebooks on the full
 *    grown corpus under the standard [[AnnIndex.pq]] key, drop + release
 *    the aged filtered entry (AnnIndexSpec proves the release), serve the
 *    refit code table. Oracle: full-corpus PQ replay.
 *  - ann_topk_ivfpq_refreshed: the refreshed SINGLE IVFADC table — the
 *    ingest batch is assigned (frozen centroids) AND encoded (frozen
 *    books) in one O(batch) stitch and appended to the standing
 *    cluster-partitioned table; serving is the same broadcast-probe read
 *    as ann_topk_ivfpq. Oracle: the IVF and PQ base-fit replays stitched
 *    over one `qn`.
 *
 * Scale posture: the refresh path never rescans or reshuffles the
 * standing artifact — the base table is memoized/durable
 * ([[AnnIndex.pqFiltered]]/[[AnnIndex.ivfpqFiltered]]), the batch side is
 * one projection (+ one batch-sized stitch join for IVFADC), and the
 * union is metadata-only. Refit remains a periodic maintenance operation
 * (the standard PQ deployment posture: codebooks drift slowly; OPQ/PQ
 * papers retrain on snapshots, not per ingest).
 */
object ExtQueries48 {

  private val NLists = 16
  private val IvfIters = 3
  private val NProbe = 4
  import ExtQueries47.{M, Ksub, Iters}

  private def isIngest = col("vec_id") % 5 === 4 // 20% ingest shard

  private def embs(s: SparkSession, dir: String): DataFrame =
    Tables.table(s, dir, "embeddings")

  /** The standing base-snapshot PQ artifact (memoized once per corpus
    * fingerprint — later queries and bench reps serve WARM). */
  private def basePq(s: SparkSession, dir: String): AnnIndex.Pq =
    AnnIndex.pqFiltered(s, dir, M, Ksub, Iters, "notmod5", !isIngest)

  /** Standing code table grown by the ingest shard: O(batch) encode
    * against frozen books, union with the standing codes. */
  private def refreshedCodes(s: SparkSession, dir: String): (AnnIndex.Pq, DataFrame) = {
    val art = basePq(s, dir)
    (art, AnnIndex.refreshedCodes(art, embs(s, dir).where(isIngest)))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    "ann_pq_refresh" -> ((s, dir) => {
      val (_, codes) = refreshedCodes(s, dir)
      PqIndex.codeTableFrom(codes, M).orderBy(col("vec_id"))
    }),

    "ann_topk_pq_refreshed" -> ((s, dir) => {
      val (art, codes) = refreshedCodes(s, dir)
      PqIndex.adcTopKFrom(art.books, codes, embs(s, dir), ExtQueries.AnnQueries, 10)
        .orderBy(col("query_id"), col("rnk"))
    }),

    // PQ DRIFT RECALL: how well do the AGED codebooks (fit on the 80%
    // base, corpus grown to 100%) still rank exact top-10? The quantizer
    // degrades as the data distribution drifts away from the training
    // snapshot — this is the number a deployment alerts on to trigger
    // ann_pq_refit.
    "ann_pq_recall_drift" -> ((s, dir) => {
      val (art, codes) = refreshedCodes(s, dir)
      val aged = PqIndex.adcTopKFrom(art.books, codes, embs(s, dir),
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

    // PQ REFIT-AND-SWAP: retrain on the grown corpus under the standard
    // key (shared with ann_pq_codes — refit and rebuild ARE the same
    // artifact), swap out the aged entry, serve the refit code table.
    "ann_pq_refit" -> ((s, dir) => {
      AnnIndex.pqFiltered(s, dir, M, Ksub, Iters, "agedpqr15", !isIngest)
      val refit = AnnIndex.refitPqTo(s, dir, M, Ksub, Iters, "agedpqr15", !isIngest)
      PqIndex.codeTableFrom(refit.codes, M).orderBy(col("vec_id"))
    }),

    // IVFADC ingest refresh: one O(batch) assign+encode stitch appended
    // to the standing single table; serving prunes lists exactly like
    // ann_topk_ivfpq (broadcast probes, codes-only scan).
    "ann_topk_ivfpq_refreshed" -> ((s, dir) => {
      val art = AnnIndex.ivfpqFiltered(s, dir, NLists, IvfIters, M, Ksub,
        Iters, "notmod5", !isIngest)
      val grown = AnnIndex.refreshedIvfPqTable(art, embs(s, dir).where(isIngest))
      PqIndex.ivfadcTopKFromTable(art.centroids, art.books, grown,
          embs(s, dir), ExtQueries.AnnQueries, 10, NProbe)
        .orderBy(col("query_id"), col("rnk"))
    }),

    // CRASH-SAFE streaming IVFADC maintenance
    // ([[graft.streaming.IvfPqMaintenance]]): batch 0 bootstraps BOTH
    // models (IVF fit + M sub-k-means, one atomic models/ publish), every
    // later batch is one O(batch) assign+encode stitch shard; markers
    // roll up and compactEvery=2 puts a live compaction point inside the
    // oracled drain (the stream_ann_index_refresh discipline). Drained
    // table must equal the frozen-models batch rebuild (fit on chunk 0,
    // assign+encode all).
    "stream_ivfpq_refresh" -> ((s, dir) => {
      import org.apache.spark.sql.streaming.Trigger
      val staged = ExtQueries46.stagedEmbChunks(s, dir)
      val schema = embs(s, dir).schema
      val root = graft.operators.Sinks.dir(
        "ivfpq_maint/run" + ivfpqMaintRuns.incrementAndGet())
      val maint = new graft.streaming.IvfPqMaintenance(s, root, NLists,
        IvfIters, M, Ksub, Iters, compactEvery = 2)
      val q = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(staged)
        .writeStream.trigger(Trigger.AvailableNow())
        .foreachBatch { (b: DataFrame, id: Long) =>
          maint.processBatch(id, b)
          ()
        }
        .start()
      q.awaitTermination()
      maint.currentTable()
        .select(col("vec_id") +: col("cluster").cast("long").as("cluster") +:
          (0 until M).map(i => col(s"code_$i").cast("long").as(s"code_$i")) :+
          col("recon2"): _*)
        .orderBy(col("vec_id"))
    })
  )

  private val ivfpqMaintRuns = new java.util.concurrent.atomic.AtomicLong()

  def oracleSql: Map[String, String] = {
    val base = "vec_id % 5 != 4"
    val codeCols = (0 until M).map(s =>
      s"CAST(MAX(CASE WHEN s = $s THEN code END) AS BIGINT) AS code_$s")
      .mkString(",\n       |       ")
    val qIn = ExtQueries.AnnQueries.mkString(", ")
    // the ADC probe/score/rank tail over a (possibly base-fit) PQ replay
    def adcTail(scoredName: String): String =
      s"""qsub AS (SELECT vec_id AS query_id, s, sq FROM pqsub
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
         |$scoredName AS (
         |  SELECT a.query_id, a.vec_id,
         |         ROUND(a.dot / (sqrt(qq.qn2) * sqrt(r.recon2)), 4) AS score
         |  FROM adc a
         |  JOIN qnorm qq ON qq.query_id = a.query_id
         |  JOIN recon r ON r.vec_id = a.vec_id)""".stripMargin

    Map(
      // frozen-codebook refresh == full re-encode with base-fit books
      "ann_pq_refresh" ->
        s"""WITH RECURSIVE ${ExtQueries.quantSql},
           |${ExtQueries47.pqReplayBody(base)}
           |SELECT c.vec_id,
           |       $codeCols,
           |       MAX(r.recon2) AS recon2
           |FROM codes c JOIN recon r ON r.vec_id = c.vec_id
           |GROUP BY c.vec_id ORDER BY c.vec_id""".stripMargin,

      "ann_topk_pq_refreshed" ->
        s"""WITH RECURSIVE ${ExtQueries.quantSql},
           |${ExtQueries47.pqReplayBody(base)},
           |${adcTail("scored")},
           |ranked AS (
           |  SELECT query_id, vec_id, score,
           |         ROW_NUMBER() OVER (PARTITION BY query_id
           |             ORDER BY score DESC, vec_id) AS rnk
           |  FROM scored)
           |SELECT query_id, rnk, vec_id, score FROM ranked WHERE rnk <= 10
           |ORDER BY query_id, rnk""".stripMargin,

      "ann_pq_recall_drift" ->
        s"""WITH RECURSIVE ${ExtQueries.quantSql},
           |${ExtQueries47.pqReplayBody(base)},
           |${adcTail("pqscored")},
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
           |GROUP BY a.query_id ORDER BY a.query_id""".stripMargin,

      // refit == a full rebuild fit on the whole grown corpus
      "ann_pq_refit" ->
        s"""WITH RECURSIVE ${ExtQueries.quantSql},
           |${ExtQueries47.pqReplayBody("TRUE")}
           |SELECT c.vec_id,
           |       $codeCols,
           |       MAX(r.recon2) AS recon2
           |FROM codes c JOIN recon r ON r.vec_id = c.vec_id
           |GROUP BY c.vec_id ORDER BY c.vec_id""".stripMargin,

      // streamed drain == frozen-models rebuild with BOTH fits on batch 0
      // (chunk c = vec_id % 3 == c): assignment from the IVF replay,
      // codes from the PQ replay, stitched over one qn
      "stream_ivfpq_refresh" ->
        s"""WITH RECURSIVE ${ExtQueries.quantSql},
           |${ExtQueries46.ivfReplayBody("vec_id % 3 = 0")},
           |${ExtQueries47.pqReplayBody("vec_id % 3 = 0")}
           |SELECT i.vec_id, CAST(i.cluster AS BIGINT) AS cluster,
           |       $codeCols,
           |       MAX(r.recon2) AS recon2
           |FROM indexed i
           |JOIN codes c ON c.vec_id = i.vec_id
           |JOIN recon r ON r.vec_id = i.vec_id
           |GROUP BY i.vec_id, i.cluster ORDER BY i.vec_id""".stripMargin,

      // both base-fit replays share one qn (CTE names disjoint by
      // construction); the IVFADC tail is ann_topk_ivfpq's
      "ann_topk_ivfpq_refreshed" ->
        s"""WITH RECURSIVE ${ExtQueries.quantSql},
           |${ExtQueries46.ivfReplayBody(base)},
           |${ExtQueries47.pqReplayBody(base)},
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
           |ORDER BY query_id, rnk""".stripMargin
    )
  }
}
