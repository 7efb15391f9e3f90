package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{AnnIndex, SqIndex, Tables}

/**
 * Round 15, wave 3: the IVF x SQ COMPOSE — the remaining cell of the ANN
 * compose matrix (IVFADC = lists x PQ codes landed in r14; this is
 * FAISS's IVF-SQ8: lists prune, BYTE-resolution codes score). The
 * trade-off it exists for: IVFADC reads 8 B/candidate at recall ~0.4,
 * IVF-SQ reads 64 B/candidate at near-exact recall — the middle rung of
 * the serving-cost ladder (exact 512 B / SQ 64 B / PQ 8 B per row), all
 * three now standing single-table artifacts with the same lifecycle.
 *
 *  - ann_topk_ivfsq: top-10 served from the single standing
 *    `(vec_id, cluster, codes, recon2)` table — broadcast probes prune
 *    lists, reconstruction from codes + broadcast-literal stats scores.
 *  - ann_topk_ivfsq_refreshed: the ingest-refresh verb — base-fit
 *    models frozen, the ingest shard assigned + encoded in one O(batch)
 *    stitch, appended, served.
 *
 * Oracles stitch the IVF recursive replay (ExtQueries46) and the
 * non-recursive SQ replay (ExtQueries49) over one quantized CTE, fit
 * predicate parametrized per query — the same composition discipline as
 * the IVFADC oracles.
 */
object ExtQueries50 {

  private val NLists = 16
  private val IvfIters = 3
  private val NProbe = 4

  private def isIngest = col("vec_id") % 5 === 4 // 20% ingest shard

  private def embs(s: SparkSession, dir: String): DataFrame =
    Tables.table(s, dir, "embeddings")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    "ann_topk_ivfsq" -> ((s, dir) => {
      val art = AnnIndex.ivfsq(s, dir, NLists, IvfIters)
      SqIndex.ivfsqTopKFromTable(art.centroids, art.stats, art.table,
          embs(s, dir), ExtQueries.AnnQueries, 10, NProbe)
        .orderBy(col("query_id"), col("rnk"))
    }),

    "ann_topk_ivfsq_refreshed" -> ((s, dir) => {
      val art = AnnIndex.ivfsqFiltered(s, dir, NLists, IvfIters,
        "notmod5", !isIngest)
      val grown = AnnIndex.refreshedIvfSqTable(art, embs(s, dir).where(isIngest))
      SqIndex.ivfsqTopKFromTable(art.centroids, art.stats, grown,
          embs(s, dir), ExtQueries.AnnQueries, 10, NProbe)
        .orderBy(col("query_id"), col("rnk"))
    }),

    // CRASH-SAFE streaming SQ8 maintenance
    // ([[graft.streaming.SqMaintenance]]): batch 0 derives + atomically
    // publishes the per-dimension stats, every later batch is one
    // O(batch) encode shard; same ShardLog durability (rolled-up
    // markers, live compaction inside the oracled drain). Drained table
    // must equal the frozen-stats batch rebuild (stats on chunk 0,
    // encode all — ingest values outside the frozen range saturate).
    "stream_sq_refresh" -> ((s, dir) => {
      import org.apache.spark.sql.streaming.Trigger
      val staged = ExtQueries46.stagedEmbChunks(s, dir)
      val schema = embs(s, dir).schema
      val root = graft.operators.Sinks.dir(
        "sq_maint/run" + sqMaintRuns.incrementAndGet())
      val maint = new graft.streaming.SqMaintenance(s, root, dims = 64,
        compactEvery = 2)
      val q = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(staged)
        .writeStream.trigger(Trigger.AvailableNow())
        .foreachBatch { (b: DataFrame, id: Long) =>
          maint.processBatch(id, b)
          ()
        }
        .start()
      q.awaitTermination()
      SqIndex.codeTableFrom(maint.currentCodes())
        .orderBy(col("vec_id"), col("i"))
    }),

    // CROSS-FAMILY: near-dup candidate generation FROM THE STANDING IVF
    // INDEX — the coarse quantizer as the blocking key (the classic
    // cluster-then-pair pipeline move): pairs form only within an IVF
    // cell (r16: HOT CELLS sub-split at CellCap by a portable hash —
    // [[graft.operators.Dedup.embeddingNearDupsIvfCells]], closing the
    // r15 skew finding: one duplicate-heavy cluster no longer goes
    // quadratic), exact cosine verifies. Reuses the memoized index the
    // ANN serves run on — at 100 TB the blocking artifact is already
    // built and cluster-partitioned, so the pair join co-locates by
    // cluster instead of needing a fresh LSH pass. CellCap is 24 so the
    // cap BINDS at the gate corpus (500 vectors / 16 lists ≈ 31 per
    // cell) and the capped semantics — including the sub-split hash —
    // sit on the oracle every round; a production corpus would run the
    // same operator at cellCap in the thousands (the knob scales the
    // per-block candidate budget, not the algorithm).
    "dedup_embedding_ivf" -> ((s, dir) => {
      val idx = AnnIndex.ivf(s, dir, NLists, IvfIters)
      graft.operators.Dedup.embeddingNearDupsIvfCells(idx.assigned, 0.30, CellCap)
        .orderBy(col("vec_a"), col("vec_b"))
    })
  )

  private[graft] val CellCap = 24

  /** The IVF-SQ serve tail over stitched `indexed` (IVF replay) and `rv`
    * (SQ replay): probes from fdists, candidates from the probed lists,
    * scores from the SQ reconstruction. */
  private def ivfsqTopkSql(fitPred: String): String = {
    val qIn = ExtQueries.AnnQueries.mkString(", ")
    s"""WITH RECURSIVE ${ExtQueries.quantSql},
       |${ExtQueries46.ivfReplayBody(fitPred)},
       |${ExtQueries49.sqReplayBody(fitPred)},
       |probes AS (
       |  SELECT vec_id AS query_id, qv AS qqv, n2 AS qn2, c AS cluster FROM (
       |    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, c) AS rn
       |    FROM fdists WHERE vec_id IN ($qIn)) x
       |  WHERE rn <= $NProbe),
       |scored AS (
       |  SELECT p.query_id, v.vec_id,
       |         ROUND(list_inner_product(p.qqv, r.rv)
       |               / (sqrt(p.qn2) * sqrt(r.recon2)), 4) AS score
       |  FROM probes p
       |  JOIN indexed v ON v.cluster = p.cluster AND v.vec_id != p.query_id
       |  JOIN rv r ON r.vec_id = v.vec_id),
       |ranked AS (
       |  SELECT query_id, vec_id, score,
       |         ROW_NUMBER() OVER (PARTITION BY query_id
       |             ORDER BY score DESC, vec_id) AS rnk
       |  FROM scored)
       |SELECT query_id, rnk, vec_id, score FROM ranked WHERE rnk <= 10
       |ORDER BY query_id, rnk""".stripMargin
  }

  private val sqMaintRuns = new java.util.concurrent.atomic.AtomicLong()

  def oracleSql: Map[String, String] = Map(
    "ann_topk_ivfsq" -> ivfsqTopkSql("TRUE"),
    "ann_topk_ivfsq_refreshed" -> ivfsqTopkSql("vec_id % 5 != 4"),

    // streamed drain == frozen-stats rebuild with the fit on batch 0
    // (chunk c = vec_id % 3 == c)
    "stream_sq_refresh" ->
      s"""WITH ${ExtQueries.quantSql},
         |${ExtQueries49.sqReplayBody("vec_id % 3 = 0")}
         |SELECT c.vec_id, c.i, CAST(c.code AS BIGINT) AS code, r.recon2
         |FROM sqc c JOIN rv r ON r.vec_id = c.vec_id
         |ORDER BY c.vec_id, c.i""".stripMargin,

    // candidates within an IVF cell — hot cells sub-split at CellCap by
    // the portable vec_id hash (the capped blocking replayed exactly) —
    // exact-cosine verified; threshold on the unrounded ratio, ROUND(4)
    // in the output (the dedup_embedding discipline)
    "dedup_embedding_ivf" ->
      s"""WITH RECURSIVE $ivfCellPairsCtes
         |SELECT vec_a, vec_b, ROUND(cosr, 4) AS cos FROM pairs
         |WHERE cosr >= 0.30 ORDER BY vec_a, vec_b""".stripMargin
  )

  /** The capped IVF-cell blocking replay up to `pairs` (vec_a, vec_b,
    * unrounded cosr) — shared by dedup_embedding_ivf and the SemDeDup
    * compose (ExtQueries57). Needs WITH RECURSIVE (the km fit). */
  private[graft] def ivfCellPairsCtes: String =
    s"""${ExtQueries.quantSql},
       |${ExtQueries46.ivfReplayBody("TRUE")},
       |cellsz AS (
       |  SELECT cluster, COUNT(*) AS n_cell FROM indexed GROUP BY cluster),
       |blocks AS (
       |  SELECT i.vec_id, i.qv, i.n2, i.cluster,
       |         ${graft.operators.PortableHash.hSql("CAST(i.vec_id AS VARCHAR)")}
       |           % CAST(CEIL(c.n_cell / $CellCap.0) AS BIGINT) AS sub
       |  FROM indexed i JOIN cellsz c ON c.cluster = i.cluster),
       |pairs AS (
       |  SELECT x.vec_id AS vec_a, y.vec_id AS vec_b,
       |         list_inner_product(x.qv, y.qv) / (sqrt(x.n2) * sqrt(y.n2)) AS cosr
       |  FROM blocks x JOIN blocks y
       |    ON x.cluster = y.cluster AND x.sub = y.sub AND x.vec_id < y.vec_id)""".stripMargin
}
