package graft

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{AnnIndex, Tables}

/**
 * Round 16, wave 5: STREAMING QUERY SERVING — the read-side twin of the
 * maintenance family. The `stream_*_refresh` drains keep a standing
 * index current under a WRITE stream; this wave serves a continuous
 * READ stream against it: retrieval requests (an external query
 * relation NOT in the corpus) arrive as files, every micro-batch is
 * served by the batched external kNN join against the ONE memoized
 * standing IVF index, and results append to a parquet sink. Because
 * serving is per-query independent and the index is frozen for the
 * drain, the appended union must equal the single batch kNN join over
 * the whole request relation — which is exactly what the DuckDB oracle
 * replays (full IVF k-means + probe-assign + probed-list scoring for
 * EVERY reversed corpus vector).
 *
 *  - stream_knn_serve: 3-chunk drain of the reversed-embedding request
 *    feed (norm-preserving permutation, so the replay reuses n2), k=5,
 *    nProbe=4, broadcast probes per micro-batch.
 *
 * 100 TB posture: each micro-batch's plan is the ann_knn_join_external
 * shape — the request batch (|B|·nProbe probe rows) broadcasts onto the
 * cluster-keyed standing lists, unprobed lists never move, results are
 * |B|·k rows appended blind (no read-modify-write on the sink). The
 * standing index builds ONCE (the AnnIndex memo); a real deployment
 * swaps it under the maintenance family's marker protocol. Request
 * throughput scales with executors because nothing in the serve path
 * holds state between batches.
 */
object ExtQueries54 {

  private val NProbe = 4
  private val K = 5

  private def embs(s: SparkSession, dir: String): DataFrame =
    Tables.table(s, dir, "embeddings")

  private val stageCache = new ConcurrentHashMap[String, String]()

  /** Stage the full reversed-embedding request relation as 3 parquet
    * chunk files in mod-time order (the stagedEmbChunks discipline —
    * one file per micro-batch under maxFilesPerTrigger=1). */
  private def stagedRequestChunks(s: SparkSession, dir: String): String = {
    val fp = graft.operators.DedupIndex.fingerprint(s, s"$dir/embeddings.parquet")
    stageCache.computeIfAbsent(s"$dir|$fp", { _ =>
      val digest = java.security.MessageDigest.getInstance("SHA-256")
        .digest(s"req|$dir|$fp".getBytes("UTF-8")).take(8).map(b => f"$b%02x").mkString
      val out = graft.operators.Sinks.dir("knn_req_chunks/" + digest)
      val reqs = embs(s, dir)
        .select(col("vec_id").as("query_id"),
          reverse(col("embedding")).as("embedding"))
        .persist()
      try {
        (0 until 3).foreach { c =>
          val tmp = s"$out/_tmp"
          reqs.where(pmod(col("query_id"), lit(3)) === c)
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
      } finally { reqs.unpersist(); () }
      out
    })
  }

  private val serveRuns = new java.util.concurrent.atomic.AtomicLong()

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    "stream_knn_serve" -> ((s, dir) => {
      import org.apache.spark.sql.streaming.Trigger
      val index = AnnIndex.ivf(s, dir, 16, 3) // the ONE standing index
      val staged = stagedRequestChunks(s, dir)
      val outDir = graft.operators.Sinks.dir(
        "knn_serve/run" + serveRuns.incrementAndGet())
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("query_id",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("embedding",
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.FloatType, containsNull = true),
          nullable = true)))
      val q = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(staged)
        .writeStream.trigger(Trigger.AvailableNow())
        .foreachBatch { (b: DataFrame, _: Long) =>
          AnnIndex.knnJoinExternal(index, b, K, NProbe)
            .write.mode("append").parquet(outDir)
          ()
        }
        .start()
      q.awaitTermination()
      s.read.parquet(outDir).orderBy(col("query_id"), col("rnk"))
    })
  )

  def oracleSql: Map[String, String] = Map(
    // the drained serve == ONE batch kNN join over the whole request
    // relation (serving is per-query independent; the index is frozen):
    // full IVF replay, probe-assign every reversed vector, probed-list
    // scoring, top-K — the ann_knn_join_external replay with rq = ALL
    "stream_knn_serve" ->
      s"""WITH RECURSIVE ${ExtQueries46.ivfReplayCtes("TRUE")},
         |rq AS (
         |  SELECT vec_id AS query_id, list_reverse(qv) AS qqv, n2 AS qn2
         |  FROM qn),
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
         |SELECT query_id, rnk, vec_id, cos FROM ranked WHERE rnk <= $K
         |ORDER BY query_id, rnk""".stripMargin
  )
}
