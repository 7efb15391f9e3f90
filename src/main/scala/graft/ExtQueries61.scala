package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Cooccurrence
import graft.streaming.CoocMaintenance

/**
 * Round 16, wave C (continued): the REFERENCE PIPELINE'S OWN standing
 * artifact — [[graft.streaming.CoocMaintenance]] keeps the co-occurrence
 * matrix durable across ingest batches (exact bilinear deltas, sum-merge
 * ShardLog folds) and serves the UNCHANGED batch LLR rescorer tail from
 * it.
 *
 *  - stream_cooc_refresh: interactions drain as one hash-split file per
 *    microbatch (a user's events deliberately SPAN batches, so the
 *    cross-term algebra is on the gate, with a live compaction inside
 *    the drain); the drained LLR top-k must hash-match `cooc_llr_topk`'s
 *    oracle — the full batch pipeline replay.
 *  - stream_cooc_delete: the right-to-erasure verb — one NEGATIVE delta
 *    removes a user slice's entire pair contribution (pairs never span
 *    users, so subtraction is exact); the serve matches the batch
 *    pipeline over the kept users, and the deleting batch lands ON the
 *    compaction cadence (zero rows dropped, shards swept).
 */
object ExtQueries61 {

  private val runs = new java.util.concurrent.atomic.AtomicLong()
  private val stageCache =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Interactions staged as 4 single-file parquet chunks with ascending
    * mod-times, split by an event-level hash so each user's events span
    * chunks (content-fingerprinted cache key, the stagedDocChunks
    * discipline). */
  private def stagedInterChunks(s: SparkSession, dir: String): String = {
    val fp = graft.operators.DedupIndex.fingerprint(s, s"$dir/events.parquet")
    stageCache.computeIfAbsent(s"$dir|$fp", { _ =>
      val digest = java.security.MessageDigest.getInstance("SHA-256")
        .digest(s"$dir|$fp".getBytes("UTF-8")).take(8).map(b => f"$b%02x").mkString
      val out = graft.operators.Sinks.dir("inter_chunks/" + digest)
      val inter = Cooccurrence.interactions(s, dir).persist()
      try {
        (0 until 4).foreach { c =>
          val tmp = s"$out/_tmp"
          inter.where(pmod(xxhash64(col("user"), col("item"), col("ts")),
              lit(4)) === c)
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
      } finally inter.unpersist()
      out
    })
  }

  private def drained(s: SparkSession, dir: String): CoocMaintenance = {
    import org.apache.spark.sql.streaming.Trigger
    val staged = stagedInterChunks(s, dir)
    val schema = Cooccurrence.interactions(s, dir).schema
    val root = graft.operators.Sinks.dir(
      "cooc_maint/run" + runs.incrementAndGet())
    val maint = new CoocMaintenance(s, root, compactEvery = 2)
    val q = s.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(staged)
      .writeStream.trigger(Trigger.AvailableNow())
      .foreachBatch { (b: DataFrame, id: Long) =>
        maint.processBatch(id, b)
        ()
      }
      .start()
    q.awaitTermination()
    maint
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    "stream_cooc_refresh" -> ((s, dir) => drained(s, dir).llrTopK(10)),

    "stream_cooc_delete" -> ((s, dir) => {
      val maint = drained(s, dir)
      // batch 4 lands on the compactEvery=2 cadence: the negative delta
      // zeroes the users' pairs and the covering compaction drops them
      maint.deleteBatch(4L, Cooccurrence.interactions(s, dir)
        .where(col("user") % 10 === 3).select("user").distinct())
      maint.llrTopK(10)
    })
  )

  /** The full batch-pipeline replay over interactions matching
    * `userPred` (SparkEntry.pairsSql parametrized by the user filter). */
  private def llrSql(userPred: String): String =
    s"""WITH inter AS (SELECT user_id AS usr,
       |  CAST(json_extract_string(props, 'k') AS INT) AS item, ts
       |  FROM events WHERE $userPred),
       |pu AS (SELECT usr, item, COUNT(*) AS n FROM inter GROUP BY usr, item),
       |pairs AS (
       |  SELECT a.item AS item, b.item AS other,
       |         CAST(SUM(CASE WHEN a.item = b.item THEN a.n * (a.n - 1) ELSE a.n * b.n END) AS BIGINT) AS cnt
       |  FROM pu a JOIN pu b ON a.usr = b.usr
       |  GROUP BY a.item, b.item
       |  HAVING SUM(CASE WHEN a.item = b.item THEN a.n * (a.n - 1) ELSE a.n * b.n END) > 0)
       |""".stripMargin + SparkEntry.llrRankTailSql

  def oracleSql: Map[String, String] = Map(
    // drained == the full batch pipeline (identical tail to cooc_llr_topk)
    "stream_cooc_refresh" -> llrSql("TRUE"),
    // ...and after the negative-delta erasure, the pipeline over KEPT users
    "stream_cooc_delete" -> llrSql("user_id % 10 != 3")
  )
}
