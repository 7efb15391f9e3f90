package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Tables}

/**
 * Round-10 wave: incremental maintenance of the persisted dedup cluster
 * index — the missing half of the build-once/scan-many pattern
 * ([[graft.operators.DedupIndex]]). At 100 TB the index is built once
 * per corpus snapshot; every ingest batch afterwards must MERGE into it
 * without re-pairing the standing corpus against itself.
 *
 *  - dedup_index_refresh: an 80/20 base/incoming split of `documents`;
 *    the standing index is built on the base shard only, then
 *    [[Dedup.simhashComponentsRefresh]] merges the incoming shard —
 *    incoming x corpus banded candidates, CC over the TOUCHED contracted
 *    subgraph, label remap for merged components. The oracle is the FULL
 *    REBUILD's recursive-CC SQL over all documents: the incremental path
 *    must land on byte-identical cluster assignments.
 *  - dedup_minhash_refresh: the MinHash (unigram-Jaccard) twin through
 *    [[Dedup.minhashComponentsRefresh]], against its own full-rebuild
 *    oracle.
 */
object ExtQueries43 {

  private def isIncoming = col("doc_id") % 5 === 4 // 20% ingest shard

  private val stageCache = new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** documents staged as 3 single-file parquet chunks with ascending
    * mod-times — a file-per-ingest-batch corpus for the streaming index
    * maintenance query (same staging pattern as ExtQueries40.stagedCsv). */
  private def stagedDocChunks(s: SparkSession, dir: String): String =
    stageCache.computeIfAbsent(dir, { _ =>
      val digest = java.security.MessageDigest.getInstance("SHA-256")
        .digest(dir.getBytes("UTF-8")).take(8).map(b => f"$b%02x").mkString
      val out = graft.operators.Sinks.dir("doc_chunks/" + digest)
      val docs = Tables.table(s, dir, "documents").persist()
      try {
        (0 until 3).foreach { c =>
          val tmp = s"$out/_tmp"
          docs.where(pmod(col("doc_id"), lit(3)) === c)
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
      } finally docs.unpersist()
      out
    })

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    "dedup_index_refresh" -> ((s, dir) => {
      val docs = Tables.table(s, dir, "documents")
      val baseIndex = Dedup.simhashComponents(docs.where(!isIncoming), 3)
      Dedup.simhashComponentsRefresh(docs, isIncoming, 3, baseIndex)
        .select(col("node").as("doc_id"), col("comp"))
        .orderBy(col("doc_id"))
    }),

    "dedup_minhash_refresh" -> ((s, dir) => {
      val docs = Tables.table(s, dir, "documents")
      val baseIndex = Dedup.minhashComponents(docs.where(!isIncoming), 0.9)
      Dedup.minhashComponentsRefresh(docs, isIncoming, 0.9, baseIndex)
        .select(col("node").as("doc_id"), col("comp"))
        .orderBy(col("doc_id"))
    }),

    // STREAMING index maintenance: the corpus arrives as one parquet
    // file per trigger (Spark's file source, maxFilesPerTrigger=1,
    // oldest-first) and each microbatch folds into the standing index
    // through the FINGERPRINT-level refresh — batch docs are hashed
    // once, appended to a persisted fp table, and the per-batch work is
    // incoming x corpus banded candidates + CC over the touched
    // subgraph. Fingerprints of standing docs are NEVER recomputed
    // (the lakehouse regime: fp is a stored column). The drained index
    // must equal the batch full rebuild for ANY file/batch split — the
    // same induction Ext43Spec proves per step — so the oracle is again
    // the full-rebuild recursive CC.
    "stream_index_refresh" -> ((s, dir) => {
      import org.apache.spark.sql.streaming.Trigger
      val staged = stagedDocChunks(s, dir)
      val schema = Tables.table(s, dir, "documents").schema
      var comps = s.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](),
        new org.apache.spark.sql.types.StructType()
          .add("node", org.apache.spark.sql.types.LongType)
          .add("comp", org.apache.spark.sql.types.LongType))
      var fpsSoFar: Option[org.apache.spark.sql.DataFrame] = None
      val q = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(staged)
        .writeStream.trigger(Trigger.AvailableNow())
        .foreachBatch { (b: DataFrame, _: Long) =>
          val newFps = Dedup.simhashFingerprints(
              b.select(col("doc_id"), col("text")))
            .withColumn("inc", lit(true)).localCheckpoint(true)
          val all = fpsSoFar.map(_.unionByName(newFps)).getOrElse(newFps)
          comps = Dedup.simhashComponentsRefreshFromFps(all, 3, comps)
          fpsSoFar = Some(all.withColumn("inc", lit(false)).localCheckpoint(true))
          ()
        }
        .start()
      q.awaitTermination()
      comps.select(col("node").as("doc_id"), col("comp"))
        .orderBy(col("doc_id"))
    })
  )

  def oracleSql: Map[String, String] = Map(

    // the full-rebuild CC over ALL documents — identical to
    // dedup_groups_cc's oracle: incremental merge == rebuild
    "dedup_index_refresh" ->
      s"""WITH RECURSIVE ${ExtQueries.simhashPairsCtes},
         |sel AS (SELECT doc_a, doc_b FROM pairs
         |        WHERE bit_count(xor(fp_a, fp_b)) <= 3),
         |e AS (SELECT doc_a AS src, doc_b AS dst FROM sel
         |      UNION SELECT doc_b, doc_a FROM sel),
         |nodes AS (SELECT DISTINCT src AS node FROM e),
         |reach(node, lab) AS (
         |  SELECT node, node FROM nodes
         |  UNION
         |  SELECT e.dst, r.lab FROM reach r JOIN e ON e.src = r.node)
         |SELECT node AS doc_id, MIN(lab) AS comp FROM reach
         |GROUP BY node ORDER BY doc_id""".stripMargin,

    // streaming maintenance drains to the identical full-rebuild index
    "stream_index_refresh" ->
      s"""WITH RECURSIVE ${ExtQueries.simhashPairsCtes},
         |sel AS (SELECT doc_a, doc_b FROM pairs
         |        WHERE bit_count(xor(fp_a, fp_b)) <= 3),
         |e AS (SELECT doc_a AS src, doc_b AS dst FROM sel
         |      UNION SELECT doc_b, doc_a FROM sel),
         |nodes AS (SELECT DISTINCT src AS node FROM e),
         |reach(node, lab) AS (
         |  SELECT node, node FROM nodes
         |  UNION
         |  SELECT e.dst, r.lab FROM reach r JOIN e ON e.src = r.node)
         |SELECT node AS doc_id, MIN(lab) AS comp FROM reach
         |GROUP BY node ORDER BY doc_id""".stripMargin,

    // the MinHash twin, against ITS full-rebuild CC (unigram Jaccard)
    "dedup_minhash_refresh" ->
      s"""WITH RECURSIVE ${ExtQueries.minhashJoinCtes},
         |mp AS (SELECT doc_a, doc_b FROM j WHERE jac >= 0.9),
         |e AS (SELECT doc_a AS src, doc_b AS dst FROM mp
         |      UNION SELECT doc_b, doc_a FROM mp),
         |nodes AS (SELECT DISTINCT src AS node FROM e),
         |reach(node, lab) AS (
         |  SELECT node, node FROM nodes
         |  UNION
         |  SELECT e.dst, r.lab FROM reach r JOIN e ON e.src = r.node)
         |SELECT node AS doc_id, MIN(lab) AS comp FROM reach
         |GROUP BY node ORDER BY doc_id""".stripMargin
  )
}
