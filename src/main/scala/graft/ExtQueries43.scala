package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Tables}

/**
 * Rounds 10+12: incremental maintenance of the persisted dedup cluster
 * index — the merge half of the build-once/scan-many pattern
 * ([[graft.operators.DedupIndex]], which also serves these queries their
 * standing BASE index). At 100 TB the index is built once per corpus
 * snapshot; every ingest batch afterwards must MERGE into it without
 * re-pairing the standing corpus against itself.
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
 *  - dedup_index_refresh_delta / dedup_minhash_refresh_delta: the
 *    changed-rows-only variants — exactly the payload a lakehouse MERGE
 *    writes — against full-rebuild-EXCEPT-base-index oracles.
 *  - stream_index_refresh: continuous maintenance through
 *    [[graft.streaming.IndexMaintenance]] (per-batch persisted fp
 *    shards + delta log + commit markers), drained equal to the full
 *    rebuild.
 */
object ExtQueries43 {

  private def isIncoming = col("doc_id") % 5 === 4 // 20% ingest shard

  private val stageCache = new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** documents staged as 3 single-file parquet chunks with ascending
    * mod-times — a file-per-ingest-batch corpus for the streaming index
    * maintenance query (same staging pattern as ExtQueries40.stagedCsv).
    * The cache key includes the source table's CONTENT fingerprint
    * (r10 advice): if the driver regenerates testdata mid-session the
    * staging is redone rather than served stale. */
  private[graft] def stagedDocChunks(s: SparkSession, dir: String): String = {
    val fp = graft.operators.DedupIndex.fingerprint(s, s"$dir/documents.parquet")
    stageCache.computeIfAbsent(s"$dir|$fp", { _ =>
      val digest = java.security.MessageDigest.getInstance("SHA-256")
        .digest(s"$dir|$fp".getBytes("UTF-8")).take(8).map(b => f"$b%02x").mkString
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
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    "dedup_index_refresh" -> ((s, dir) => {
      val docs = Tables.table(s, dir, "documents")
      val baseIndex = graft.operators.DedupIndex
        .simhashComponentsFiltered(s, dir, 3, "notmod5", !isIncoming)
      Dedup.simhashComponentsRefresh(docs, isIncoming, 3, baseIndex)
        .select(col("node").as("doc_id"), col("comp"))
        .orderBy(col("doc_id"))
    }),

    "dedup_minhash_refresh" -> ((s, dir) => {
      val docs = Tables.table(s, dir, "documents")
      val baseIndex = graft.operators.DedupIndex
        .minhashComponentsFiltered(s, dir, 0.9, "notmod5", !isIncoming)
      Dedup.minhashComponentsRefresh(docs, isIncoming, 0.9, baseIndex)
        .select(col("node").as("doc_id"), col("comp"))
        .orderBy(col("doc_id"))
    }),

    // Delta twins: ONLY the rows a lakehouse MERGE must write — new
    // nodes plus standing nodes whose component label changed. The
    // oracle is the set difference of the full-rebuild index and the
    // base index (both recursive CC in DuckDB): full EXCEPT base is
    // exactly "new or remapped", since a refresh never deletes a row
    // and never leaves a remapped row at its old label.
    "dedup_index_refresh_delta" -> ((s, dir) => {
      val docs = Tables.table(s, dir, "documents")
      val baseIndex = graft.operators.DedupIndex
        .simhashComponentsFiltered(s, dir, 3, "notmod5", !isIncoming)
      Dedup.simhashComponentsRefreshDelta(docs, isIncoming, 3, baseIndex)
        .select(col("node").as("doc_id"), col("comp"))
        .orderBy(col("doc_id"))
    }),

    "dedup_minhash_refresh_delta" -> ((s, dir) => {
      val docs = Tables.table(s, dir, "documents")
      val baseIndex = graft.operators.DedupIndex
        .minhashComponentsFiltered(s, dir, 0.9, "notmod5", !isIncoming)
      Dedup.minhashComponentsRefreshDelta(docs, isIncoming, 0.9, baseIndex)
        .select(col("node").as("doc_id"), col("comp"))
        .orderBy(col("doc_id"))
    }),

    // STREAMING index maintenance: the corpus arrives as one parquet
    // file per trigger (Spark's file source, maxFilesPerTrigger=1,
    // oldest-first) and each microbatch folds into the standing index
    // through [[graft.streaming.IndexMaintenance]] — batch docs are
    // hashed once and persisted as that batch's fp shard; per-batch work
    // is incoming x corpus banded candidates + CC over the touched
    // subgraph + an O(changed) delta write. Standing fingerprints are
    // only ever SCANNED — never recomputed (the lakehouse regime: fp is
    // a stored column) and never re-materialized (the r10/r11 shape that
    // re-checkpointed the accumulated fp union every batch was quadratic
    // in batch count). The drained index must equal the batch full
    // rebuild for ANY file/batch split — the same induction Ext43Spec
    // proves per step — so the oracle is again the full-rebuild
    // recursive CC. A fresh state root per invocation keeps bench reps
    // honest (a reused root would no-op on already-committed batch ids).
    // compactEvery=2 puts a LIVE compaction point (snapshot + log
    // truncation) inside the oracled drain, so the correctness gate
    // exercises the compacted read path every round; the minhash twin
    // below keeps the class default and covers the uncompacted path.
    "stream_index_refresh" -> ((s, dir) =>
      drainSimhashMaintenance(s, dir, compactEvery = 2)),

    // the SAME drain at the class-default compaction (no compaction point
    // fires at 3 batches): benched alongside stream_index_refresh so the
    // maintenance cost and the live-compaction cost are separately
    // visible per round (r12 verdict #6) — the compacted read path stays
    // on the correctness gate via the compactEvery=2 variant above
    "stream_index_refresh_nocompact" -> ((s, dir) =>
      drainSimhashMaintenance(s, dir, compactEvery = 64)),

    // the MinHash twin of stream_index_refresh: same maintenance loop,
    // stored columns are banded signatures + word-hash sets, oracle is
    // the MinHash full-rebuild CC
    "stream_minhash_index_refresh" -> ((s, dir) => {
      import org.apache.spark.sql.streaming.Trigger
      val staged = stagedDocChunks(s, dir)
      val schema = Tables.table(s, dir, "documents").schema
      val root = graft.operators.Sinks.dir(
        "index_maint/run" + maintRuns.incrementAndGet())
      val maint = new graft.streaming.IndexMaintenance(s, root,
        graft.streaming.IndexMaintenance.MinhashJaccard(0.9))
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
        .select(col("node").as("doc_id"), col("comp"))
        .orderBy(col("doc_id"))
    })
  )

  private val maintRuns = new java.util.concurrent.atomic.AtomicLong()

  /** One full AvailableNow drain of the staged doc chunks through a fresh
    * simhash [[graft.streaming.IndexMaintenance]] root (a reused root
    * would no-op on already-committed batch ids and turn bench reps into
    * marker reads). */
  private def drainSimhashMaintenance(s: SparkSession, dir: String,
      compactEvery: Int): DataFrame = {
    import org.apache.spark.sql.streaming.Trigger
    val staged = stagedDocChunks(s, dir)
    val schema = Tables.table(s, dir, "documents").schema
    val root = graft.operators.Sinks.dir(
      "index_maint/run" + maintRuns.incrementAndGet())
    val maint = new graft.streaming.IndexMaintenance(s, root,
      graft.streaming.IndexMaintenance.Simhash(3), compactEvery = compactEvery)
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
      .select(col("node").as("doc_id"), col("comp"))
      .orderBy(col("doc_id"))
  }

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
    "stream_index_refresh_nocompact" ->
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

    // delta = full-rebuild EXCEPT base-index: a refresh never deletes a
    // row and never leaves a remapped node at its old label, so the set
    // difference is exactly the new + remapped rows. base_idx restricts
    // the SAME pair list to base-only endpoints (fingerprints depend
    // only on a doc's own text, so subset pairs == pairs of the subset).
    "dedup_index_refresh_delta" ->
      s"""WITH RECURSIVE ${ExtQueries.simhashPairsCtes},
         |sel AS (SELECT doc_a, doc_b FROM pairs
         |        WHERE bit_count(xor(fp_a, fp_b)) <= 3),
         |e AS (SELECT doc_a AS src, doc_b AS dst FROM sel
         |      UNION SELECT doc_b, doc_a FROM sel),
         |nodes AS (SELECT DISTINCT src AS node FROM e),
         |reach(node, lab) AS (
         |  SELECT node, node FROM nodes
         |  UNION
         |  SELECT e.dst, r.lab FROM reach r JOIN e ON e.src = r.node),
         |full_idx AS (SELECT node, MIN(lab) AS comp FROM reach GROUP BY node),
         |bsel AS (SELECT doc_a, doc_b FROM sel
         |         WHERE doc_a % 5 <> 4 AND doc_b % 5 <> 4),
         |be AS (SELECT doc_a AS src, doc_b AS dst FROM bsel
         |       UNION SELECT doc_b, doc_a FROM bsel),
         |bnodes AS (SELECT DISTINCT src AS node FROM be),
         |breach(node, lab) AS (
         |  SELECT node, node FROM bnodes
         |  UNION
         |  SELECT be.dst, r.lab FROM breach r JOIN be ON be.src = r.node),
         |base_idx AS (SELECT node, MIN(lab) AS comp FROM breach GROUP BY node)
         |SELECT node AS doc_id, comp FROM (
         |  SELECT node, comp FROM full_idx
         |  EXCEPT SELECT node, comp FROM base_idx) AS d
         |ORDER BY doc_id""".stripMargin,

    "dedup_minhash_refresh_delta" ->
      s"""WITH RECURSIVE ${ExtQueries.minhashJoinCtes},
         |mp AS (SELECT doc_a, doc_b FROM j WHERE jac >= 0.9),
         |e AS (SELECT doc_a AS src, doc_b AS dst FROM mp
         |      UNION SELECT doc_b, doc_a FROM mp),
         |nodes AS (SELECT DISTINCT src AS node FROM e),
         |reach(node, lab) AS (
         |  SELECT node, node FROM nodes
         |  UNION
         |  SELECT e.dst, r.lab FROM reach r JOIN e ON e.src = r.node),
         |full_idx AS (SELECT node, MIN(lab) AS comp FROM reach GROUP BY node),
         |bmp AS (SELECT doc_a, doc_b FROM mp
         |        WHERE doc_a % 5 <> 4 AND doc_b % 5 <> 4),
         |be AS (SELECT doc_a AS src, doc_b AS dst FROM bmp
         |       UNION SELECT doc_b, doc_a FROM bmp),
         |bnodes AS (SELECT DISTINCT src AS node FROM be),
         |breach(node, lab) AS (
         |  SELECT node, node FROM bnodes
         |  UNION
         |  SELECT be.dst, r.lab FROM breach r JOIN be ON be.src = r.node),
         |base_idx AS (SELECT node, MIN(lab) AS comp FROM breach GROUP BY node)
         |SELECT node AS doc_id, comp FROM (
         |  SELECT node, comp FROM full_idx
         |  EXCEPT SELECT node, comp FROM base_idx) AS d
         |ORDER BY doc_id""".stripMargin,

    // MinHash streaming maintenance drains to ITS full-rebuild index
    "stream_minhash_index_refresh" ->
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
