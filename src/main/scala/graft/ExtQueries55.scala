package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{SqIndex, Tables}

/**
 * Round 16: DELETION in the standing-index maintenance family — the one
 * lifecycle verb a long-lived deployment still lacked (takedown requests,
 * opt-outs, right-to-erasure: at 100 TB you cannot rebuild an index to
 * remove a handful of vectors). Implemented ONCE at the shared-protocol
 * level ([[graft.streaming.ShardLog.commitDeletes]]) so every maintenance
 * member inherits identical semantics:
 *
 *  - a delete batch commits a KEY-ONLY tombstone shard + a marker in the
 *    same log as ingest — ordered, idempotent, crash-safe (kill/resume
 *    across a delete is byte-identical, AnnMaintenanceSpec);
 *  - serves reflect the delete as soon as the marker commits (the fold
 *    anti-joins live tombstones — a KB-scale broadcast against the
 *    standing side, which never moves);
 *  - the covering compaction's snapshot PHYSICALLY excludes the rows and
 *    the tombstone shard is swept one cycle later: after two compaction
 *    cycles (or two eager `compactNow()` calls) the deleted vectors
 *    exist nowhere under the root — the erasure guarantee, bounded and
 *    forced on demand (ShardLogSpec proves it by scanning the snapshot
 *    parquet directly).
 *
 * Each drain below interleaves BOTH read paths with the ingest chunks:
 * delete batch 3 lands on the compaction cadence (compactEvery=2, count
 * 4), so set A is served from the PURGED snapshot; delete batch 4 stays
 * in the tail, so set B is served through the tombstone anti-join. The
 * oracle is the member's frozen-models replay (fit on chunk 0) minus
 * both delete sets — deletion must NOT perturb surviving rows' models,
 * assignments, or codes (the codebook/stats are trained on batch 0 and
 * deletion never retrains; refit on the post-delete corpus is the
 * separate, already-oracled verb).
 *
 * Reference behavior: the closest reference analogue is state RETRACTION
 * in the co-occurrence fold (flink-cooccurrence
 * ItemRowRescorerTwoInputStreamOperator.java:158-228 merges signed
 * deltas into standing state); here the retraction is a first-class
 * keyed verb over the durable artifact instead of an in-memory merge.
 */
object ExtQueries55 {

  private val NLists = 16
  private val IvfIters = 3
  import ExtQueries47.{M, Ksub, Iters}

  // set A: purged via the covering compaction; set B: masked via the
  // tombstone anti-join (both sit on the oracle every round)
  private def delA = col("vec_id") % 7 === 3
  private def delB = col("vec_id") % 11 === 5
  private def delWhere(q: String) =
    s"${q}vec_id % 7 != 3 AND ${q}vec_id % 11 != 5"

  private def embs(s: SparkSession, dir: String): DataFrame =
    Tables.table(s, dir, "embeddings")

  /** Drain the 3 staged chunks through `process`, then commit delete
    * batches 3 (set A — lands exactly on the compactEvery=2 cadence:
    * the purge path) and 4 (set B — tail tombstone: the mask path). */
  private def drainWithDeletes(s: SparkSession, dir: String,
      process: (DataFrame, Long) => Unit,
      delete: (Long, DataFrame) => Unit): Unit = {
    import org.apache.spark.sql.streaming.Trigger
    val staged = ExtQueries46.stagedEmbChunks(s, dir)
    val schema = embs(s, dir).schema
    val q = s.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(staged)
      .writeStream.trigger(Trigger.AvailableNow())
      .foreachBatch { (b: DataFrame, id: Long) => process(b, id); () }
      .start()
    q.awaitTermination()
    delete(3L, embs(s, dir).where(delA).select("vec_id"))
    delete(4L, embs(s, dir).where(delB).select("vec_id"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // raw-vector member: drained index == frozen-centroid rebuild (fit
    // on chunk 0) minus both delete sets; set A is read from the purged
    // base/3 snapshot, set B through the tail tombstone
    "stream_ann_index_delete" -> ((s, dir) => {
      val root = graft.operators.Sinks.dir(
        "ann_maint_del/run" + delRuns.incrementAndGet())
      val maint = new graft.streaming.AnnMaintenance(s, root, NLists,
        IvfIters, compactEvery = 2)
      drainWithDeletes(s, dir, (b, id) => maint.processBatch(id, b),
        (id, ids) => maint.deleteBatch(id, ids))
      maint.currentIndex()
        .select(col("vec_id"), col("cluster").cast("long").as("cluster"))
        .orderBy(col("vec_id"))
    }),

    // IVFADC member: the single standing cluster-partitioned code table
    // loses the deleted vectors' codes; surviving codes byte-unchanged
    "stream_ivfpq_delete" -> ((s, dir) => {
      val root = graft.operators.Sinks.dir(
        "ivfpq_maint_del/run" + delRuns.incrementAndGet())
      val maint = new graft.streaming.IvfPqMaintenance(s, root, NLists,
        IvfIters, M, Ksub, Iters, compactEvery = 2)
      drainWithDeletes(s, dir, (b, id) => maint.processBatch(id, b),
        (id, ids) => maint.deleteBatch(id, ids))
      maint.currentTable()
        .select(col("vec_id") +: col("cluster").cast("long").as("cluster") +:
          (0 until M).map(i => col(s"code_$i").cast("long").as(s"code_$i")) :+
          col("recon2"): _*)
        .orderBy(col("vec_id"))
    }),

    // dedup-index member ([[graft.streaming.IndexMaintenance]]): the
    // standing (node, comp) rows of the deleted docs vanish (tombstone
    // protocol; batch 3 lands on the compactEvery=2 cadence, so the
    // purge path is on the gate) and the docs' stored fingerprints are
    // masked out of later corpus scans. Deletion removes rows, it does
    // NOT re-split components: survivors keep their labels — which is
    // exactly why the oracle is the full-rebuild CC minus the deleted
    // nodes. (The masking semantics for post-delete ingest is spec'd in
    // IndexMaintenanceSpec, where the replay corpus is controllable.)
    "stream_index_delete" -> ((s, dir) => {
      import org.apache.spark.sql.streaming.Trigger
      val staged = ExtQueries43.stagedDocChunks(s, dir)
      val schema = Tables.table(s, dir, "documents").schema
      val root = graft.operators.Sinks.dir(
        "index_maint_del/run" + delRuns.incrementAndGet())
      val maint = new graft.streaming.IndexMaintenance(s, root,
        graft.streaming.IndexMaintenance.Simhash(3), compactEvery = 2)
      val q = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(staged)
        .writeStream.trigger(Trigger.AvailableNow())
        .foreachBatch { (b: DataFrame, id: Long) =>
          maint.processBatch(id, b)
          ()
        }
        .start()
      q.awaitTermination()
      maint.deleteBatch(3L, Tables.table(s, dir, "documents")
        .where(col("doc_id") % 10 === 2).select("doc_id"))
      maint.currentIndex()
        .select(col("node").as("doc_id"), col("comp"))
        .orderBy(col("doc_id"))
    }),

    // SQ8 member: same timeline over the scalar-quantized code table
    "stream_sq_delete" -> ((s, dir) => {
      val root = graft.operators.Sinks.dir(
        "sq_maint_del/run" + delRuns.incrementAndGet())
      val maint = new graft.streaming.SqMaintenance(s, root, dims = 64,
        compactEvery = 2)
      drainWithDeletes(s, dir, (b, id) => maint.processBatch(id, b),
        (id, ids) => maint.deleteBatch(id, ids))
      SqIndex.codeTableFrom(maint.currentCodes())
        .orderBy(col("vec_id"), col("i"))
    })
  )

  private val delRuns = new java.util.concurrent.atomic.AtomicLong()

  def oracleSql: Map[String, String] = {
    val codeCols = (0 until M).map(s =>
      s"CAST(MAX(CASE WHEN s = $s THEN code END) AS BIGINT) AS code_$s")
      .mkString(",\n       |       ")
    Map(
      // frozen-centroid rebuild (fit on chunk 0) minus both delete sets —
      // deletion must not perturb surviving assignments
      "stream_ann_index_delete" ->
        s"""WITH RECURSIVE ${ExtQueries46.ivfReplayCtes("vec_id % 3 = 0")}
           |SELECT vec_id, CAST(cluster AS BIGINT) AS cluster FROM indexed
           |WHERE ${delWhere("")}
           |ORDER BY vec_id""".stripMargin,

      // frozen-models IVFADC rebuild (both fits on chunk 0) minus both
      // delete sets — surviving codes byte-unchanged
      "stream_ivfpq_delete" ->
        s"""WITH RECURSIVE ${ExtQueries.quantSql},
           |${ExtQueries46.ivfReplayBody("vec_id % 3 = 0")},
           |${ExtQueries47.pqReplayBody("vec_id % 3 = 0")}
           |SELECT i.vec_id, CAST(i.cluster AS BIGINT) AS cluster,
           |       $codeCols,
           |       MAX(r.recon2) AS recon2
           |FROM indexed i
           |JOIN codes c ON c.vec_id = i.vec_id
           |JOIN recon r ON r.vec_id = i.vec_id
           |WHERE ${delWhere("i.")}
           |GROUP BY i.vec_id, i.cluster ORDER BY i.vec_id""".stripMargin,

      // full-rebuild CC minus the deleted nodes: deletion removes rows
      // and never relabels survivors (labels computed over the full
      // corpus, filter applied to the node column only)
      "stream_index_delete" ->
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
           |WHERE node % 10 != 2
           |GROUP BY node ORDER BY doc_id""".stripMargin,

      // frozen-stats SQ rebuild (stats on chunk 0) minus both delete sets
      "stream_sq_delete" ->
        s"""WITH ${ExtQueries.quantSql},
           |${ExtQueries49.sqReplayBody("vec_id % 3 = 0")}
           |SELECT c.vec_id, c.i, CAST(c.code AS BIGINT) AS code, r.recon2
           |FROM sqc c JOIN rv r ON r.vec_id = c.vec_id
           |WHERE ${delWhere("c.")}
           |ORDER BY c.vec_id, c.i""".stripMargin
    )
  }
}
