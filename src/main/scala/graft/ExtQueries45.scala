package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.Tables

/**
 * Round-13 wave: TRAINING-SEQUENCE PACKING — the step between a curated
 * corpus and an LLM training run: documents become fixed-length token
 * sequences. Two standard disciplines, both sharded so the fold
 * parallelizes at 100 TB (shard = hash(doc_id) mod NShards; packing is
 * per-shard, shards are independent):
 *
 *  - CONCAT packing (GPT-style): the shard's documents are concatenated
 *    in doc_id order with one separator token after each, and the
 *    stream is cut every SeqLen tokens. Docs may straddle sequence
 *    boundaries. Pure prefix-sum arithmetic — a scan + one cumulative
 *    window per shard, no iteration, the exact shape that holds at any
 *    scale.
 *  - GREEDY ATOMIC packing (no-split bins): documents stay whole; in
 *    doc_id order each doc joins the current sequence if it fits in the
 *    remaining budget, else opens a new one (docs longer than SeqLen get
 *    a sequence of their own). Inherently sequential PER SHARD — done as
 *    a STREAMING fold per shard (shuffle-sorted iterator, O(1) task
 *    state), which is exactly how a real pipeline shards it; the DuckDB
 *    oracle replays the fold with a recursive CTE over each shard's doc
 *    list.
 *
 * Token counts are whitespace tokens (the `text_tokens` convention).
 *
 * Queries:
 *  - pack_offsets:  per doc — shard, global token offset, first/last
 *    sequence id touched, sequences spanned (concat packing).
 *  - pack_stats:    per shard — sequences, docs, tokens, tail fill,
 *    boundary-straddle fraction (concat packing).
 *  - pack_greedy:   per doc — shard, sequence id, offset inside the
 *    sequence (atomic packing).
 *  - pack_greedy_stats: per shard — sequences, mean fill, wasted-token
 *    fraction (atomic packing vs concat's zero waste).
 */
object ExtQueries45 {

  private val SeqLen = 256L // tokens per training sequence

  /** Shard count for the packing fold. A PARAMETER, not a constant
    * (r13 verdict #1): at 100 TB the fold's parallelism and per-task
    * row count are both corpus/NShards, so the deployment sizes it to
    * the cluster (tasks ~ 2-3x cores, shard ~ fits a task's memory
    * comfortably — though the fold STREAMS, so memory is O(1) anyway
    * and the bound that matters is wall-clock per task). The driver
    * gate pins 8 so the oracle replay is small; the oracle SQL is
    * shard-generic (it interpolates the same value). */
  private[graft] val NShards: Int =
    sys.props.get("graft.pack.shards").map(_.toInt).getOrElse(8)

  /** (doc_id, shard, n_tok) — whitespace tokens, +1 separator accounted
    * by the packing arithmetic, not here. */
  private def docToks(s: SparkSession, dir: String): DataFrame =
    Tables.table(s, dir, "documents")
      .select(col("doc_id"),
        pmod(col("doc_id"), lit(NShards)).cast("int").as("shard"),
        size(split(col("text"), " ")).cast("long").as("n_tok"))

  /** Concat packing offsets: running token offset per shard (each doc
    * contributes n_tok + 1 separator), sequence ids by floor division. */
  private def concatOffsets(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("shard")).orderBy(col("doc_id"))
    docToks(s, dir)
      .withColumn("start_tok",
        coalesce(sum(col("n_tok") + 1).over(
          w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("end_tok", col("start_tok") + col("n_tok")) // excl. separator
      .withColumn("first_seq", floor(col("start_tok") / SeqLen).cast("long"))
      .withColumn("last_seq",
        floor((col("end_tok") - 1) / SeqLen).cast("long"))
  }

  /** Greedy atomic packing: one sorted fold per shard. Each output row is
    * (doc_id, shard, seq_id, seq_off). Sequential by construction, but
    * only WITHIN a shard — shards fold in parallel, which is the whole
    * point of sharding the pack.
    *
    * Scale shape (r13 verdict #1): `repartition(NShards, shard) +
    * sortWithinPartitions(shard, doc_id) + mapPartitions` — the shuffle
    * machinery does the sort (spillable sort-merge, never a heap
    * buffer), and the fold consumes the ITERATOR with O(1) state (shard,
    * seq, used), so per-task memory is flat in shard size. The earlier
    * `flatMapGroups` shape buffered a whole shard on the heap
    * (`it.toArray.sortBy`) — tens of GB per task at 100 TB/8 shards.
    * `repartition(NShards, shard)` hash-partitions on murmur3, so shards
    * CAN collide into one partition (leaving others empty) — achieved
    * parallelism is <= NShards, not exactly NShards. The fold is written
    * shard-change-aware, so a many-shards-per-partition layout is
    * correct by construction; NShards only sizes the upper bound. */
  private def greedy(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    docToks(s, dir)
      .select(col("shard"), col("doc_id"), col("n_tok"))
      .as[(Int, Long, Long)]
      .repartition(NShards, col("shard"))
      .sortWithinPartitions(col("shard"), col("doc_id"))
      .mapPartitions { it =>
        var curShard = Int.MinValue
        var seq = 0L
        var used = 0L
        it.map { case (shard, docId, n) =>
          if (shard != curShard) { curShard = shard; seq = 0L; used = 0L }
          if (used > 0 && used + n > SeqLen) { seq += 1; used = 0L }
          val off = used
          used += n
          (docId, shard, seq, off)
        }
      }
      .toDF("doc_id", "shard", "seq_id", "seq_off")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    "pack_offsets" -> ((s, dir) =>
      concatOffsets(s, dir)
        .select(col("doc_id"), col("shard"), col("start_tok"),
          col("first_seq"), col("last_seq"),
          (col("last_seq") - col("first_seq") + 1).as("n_seqs"))
        .orderBy(col("doc_id"))),

    "pack_stats" -> ((s, dir) => {
      val o = concatOffsets(s, dir)
      o.groupBy(col("shard"))
        .agg(
          count(lit(1)).as("n_docs"),
          sum(col("n_tok")).as("n_tokens"),
          // shard stream length = last end_tok + its separator; sequences
          // cut every SeqLen tokens -> ceil = floor(max(end_tok)/SeqLen)+1
          (floor(max(col("end_tok")) / SeqLen) + 1).cast("long").as("n_seqs"),
          sum(when(col("last_seq") > col("first_seq"), 1).otherwise(0))
            .cast("long").as("n_straddlers"),
          round(sum(when(col("last_seq") > col("first_seq"), 1).otherwise(0))
            * lit(1.0) / count(lit(1)), 4).as("straddle_frac"))
        .orderBy(col("shard"))
    }),

    "pack_greedy" -> ((s, dir) =>
      greedy(s, dir).orderBy(col("doc_id"))),

    "pack_greedy_stats" -> ((s, dir) => {
      // per-sequence used tokens = max over its docs of (seq_off + n_tok);
      // join back to the token counts instead of carrying n_tok through
      // the greedy fold's output
      val withTok = greedy(s, dir)
        .join(docToks(s, dir).select(col("doc_id"), col("n_tok")), "doc_id")
      withTok.groupBy(col("shard"), col("seq_id"))
        .agg(count(lit(1)).as("n_docs"),
          max(col("seq_off") + col("n_tok")).as("used"))
        .groupBy(col("shard"))
        .agg(count(lit(1)).as("n_seqs"),
          sum(col("n_docs")).cast("long").as("n_docs"),
          // oversized docs overflow their own sequence; waste counts
          // only the unfilled part of non-overflowing sequences
          round(avg(least(col("used"), lit(SeqLen)) / lit(SeqLen.toDouble)), 4)
            .as("mean_fill"),
          sum(greatest(lit(SeqLen) - col("used"), lit(0L))).as("wasted_tokens"))
        .orderBy(col("shard"))
    })
  )

  def oracleSql: Map[String, String] = {
    val docToksSql =
      s"""dt AS (SELECT doc_id, CAST(doc_id % $NShards AS INT) AS shard,
         |             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
         |      FROM documents)""".stripMargin
    val offsetsSql =
      s"""$docToksSql,
         |o AS (
         |  SELECT doc_id, shard, n_tok,
         |         CAST(COALESCE(SUM(n_tok + 1) OVER (PARTITION BY shard ORDER BY doc_id
         |             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
         |           AS start_tok
         |  FROM dt),
         |oo AS (
         |  SELECT doc_id, shard, n_tok, start_tok, start_tok + n_tok AS end_tok,
         |         CAST(start_tok // $SeqLen AS BIGINT) AS first_seq,
         |         CAST((start_tok + n_tok - 1) // $SeqLen AS BIGINT) AS last_seq
         |  FROM o)""".stripMargin
    // greedy fold replay: one recursive iteration per shard per DOC RANK
    // (all shards advance together); state = (shard, rank, seq, used)
    val greedySql =
      s"""WITH RECURSIVE $docToksSql,
         |r AS (SELECT doc_id, shard, n_tok,
         |             CAST(ROW_NUMBER() OVER (PARTITION BY shard ORDER BY doc_id) AS BIGINT) AS rk
         |      FROM dt),
         |g(shard, rk, doc_id, seq_id, seq_off, used) AS (
         |  SELECT shard, rk, doc_id, CAST(0 AS BIGINT), CAST(0 AS BIGINT), n_tok
         |  FROM r WHERE rk = 1
         |  UNION ALL
         |  SELECT r.shard, r.rk, r.doc_id,
         |         CASE WHEN g.used > 0 AND g.used + r.n_tok > $SeqLen
         |              THEN g.seq_id + 1 ELSE g.seq_id END,
         |         CASE WHEN g.used > 0 AND g.used + r.n_tok > $SeqLen
         |              THEN CAST(0 AS BIGINT) ELSE g.used END,
         |         CASE WHEN g.used > 0 AND g.used + r.n_tok > $SeqLen
         |              THEN r.n_tok ELSE g.used + r.n_tok END
         |  FROM g JOIN r ON r.shard = g.shard AND r.rk = g.rk + 1)""".stripMargin
    Map(
      "pack_offsets" ->
        s"""WITH $offsetsSql
           |SELECT doc_id, shard, start_tok, first_seq, last_seq,
           |       CAST(last_seq - first_seq + 1 AS BIGINT) AS n_seqs
           |FROM oo ORDER BY doc_id""".stripMargin,

      "pack_stats" ->
        s"""WITH $offsetsSql
           |SELECT shard, COUNT(*) AS n_docs,
           |       CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
           |       CAST(MAX(end_tok) // $SeqLen + 1 AS BIGINT) AS n_seqs,
           |       CAST(SUM(CASE WHEN last_seq > first_seq THEN 1 ELSE 0 END) AS BIGINT)
           |         AS n_straddlers,
           |       ROUND(SUM(CASE WHEN last_seq > first_seq THEN 1 ELSE 0 END) * 1.0
           |             / COUNT(*), 4) AS straddle_frac
           |FROM oo GROUP BY shard ORDER BY shard""".stripMargin,

      "pack_greedy" ->
        s"""$greedySql
           |SELECT doc_id, shard, seq_id, seq_off FROM g ORDER BY doc_id""".stripMargin,

      "pack_greedy_stats" ->
        s"""$greedySql,
           |pertok AS (SELECT g.shard, g.seq_id, g.doc_id, g.seq_off, dt.n_tok
           |           FROM g JOIN dt USING (doc_id)),
           |perseq AS (
           |  SELECT shard, seq_id, COUNT(*) AS n_docs,
           |         MAX(seq_off + n_tok) AS used
           |  FROM pertok GROUP BY shard, seq_id)
           |SELECT shard, COUNT(*) AS n_seqs,
           |       CAST(SUM(n_docs) AS BIGINT) AS n_docs,
           |       ROUND(AVG(LEAST(used, $SeqLen) * 1.0 / $SeqLen), 4) AS mean_fill,
           |       CAST(SUM(GREATEST($SeqLen - used, 0)) AS BIGINT) AS wasted_tokens
           |FROM perseq GROUP BY shard ORDER BY shard""".stripMargin
    )
  }
}
