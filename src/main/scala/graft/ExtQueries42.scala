package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.operators.{Dedup, DedupIndex, Tables}

/**
 * Round-9 second wave: MinHash-family parity for clustering, the
 * data-constrained mixing planner, shard rebalancing, and the
 * column-pruned streaming read of the DSv2 source.
 *
 *  - dedup_minhash_groups: connected components over MinHash near-dup
 *    pairs (Jaccard >= 0.9) — the MinHash twin of `dedup_groups_cc`
 *    (SimHash). Runs on the identical-word-set REP graph: duplicate
 *    cohorts contract to one node each, so the label propagation never
 *    carries the C(n,2) within-cohort clique edges; at web scale the
 *    edge volume is bounded by distinct content, not corpus size.
 *  - mix_epochs_plan: the step AFTER `mix_temperature` — given the
 *    temperature weights (tau=2) and a 3-pass compute budget, allocate
 *    target tokens per source and report the repetition factor
 *    (epochs) each source would run. Sources pushed past 4 epochs are
 *    flagged: repeating data beyond ~4 epochs returns rapidly
 *    diminishing value, so the flag is the "get more data or re-weight"
 *    signal a pretraining-mixture owner acts on. Aggregate-grain
 *    arithmetic only (one row per source).
 *  - shard_rebalance_plan: deterministic skew-repair plan over the
 *    16-shard layout of `shard_manifest` — rank surplus shards against
 *    deficit shards and pair them i-th-to-i-th, moving
 *    least(surplus, deficit) bytes. The plan is computed entirely at
 *    shard grain (16 rows), so the single-partition rank windows are
 *    constant-size at any corpus scale.
 *  - stream_dsv2_pruned: the graft-interactions MicroBatchStream read
 *    with only `item` referenced — column pruning must reach the
 *    streaming reader exactly as it does the batch reader (same oracle
 *    as source_dsv2_pruned).
 */
object ExtQueries42 {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    "dedup_minhash_groups" -> ((s, dir) =>
      DedupIndex.minhashComponents(s, dir, 0.9)
        .select(col("node").as("doc_id"), col("comp"))
        .orderBy(col("doc_id"))),

    "mix_epochs_plan" -> ((s, dir) => {
      val d = Tables.table(s, dir, "documents")
        .groupBy(col("source")).agg(sum(col("n_chars")).as("toks"))
      val tot = d.agg(sum(col("toks")).as("tot"))
      val withW = d.crossJoin(broadcast(tot))
        // same decimal pinning as mix_temperature: sqrt is IEEE
        // correctly-rounded (portable), grid to 9 places BEFORE the
        // cross-source normalization sum
        .withColumn("w_raw",
          round(sqrt(col("toks") * lit(1.0) / col("tot")), 9).cast(DecimalType(12, 9)))
      val wsum = withW.agg(sum(col("w_raw")).as("wsum"))
      withW.crossJoin(broadcast(wsum))
        .withColumn("weight",
          round(col("w_raw").cast("double") / col("wsum").cast("double"), 6))
        // 3-pass budget: 3x the corpus tokens, split by temperature weight
        .withColumn("alloc_toks",
          round(col("weight") * col("tot") * lit(3.0)).cast("long"))
        // integer percent: portable across engines (no double division)
        .withColumn("epochs_pct", expr("(alloc_toks * 100) DIV toks"))
        .select(col("source"), col("toks"), col("alloc_toks"), col("epochs_pct"),
          (col("epochs_pct") > 400).as("over_cap"),
          round(least(lit(1.0), col("alloc_toks") * lit(1.0) / col("toks")), 4)
            .as("unique_frac"))
        .orderBy(col("source"))
    }),

    "shard_rebalance_plan" -> ((s, dir) => {
      val sh = Tables.table(s, dir, "documents")
        .groupBy(pmod(col("doc_id"), lit(16)).cast("int").as("shard"))
        .agg(sum(col("n_chars")).as("bytes"))
      val tot = sh.agg(sum(col("bytes")).as("tot"), count(lit(1)).as("n"))
      val w = sh.crossJoin(broadcast(tot)).withColumn("avg", expr("tot DIV n"))
      // global rank windows over SHARD grain (16 rows at any corpus
      // size) — the single partition is a constant, not a scale risk
      val over = w.where(col("bytes") > col("avg"))
        .withColumn("rnk",
          row_number().over(Window.orderBy(col("bytes").desc, col("shard"))))
        .select(col("shard").as("from_shard"),
          (col("bytes") - col("avg")).as("surplus"), col("rnk"))
      val under = w.where(col("bytes") < col("avg"))
        .withColumn("rnk",
          row_number().over(Window.orderBy(col("bytes").asc, col("shard"))))
        .select(col("shard").as("to_shard"),
          (col("avg") - col("bytes")).as("deficit"), col("rnk"))
      over.join(under, Seq("rnk"))
        .select(col("from_shard"), col("to_shard"),
          least(col("surplus"), col("deficit")).as("moved_bytes"))
        .where(col("moved_bytes") > 0)
        .orderBy(col("from_shard"))
    }),

    "stream_dsv2_pruned" -> ((s, dir) => {
      val staged = ExtQueries40.stagedCsv(s, dir)
      // the `columns` option shrinks the TABLE schema: Spark's
      // micro-batch planner never runs V2 scan pushdown for streaming
      // relations, so this is the only way the streaming reader can
      // skip parsing the dropped fields (InteractionsSourceSpec pins
      // both behaviors)
      val agg = s.readStream.format("graft-interactions")
        .option("columns", "item").load(staged)
        .groupBy(col("item")).agg(count(lit(1)).as("n_events"))
      graft.streaming.StreamingOps.runToMemory(agg, s"dsv2spr_${System.nanoTime()}")
        .orderBy(col("item"))
    })
  )

  def oracleSql: Map[String, String] = Map(

    "dedup_minhash_groups" ->
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

    "mix_epochs_plan" ->
      """WITH d AS (SELECT source, CAST(SUM(n_chars) AS BIGINT) AS toks
        |           FROM documents GROUP BY source),
        |t AS (SELECT SUM(toks) AS tot FROM d),
        |w AS (SELECT source, toks, tot,
        |        CAST(round(sqrt(toks * 1.0 / tot), 9) AS DECIMAL(12,9)) AS w_raw
        |      FROM d CROSS JOIN t),
        |ws AS (SELECT SUM(w_raw) AS wsum FROM w),
        |a AS (SELECT source, toks,
        |        CAST(round(round(CAST(w_raw AS DOUBLE) / CAST(wsum AS DOUBLE), 6)
        |          * tot * 3.0) AS BIGINT) AS alloc_toks
        |      FROM w CROSS JOIN ws)
        |SELECT source, toks, alloc_toks,
        |       (alloc_toks * 100) // toks AS epochs_pct,
        |       ((alloc_toks * 100) // toks) > 400 AS over_cap,
        |       round(LEAST(1.0, alloc_toks * 1.0 / toks), 4) AS unique_frac
        |FROM a ORDER BY source""".stripMargin,

    "shard_rebalance_plan" ->
      """WITH sh AS (SELECT CAST(doc_id % 16 AS INT) AS shard,
        |                   CAST(SUM(n_chars) AS BIGINT) AS bytes
        |            FROM documents GROUP BY 1),
        |t AS (SELECT SUM(bytes) AS tot, COUNT(*) AS n FROM sh),
        |w AS (SELECT shard, bytes, CAST(tot // n AS BIGINT) AS avg
        |      FROM sh CROSS JOIN t),
        |o AS (SELECT shard AS from_shard, bytes - avg AS surplus,
        |             ROW_NUMBER() OVER (ORDER BY bytes DESC, shard) AS rnk
        |      FROM w WHERE bytes > avg),
        |u AS (SELECT shard AS to_shard, avg - bytes AS deficit,
        |             ROW_NUMBER() OVER (ORDER BY bytes ASC, shard) AS rnk
        |      FROM w WHERE bytes < avg)
        |SELECT from_shard, to_shard, LEAST(surplus, deficit) AS moved_bytes
        |FROM o JOIN u USING (rnk)
        |WHERE LEAST(surplus, deficit) > 0 ORDER BY from_shard""".stripMargin,

    // streaming pruned read == batch pruned read: same oracle as
    // source_dsv2_pruned
    "stream_dsv2_pruned" ->
      s"""WITH inter AS (${SparkEntry.interSql})
         |SELECT item, COUNT(*) AS n_events
         |FROM inter
         |WHERE usr IS NOT NULL AND item IS NOT NULL AND ts IS NOT NULL
         |GROUP BY item ORDER BY item""".stripMargin
  )
}
