package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.operators.Tables

/**
 * Round-6 second wave: the REMOVE step of substring dedup (rewrite docs
 * with later duplicate spans masked), incremental materialized-view
 * maintenance (merge partial aggregates instead of recomputing), and
 * join-key skew diagnosis (the operational input to salting decisions).
 */
object ExtQueries12 {

  private val GramN = 10

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Substring dedup REWRITE (Lee et al. 2022's remove step, n-gram
    // granularity): every 10-word span whose gram occurred earlier —
    // in a smaller doc_id, or earlier in the same doc — is masked, and
    // each doc is re-emitted with only unmasked words. keep-first is a
    // per-gram window rank (partitioned by gram — parallel); the masked
    // position set is a bounded 10-row explode per duplicate occurrence;
    // reassembly sorts within the doc partition only. No pairwise doc
    // work anywhere; at extreme scale the gram index would be replaced
    // by a suffix-array pass, but the shuffle structure (gram-keyed
    // rank, doc-keyed reassembly) is the distributed shape either way.
    "dedup_substring_rewrite" -> ((s, dir) => {
      val docs = Tables.table(s, dir, "documents")
        .select(col("doc_id"), split(col("text"), " ").as("w"))
      val occ = docs.where(size(col("w")) >= GramN)
        .select(col("doc_id"),
          posexplode(transform(sequence(lit(0), size(col("w")) - GramN),
            i => array_join(slice(col("w"), i + 1, lit(GramN)), " "))))
        .toDF("doc_id", "pos", "gram")
      val dups = occ.withColumn("rn", row_number().over(
          Window.partitionBy(col("gram")).orderBy(col("doc_id"), col("pos"))))
        .where(col("rn") > 1)
      val masked = dups.select(col("doc_id"),
          explode(sequence(col("pos"), col("pos") + GramN - 1)).as("mpos"))
        .distinct()
      val words = docs.select(col("doc_id"), posexplode(col("w")).as(Seq("pos", "word")))
      val keptAgg = words.join(masked, words("doc_id") === masked("doc_id") &&
          words("pos") === masked("mpos"), "left_anti")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_kept"),
          array_join(transform(array_sort(collect_list(struct(col("pos"), col("word")))),
            x => x.getField("word")), " ").as("clean_text"))
      // fully-masked docs (exact clones of an earlier doc) must still be
      // emitted — with zero kept words — so the output is a total rewrite
      // of the corpus, not a filtered subset
      docs.select(col("doc_id"), size(col("w")).cast("long").as("n_words"))
        .join(keptAgg, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_words"),
          coalesce(col("n_kept"), lit(0L)).as("n_kept"),
          (col("n_words") - coalesce(col("n_kept"), lit(0L))).as("n_masked"),
          coalesce(col("clean_text"), lit("")).as("clean_text"))
        .orderBy(col("doc_id"))
    }),

    // Incremental materialized-view maintenance: the standing agg over
    // the base partition merges with the delta batch's partial agg —
    // union of two partials + one re-aggregation, never a rescan of the
    // base FACTS. Decimal-summed so the merge is bit-equal to the
    // full recompute the oracle runs (double sums are order-sensitive).
    "incremental_mv" -> ((s, dir) => {
      val orders = Tables.table(s, dir, "orders")
      val cut = lit("2024-06-01").cast("date")
      def partial(df: DataFrame) = df
        .groupBy(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"),
          sum(col("o_totalprice").cast(DecimalType(20, 4))).as("total"))
      val base = partial(orders.where(col("o_orderdate") < cut))
      val delta = partial(orders.where(col("o_orderdate") >= cut))
      base.unionAll(delta)
        .groupBy(col("o_orderstatus"), col("o_orderpriority"))
        .agg(sum(col("n")).as("n"),
          sum(col("total")).cast("double").as("total"))
        .orderBy(col("o_orderstatus"), col("o_orderpriority"))
    }),

    // Join-key skew diagnosis: per candidate shuffle key, the frequency
    // profile that decides salting (max key frequency vs uniform share).
    // Two-level: per-key count (one shuffle per key column) then a tiny
    // per-column rollup. The heaviest key rides through max() as the
    // scalar f*10^12 + k (both far below the respective overflow lines
    // at any tested SF; ties break toward the larger key) because
    // row-valued arg-max is not portable SQL. At 100 TB this is the
    // exact query you run before choosing salt factors.
    "skew_diagnose" -> ((s, dir) => {
      val enc = 1000000000000L
      def profile(df: DataFrame, keyCol: String, tag: String) = df
        .groupBy(col(keyCol).as("k")).agg(count(lit(1)).as("f"))
        .agg(lit(tag).as("key_col"),
          count(lit(1)).as("n_keys"),
          sum(col("f")).as("n_rows"),
          max(col("f")).as("max_freq"),
          (max(col("f") * enc + col("k")) % enc).as("heaviest_key"))
      val ev = Tables.events(s, dir)
      profile(ev, "user_id", "events.user_id")
        .unionAll(profile(Tables.table(s, dir, "lineitem"), "l_orderkey", "lineitem.l_orderkey"))
        .unionAll(profile(Tables.table(s, dir, "lineitem"), "l_partkey", "lineitem.l_partkey"))
        .select(col("key_col"), col("n_keys"), col("n_rows"), col("max_freq"),
          col("heaviest_key"),
          round(col("max_freq") * col("n_keys") / col("n_rows").cast("double"), 6).as("skew_ratio"))
        .orderBy(col("key_col"))
    })
  )

  def oracleSql: Map[String, String] = Map(

    "dedup_substring_rewrite" ->
      s"""WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
         |occ AS (SELECT doc_id, i AS pos,
         |               array_to_string(ws[CAST(i + 1 AS INT):CAST(i + $GramN AS INT)], ' ') AS gram
         |        FROM w, UNNEST(generate_series(0, len(ws) - $GramN)) AS t(i)
         |        WHERE len(ws) >= $GramN),
         |dups AS (SELECT doc_id, pos FROM (
         |           SELECT doc_id, pos,
         |                  ROW_NUMBER() OVER (PARTITION BY gram ORDER BY doc_id, pos) AS rn
         |           FROM occ) WHERE rn > 1),
         |masked AS (SELECT DISTINCT doc_id, pos + j AS mpos
         |           FROM dups, UNNEST(generate_series(0, ${GramN - 1})) AS s(j)),
         |words AS (SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos, ws[CAST(i AS INT)] AS word
         |          FROM w, UNNEST(generate_series(1, len(ws))) AS t(i)),
         |kept AS (SELECT wd.doc_id, wd.pos, wd.word FROM words wd
         |         WHERE NOT EXISTS (SELECT 1 FROM masked m
         |                           WHERE m.doc_id = wd.doc_id AND m.mpos = wd.pos)),
         |ka AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_kept,
         |              string_agg(word, ' ' ORDER BY pos) AS clean_text
         |       FROM kept GROUP BY doc_id)
         |SELECT w.doc_id, CAST(len(w.ws) AS BIGINT) AS n_words,
         |       COALESCE(ka.n_kept, 0) AS n_kept,
         |       CAST(len(w.ws) - COALESCE(ka.n_kept, 0) AS BIGINT) AS n_masked,
         |       COALESCE(ka.clean_text, '') AS clean_text
         |FROM w LEFT JOIN ka ON w.doc_id = ka.doc_id
         |ORDER BY w.doc_id""".stripMargin,

    "incremental_mv" ->
      """SELECT o_orderstatus, o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n,
        |       CAST(SUM(CAST(o_totalprice AS DECIMAL(20,4))) AS DOUBLE) AS total
        |FROM orders GROUP BY o_orderstatus, o_orderpriority
        |ORDER BY o_orderstatus, o_orderpriority""".stripMargin,

    "skew_diagnose" ->
      """WITH p AS (
        |  SELECT 'events.user_id' AS key_col, user_id AS k, COUNT(*) AS f
        |  FROM events GROUP BY user_id
        |  UNION ALL
        |  SELECT 'lineitem.l_orderkey', l_orderkey, COUNT(*) FROM lineitem GROUP BY l_orderkey
        |  UNION ALL
        |  SELECT 'lineitem.l_partkey', l_partkey, COUNT(*) FROM lineitem GROUP BY l_partkey),
        |agg AS (
        |  SELECT key_col, CAST(COUNT(*) AS BIGINT) AS n_keys,
        |         CAST(SUM(f) AS BIGINT) AS n_rows, CAST(MAX(f) AS BIGINT) AS max_freq,
        |         CAST(MAX(f * 1000000000000 + k) % 1000000000000 AS BIGINT) AS heaviest_key
        |  FROM p GROUP BY key_col)
        |SELECT key_col, n_keys, n_rows, max_freq, heaviest_key,
        |       round(max_freq * n_keys / CAST(n_rows AS DOUBLE), 6) AS skew_ratio
        |FROM agg ORDER BY key_col""".stripMargin
  )
}
