package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.{DeterministicSample, Tables}

/**
 * Round-4 fourth wave: data-engineering and analytics completions —
 * weighted deterministic sampling (per-row keep probability on the
 * portable-hash gate), keyed table diff/reconciliation, event-type
 * transition counts (Markov matrix), corpus source-vocabulary
 * similarity, and day-over-day trend change.
 */
object ExtQueries8 {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // weighted deterministic sampling: keep probability proportional to
    // document length (integer permyriad rate — float-free), membership
    // a pure function of the key hash: same selected set on any
    // partitioning/cluster/engine.
    "sample_weighted" -> ((s, dir) => {
      val d = Tables.table(s, dir, "documents")
        .withColumn("rate", least(col("n_chars") * 3, lit(10000L)))
      DeterministicSample.weighted(d, col("doc_id").cast("string"), col("rate"))
        .select(col("doc_id"), col("rate"))
        .orderBy("doc_id")
    }),

    // keyed table diff (reconciliation): current orders vs a
    // deterministically mutated "previous snapshot" (every 31st key
    // re-priced, every 97th absent) — FULL OUTER join on the key,
    // classify added / removed / changed, identical rows suppressed.
    // One co-partitioned shuffle join at any scale.
    "table_diff" -> ((s, dir) => {
      val cur = Tables.table(s, dir, "orders")
        .select(col("o_orderkey").as("k"), col("o_totalprice").as("cur_price"))
      val prev = Tables.table(s, dir, "orders")
        .where(col("o_orderkey") % 97 =!= 0)
        .select(col("o_orderkey").as("k"),
          // additive mutation, not *1.1 + round: scaling lands on
          // half-cent boundaries where Spark's and DuckDB's double
          // rounding can differ by a cent (caught by the sf0.1 gate)
          when(col("o_orderkey") % 31 === 0, col("o_totalprice") + 1000.0)
            .otherwise(col("o_totalprice")).as("prev_price"))
      cur.join(prev, Seq("k"), "full_outer")
        .withColumn("status",
          when(col("prev_price").isNull, "added")
            .when(col("cur_price").isNull, "removed")
            .when(col("cur_price") =!= col("prev_price"), "changed"))
        .where(col("status").isNotNull)
        .select(col("k").as("o_orderkey"), col("status"),
          coalesce(round(col("cur_price"), 2), lit(-1.0)).as("cur_price"),
          coalesce(round(col("prev_price"), 2), lit(-1.0)).as("prev_price"))
        .orderBy("o_orderkey")
    }),

    // event-type transition matrix (first-order Markov counts): lag of
    // event_type per user in event order, counted per (from, to) pair.
    "event_transitions" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      Tables.events(s, dir)
        .withColumn("from_type", lag(col("event_type"), 1).over(w))
        .where(col("from_type").isNotNull)
        .groupBy(col("from_type"), col("event_type").as("to_type"))
        .agg(count(lit(1)).as("n"))
        .orderBy("from_type", "to_type")
    }),

    // corpus source similarity: vocabulary Jaccard between every source
    // pair via the word inverted index (distinct (source, word) posting
    // self-join — at web scale the join would be df-capped like
    // dedup_ngram_capped; source count is tiny by construction).
    "source_similarity" -> ((s, dir) => {
      val sw = Tables.table(s, dir, "documents")
        .select(col("source"), explode(split(col("text"), " ")).as("word"))
        .distinct()
      val sizes = sw.groupBy("source").agg(count(lit(1)).as("n"))
      val inter = sw.select(col("source").as("src_a"), col("word"))
        .join(sw.select(col("source").as("src_b"), col("word")), Seq("word"))
        .where(col("src_a") < col("src_b"))
        .groupBy("src_a", "src_b").agg(count(lit(1)).as("i"))
      inter
        .join(broadcast(sizes.withColumnRenamed("source", "src_a")
          .withColumnRenamed("n", "na")), Seq("src_a"))
        .join(broadcast(sizes.withColumnRenamed("source", "src_b")
          .withColumnRenamed("n", "nb")), Seq("src_b"))
        .select(col("src_a"), col("src_b"),
          round(col("i").cast("double") / (col("na") + col("nb") - col("i")), 4)
            .as("jaccard"))
        .orderBy("src_a", "src_b")
    }),

    // windowed audio-energy stub: 32-byte synthetic "PCM" payloads ->
    // 4 windows of 8 bytes, exact integer energy per window — the
    // fixed-frame audio feature-extraction shape (batched
    // per-partition, windows fan out, payloads never shuffle).
    "media_audio_energy_stub" -> ((s, dir) =>
      graft.operators.Multimodal.audioEnergy(
        graft.operators.Multimodal.pcmTable(
          Tables.table(s, dir, "documents").where(col("doc_id") % 5 === 3)), 8)
        .toDF()
        .orderBy("doc_id", "win_idx")),

    // day-over-day change: daily event counts + percent change vs the
    // previous day. The trend window is over the 30-row daily AGGREGATE
    // (day cardinality, not event cardinality) — a single partition of
    // days is the correct plan at any event volume.
    "daily_wow_change" -> ((s, dir) => {
      val w = Window.orderBy(col("d"))
      Tables.events(s, dir)
        .groupBy(to_date(col("ts")).as("d"))
        .agg(count(lit(1)).as("n"))
        .withColumn("prev", lag(col("n"), 1).over(w))
        .select(date_format(col("d"), "yyyy-MM-dd").as("day"), col("n"),
          coalesce(round((col("n") - col("prev")).cast("double") / col("prev") * 100, 2),
            lit(0.0)).as("pct_change"))
        .orderBy("day")
    })
  )

  def oracleSql: Map[String, String] = Map(

    "sample_weighted" -> {
      val gate = DeterministicSample.weightedGateSql(
        "CAST(doc_id AS VARCHAR)", "LEAST(n_chars * 3, 10000)")
      s"""SELECT doc_id, CAST(LEAST(n_chars * 3, 10000) AS BIGINT) AS rate
         |FROM documents WHERE $gate ORDER BY doc_id""".stripMargin
    },

    "table_diff" ->
      """WITH cur AS (SELECT o_orderkey AS k, o_totalprice AS cur_price FROM orders),
        |prev AS (SELECT o_orderkey AS k,
        |           CASE WHEN o_orderkey % 31 = 0 THEN o_totalprice + 1000.0
        |                ELSE o_totalprice END AS prev_price
        |         FROM orders WHERE o_orderkey % 97 <> 0),
        |j AS (SELECT COALESCE(cur.k, prev.k) AS k, cur_price, prev_price,
        |        CASE WHEN prev_price IS NULL THEN 'added'
        |             WHEN cur_price IS NULL THEN 'removed'
        |             WHEN cur_price <> prev_price THEN 'changed' END AS status
        |      FROM cur FULL OUTER JOIN prev ON cur.k = prev.k)
        |SELECT k AS o_orderkey, status,
        |  COALESCE(round(cur_price, 2), -1.0) AS cur_price,
        |  COALESCE(round(prev_price, 2), -1.0) AS prev_price
        |FROM j WHERE status IS NOT NULL ORDER BY o_orderkey""".stripMargin,

    "event_transitions" ->
      """WITH l AS (SELECT user_id, event_type,
        |             LAG(event_type) OVER (PARTITION BY user_id
        |               ORDER BY ts, event_id) AS from_type
        |           FROM events)
        |SELECT from_type, event_type AS to_type, CAST(COUNT(*) AS BIGINT) AS n
        |FROM l WHERE from_type IS NOT NULL
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "source_similarity" ->
      """WITH sw AS (SELECT DISTINCT source, UNNEST(string_split(text, ' ')) AS word
        |            FROM documents),
        |sz AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n FROM sw GROUP BY 1),
        |i AS (SELECT a.source AS src_a, b.source AS src_b, CAST(COUNT(*) AS BIGINT) AS i
        |      FROM sw a JOIN sw b ON a.word = b.word AND a.source < b.source
        |      GROUP BY 1, 2)
        |SELECT i.src_a, i.src_b,
        |  round(CAST(i.i AS DOUBLE) / (za.n + zb.n - i.i), 4) AS jaccard
        |FROM i JOIN sz za ON i.src_a = za.source
        |JOIN sz zb ON i.src_b = zb.source
        |ORDER BY src_a, src_b""".stripMargin,

    // independent byte-level derivation from the same md5 hex
    "media_audio_energy_stub" ->
      """WITH m AS (SELECT doc_id, md5(text) || md5(text || 'x') AS hx
        |           FROM documents WHERE doc_id % 5 = 3),
        |b AS (SELECT doc_id,
        |        [CAST(('0x' || substr(hx, 2*i - 1, 2)) AS BIGINT) for i in range(1, 33)] AS by
        |      FROM m),
        |e AS (SELECT doc_id, CAST((j - 1) // 8 AS INT) AS win_idx,
        |        by[CAST(j AS INT)] * by[CAST(j AS INT)] AS sq
        |      FROM b, UNNEST(range(1, 33)) r(j))
        |SELECT doc_id, win_idx, CAST(SUM(sq) AS BIGINT) AS energy
        |FROM e GROUP BY doc_id, win_idx ORDER BY doc_id, win_idx""".stripMargin,

    "daily_wow_change" ->
      """WITH d AS (SELECT CAST(ts AS DATE) AS d, CAST(COUNT(*) AS BIGINT) AS n
        |           FROM events GROUP BY 1),
        |l AS (SELECT d, n, LAG(n) OVER (ORDER BY d) AS prev FROM d)
        |SELECT strftime(d, '%Y-%m-%d') AS day, n,
        |  COALESCE(round(CAST(n - prev AS DOUBLE) / prev * 100, 2), 0.0) AS pct_change
        |FROM l ORDER BY day""".stripMargin
  )
}
