package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.operators.{Similarity, Tables}

/**
 * Round-4 second wave: the event-analytics and retrieval surface a
 * training-data platform runs next to the co-occurrence pipeline —
 * gap-based sessionization, funnel conversion, cohort retention,
 * CDC latest-by-key compaction, SCD2 validity intervals, an inverted
 * term index, BM25 relevance scoring, token-distribution entropy,
 * equi-depth quantile binning, vector-quantization codebook
 * assignment, time-interval rolling windows, MAD robust outliers,
 * extended array scalars, and a foreachBatch streaming upsert sink.
 *
 * Scale posture notes (per query, also in COVERAGE.md):
 *  - sessionize/cdc/scd2 are per-key windows — partition by the key,
 *    never a global sort;
 *  - quantile_bins replaces ntile's global sort with exact percentile
 *    boundaries (one tiny agg, broadcast) + a codegen'd HOF bin probe;
 *  - vq_assign broadcasts the codebook (tiny by construction) and the
 *    distance is the exact-integer quantized form (LongArrayDot), so
 *    assignment is engine/partition-portable;
 *  - bm25/entropy sum doubles through DECIMAL after an 1e-6/1e-8
 *    round so the aggregation is order-independent (float discipline,
 *    SparkEntry header).
 */
object ExtQueries6 {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // gap-based sessionization (30-min inactivity): the batch form of
    // session windows — lag to mark session breaks, running sum to
    // number them, then per-session stats. All windows are keyed by
    // user_id; nothing global. Break at gap >= 30 min — the SAME
    // boundary contract as session_window (windowed_session) and
    // SessionProcessor (stream_session_timers): a session stays open
    // only while successor events land STRICTLY inside lastTs + gap.
    "sessionize_batch" -> ((s, dir) => {
      val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val running = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.events(s, dir)
        .withColumn("tus", expr("unix_micros(ts)"))
        .withColumn("prev", lag(col("tus"), 1).over(byUser))
        .withColumn("brk",
          when(col("prev").isNull || col("tus") - col("prev") >= 1800L * 1000000L, 1L)
            .otherwise(0L))
        .withColumn("session_id", sum(col("brk")).over(running))
        .groupBy(col("user_id"), col("session_id"))
        .agg(count(lit(1)).as("n_events"),
          date_format(min(col("ts")), "yyyy-MM-dd HH:mm:ss").as("session_start"),
          date_format(max(col("ts")), "yyyy-MM-dd HH:mm:ss").as("session_end"))
        .orderBy(col("user_id"), col("session_id"))
    }),

    // ordered funnel conversion: users who viewed, then clicked
    // strictly after their first view, then purchased strictly after
    // that first qualifying click. Three keyed aggs chained by joins —
    // each stage's output is per-user (≤ one row), so the joins stay
    // small and broadcastable downstream.
    "funnel_steps" -> ((s, dir) => {
      val e = Tables.events(s, dir).select(col("user_id"), col("event_type"), col("ts"))
      val t1 = e.where(col("event_type") === "view")
        .groupBy("user_id").agg(min(col("ts")).as("t1"))
      val t2 = e.where(col("event_type") === "click").join(t1, "user_id")
        .where(col("ts") > col("t1"))
        .groupBy("user_id").agg(min(col("ts")).as("t2"))
      val t3 = e.where(col("event_type") === "purchase").join(t2, "user_id")
        .where(col("ts") > col("t2"))
        .groupBy("user_id").agg(min(col("ts")).as("t3"))
      t1.agg(count(lit(1)).as("viewed"))
        .crossJoin(t2.agg(count(lit(1)).as("clicked")))
        .crossJoin(t3.agg(count(lit(1)).as("purchased")))
    }),

    // cohort retention: users grouped by first-activity day, retention
    // counted as distinct active users per (cohort, day offset). Two
    // hash aggs + one equi-join on user_id.
    "cohort_retention" -> ((s, dir) => {
      val d = Tables.events(s, dir)
        .select(col("user_id"), to_date(col("ts")).as("d")).distinct()
      val first = d.groupBy("user_id").agg(min(col("d")).as("cohort"))
      d.join(first, "user_id")
        .groupBy(date_format(col("cohort"), "yyyy-MM-dd").as("cohort_day"),
          datediff(col("d"), col("cohort")).as("day_offset"))
        .agg(countDistinct(col("user_id")).as("n_users"))
        .orderBy(col("cohort_day"), col("day_offset"))
    }),

    // CDC latest-by-key compaction (upsert semantics): newest event per
    // (user, event_type) by (ts, event_id) — the keep-latest pass every
    // changelog ingestion runs. Keyed window rank; with cardinality(key)
    // << rows this is the textbook max_by shape, kept as row_number to
    // preserve the full row without a struct round-trip.
    "cdc_latest" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id"), col("event_type"))
        .orderBy(col("ts").desc, col("event_id").desc)
      Tables.events(s, dir)
        .withColumn("rn", row_number().over(w))
        .where(col("rn") === 1)
        .select(col("user_id"), col("event_type"),
          col("event_id").as("last_event"), col("value").as("last_value"))
        .orderBy(col("user_id"), col("event_type"))
    }),

    // SCD2 validity intervals: each purchase's value holds from its ts
    // until the user's next purchase (open intervals closed by a
    // sentinel) — the slowly-changing-dimension build. lead() over the
    // user partition only.
    "scd2_intervals" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      Tables.events(s, dir)
        .where(col("event_type") === "purchase" && col("user_id") % 10 === 0)
        .select(col("user_id"), col("event_id"), col("ts"), col("value"))
        .withColumn("vt", lead(col("ts"), 1).over(w))
        .select(col("user_id"), col("event_id"),
          date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("valid_from"),
          coalesce(date_format(col("vt"), "yyyy-MM-dd HH:mm:ss"),
            lit("9999-12-31 00:00:00")).as("valid_to"),
          col("value"))
        .orderBy(col("user_id"), col("event_id"))
    }),

    // inverted term index: term -> document frequency + first postings
    // (sorted doc ids, truncated) for terms above a df floor. The
    // distinct (doc, term) explode is the posting list build; collect
    // per term is bounded by the truncation downstream, df by the
    // explode's dedup.
    "inverted_index" -> ((s, dir) =>
      Tables.table(s, dir, "documents")
        .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
        .distinct()
        .groupBy(col("term"))
        .agg(count(lit(1)).as("df"),
          array_join(
            transform(slice(array_sort(collect_list(col("doc_id"))), 1, 5),
              x => x.cast("string")), ",").as("first_docs"))
        .where(col("df") >= 20)
        .orderBy(col("term"))),

    // BM25 (k1=1.2, b=0.75, Lucene idf) over a fixed query-term set:
    // df/avgdl are tiny aggregates (broadcast); per-term scores are
    // rounded to 1e-8 and summed through DECIMAL so the per-doc total
    // is order-independent; rank on the rounded score with doc_id
    // tiebreak (float discipline).
    "text_bm25" -> ((s, dir) => {
      val tokens = Tables.table(s, dir, "documents")
        .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
      val dl = tokens.groupBy("doc_id").agg(count(lit(1)).as("dl"))
      val stats = dl.agg(count(lit(1)).as("n_docs"), avg(col("dl")).as("avgdl"))
      val tf = tokens
        .where(col("term").isin("key", "value", "table", "row", "scan"))
        .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
      val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
      tf.join(broadcast(df), "term").join(dl, "doc_id").crossJoin(broadcast(stats))
        .withColumn("idf",
          log((col("n_docs") - col("df") + 0.5) / (col("df") + 0.5) + 1.0))
        .withColumn("tscore",
          col("idf") * col("tf") * 2.2 /
            (col("tf") + lit(1.2) * (lit(0.25) + lit(0.75) * col("dl") / col("avgdl"))))
        .groupBy("doc_id")
        .agg(round(sum(round(col("tscore"), 8).cast(DecimalType(20, 8)))
          .cast("double"), 4).as("bm25"))
        .orderBy(col("bm25").desc, col("doc_id")).limit(20)
        .orderBy(col("doc_id"))
    }),

    // unigram-distribution entropy per doc (quality signal: low entropy
    // = repetitive/keyword-stuffed): H = ln(n) - (Σ c·ln c)/n, in bits.
    // The Σ c·ln c partial sums ride the 1e-6 decimal grid.
    "text_entropy" -> ((s, dir) =>
      Tables.table(s, dir, "documents")
        .where(col("doc_id") % 5 === 0)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
        .groupBy("doc_id", "w").agg(count(lit(1)).as("c"))
        .groupBy("doc_id")
        .agg(sum(col("c")).as("n"),
          sum(round(col("c") * log(col("c")), 6).cast(DecimalType(24, 6))).as("s"))
        .select(col("doc_id"), col("n"),
          round((log(col("n")) - col("s").cast("double") / col("n")) / log(lit(2.0)),
            4).as("entropy_bits"))
        .orderBy("doc_id")),

    // equi-depth decile binning WITHOUT a global sort: exact
    // interpolated percentile boundaries (one scalar agg, broadcast)
    // + a codegen'd HOF probe per row. The ntile-by-sort alternative
    // single-partitions at scale; this shape doesn't.
    "quantile_bins" -> ((s, dir) => {
      val orders = Tables.table(s, dir, "orders")
      val bounds = orders.agg(expr(
        "percentile(o_totalprice, array(0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9))")
        .as("bounds"))
      orders.crossJoin(broadcast(bounds))
        .select(col("o_totalprice"),
          (size(filter(col("bounds"), b => col("o_totalprice") > b)) + 1).as("bin"))
        .groupBy("bin")
        .agg(count(lit(1)).as("n"),
          round(min(col("o_totalprice")), 2).as("lo"),
          round(max(col("o_totalprice")), 2).as("hi"))
        .orderBy("bin")
    }),

    // vector-quantization codebook assignment (the k-means / PQ assign
    // step): every vector to its nearest codeword by exact integer
    // L2² on the quantized grid (|x|² + |c|² − 2x·c, LongArrayDot),
    // codebook broadcast, argmin via struct-min — deterministic at any
    // parallelism.
    "vq_assign" -> ((s, dir) => {
      val emb = Tables.table(s, dir, "embeddings")
        .select(col("vec_id"), Similarity.quantize(col("embedding")).as("qv"))
      val codes = emb.where(col("vec_id") % 64 === 0)
        .select(col("vec_id").as("code_id"), col("qv").as("cv"))
      val d2 = Similarity.dotQ(col("qv"), col("qv")) +
        Similarity.dotQ(col("cv"), col("cv")) -
        lit(2L) * Similarity.dotQ(col("qv"), col("cv"))
      // argmin as min(ONE long): struct-ordered min/min_by both fall
      // back to SortAggregate (struct buffers aren't hash-aggregable),
      // which sorts the 8x-corpus join output on both shuffle sides.
      // Packing (dist2, dense code index) into a single long keeps the
      // whole aggregation in HashAggregate: dist2 <= 64*(2e6)^2 needs
      // 48 bits, the dense index (vec_id DIV 64 here) gets 13 —
      // codebooks are <= 4k codewords in practice (PQ uses 256).
      // min(packed) == lexicographic (dist2, code_id) min, ties broken
      // identically because the index is monotone in code_id.
      emb.crossJoin(broadcast(codes))
        .select(col("vec_id"), expr("code_id DIV 64").as("cidx"), d2.as("d2"))
        // fail fast instead of silently corrupting the min if the data
        // outgrows the packing (index bleeding into distance bits /
        // Long overflow); assert_true lives in a filter so the check
        // cannot be pruned away as an unused column
        .where(assert_true(col("cidx") < 8192L && col("d2") < lit(1L << 50),
          lit("vq_assign packed-argmin bounds exceeded: need codeIndex < 2^13 and dist2 < 2^50"))
          .isNull)
        .select(col("vec_id"), (col("d2") * 8192L + col("cidx")).as("packed"))
        .groupBy("vec_id")
        .agg(min(col("packed")).as("p"))
        .select(col("vec_id"),
          (col("p") % 8192L * 64L).as("code_id"),
          expr("p DIV 8192").as("dist2"))
        .orderBy("vec_id")
    }),

    // time-interval rolling window (RANGE frame over epoch seconds):
    // trailing 1-hour event count + exact quantized value sum per user
    // — the value-range frame keyed per user, no global ordering.
    "window_time_range" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("tsec"))
        .rangeBetween(-3600L, 0L)
      Tables.events(s, dir)
        .where(col("user_id") % 5 === 1)
        .withColumn("tsec", expr("unix_micros(ts) DIV 1000000"))
        .withColumn("q", round(col("value") * 10000).cast("long"))
        .select(col("event_id"), col("user_id"),
          count(lit(1)).over(w).as("n_1h"),
          sum(col("q")).over(w).as("sum_q"))
        .orderBy("event_id")
    }),

    // robust outlier detection: median + MAD per event_type (exact
    // interpolated percentiles), outliers = |x − med| > 3·MAD. The
    // percentile results are tiny per-group rows — broadcast back; the
    // comparison arithmetic is plain IEEE, identical cross-engine.
    "robust_outliers" -> ((s, dir) => {
      val e = Tables.events(s, dir).select(col("event_type"), col("value"))
      val med = e.groupBy("event_type").agg(expr("percentile(value, 0.5)").as("med"))
      val dev = e.join(broadcast(med), "event_type")
        .withColumn("absdev", abs(col("value") - col("med")))
      val mad = dev.groupBy("event_type").agg(expr("percentile(absdev, 0.5)").as("mad"))
      dev.join(broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          sum(when(col("absdev") > col("mad") * 3.0, 1L).otherwise(0L)).as("n_outliers"),
          round(min(col("med")), 4).as("med"),
          round(min(col("mad")), 4).as("mad"))
        .orderBy("event_type")
    }),

    // extended array scalars: position, safe indexing, slicing,
    // reversal, flatten, repeat — all codegen'd collection
    // expressions, no explode.
    "scalar_array2" -> ((s, dir) =>
      Tables.table(s, dir, "documents")
        .where(col("doc_id") % 25 === 2)
        .select(col("doc_id"), col("lang"), split(col("text"), " ").as("wds"))
        .select(col("doc_id"),
          array_position(col("wds"), "key").as("pos_key"),
          expr("try_element_at(wds, 3)").as("third"),
          array_join(slice(col("wds"), 2, 3), ",").as("mid"),
          size(array_distinct(col("wds"))).as("n_uniq"),
          array_join(reverse(slice(col("wds"), 1, 3)), ",").as("rev3"),
          array_join(array_repeat(col("lang"), 2), "-").as("lang2"),
          array_join(flatten(array(slice(col("wds"), 1, 2), array(col("lang")))),
            " ").as("flat"))
        .orderBy("doc_id")),

    // streaming upsert sink: foreachBatch keep-latest-per-user merge,
    // each microbatch pre-reduced (distributed max_by) then written to
    // a batchId-keyed path — overwrite on retry = exactly-once. Final
    // read compacts across batches.
    "stream_upsert_latest" -> ((s, dir) =>
      graft.streaming.StreamingOps.streamUpsertLatest(s, dir))
  )

  def oracleSql: Map[String, String] = Map(

    "sessionize_batch" ->
      """WITH o AS (SELECT user_id, event_id, ts, epoch_us(ts) AS tus,
        |             LAG(epoch_us(ts)) OVER (PARTITION BY user_id
        |               ORDER BY ts, event_id) AS prev
        |           FROM events),
        |f AS (SELECT *, CASE WHEN prev IS NULL OR tus - prev >= 1800000000
        |                     THEN 1 ELSE 0 END AS brk FROM o),
        |s AS (SELECT *, SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid FROM f)
        |SELECT user_id, CAST(sid AS BIGINT) AS session_id,
        |  CAST(COUNT(*) AS BIGINT) AS n_events,
        |  strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
        |  strftime(MAX(ts), '%Y-%m-%d %H:%M:%S') AS session_end
        |FROM s GROUP BY user_id, sid ORDER BY user_id, session_id""".stripMargin,

    "funnel_steps" ->
      """WITH t1 AS (SELECT user_id, MIN(ts) AS t1 FROM events
        |            WHERE event_type = 'view' GROUP BY 1),
        |t2 AS (SELECT e.user_id, MIN(e.ts) AS t2 FROM events e
        |       JOIN t1 ON e.user_id = t1.user_id
        |       WHERE e.event_type = 'click' AND e.ts > t1.t1 GROUP BY 1),
        |t3 AS (SELECT e.user_id, MIN(e.ts) AS t3 FROM events e
        |       JOIN t2 ON e.user_id = t2.user_id
        |       WHERE e.event_type = 'purchase' AND e.ts > t2.t2 GROUP BY 1)
        |SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM t1) AS viewed,
        |       (SELECT CAST(COUNT(*) AS BIGINT) FROM t2) AS clicked,
        |       (SELECT CAST(COUNT(*) AS BIGINT) FROM t3) AS purchased""".stripMargin,

    "cohort_retention" ->
      """WITH d AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
        |f AS (SELECT user_id, MIN(d) AS cohort FROM d GROUP BY 1)
        |SELECT strftime(f.cohort, '%Y-%m-%d') AS cohort_day,
        |       CAST(datediff('day', f.cohort, d.d) AS INT) AS day_offset,
        |       CAST(COUNT(DISTINCT d.user_id) AS BIGINT) AS n_users
        |FROM d JOIN f ON d.user_id = f.user_id
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "cdc_latest" ->
      """WITH r AS (SELECT user_id, event_type, event_id, value,
        |             ROW_NUMBER() OVER (PARTITION BY user_id, event_type
        |               ORDER BY ts DESC, event_id DESC) AS rn
        |           FROM events)
        |SELECT user_id, event_type, event_id AS last_event, value AS last_value
        |FROM r WHERE rn = 1 ORDER BY user_id, event_type""".stripMargin,

    "scd2_intervals" ->
      """WITH p AS (SELECT user_id, event_id, ts, value FROM events
        |           WHERE event_type = 'purchase' AND user_id % 10 = 0),
        |l AS (SELECT *, LEAD(ts) OVER (PARTITION BY user_id
        |        ORDER BY ts, event_id) AS vt FROM p)
        |SELECT user_id, event_id,
        |  strftime(ts, '%Y-%m-%d %H:%M:%S') AS valid_from,
        |  COALESCE(strftime(vt, '%Y-%m-%d %H:%M:%S'), '9999-12-31 00:00:00') AS valid_to,
        |  value
        |FROM l ORDER BY user_id, event_id""".stripMargin,

    "inverted_index" ->
      """WITH p AS (SELECT DISTINCT doc_id, UNNEST(string_split(text, ' ')) AS term
        |           FROM documents)
        |SELECT term, CAST(COUNT(*) AS BIGINT) AS df,
        |  array_to_string(list_transform((list_sort(list(doc_id)))[1:5],
        |    x -> CAST(x AS VARCHAR)), ',') AS first_docs
        |FROM p GROUP BY term HAVING COUNT(*) >= 20 ORDER BY term""".stripMargin,

    "text_bm25" ->
      """WITH tok AS (SELECT doc_id, UNNEST(string_split(text, ' ')) AS term FROM documents),
        |dl AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dl FROM tok GROUP BY 1),
        |st AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs, AVG(dl) AS avgdl FROM dl),
        |tf AS (SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf FROM tok
        |       WHERE term IN ('key','value','table','row','scan') GROUP BY 1, 2),
        |df AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY 1),
        |sc AS (SELECT tf.doc_id,
        |         ln((st.n_docs - df.df + 0.5) / (df.df + 0.5) + 1.0) * tf.tf * 2.2 /
        |           (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / st.avgdl)) AS tscore
        |       FROM tf JOIN df ON tf.term = df.term
        |       JOIN dl ON tf.doc_id = dl.doc_id CROSS JOIN st),
        |agg AS (SELECT doc_id,
        |          round(CAST(SUM(CAST(round(tscore, 8) AS DECIMAL(20,8))) AS DOUBLE), 4) AS bm25
        |        FROM sc GROUP BY 1),
        |r AS (SELECT doc_id, bm25,
        |        ROW_NUMBER() OVER (ORDER BY bm25 DESC, doc_id) AS rn FROM agg)
        |SELECT doc_id, bm25 FROM r WHERE rn <= 20 ORDER BY doc_id""".stripMargin,

    "text_entropy" ->
      """WITH w AS (SELECT doc_id, UNNEST(string_split(text, ' ')) AS w
        |           FROM documents WHERE doc_id % 5 = 0),
        |c AS (SELECT doc_id, w, COUNT(*) AS c FROM w GROUP BY 1, 2),
        |d AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n,
        |        SUM(CAST(round(c * ln(c), 6) AS DECIMAL(24,6))) AS s
        |      FROM c GROUP BY doc_id)
        |SELECT doc_id, n,
        |  round((ln(n) - CAST(s AS DOUBLE) / n) / ln(2.0), 4) AS entropy_bits
        |FROM d ORDER BY doc_id""".stripMargin,

    "quantile_bins" ->
      """WITH b AS (SELECT quantile_cont(o_totalprice,
        |             [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]) AS bounds FROM orders)
        |SELECT CAST(len(list_filter(b.bounds, x -> o.o_totalprice > x)) + 1 AS INT) AS bin,
        |       CAST(COUNT(*) AS BIGINT) AS n,
        |       round(MIN(o_totalprice), 2) AS lo,
        |       round(MAX(o_totalprice), 2) AS hi
        |FROM orders o CROSS JOIN b GROUP BY 1 ORDER BY 1""".stripMargin,

    "vq_assign" ->
      """WITH q AS (SELECT vec_id, CAST(i - 1 AS INT) AS dim,
        |             CAST(round(CAST(embedding[i] AS DOUBLE) * 1000000, 0) AS BIGINT) AS qe
        |           FROM embeddings, UNNEST(range(1, len(embedding) + 1)) r(i)),
        |c AS (SELECT vec_id AS code_id, dim, qe AS ce FROM q WHERE vec_id % 64 = 0),
        |d AS (SELECT q.vec_id, c.code_id,
        |        CAST(SUM((q.qe - c.ce) * (q.qe - c.ce)) AS BIGINT) AS dist2
        |      FROM q JOIN c ON q.dim = c.dim GROUP BY 1, 2),
        |a AS (SELECT vec_id, code_id, dist2,
        |        ROW_NUMBER() OVER (PARTITION BY vec_id
        |          ORDER BY dist2, code_id) AS rn FROM d)
        |SELECT vec_id, code_id, dist2 FROM a WHERE rn = 1 ORDER BY vec_id""".stripMargin,

    "window_time_range" ->
      """WITH t AS (SELECT event_id, user_id,
        |             epoch_us(ts) // 1000000 AS tsec,
        |             CAST(round(value * 10000, 0) AS BIGINT) AS q
        |           FROM events WHERE user_id % 5 = 1)
        |SELECT event_id, user_id,
        |  CAST(COUNT(*) OVER w AS BIGINT) AS n_1h,
        |  CAST(SUM(q) OVER w AS BIGINT) AS sum_q
        |FROM t
        |WINDOW w AS (PARTITION BY user_id ORDER BY tsec
        |             RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin,

    "robust_outliers" ->
      """WITH med AS (SELECT event_type, quantile_cont(value, 0.5) AS med
        |             FROM events GROUP BY 1),
        |dev AS (SELECT e.event_type, e.value, m.med,
        |          abs(e.value - m.med) AS absdev
        |        FROM events e JOIN med m ON e.event_type = m.event_type),
        |mad AS (SELECT event_type, quantile_cont(absdev, 0.5) AS mad
        |        FROM dev GROUP BY 1)
        |SELECT d.event_type, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(CASE WHEN d.absdev > m.mad * 3.0 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_outliers,
        |  round(MIN(d.med), 4) AS med, round(MIN(m.mad), 4) AS mad
        |FROM dev d JOIN mad m ON d.event_type = m.event_type
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "scalar_array2" ->
      """WITH d AS (SELECT doc_id, lang, string_split(text, ' ') AS wds
        |           FROM documents WHERE doc_id % 25 = 2)
        |SELECT doc_id,
        |  CAST(COALESCE(list_position(wds, 'key'), 0) AS BIGINT) AS pos_key,
        |  wds[3] AS third,
        |  array_to_string(wds[2:4], ',') AS mid,
        |  CAST(len(list_distinct(wds)) AS INT) AS n_uniq,
        |  array_to_string(list_reverse(wds[1:3]), ',') AS rev3,
        |  lang || '-' || lang AS lang2,
        |  array_to_string(flatten([wds[1:2], [lang]]), ' ') AS flat
        |FROM d ORDER BY doc_id""".stripMargin,

    "stream_upsert_latest" ->
      """WITH r AS (SELECT user_id, event_id, ts, value,
        |             ROW_NUMBER() OVER (PARTITION BY user_id
        |               ORDER BY ts DESC, event_id DESC) AS rn
        |           FROM events)
        |SELECT user_id, strftime(ts, '%Y-%m-%d %H:%M:%S') AS last_ts,
        |       event_id AS last_event, value AS last_value
        |FROM r WHERE rn = 1 ORDER BY user_id""".stripMargin
  )
}
