package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.operators.{Multimodal, Tables}
import graft.streaming.StreamingOps

/**
 * Round-2 surface widening, part 2: correlated subqueries (scalar /
 * EXISTS / NOT EXISTS / IN — Catalyst decorrelates all of them into
 * joins), lateral joins (per-row top-N, the SQL form of a keyed heap),
 * streaming deduplication with watermark-bounded state, and the
 * multimodal resize stub (binary -> binary transform on the media
 * plumbing).
 *
 * Scale posture: every subquery here decorrelates to a hash join +
 * aggregate — no per-row re-execution; `.explain` shows plain joins.
 * Streaming dedup keeps at most one state row per key, evicted when the
 * watermark passes the key's event time.
 */
object ExtQueries3 {

  private def view(s: SparkSession, dir: String, name: String): String = {
    val v = s"${name}_sq"
    Tables.table(s, dir, name).createOrReplaceTempView(v)
    v
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // correlated scalar subqueries: COUNT (the classic "count bug" case —
    // must yield 0, not NULL, for customers with no orders) and MAX with
    // a sentinel default. Decorrelates to a left outer join + aggregate.
    "subquery_scalar" -> ((s, dir) => {
      val c = view(s, dir, "customer"); val o = view(s, dir, "orders")
      s.sql(
        s"""SELECT c_custkey,
           |  (SELECT COUNT(*) FROM $o o WHERE o.o_custkey = c.c_custkey) AS n_orders,
           |  (SELECT COALESCE(MAX(o_totalprice), -1.0) FROM $o o
           |    WHERE o.o_custkey = c.c_custkey) AS max_price
           |FROM $c c
           |ORDER BY c_custkey""".stripMargin)
    }),

    // EXISTS / NOT EXISTS / IN in one predicate — all three decorrelate
    // to semi/anti joins (same physical shape as join_semi/join_anti,
    // but arrived at via Catalyst's subquery rewrite).
    "subquery_exists" -> ((s, dir) => {
      val c = view(s, dir, "customer"); val o = view(s, dir, "orders")
      val n = view(s, dir, "nation")
      s.sql(
        s"""SELECT c_custkey, c_nationkey
           |FROM $c c
           |WHERE EXISTS (SELECT 1 FROM $o o
           |        WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')
           |  AND NOT EXISTS (SELECT 1 FROM $o o2
           |        WHERE o2.o_custkey = c.c_custkey
           |          AND o2.o_orderpriority = '1-URGENT')
           |  AND c_nationkey IN (SELECT n_nationkey FROM $n WHERE n_regionkey <= 2)
           |ORDER BY c_custkey""".stripMargin)
    }),

    // lateral join: per-customer top-2 orders by price. The relational
    // form of the bounded per-key heap (reference #14) — Spark plans the
    // correlated LIMIT subquery as a partitioned rank, not a per-row
    // re-execution.
    "join_lateral" -> ((s, dir) => {
      val c = view(s, dir, "customer"); val o = view(s, dir, "orders")
      s.sql(
        s"""SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
           |FROM $c c,
           |  LATERAL (SELECT o_orderkey, o_totalprice FROM $o o
           |           WHERE o.o_custkey = c.c_custkey
           |           ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
           |ORDER BY c_custkey, o_orderkey""".stripMargin)
    }),

    // streaming dedup: dropDuplicatesWithinWatermark keeps one state row
    // per (user_id, event_type), evicted once the watermark passes —
    // bounded state however long the stream runs. Drained AvailableNow,
    // the kept set is exactly the distinct keys.
    "stream_dedup" -> ((s, dir) => StreamingOps.withStreamWidth(s, dir) {
      val deduped = StreamingOps.eventsStream(s, dir)
        .withWatermark("ts", "0 seconds")
        .dropDuplicatesWithinWatermark("user_id", "event_type")
        .select(col("user_id"), col("event_type"))
      StreamingOps.runToMemory(deduped, s"sdedup_${System.nanoTime()}",
          OutputMode.Append())
        .orderBy(col("user_id"), col("event_type"))
    }),

    // approximate percentiles (KLL-style sketch, mergeable across
    // partitions — the percentile operator that scales where exact
    // percentile_agg's full sort-by-key does not). The sketch VALUE is
    // engine-specific, so the oracle-checkable output is its CONTRACT:
    // accuracy=10000 bounds rank error at n/10000, far inside the
    // ±0.001-quantile band checked here (flags must be 1; the exact
    // band edges come from the same one-pass aggregation).
    // ExtOperatorsSpec keeps the direct rank-error check on the values.
    "approx_percentile" -> ((s, dir) =>
      Tables.table(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          percentile_approx(col("l_extendedprice"), lit(0.5), lit(10000)).as("ap50"),
          percentile_approx(col("l_extendedprice"), lit(0.95), lit(10000)).as("ap95"),
          expr("percentile(l_extendedprice, 0.499)").as("lo50"),
          expr("percentile(l_extendedprice, 0.501)").as("hi50"),
          expr("percentile(l_extendedprice, 0.949)").as("lo95"),
          expr("percentile(l_extendedprice, 0.951)").as("hi95"),
          count(lit(1)).as("n"))
        .select(col("l_returnflag"), col("n"),
          when(col("ap50").between(col("lo50"), col("hi50")), 1).otherwise(0).as("p50_in_band"),
          when(col("ap95").between(col("lo95"), col("hi95")), 1).otherwise(0).as("p95_in_band"))
        .orderBy(col("l_returnflag"))),

    // df-capped inverted index — THE n-gram near-dup plan for web-scale
    // corpora: shingles with df > maxDf are dropped from candidate
    // generation (their join fan-out is df^2; the stop set, bounded by
    // N/maxDf entries, is what gets broadcast), while Jaccard is still
    // computed over the FULL shingle sets via the native sorted-merge
    // intersect — every emitted pair is exact.
    "dedup_ngram_capped" -> ((s, dir) =>
      graft.operators.Dedup.jaccardPairs(
        graft.operators.Dedup.ngramShingles(Tables.table(s, dir, "documents"), 3),
        0.1, maxDf = 5)
        .orderBy(col("doc_a"), col("doc_b"))),

    // multimodal resize: binary -> binary stride-2 downsample STUB on the
    // payload column (real plumbing: batched per-partition transform, no
    // shuffle touches payloads), then feature-extract the resized bytes.
    "media_resize_stub" -> ((s, dir) => {
      val media = Multimodal.mediaTable(Tables.table(s, dir, "documents"))
      Multimodal.extractFeatures(Multimodal.resize(media, 2)).toDF()
        .orderBy(col("doc_id"))
    })
  )

  def oracleSql: Map[String, String] = Map(
    // the sketch contract is the oracle: group sizes from SQL, and both
    // in-band flags must be 1 for every group
    "approx_percentile" ->
      """SELECT l_returnflag, COUNT(*) AS n, 1 AS p50_in_band, 1 AS p95_in_band
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "subquery_scalar" ->
      """SELECT c_custkey,
        |  (SELECT COUNT(*) FROM orders o WHERE o.o_custkey = c.c_custkey) AS n_orders,
        |  (SELECT COALESCE(MAX(o_totalprice), -1.0) FROM orders o
        |    WHERE o.o_custkey = c.c_custkey) AS max_price
        |FROM customer c
        |ORDER BY c_custkey""".stripMargin,

    "subquery_exists" ->
      """SELECT c_custkey, c_nationkey
        |FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |        WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')
        |  AND NOT EXISTS (SELECT 1 FROM orders o2
        |        WHERE o2.o_custkey = c.c_custkey
        |          AND o2.o_orderpriority = '1-URGENT')
        |  AND c_nationkey IN (SELECT n_nationkey FROM nation WHERE n_regionkey <= 2)
        |ORDER BY c_custkey""".stripMargin,

    "join_lateral" ->
      """SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
        |FROM customer c,
        |  LATERAL (SELECT o_orderkey, o_totalprice FROM orders o
        |           WHERE o.o_custkey = c.c_custkey
        |           ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
        |ORDER BY c_custkey, o_orderkey""".stripMargin,

    "stream_dedup" ->
      """SELECT DISTINCT user_id, event_type FROM events
        |ORDER BY user_id, event_type""".stripMargin,

    "dedup_ngram_capped" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS wd FROM documents),
        |w AS (
        |  SELECT DISTINCT doc_id, wd[i] || ' ' || wd[i+1] || ' ' || wd[i+2] AS word
        |  FROM t, UNNEST(range(1, len(wd) - 1)) AS r(i)),
        |stop AS (SELECT word FROM w GROUP BY word HAVING COUNT(*) > 5),
        |idx AS (SELECT * FROM w WHERE word NOT IN (SELECT word FROM stop)),
        |cand AS (
        |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM idx a JOIN idx b ON a.word = b.word AND a.doc_id < b.doc_id),
        |n AS (SELECT doc_id, COUNT(*) AS n_w FROM w GROUP BY doc_id),
        |common AS (
        |  SELECT c.doc_a, c.doc_b, COUNT(*) AS n_common
        |  FROM cand c
        |  JOIN w wa ON wa.doc_id = c.doc_a
        |  JOIN w wb ON wb.doc_id = c.doc_b AND wb.word = wa.word
        |  GROUP BY c.doc_a, c.doc_b),
        |j AS (
        |  SELECT doc_a, doc_b,
        |         n_common * 1.0 / (na.n_w + nb.n_w - n_common) AS jac
        |  FROM common
        |  JOIN n na ON na.doc_id = doc_a
        |  JOIN n nb ON nb.doc_id = doc_b)
        |SELECT doc_a, doc_b, ROUND(jac, 4) AS jaccard FROM j
        |WHERE jac >= 0.1 ORDER BY doc_a, doc_b""".stripMargin,

    // resized payload = md5 bytes at odd 1-indexed positions (stride-2
    // downsample of the 16-byte fake image -> 8 bytes); features follow
    // Multimodal.decodeStub on the 8-byte payload (frame stride = len/4 = 2).
    "media_resize_stub" ->
      """WITH m AS (SELECT doc_id, md5(text) AS hx FROM documents),
        |b AS (
        |  SELECT doc_id,
        |         [CAST(('0x' || substr(hx, 2*i - 1, 2)) AS INT)
        |          for i in [1, 3, 5, 7, 9, 11, 13, 15]] AS bytes
        |  FROM m)
        |SELECT doc_id, bytes[1] + 1 AS width, bytes[2] + 1 AS height,
        |       CAST(list_sum(bytes) AS BIGINT) AS sum_bytes, 4 AS n_frames,
        |       CAST(bytes[1] AS BIGINT) * 16777216 + bytes[3] * 65536 +
        |         bytes[5] * 256 + bytes[7] AS frame_sig
        |FROM b ORDER BY doc_id""".stripMargin
  )
}
