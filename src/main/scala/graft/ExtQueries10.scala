package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{BpeTrainer, Tables}

/**
 * Round-5 second wave: BPE merge training (the iterative subword-vocab
 * loop, corpus-sized work only in the initial word count), Z-order
 * layout bucketing (the data-layout primitive behind min/max file
 * pruning), and a runtime-bloom-filtered shuffle join (Spark's runtime
 * filter injection, the shuffle-join analogue of partition pruning).
 */
object ExtQueries10 {

  /** Interleave the low 8 bits of x and y (Morton/Z-order curve) —
    * generated once, mirrored verbatim into the DuckDB oracle. */
  private def zInterleave(sparkSide: Boolean): String =
    (0 until 8).map { i =>
      if (sparkSide) s"(shiftleft((shiftright(x, $i) & 1), ${2 * i}) + shiftleft((shiftright(y, $i) & 1), ${2 * i + 1}))"
      else s"((((x >> $i) & 1) << ${2 * i}) + (((y >> $i) & 1) << ${2 * i + 1}))"
    }.mkString("(", " + ", ")")

  /** The bloom-join body WITHOUT materialization — shared by the query
    * (which materializes under the runtime-filter confs) and PlanSpec
    * (which inspects the optimized plan under the same confs). */
  def bloomJoinBody(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.table(s, dir, "orders")
      .where(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"))
    Tables.table(s, dir, "lineitem")
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        sum(col("l_quantity").cast(org.apache.spark.sql.types.DecimalType(20, 4)))
          .cast("double").as("sum_qty"))
      .orderBy(col("l_returnflag"))
  }

  /** Set session confs for the duration of `f`, restoring after. */
  def withConfs[A](s: SparkSession, confs: (String, String)*)(f: => A): A = {
    val prior = confs.map { case (k, _) => k -> s.conf.getOption(k) }
    confs.foreach { case (k, v) => s.conf.set(k, v) }
    try f finally prior.foreach {
      case (k, Some(v)) => s.conf.set(k, v)
      case (k, None) => s.conf.unset(k)
    }
  }

  val bloomConfs: Seq[(String, String)] = Seq(
    "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
    // test-scale thresholds: the prod defaults (10 MB creation / 10 GB
    // application side) key off real data volumes; at sf<=0.1 nothing
    // clears them, so the demo lowers the application floor to 0
    "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
    "spark.sql.optimizer.runtimeFilter.semiJoinReduction.enabled" -> "false",
    "spark.sql.autoBroadcastJoinThreshold" -> "-1") // force the shuffle join the filter exists for

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // BPE merge training, 12 merges: FULLY ORACLED (r13) — the DuckDB
    // oracle below replays the whole merge loop with a recursive CTE
    // (exact integer pair counts, same total-order argmax). BpeSpec
    // additionally cross-checks the sequence against a single-machine
    // reference implementation.
    "bpe_merges" -> ((s, dir) =>
      BpeTrainer.merges(Tables.table(s, dir, "documents"), 12)),

    // BPE encode, self-checked (round-6 verdict item 5): the learned
    // merges aren't SQL-expressible, but their INVARIANTS are exact and
    // hashable — (a) encode()'s per-doc token counts must equal the
    // per-doc row counts of the independently-shaped tokenize() pipeline
    // (hash-agg + broadcast join vs posexplode + per-doc window), and
    // (b) every vocabulary word must round-trip through its merge
    // sequence (concat(subtokens) == word + EndMark). The oracle pins
    // n_docs / n_vocab from the data and requires zero mismatches.
    // BpeSpec still cross-checks the merge sequence itself.
    "bpe_encode" -> ((s, dir) => {
      import s.implicits._
      val docs = Tables.table(s, dir, "documents")
      val ms = BpeTrainer.train(docs, 12)
      val enc = BpeTrainer.encode(docs, ms)
      val tokCounts = BpeTrainer.tokenize(docs, ms)
        .groupBy(col("doc_id")).agg(count(lit(1)).as("n_tok_seq"))
      val d = enc.join(tokCounts, Seq("doc_id"), "full_outer")
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("n_tokens") === col("n_tok_seq"), 1L).otherwise(0L))
            .as("n_docs_count_match"))
      val v = docs.select(explode(split(col("text"), " ")).as("w"))
        .where(col("w") =!= "").distinct().as[String]
        .map(w => (1L,
          if (BpeTrainer.applyMerges(w, ms).mkString("") == w + BpeTrainer.EndMark) 1L else 0L))
        .toDF("one", "ok")
        .agg(sum(col("one")).as("n_vocab"), sum(col("ok")).as("n_vocab_roundtrip"))
      d.crossJoin(v)
    }),

    // BPE token SEQUENCES (doc_id, pos, token) — the model-input form of
    // the tokenizer (r5 verdict #6). Same broadcast vocab-join shape as
    // encode; per-doc position via a doc-partitioned (bounded) window.
    // FULLY ORACLED (r13): the oracle replays the merge loop by
    // recursive CTE, then re-applies the merges per word; BpeSpec also
    // checks per-document equality with direct applyMerges application.
    "bpe_tokenize" -> ((s, dir) => {
      val docs = Tables.table(s, dir, "documents")
      BpeTrainer.tokenize(docs, BpeTrainer.train(docs, 12))
    }),

    // global row numbering WITHOUT the single-partition window: the
    // two-level prefix scan (value-range buckets + driver fold over
    // bucket totals + broadcast-back) assigns contiguous global row
    // numbers over a total order — the scalable ROW_NUMBER() OVER
    // (ORDER BY ...) for offset assignment / record ids at 100 TB.
    "global_rownum" -> ((s, dir) => {
      val li = Tables.table(s, dir, "lineitem")
        .select((col("l_orderkey") * 100 + col("l_linenumber")).as("okey"),
          col("l_orderkey"), col("l_linenumber"), lit(1L).as("one"))
      operators.PrefixScan.runningSumExclusive(li, "okey", "one", "rn0")
        .select(col("l_orderkey"), col("l_linenumber"),
          (col("rn0") + 1).as("rownum"))
        .orderBy(col("rownum"))
    }),

    // recursive CTE (Spark 4 WITH RECURSIVE): transitive closure of the
    // implicit binary tree over part keys (k -> 2k, 2k+1) from root 1 —
    // the BFS/bill-of-materials recursion shape. Linear total work
    // (every part reached once); the <= 4095 key cap bounds the
    // iteration count at 12 (each recursive step pays a full planning
    // round — depth, not volume, is the cost driver). The oracle runs
    // the IDENTICAL recursive SQL in DuckDB.
    "recursive_tree" -> ((s, dir) => {
      Tables.table(s, dir, "part").createOrReplaceTempView("part_v")
      s.sql(
        """WITH RECURSIVE tree(k, depth) AS (
          |  SELECT CAST(1 AS BIGINT), 0
          |  UNION ALL
          |  SELECT c.p_partkey, t.depth + 1
          |  FROM tree t JOIN part_v c
          |    ON (c.p_partkey = t.k * 2 OR c.p_partkey = t.k * 2 + 1)
          |       AND c.p_partkey <= 4095)
          |SELECT depth, COUNT(*) AS n, MIN(k) AS min_k, MAX(k) AS max_k
          |FROM tree GROUP BY depth ORDER BY depth""".stripMargin)
    }),

    // overlapping context-window chunking — the split side of the
    // packing story (text_pack_bins packs short docs UP; this splits
    // long docs DOWN): windows of 200 chars starting every 150 (50
    // overlap), one explode per doc — scan-shaped, chunk count linear
    // in text length. greatest(len,1) keeps the empty-text chunk count
    // engine-portable (DIV truncates, // floors — they disagree at -1).
    "text_chunk_overlap" -> ((s, dir) =>
      Tables.table(s, dir, "documents")
        .select(col("doc_id"),
          explode(sequence(lit(0),
            expr("(greatest(length(text), 1) - 1) DIV 150").cast("int"))).as("chunk_idx"),
          col("text"))
        .select(col("doc_id"), col("chunk_idx"),
          expr("substring(text, chunk_idx * 150 + 1, 200)").as("chunk"))
        .withColumn("n_chars", length(col("chunk")))
        .drop("text")
        .orderBy(col("doc_id"), col("chunk_idx"))),

    // try_-function surface (ANSI-safe arithmetic): division by zero,
    // malformed cast, out-of-bounds element — NULL instead of error,
    // with the oracle expressing each via its portable equivalent.
    // NULLs coalesce to -1 sentinels (pandas NaN-vs-null canon); the
    // quotient is FLOOR of an IEEE division of exact integers (price
    // cents / integral quantity offset) — bit-identical across engines,
    // where ROUND(double, 4) diverges at binary half-boundaries.
    "scalar_try" -> ((s, dir) =>
      Tables.table(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"),
          coalesce(
            floor(expr("try_divide(CAST(round(l_extendedprice * 100) AS BIGINT), " +
              "CAST(l_quantity AS BIGINT) - 25)")).cast("long"),
            lit(-1L)).as("safe_div"),
          coalesce(expr("try_cast(l_returnflag AS INT)"), lit(-1)).as("safe_cast"),
          coalesce(expr("try_element_at(array(l_linenumber, l_linenumber * 2), 5)"),
            lit(-1)).as("safe_at"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))),

    // Spark-4 VARIANT path: props parse into the binary variant encoding
    // (open-schema semi-structured column type, shreddable at the scan);
    // variant_get extracts with a target type. The oracle checks the
    // VALUE via a typed JSON extract — the variant encode/decode
    // machinery is what the query exercises.
    "json_variant" -> ((s, dir) =>
      Tables.events(s, dir)
        .select(col("event_id"),
          expr("variant_get(parse_json(props), '$.k', 'int')").as("k"))
        .orderBy(col("event_id"))),

    // Z-order layout bucketing: interleave customer-key and order-day
    // bits, bucket by the top interleaved byte. Each bucket's x/y
    // min-max ranges stay tight (<= 16-wide per dimension) — exactly
    // the property that makes file-level min/max pruning work on BOTH
    // columns after a z-ordered write, where a lexicographic sort only
    // prunes the leading column. The output IS the evidence.
    "zorder_layout" -> ((s, dir) =>
      Tables.table(s, dir, "orders")
        .select((col("o_custkey") % 256).cast("int").as("x"),
          (datediff(to_date(col("o_orderdate")), lit("1970-01-01")) % 256).cast("int").as("y"))
        .withColumn("z", expr(zInterleave(sparkSide = true)))
        .groupBy((col("z") / 256).cast("int").as("zbucket"))
        .agg(count(lit(1)).as("n"),
          min(col("x")).as("min_x"), max(col("x")).as("max_x"),
          min(col("y")).as("min_y"), max(col("y")).as("max_y"))
        .orderBy(col("zbucket"))),

    // runtime-bloom-filtered shuffle join: the selective dim filter is
    // turned into a bloom filter evaluated ON THE FACT SCAN before the
    // shuffle — rows for non-urgent orders never leave the map side.
    // This is the shuffle-join analogue of partition pruning and the
    // default Spark mechanism at warehouse scale; result materialized
    // under the demo confs (3 rows), then session confs restored.
    "join_runtime_bloom" -> ((s, dir) =>
      withConfs(s, bloomConfs: _*) {
        bloomJoinBody(s, dir).localCheckpoint(true)
      })
  )

  /**
   * Recursive replay of the BPE merge loop in DuckDB (r13): one
   * iteration per merge round over the word-frequency vocabulary.
   * Everything the loop decides is integer/string-exact, so the oracle
   * reproduces the merge sequence bit-for-bit:
   *  - pair counts: SUM(freq) over adjacent symbol positions (every
   *    occurrence counts, overlaps included — same as the sliding(2)
   *    count);
   *  - winner: ORDER BY pf DESC, l, r (binary collation = Spark's
   *    UTF-8 string order);
   *  - greedy left-to-right non-overlapping merge: within a run of
   *    consecutive matches (runs longer than 1 only exist when l = r)
   *    the selected positions are exactly the even offsets from the run
   *    start — gaps-and-islands + run parity, no sequential scan needed;
   *  - the next round's symbol lists rebuild with a positional LIST()
   *    aggregate that emits merged pairs at selected positions and skips
   *    the swallowed successor.
   * `kind 1` rows accumulate the merge table; `kind 0` rows carry the
   * vocab state, whose final round is what bpe_tokenize joins against.
   */
  private def bpeRecSql(nMerges: Int): String =
    s"""wf AS (
       |  SELECT w, CAST(COUNT(*) AS BIGINT) AS freq
       |  FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
       |  WHERE w <> '' GROUP BY w),
       |rec(round, kind, w, syms, freq, l, r, pf) AS (
       |  SELECT CAST(1 AS BIGINT), 0, w,
       |         list_append(list_transform(range(1, length(w) + 1),
       |             i -> substr(w, CAST(i AS INT), 1)), '</w>'),
       |         freq, CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR), CAST(NULL AS BIGINT)
       |  FROM wf
       |  UNION ALL
       |  (
       |  WITH cur AS (SELECT round, w, syms, freq FROM rec WHERE kind = 0),
       |  rnd AS (SELECT MAX(round) AS k FROM cur),
       |  pr AS (
       |    SELECT syms[i] AS l, syms[i+1] AS r, CAST(SUM(freq) AS BIGINT) AS pf
       |    FROM cur, UNNEST(range(1, len(syms))) t(i)
       |    GROUP BY 1, 2),
       |  win AS (SELECT l, r, pf FROM pr ORDER BY pf DESC, l, r LIMIT 1),
       |  pos AS (
       |    SELECT c.w, c.freq, t.i, c.syms[t.i] AS sym,
       |           (t.i < len(c.syms) AND c.syms[t.i] = win.l
       |            AND c.syms[t.i+1] = win.r) AS m
       |    FROM cur c, win, UNNEST(range(1, len(c.syms) + 1)) t(i)),
       |  sel AS (
       |    SELECT *, CASE WHEN m THEN
       |        i - ROW_NUMBER() OVER (PARTITION BY w, m ORDER BY i) END AS grp
       |    FROM pos),
       |  sel2 AS (
       |    SELECT *, m AND ((i - MIN(i) OVER (PARTITION BY w, grp)) % 2 = 0) AS s
       |    FROM sel),
       |  sel3 AS (
       |    SELECT *, COALESCE(LAG(s) OVER (PARTITION BY w ORDER BY i), FALSE) AS ps,
       |           LEAD(sym) OVER (PARTITION BY w ORDER BY i) AS nsym
       |    FROM sel2),
       |  nxt AS (
       |    SELECT w, freq,
       |           list(CASE WHEN s THEN sym || nsym ELSE sym END ORDER BY i)
       |             FILTER (WHERE NOT ps) AS syms
       |    FROM sel3 GROUP BY w, freq)
       |  SELECT * FROM (
       |    SELECT (SELECT k FROM rnd), 1, CAST(NULL AS VARCHAR),
       |           CAST(NULL AS VARCHAR[]), CAST(NULL AS BIGINT), l, r, pf
       |    FROM win WHERE (SELECT k FROM rnd) <= $nMerges
       |    UNION ALL
       |    SELECT (SELECT k FROM rnd) + 1, 0, w, syms, freq,
       |           CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR), CAST(NULL AS BIGINT)
       |    FROM nxt WHERE (SELECT k FROM rnd) <= $nMerges
       |  ) z
       |  )
       |)""".stripMargin

  def oracleSql: Map[String, String] = Map(

    // recursive replay of the merge loop — bit-identical merge table
    "bpe_merges" ->
      s"""WITH RECURSIVE ${bpeRecSql(12)}
         |SELECT CAST(round AS INT) AS rank, l AS "left", r AS "right",
         |       pf AS pair_freq
         |FROM rec WHERE kind = 1 ORDER BY rank""".stripMargin,

    // token sequences: docs join the FINAL vocab state of the replayed
    // loop; position = contiguous index over (word order, subtoken order)
    "bpe_tokenize" ->
      s"""WITH RECURSIVE ${bpeRecSql(12)},
         |fin AS (SELECT w, syms FROM rec
         |        WHERE kind = 0
         |          AND round = (SELECT MAX(round) FROM rec WHERE kind = 0)),
         |dw AS (
         |  SELECT doc_id, i AS wpos, ws[i] AS w
         |  FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
         |       UNNEST(range(1, len(ws) + 1)) t(i)
         |  WHERE ws[i] <> ''),
         |tok AS (
         |  SELECT d.doc_id, d.wpos, t.s AS spos, f.syms[t.s] AS token
         |  FROM dw d JOIN fin f ON f.w = d.w,
         |       UNNEST(range(1, len(f.syms) + 1)) t(s))
         |SELECT doc_id,
         |       CAST(ROW_NUMBER() OVER (PARTITION BY doc_id
         |            ORDER BY wpos, spos) - 1 AS INT) AS pos,
         |       token
         |FROM tok ORDER BY doc_id, pos""".stripMargin,

    // the BPE invariants are exact: doc/vocab counts from SQL, and the
    // encode==tokenize and round-trip tallies must equal them
    "bpe_encode" ->
      """WITH d AS (SELECT COUNT(*) AS n_docs FROM documents
        |           WHERE length(replace(text, ' ', '')) > 0),
        |w AS (SELECT DISTINCT unnest(string_split(text, ' ')) AS w FROM documents),
        |v AS (SELECT COUNT(*) AS n_vocab FROM w WHERE w <> '')
        |SELECT d.n_docs, d.n_docs AS n_docs_count_match,
        |       v.n_vocab, v.n_vocab AS n_vocab_roundtrip
        |FROM d, v""".stripMargin,

    "json_variant" ->
      """SELECT event_id, CAST(json_extract_string(props, 'k') AS INT) AS k
        |FROM events ORDER BY event_id""".stripMargin,

    "recursive_tree" ->
      """WITH RECURSIVE tree(k, depth) AS (
        |  SELECT CAST(1 AS BIGINT), 0
        |  UNION ALL
        |  SELECT c.p_partkey, t.depth + 1
        |  FROM tree t JOIN part c
        |    ON (c.p_partkey = t.k * 2 OR c.p_partkey = t.k * 2 + 1)
        |       AND c.p_partkey <= 4095)
        |SELECT depth, CAST(COUNT(*) AS BIGINT) AS n, MIN(k) AS min_k, MAX(k) AS max_k
        |FROM tree GROUP BY depth ORDER BY depth""".stripMargin,

    "text_chunk_overlap" ->
      """SELECT doc_id, CAST(i AS INT) AS chunk_idx,
        |       substring(text, CAST(i AS INT) * 150 + 1, 200) AS chunk,
        |       CAST(length(substring(text, CAST(i AS INT) * 150 + 1, 200)) AS INT) AS n_chars
        |FROM documents,
        |     UNNEST(generate_series(0, (greatest(length(text), 1) - 1) // 150)) AS t(i)
        |ORDER BY doc_id, chunk_idx""".stripMargin,

    "scalar_try" ->
      """SELECT l_orderkey, l_linenumber,
        |       COALESCE(CAST(FLOOR(CAST(round(l_extendedprice * 100) AS BIGINT)
        |           / NULLIF(CAST(l_quantity AS BIGINT) - 25, 0)) AS BIGINT), -1) AS safe_div,
        |       COALESCE(TRY_CAST(l_returnflag AS INT), -1) AS safe_cast,
        |       COALESCE(([l_linenumber, l_linenumber * 2])[5], -1) AS safe_at
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "global_rownum" ->
      """SELECT l_orderkey, l_linenumber,
        |       ROW_NUMBER() OVER (ORDER BY l_orderkey * 100 + l_linenumber) AS rownum
        |FROM lineitem ORDER BY rownum""".stripMargin,

    "zorder_layout" -> {
      val z = zInterleave(sparkSide = false)
      s"""WITH xy AS (
         |  SELECT CAST(o_custkey % 256 AS INT) AS x,
         |         CAST((CAST(o_orderdate AS DATE) - DATE '1970-01-01') % 256 AS INT) AS y
         |  FROM orders),
         |zt AS (SELECT x, y, $z AS z FROM xy)
         |SELECT CAST(z // 256 AS INT) AS zbucket, CAST(COUNT(*) AS BIGINT) AS n,
         |       MIN(x) AS min_x, MAX(x) AS max_x,
         |       MIN(y) AS min_y, MAX(y) AS max_y
         |FROM zt GROUP BY 1 ORDER BY zbucket""".stripMargin
    },

    "join_runtime_bloom" ->
      """SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n,
        |       CAST(SUM(CAST(l_quantity AS DECIMAL(20,4))) AS DOUBLE) AS sum_qty
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE o_orderpriority = '1-URGENT'
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin
  )
}
