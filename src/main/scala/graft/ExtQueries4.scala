package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, DedupIndex, Tables}

/**
 * Round-3 surface widening: statistical aggregates, ordered-arg
 * aggregates (max_by/min_by), collect aggregates, FILTER-clause
 * conditional aggregation, distribution window functions
 * (cume_dist/percent_rank/nth_value), null-safe joins, bitwise scalars,
 * TF-IDF term scoring, PII redaction, per-column table profiling,
 * edit-distance near-dup verification, and connected-components dup
 * grouping (the pairs -> groups step of every web-scale dedup pipeline).
 *
 * Scale posture: everything here is hash-agg / hash-join / window-rank
 * shaped — partial aggregation and AQE broadcasts apply as usual. The
 * two dedup additions keep the candidate-pair discipline (blocking
 * equi-join / LSH pairs), never all-pairs.
 */
object ExtQueries4 {

  private def view(s: SparkSession, dir: String, name: String): String = {
    val v = s"${name}_x4"
    Tables.table(s, dir, name).createOrReplaceTempView(v)
    v
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // statistical aggregates: sample stddev/variance, correlation,
    // covariance — all single-pass mergeable moments (partial agg).
    "agg_stats" -> ((s, dir) =>
      Tables.table(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          round(stddev_samp(col("l_quantity")), 4).as("sd_qty"),
          round(var_samp(col("l_quantity")), 4).as("var_qty"),
          round(corr(col("l_quantity"), col("l_extendedprice")), 6).as("corr_qp"),
          round(covar_samp(col("l_quantity"), col("l_discount")), 6).as("cov_qd"))
        .orderBy(col("l_returnflag"))),

    // ordered-arg aggregates: the row that carries the extreme value.
    // Struct ordering makes the tiebreak explicit (max price, then max
    // key), so the result is deterministic and oracle-reproducible.
    "agg_minmax_by" -> ((s, dir) => {
      val o = view(s, dir, "orders")
      s.sql(
        s"""SELECT o_orderpriority,
           |  max_by(o_orderkey, struct(o_totalprice, o_orderkey)) AS best_order,
           |  min_by(o_orderkey, struct(o_totalprice, o_orderkey)) AS worst_order,
           |  MAX(o_totalprice) AS max_price
           |FROM $o GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)
    }),

    // collect aggregates surfaced as deterministic strings (sorted
    // before joining — raw collect_list order is partition-dependent).
    "agg_collect" -> ((s, dir) => {
      val n = Tables.table(s, dir, "nation")
      val r = Tables.table(s, dir, "region")
      n.join(r, col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"))
        .agg(
          array_join(sort_array(collect_list(col("n_name"))), ",").as("nations"),
          count(lit(1)).as("n_nations"))
        .orderBy(col("r_name"))
    }),

    // FILTER-clause conditional aggregation — one scan, many predicates
    // (vs. one scan per predicate); sums stay double + ROUND to dodge
    // engine cast semantics.
    "agg_filtered" -> ((s, dir) => {
      val l = view(s, dir, "lineitem")
      s.sql(
        s"""SELECT l_returnflag,
           |  CAST(COALESCE(SUM(CAST(l_quantity AS DECIMAL(20,4))) FILTER (WHERE l_discount > 0.05), 0) AS DOUBLE) AS qty_hi_disc,
           |  COUNT(*) FILTER (WHERE l_tax > 0.04) AS n_hi_tax,
           |  CAST(SUM(CAST(l_quantity AS DECIMAL(20,4))) AS DOUBLE) AS qty_all
           |FROM $l GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)
    }),

    // distribution window functions over a tie-free ordering; explicit
    // ROWS frames where the default frame would differ per engine.
    "window_cume_percent" -> ((s, dir) => {
      val l = view(s, dir, "lineitem")
      s.sql(
        s"""WITH l AS (SELECT * FROM $l WHERE l_suppkey <= 5)
           |SELECT l_suppkey, l_orderkey, l_linenumber,
           |  CAST(FLOOR(CUME_DIST() OVER wt * 1000000) AS BIGINT) AS cd_ppm,
           |  CAST(FLOOR(PERCENT_RANK() OVER wt * 1000000) AS BIGINT) AS pr_ppm,
           |  FIRST_VALUE(l_orderkey) OVER wt AS first_key,
           |  COALESCE(NTH_VALUE(l_orderkey, 2) OVER (PARTITION BY l_suppkey
           |    ORDER BY l_extendedprice, l_orderkey, l_linenumber
           |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING), -1) AS second_key,
           |  LAST_VALUE(l_orderkey) OVER (PARTITION BY l_suppkey
           |    ORDER BY l_extendedprice, l_orderkey, l_linenumber
           |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_key
           |FROM l
           |WINDOW wt AS (PARTITION BY l_suppkey
           |  ORDER BY l_extendedprice, l_orderkey, l_linenumber)
           |ORDER BY l_suppkey, l_orderkey, l_linenumber""".stripMargin)
    }),

    // null-safe equi-join (<=>): NULL keys match each other — a real
    // hash join key in Spark (no null-filter-and-union rewrite needed).
    "join_null_safe" -> ((s, dir) => {
      val c = view(s, dir, "customer"); val su = view(s, dir, "supplier")
      s.sql(
        s"""SELECT a.c_custkey, b.s_suppkey, COALESCE(a.k, -1) AS k
           |FROM (SELECT c_custkey, nullif(c_nationkey % 5, 0) AS k FROM $c) a
           |JOIN (SELECT s_suppkey, nullif(s_nationkey % 5, 0) AS k FROM $su) b
           |  ON a.k <=> b.k
           |ORDER BY c_custkey, s_suppkey""".stripMargin)
    }),

    // bitwise scalar surface (codegen'd integer ops).
    "scalar_bitwise" -> ((s, dir) =>
      Tables.table(s, dir, "lineitem")
        .where(col("l_linenumber") === 1 && col("l_orderkey") % 7 === 0)
        .select(col("l_orderkey"),
          col("l_orderkey").bitwiseAND(lit(255L)).as("b_and"),
          col("l_orderkey").bitwiseOR(lit(7L)).as("b_or"),
          col("l_orderkey").bitwiseXOR(lit(42L)).as("b_xor"),
          shiftleft(col("l_orderkey"), 2).as("b_shl"),
          shiftright(col("l_orderkey"), 1).as("b_shr"),
          bit_count(col("l_orderkey")).as("b_cnt"))
        .orderBy(col("l_orderkey"))),

    // TF-IDF top-3 terms per document. The word explode runs ONCE: the
    // (doc, word) term-frequency table is materialized and document
    // lengths (sum of tf) and document frequencies (tf rows per word —
    // tf is unique per (doc, word)) both derive from it; N broadcast.
    // Ties broken on the rounded score then term so ranking is
    // engine-reproducible.
    "text_tfidf" -> ((s, dir) => {
      val docs = Tables.table(s, dir, "documents")
      val words = docs.select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
      val tf = words.groupBy(col("doc_id"), col("word")).agg(count(lit(1)).as("c"))
        .localCheckpoint(true)
      val dl = tf.groupBy(col("doc_id")).agg(sum(col("c")).as("n"))
      val dfq = tf.groupBy(col("word")).agg(count(lit(1)).as("d"))
      val nd = docs.agg(count(lit(1)).as("nd"))
      val scored = tf.join(dl, "doc_id").join(dfq, "word").crossJoin(broadcast(nd))
        .select(col("doc_id"), col("word"),
          round((col("c") / col("n")) * log((col("nd") + 1.0) / (col("d") + 1.0)), 6)
            .as("score"))
      val w = Window.partitionBy(col("doc_id")).orderBy(col("score").desc, col("word"))
      scored.withColumn("rn", row_number().over(w))
        .where(col("rn") <= 3).drop("rn")
        .orderBy(col("doc_id"), col("word"))
    }),

    // PII-style redaction: digits masked, email-shaped tokens replaced —
    // compared via hash + length (the redacted text itself stays big).
    "text_redact_pii" -> ((s, dir) =>
      Tables.table(s, dir, "documents")
        .select(col("doc_id"),
          md5(regexp_replace(
            regexp_replace(col("text"), "[a-z0-9._%+-]+@[a-z0-9.-]+", "<EMAIL>"),
            "[0-9]", "#").cast("binary")).as("red_hash"),
          length(regexp_replace(
            regexp_replace(col("text"), "[a-z0-9._%+-]+@[a-z0-9.-]+", "<EMAIL>"),
            "[0-9]", "#")).as("red_len"))
        .orderBy(col("doc_id"))),

    // per-column profiling (row count, non-null count, exact distinct) —
    // the data-quality pass a training pipeline runs before ingestion.
    "table_profile" -> ((s, dir) => {
      val o = Tables.table(s, dir, "orders")
      Seq("o_orderstatus", "o_orderpriority", "o_custkey")
        .map { c =>
          o.agg(count(lit(1)).as("n_rows"), count(col(c)).as("n_nonnull"),
              countDistinct(col(c)).as("n_distinct"))
            .select(lit(c).as("col"), col("n_rows"), col("n_nonnull"), col("n_distinct"))
        }
        .reduce(_ unionAll _)
        .orderBy(col("col"))
    }),

    // edit-distance near-dup: prefix-equality blocking (an equi-join —
    // never all-pairs) then BANDED Levenshtein verification (3-arg form:
    // a 2*threshold diagonal band, O(n*t), -1 above threshold). The
    // blocked pair set is MATERIALIZED before scoring: left in one plan,
    // Catalyst pushes the distance predicate into the join condition
    // AHEAD of the id test, running Levenshtein on every bucket pair
    // including the |docs| self-pairs the id test discards (measured 4x
    // slower); the checkpoint barrier pins evaluation to the verified
    // pairs only.
    "dedup_levenshtein" -> ((s, dir) => {
      val d = Tables.table(s, dir, "documents")
      val a = d.select(col("doc_id").as("doc_a"), col("text").as("ta"),
        substring(col("text"), 1, 24).as("pfx"))
      val b = d.select(col("doc_id").as("doc_b"), col("text").as("tb"),
        substring(col("text"), 1, 24).as("pfx"))
      val cand = a.join(b, "pfx").where(col("doc_a") < col("doc_b"))
        .select(col("doc_a"), col("doc_b"), col("ta"), col("tb"))
        .localCheckpoint(true)
      cand
        .select(col("doc_a"), col("doc_b"),
          levenshtein(col("ta"), col("tb"), 50).as("dist"))
        .where(col("dist") >= 0)
        .orderBy(col("doc_a"), col("doc_b"))
    }),

    // benchmark decontamination: bloom-gated exact anti-join of the
    // corpus against an eval set (docs with doc_id % 10 == 3 stand in
    // for the benchmark); output is exact, the bloom only bounds the
    // anti-join's left side.
    "dedup_decontaminate" -> ((s, dir) => {
      val docs = Tables.table(s, dir, "documents")
      Dedup.decontaminate(
        docs.select(col("doc_id"), col("text")),
        docs.where(col("doc_id") % 10 === 3).select(col("text")))
        .orderBy(col("doc_id"))
    }),

    // connected components over SimHash near-dup pairs: pairs -> dup
    // GROUPS keyed by min reachable doc_id (min-label propagation).
    "dedup_groups_cc" -> ((s, dir) =>
      DedupIndex.simhashComponents(s, dir, 3)
        .select(col("node").as("doc_id"), col("comp"))
        .orderBy(col("doc_id"))),

    // streaming bounded top-K per key (transformWithState keyed heap
    // state — reference #14 in streaming form); equals the batch
    // window-rank oracle when drained.
    "stream_group_topk" -> ((s, dir) =>
      graft.streaming.TopKStream.topK(s, dir, 5)),

    // un-keyed GLOBAL streaming aggregate (Complete mode): one state row
    // for the whole stream — the degenerate-key form of streaming agg
    // state (contrast the keyed windowed aggs).
    "stream_global_agg" -> ((s, dir) =>
      graft.streaming.StreamingOps.withStreamWidth(s, dir) {
        import org.apache.spark.sql.types.DecimalType
        // distinct aggregations are unsupported on streams; min/max of
        // the id column round out the state shape instead
        val agg = graft.streaming.StreamingOps.eventsStream(s, dir)
          .agg(count(lit(1)).as("n_events"),
            sum(col("value").cast(DecimalType(20, 4))).cast("double").as("sum_value"),
            min(col("event_id")).as("min_id"),
            max(col("event_id")).as("max_id"))
        val t = graft.streaming.StreamingOps.runToMemory(
          agg, s"gagg_${System.nanoTime()}")
        // an empty drain runs no microbatch and leaves the sink empty;
        // the batch oracle's global aggregate always emits one row
        if (t.isEmpty) s.sql(
          """SELECT CAST(0 AS BIGINT) AS n_events, CAST(NULL AS DOUBLE) AS sum_value,
            |CAST(NULL AS BIGINT) AS min_id, CAST(NULL AS BIGINT) AS max_id""".stripMargin)
        else t
      }),

    // several DISTINCT aggregates beside a plain one — Catalyst's Expand
    // rewrite (one scan fans out per distinct group, then re-aggregates).
    "agg_multi_distinct" -> ((s, dir) => {
      val o = view(s, dir, "orders")
      s.sql(
        s"""SELECT o_orderstatus,
           |  COUNT(DISTINCT o_custkey) AS n_custs,
           |  COUNT(DISTINCT o_orderpriority) AS n_prios,
           |  COUNT(*) AS n_orders,
           |  CAST(SUM(CAST(o_totalprice AS DECIMAL(20,4))) AS DOUBLE) AS sum_price
           |FROM $o GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin)
    }),

    // boolean aggregates: predicate counting and universal/existential
    // quantifiers per group (every/any), all single-pass mergeable.
    "agg_boolean" -> ((s, dir) => {
      val l = view(s, dir, "lineitem")
      s.sql(
        s"""SELECT l_returnflag,
           |  count_if(l_discount > 0.05) AS n_hi_disc,
           |  every(l_quantity > 0) AS all_pos_qty,
           |  any(l_tax > 0.07) AS some_hi_tax,
           |  every(l_extendedprice > 100000) AS all_exp
           |FROM $l GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)
    }),

    // hashing-trick featurization: fixed-width word-count vector per doc
    // (8 buckets by portable hash) — the stateless vectorizer for
    // downstream ML; one shuffle, 8 conditional sums in one hash agg.
    "text_hash_features" -> ((s, dir) => {
      import graft.operators.PortableHash
      val words = Tables.table(s, dir, "documents")
        .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
        .withColumn("b", PortableHash.hMod(col("word")) % 8)
      val feats = (0 until 8).map(j =>
        sum(when(col("b") === j, 1L).otherwise(0L)).as(s"f$j"))
      words.groupBy(col("doc_id")).agg(feats.head, feats.tail: _*)
        .orderBy(col("doc_id"))
    }),

    // trig/exponential scalars — rounded to 6 decimals so libm-vs-JVM
    // last-ulp differences can't surface (values bounded first).
    "scalar_trig" -> ((s, dir) =>
      Tables.events(s, dir)
        .select(col("event_id"),
          round(sin(col("value")), 6).as("sin_v"),
          round(cos(col("value")), 6).as("cos_v"),
          round(atan2(col("value"), lit(2.0)), 6).as("atan2_v"),
          round(exp(least(abs(col("value")), lit(5.0))), 6).as("exp_v"),
          round(pow(abs(col("value")) + 1, 0.3), 6).as("pow_v"))
        .orderBy(col("event_id"))),

    // full outer join with unmatched rows on BOTH sides (restricted key
    // ranges), null-filled and sentinel-coalesced for the oracle.
    "join_full_outer" -> ((s, dir) => {
      val c = Tables.table(s, dir, "customer")
        .where(col("c_nationkey") < 20)
        .groupBy(col("c_nationkey").as("ck")).agg(count(lit(1)).as("n_cust"))
      val su = Tables.table(s, dir, "supplier")
        .where(col("s_nationkey") >= 5)
        .groupBy(col("s_nationkey").as("sk")).agg(count(lit(1)).as("n_supp"))
      c.join(su, col("ck") === col("sk"), "full_outer")
        .select(coalesce(col("ck"), col("sk")).as("nationkey"),
          coalesce(col("n_cust"), lit(0L)).as("n_cust"),
          coalesce(col("n_supp"), lit(0L)).as("n_supp"))
        .orderBy(col("nationkey"))
    }),

    // multiset (bag) semantics set ops: EXCEPT ALL / INTERSECT ALL
    // subtract/intersect MULTIPLICITIES, not distinct membership.
    "setop_except_all" -> ((s, dir) => {
      val a = Tables.table(s, dir, "customer").select(col("c_nationkey").as("k"))
      val b = Tables.table(s, dir, "supplier").select(col("s_nationkey").as("k"))
      a.exceptAll(b).orderBy(col("k"))
    }),
    "setop_intersect_all" -> ((s, dir) => {
      val a = Tables.table(s, dir, "customer").select(col("c_nationkey").as("k"))
      val b = Tables.table(s, dir, "supplier").select(col("s_nationkey").as("k"))
      a.intersectAll(b).orderBy(col("k"))
    }),

    // multimodal frame sampling: one payload -> 4 frame rows (the
    // explode-shaped media transform); frames compared by hex + length.
    "media_framesample_stub" -> ((s, dir) =>
      graft.operators.Multimodal.frameSample(
        graft.operators.Multimodal.mediaTable(Tables.table(s, dir, "documents")), 4)
        .toDF()
        .select(col("doc_id"), col("frame_idx"),
          lower(hex(col("frame_bytes"))).as("frame_hex"),
          length(col("frame_bytes")).as("frame_len"))
        .orderBy(col("doc_id"), col("frame_idx"))),

    // CAPSTONE: the end-to-end corpus-cleaning pass a training pipeline
    // runs before tokenization, composed from the declared operators —
    // language gate (stopword-ratio langid), quality gate (token count +
    // alpha ratio), exact-dup removal (keep min doc_id per content
    // hash), and benchmark decontamination (bloom-gated anti-join).
    // Every stage is a semi-join on doc_id, so the pipeline stays one
    // scan-shaped plan with broadcast-able gate tables.
    "pipeline_clean_corpus" -> ((s, dir) => {
      val docs = Tables.table(s, dir, "documents")
      val lang = graft.operators.TextAnalysis.langId(docs)
        .where(col("predicted_lang") === "en").select(col("doc_id"))
      val qual = graft.operators.TextAnalysis.qualityScores(docs)
        .where(col("n_tokens") >= 30 && col("alpha_ratio") >= 0.6)
        .select(col("doc_id"))
      val firstPerHash = docs
        .select(col("doc_id"), md5(col("text").cast("binary")).as("h"))
        .groupBy(col("h")).agg(min(col("doc_id")).as("doc_id"))
        .select(col("doc_id"))
      val decontaminated = Dedup.decontaminate(
        docs.select(col("doc_id"), col("text")),
        docs.where(col("doc_id") % 10 === 3).select(col("text")))
      docs.select(col("doc_id"))
        .join(lang, Seq("doc_id"), "left_semi")
        .join(qual, Seq("doc_id"), "left_semi")
        .join(firstPerHash, Seq("doc_id"), "left_semi")
        .join(decontaminated, Seq("doc_id"), "left_semi")
        .orderBy(col("doc_id"))
    }),

    // deterministic train/val/test split: membership is a pure function
    // of the doc id's portable hash — re-derivable on any cluster/engine
    // forever (contrast randomSplit: partition-layout-dependent).
    "sample_split" -> ((s, dir) =>
      graft.operators.DeterministicSample.split(
        Tables.table(s, dir, "documents").select(col("doc_id")),
        col("doc_id").cast("string"), valPct = 10, testPct = 10)
        .orderBy(col("doc_id"))),

    // sequential token-budget packing: docs (in doc_id order) are
    // assigned to fixed-budget context bins by exclusive running token
    // count DIV budget — computed with the two-level prefix scan, never
    // an all-to-one global window.
    "text_pack_bins" -> ((s, dir) => {
      val docsN = Tables.table(s, dir, "documents")
        .select(col("doc_id"),
          size(split(col("text"), " ")).cast("long").as("n_tokens"))
      graft.operators.PrefixScan
        .runningSumExclusive(docsN, "doc_id", "n_tokens", "cum_excl")
        .select(col("doc_id"), col("n_tokens"), col("cum_excl"),
          expr("cum_excl DIV 2000").as("bin"))
        .orderBy(col("doc_id"))
    }),

    // corpus-level bigram document frequencies, top-50 — a global
    // sort-limit (TakeOrderedAndProject: each task keeps 50 rows, the
    // driver merges — no global sort shuffle).
    "text_ngram_freq" -> ((s, dir) =>
      Dedup.ngramShingles(Tables.table(s, dir, "documents"), 2)
        .groupBy(col("shingle").as("bigram"))
        .agg(count(lit(1)).as("df"))
        .orderBy(col("df").desc, col("bigram"))
        .limit(50)
        .orderBy(col("bigram"))),

    // extended date/time scalars (trunc, month-end, day arithmetic,
    // calendar fields) — cross-engine day-of-week convention differences
    // reconciled in the oracle.
    "scalar_date2" -> ((s, dir) =>
      Tables.table(s, dir, "orders")
        .where(col("o_orderkey") % 11 === 0)
        .select(col("o_orderkey"),
          date_format(date_trunc("month", col("o_orderdate")), "yyyy-MM-dd").as("mstart"),
          date_format(last_day(col("o_orderdate")), "yyyy-MM-dd").as("mend"),
          datediff(to_date(col("o_orderdate")), lit("2024-01-01").cast("date")).as("days_since"),
          date_format(add_months(col("o_orderdate"), 3), "yyyy-MM-dd").as("plus3m"),
          year(col("o_orderdate")).as("yr"),
          quarter(col("o_orderdate")).as("qtr"),
          dayofweek(col("o_orderdate")).as("dow"))
        .orderBy(col("o_orderkey"))),

    // count-min sketch counts for the exact heavy hitters — the
    // mergeable-sketch counterpart to the Misra-Gries recount: one pass
    // builds a fixed-size sketch (mergeable across partitions, the
    // 100 TB path where even the candidate recount is too wide); the
    // tiny heavy-hitter set is then probed against it. The sketch VALUE
    // is engine-specific, so the oracle-checkable output is the CMS
    // CONTRACT (round-6 verdict item 5, same pattern as approx_distinct):
    // exact counts from the exact side, a no-underestimate flag (a HARD
    // CMS guarantee), and a bounded-overestimate flag at 5x the sketch's
    // eps*N (eps=1e-4; the 5x slack makes the probabilistic bound
    // effectively certain, and the fixed seed makes it deterministic
    // besides). ExtOperatorsSpec keeps the tight 1x-eps check.
    "approx_topk_cms" -> ((s, dir) => {
      val keys = graft.operators.Tables.events(s, dir)
        .select(get_json_object(col("props"), "$.k").cast("string").as("key"))
        .where(col("key").isNotNull)
      val bytes = keys
        .agg(count_min_sketch(col("key"), lit(0.0001), lit(0.99), lit(42)).as("sk"))
        .head().getAs[Array[Byte]](0)
      val cms = org.apache.spark.util.sketch.CountMinSketch
        .readFrom(new java.io.ByteArrayInputStream(bytes))
      val slack = math.ceil(5 * 0.0001 * cms.totalCount()).toLong
      val hh = graft.operators.HeavyHitters.exact(keys, col("key"), 20).collect()
      import s.implicits._
      hh.toSeq
        .map { r =>
          val est = cms.estimateCount(r.getString(0))
          (r.getString(0), r.getLong(1),
            if (est >= r.getLong(1)) 1 else 0,
            if (est <= r.getLong(1) + slack) 1 else 0)
        }
        .toDF("key", "exact_n", "no_underestimate", "within_bound")
        .orderBy(col("key"))
    })
  )

  def oracleSql: Map[String, String] = Map(
    // the CMS contract is the oracle: exact heavy-hitter counts from
    // SQL, and both sketch-bound flags must be 1 for every key
    "approx_topk_cms" ->
      """WITH k AS (SELECT json_extract_string(props, 'k') AS key FROM events
        |           WHERE json_extract_string(props, 'k') IS NOT NULL)
        |SELECT key, COUNT(*) AS exact_n, 1 AS no_underestimate, 1 AS within_bound
        |FROM k GROUP BY key HAVING COUNT(*) >= 20 ORDER BY key""".stripMargin,

    "agg_stats" ->
      """SELECT l_returnflag,
        |  ROUND(stddev_samp(l_quantity), 4) AS sd_qty,
        |  ROUND(var_samp(l_quantity), 4) AS var_qty,
        |  ROUND(corr(l_quantity, l_extendedprice), 6) AS corr_qp,
        |  ROUND(covar_samp(l_quantity, l_discount), 6) AS cov_qd
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "agg_minmax_by" ->
      """WITH mx AS (
        |  SELECT o_orderpriority, o_orderkey AS best_order FROM (
        |    SELECT o_orderpriority, o_orderkey, ROW_NUMBER() OVER (
        |      PARTITION BY o_orderpriority
        |      ORDER BY o_totalprice DESC, o_orderkey DESC) AS rn FROM orders)
        |  WHERE rn = 1),
        |mn AS (
        |  SELECT o_orderpriority, o_orderkey AS worst_order FROM (
        |    SELECT o_orderpriority, o_orderkey, ROW_NUMBER() OVER (
        |      PARTITION BY o_orderpriority
        |      ORDER BY o_totalprice ASC, o_orderkey ASC) AS rn FROM orders)
        |  WHERE rn = 1),
        |mp AS (SELECT o_orderpriority, MAX(o_totalprice) AS max_price
        |       FROM orders GROUP BY o_orderpriority)
        |SELECT o_orderpriority, best_order, worst_order, max_price
        |FROM mx JOIN mn USING (o_orderpriority) JOIN mp USING (o_orderpriority)
        |ORDER BY o_orderpriority""".stripMargin,

    "agg_collect" ->
      """SELECT r_name,
        |  array_to_string(list_sort(list(n_name)), ',') AS nations,
        |  CAST(COUNT(*) AS BIGINT) AS n_nations
        |FROM nation JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin,

    "agg_filtered" ->
      """SELECT l_returnflag,
        |  CAST(COALESCE(SUM(CAST(l_quantity AS DECIMAL(20,4))) FILTER (WHERE l_discount > 0.05), 0) AS DOUBLE) AS qty_hi_disc,
        |  CAST(COUNT(*) FILTER (WHERE l_tax > 0.04) AS BIGINT) AS n_hi_tax,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(20,4))) AS DOUBLE) AS qty_all
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "window_cume_percent" ->
      """WITH l AS (SELECT * FROM lineitem WHERE l_suppkey <= 5)
        |SELECT l_suppkey, l_orderkey, l_linenumber,
        |  CAST(FLOOR(CUME_DIST() OVER wt * 1000000) AS BIGINT) AS cd_ppm,
        |  CAST(FLOOR(PERCENT_RANK() OVER wt * 1000000) AS BIGINT) AS pr_ppm,
        |  FIRST_VALUE(l_orderkey) OVER wt AS first_key,
        |  COALESCE(NTH_VALUE(l_orderkey, 2) OVER (PARTITION BY l_suppkey
        |    ORDER BY l_extendedprice, l_orderkey, l_linenumber
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING), -1) AS second_key,
        |  LAST_VALUE(l_orderkey) OVER (PARTITION BY l_suppkey
        |    ORDER BY l_extendedprice, l_orderkey, l_linenumber
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_key
        |FROM l
        |WINDOW wt AS (PARTITION BY l_suppkey
        |  ORDER BY l_extendedprice, l_orderkey, l_linenumber)
        |ORDER BY l_suppkey, l_orderkey, l_linenumber""".stripMargin,

    "join_null_safe" ->
      """SELECT a.c_custkey, b.s_suppkey, COALESCE(a.k, -1) AS k
        |FROM (SELECT c_custkey, nullif(c_nationkey % 5, 0) AS k FROM customer) a
        |JOIN (SELECT s_suppkey, nullif(s_nationkey % 5, 0) AS k FROM supplier) b
        |  ON a.k IS NOT DISTINCT FROM b.k
        |ORDER BY c_custkey, s_suppkey""".stripMargin,

    "scalar_bitwise" ->
      """SELECT l_orderkey,
        |  l_orderkey & 255 AS b_and,
        |  l_orderkey | 7 AS b_or,
        |  xor(l_orderkey, 42) AS b_xor,
        |  l_orderkey << 2 AS b_shl,
        |  l_orderkey >> 1 AS b_shr,
        |  CAST(bit_count(l_orderkey) AS INT) AS b_cnt
        |FROM lineitem
        |WHERE l_linenumber = 1 AND l_orderkey % 7 = 0
        |ORDER BY l_orderkey""".stripMargin,

    "text_tfidf" ->
      """WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents),
        |tf AS (SELECT doc_id, word, COUNT(*) AS c FROM w GROUP BY doc_id, word),
        |dl AS (SELECT doc_id, COUNT(*) AS n FROM w GROUP BY doc_id),
        |df AS (SELECT word, COUNT(DISTINCT doc_id) AS d FROM w GROUP BY word),
        |nd AS (SELECT COUNT(*) AS nd FROM documents),
        |sc AS (
        |  SELECT tf.doc_id, tf.word,
        |         ROUND((c * 1.0 / dl.n) * ln((nd.nd + 1.0) / (df.d + 1.0)), 6) AS score
        |  FROM tf JOIN dl ON tf.doc_id = dl.doc_id
        |          JOIN df ON tf.word = df.word
        |          CROSS JOIN nd),
        |rk AS (SELECT doc_id, word, score, ROW_NUMBER() OVER (
        |         PARTITION BY doc_id ORDER BY score DESC, word) AS rn FROM sc)
        |SELECT doc_id, word, score FROM rk WHERE rn <= 3
        |ORDER BY doc_id, word""".stripMargin,

    "text_redact_pii" ->
      """WITH red AS (
        |  SELECT doc_id,
        |    regexp_replace(regexp_replace(text, '[a-z0-9._%+-]+@[a-z0-9.-]+', '<EMAIL>', 'g'),
        |      '[0-9]', '#', 'g') AS r
        |  FROM documents)
        |SELECT doc_id, md5(r) AS red_hash, CAST(length(r) AS INT) AS red_len
        |FROM red ORDER BY doc_id""".stripMargin,

    "table_profile" ->
      """SELECT 'o_orderstatus' AS col, CAST(COUNT(*) AS BIGINT) AS n_rows,
        |       CAST(COUNT(o_orderstatus) AS BIGINT) AS n_nonnull,
        |       CAST(COUNT(DISTINCT o_orderstatus) AS BIGINT) AS n_distinct FROM orders
        |UNION ALL
        |SELECT 'o_orderpriority', CAST(COUNT(*) AS BIGINT),
        |       CAST(COUNT(o_orderpriority) AS BIGINT),
        |       CAST(COUNT(DISTINCT o_orderpriority) AS BIGINT) FROM orders
        |UNION ALL
        |SELECT 'o_custkey', CAST(COUNT(*) AS BIGINT),
        |       CAST(COUNT(o_custkey) AS BIGINT),
        |       CAST(COUNT(DISTINCT o_custkey) AS BIGINT) FROM orders
        |ORDER BY col""".stripMargin,

    "dedup_levenshtein" ->
      """SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |       CAST(levenshtein(a.text, b.text) AS INT) AS dist
        |FROM documents a JOIN documents b
        |  ON substr(a.text, 1, 24) = substr(b.text, 1, 24)
        | AND a.doc_id < b.doc_id
        |WHERE levenshtein(a.text, b.text) <= 50
        |ORDER BY doc_a, doc_b""".stripMargin,

    "dedup_groups_cc" ->
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

    "stream_group_topk" ->
      """WITH e AS (SELECT CAST(json_extract_string(props, 'k') AS INT) AS item,
        |                  event_id, value FROM events),
        |rk AS (SELECT item, event_id, value, ROW_NUMBER() OVER (
        |         PARTITION BY item ORDER BY value DESC, event_id) AS rn FROM e)
        |SELECT item, event_id, value FROM rk WHERE rn <= 5
        |ORDER BY item, event_id""".stripMargin,

    "dedup_decontaminate" ->
      """SELECT doc_id FROM documents
        |WHERE md5(text) NOT IN
        |  (SELECT md5(text) FROM documents WHERE doc_id % 10 = 3)
        |ORDER BY doc_id""".stripMargin,

    "stream_global_agg" ->
      """SELECT CAST(COUNT(*) AS BIGINT) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(20,4))) AS DOUBLE) AS sum_value,
        |  MIN(event_id) AS min_id, MAX(event_id) AS max_id
        |FROM events""".stripMargin,

    "agg_multi_distinct" ->
      """SELECT o_orderstatus,
        |  CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_custs,
        |  CAST(COUNT(DISTINCT o_orderpriority) AS BIGINT) AS n_prios,
        |  CAST(COUNT(*) AS BIGINT) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(20,4))) AS DOUBLE) AS sum_price
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    "agg_boolean" ->
      """SELECT l_returnflag,
        |  CAST(count_if(l_discount > 0.05) AS BIGINT) AS n_hi_disc,
        |  bool_and(l_quantity > 0) AS all_pos_qty,
        |  bool_or(l_tax > 0.07) AS some_hi_tax,
        |  bool_and(l_extendedprice > 100000) AS all_exp
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "text_hash_features" -> {
      val b = s"(${graft.operators.PortableHash.hModSql("word")} % 8)"
      val feats = (0 until 8)
        .map(j => s"CAST(SUM(CASE WHEN $b = $j THEN 1 ELSE 0 END) AS BIGINT) AS f$j")
        .mkString(",\n  ")
      s"""WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word
         |           FROM documents)
         |SELECT doc_id,
         |  $feats
         |FROM w GROUP BY doc_id ORDER BY doc_id""".stripMargin
    },

    "scalar_trig" ->
      """SELECT event_id,
        |  ROUND(sin(value), 6) AS sin_v,
        |  ROUND(cos(value), 6) AS cos_v,
        |  ROUND(atan2(value, 2.0), 6) AS atan2_v,
        |  ROUND(exp(least(abs(value), 5.0)), 6) AS exp_v,
        |  ROUND(pow(abs(value) + 1, 0.3), 6) AS pow_v
        |FROM events ORDER BY event_id""".stripMargin,

    "join_full_outer" ->
      """WITH c AS (SELECT c_nationkey AS ck, CAST(COUNT(*) AS BIGINT) AS n_cust
        |           FROM customer WHERE c_nationkey < 20 GROUP BY c_nationkey),
        |s AS (SELECT s_nationkey AS sk, CAST(COUNT(*) AS BIGINT) AS n_supp
        |      FROM supplier WHERE s_nationkey >= 5 GROUP BY s_nationkey)
        |SELECT COALESCE(ck, sk) AS nationkey,
        |       COALESCE(n_cust, 0) AS n_cust,
        |       COALESCE(n_supp, 0) AS n_supp
        |FROM c FULL JOIN s ON ck = sk
        |ORDER BY nationkey""".stripMargin,

    "setop_except_all" ->
      """SELECT c_nationkey AS k FROM customer
        |EXCEPT ALL
        |SELECT s_nationkey AS k FROM supplier
        |ORDER BY k""".stripMargin,

    "setop_intersect_all" ->
      """SELECT c_nationkey AS k FROM customer
        |INTERSECT ALL
        |SELECT s_nationkey AS k FROM supplier
        |ORDER BY k""".stripMargin,

    // payload = unhex(md5(text)) (16 bytes), 4 frames of 4 bytes = 8 hex
    // chars each, sliced from the md5 hex string directly
    "media_framesample_stub" ->
      """SELECT doc_id, CAST(i AS INT) AS frame_idx,
        |       substring(md5(text), i * 8 + 1, 8) AS frame_hex,
        |       4 AS frame_len
        |FROM documents, UNNEST(range(0, 4)) AS r(i)
        |ORDER BY doc_id, frame_idx""".stripMargin,

    "pipeline_clean_corpus" -> {
      val stop = graft.operators.TextAnalysis.EnStopwords
        .map(w => s"'$w'").mkString(", ")
      s"""WITH t AS (
         |  SELECT doc_id, text, len(string_split(text, ' ')) AS n,
         |         len(list_filter(string_split(text, ' '), x -> x IN ($stop))) AS n_stop,
         |         len(regexp_extract_all(text, '[a-z]')) AS n_alpha
         |  FROM documents),
         |gates AS (
         |  SELECT doc_id FROM t
         |  WHERE n_stop * 1.0 / n >= 0.02
         |    AND n >= 30
         |    AND ROUND(n_alpha * 1.0 / length(text), 4) >= 0.6),
         |firsts AS (
         |  SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY md5(text)),
         |evalh AS (
         |  SELECT md5(text) AS h FROM documents WHERE doc_id % 10 = 3)
         |SELECT d.doc_id FROM documents d
         |JOIN gates g ON g.doc_id = d.doc_id
         |JOIN firsts f ON f.doc_id = d.doc_id
         |WHERE md5(d.text) NOT IN (SELECT h FROM evalh)
         |ORDER BY d.doc_id""".stripMargin
    },

    "sample_split" -> {
      val c = graft.operators.DeterministicSample
        .splitCaseSql("CAST(doc_id AS VARCHAR)", 10, 10)
      s"""SELECT doc_id, $c AS split FROM documents ORDER BY doc_id"""
    },

    // CASTs on cum_excl/bin: DuckDB SUM(BIGINT) yields HUGEINT, which the
    // driver's pandas path canonicalizes as float -> hash mismatch vs
    // Spark's int64 (the r03 failure).
    "text_pack_bins" ->
      """WITH t AS (SELECT doc_id,
        |             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        |           FROM documents),
        |c AS (SELECT doc_id, n_tokens,
        |        CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum_excl
        |      FROM t)
        |SELECT doc_id, n_tokens, cum_excl, CAST(cum_excl // 2000 AS BIGINT) AS bin
        |FROM c ORDER BY doc_id""".stripMargin,

    "text_ngram_freq" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS wd FROM documents),
        |w AS (SELECT DISTINCT doc_id, wd[i] || ' ' || wd[i+1] AS bigram
        |      FROM t, UNNEST(range(1, len(wd))) AS r(i)),
        |c AS (SELECT bigram, CAST(COUNT(*) AS BIGINT) AS df FROM w GROUP BY bigram),
        |rk AS (SELECT bigram, df,
        |         ROW_NUMBER() OVER (ORDER BY df DESC, bigram) AS rn FROM c)
        |SELECT bigram, df FROM rk WHERE rn <= 50
        |ORDER BY bigram""".stripMargin,

    // Spark dayofweek is 1-7 (Sun-Sat); DuckDB dayofweek is 0-6 (Sun-Sat)
    "scalar_date2" ->
      """SELECT o_orderkey,
        |  strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS mstart,
        |  strftime(last_day(o_orderdate), '%Y-%m-%d') AS mend,
        |  CAST(datediff('day', DATE '2024-01-01', CAST(o_orderdate AS DATE)) AS INT) AS days_since,
        |  strftime(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH, '%Y-%m-%d') AS plus3m,
        |  CAST(year(o_orderdate) AS INT) AS yr,
        |  CAST(quarter(o_orderdate) AS INT) AS qtr,
        |  CAST(dayofweek(o_orderdate) + 1 AS INT) AS dow
        |FROM orders WHERE o_orderkey % 11 = 0
        |ORDER BY o_orderkey""".stripMargin
  )
}
