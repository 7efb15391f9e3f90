package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.operators.{PortableHash, Tables}

/**
 * Round-7 wave: curation-pipeline shapes that close remaining everyday
 * gaps — rank fusion for retrieval, per-group corpus caps, robust
 * (order-statistic) outlier clipping, normalize-then-dedup, and the
 * deterministic epoch shuffle a training-data loader needs.
 *
 *  - rrf_fusion: reciprocal-rank fusion of two retrievers (BM25 and
 *    query-term coverage) — the standard way to combine sparse+dense or
 *    heterogeneous rankings without score calibration. Candidate set is
 *    query-bounded (docs matching >= 1 query term), so the global ranks
 *    are windows over a small set, not the corpus.
 *  - source_cap: cap each source at K docs chosen by deterministic
 *    portable hash — the "no domain may dominate the mixture" guard.
 *    One window over a (source, hash)-sorted shuffle; the kept set is
 *    engine- and partitioning-independent.
 *  - winsorize_stats: per-group winsorization at the exact order-
 *    statistic p05/p95 cut ranks (integer rank arithmetic, no float
 *    percentile interpolation) — robust stats for fee/price-style
 *    columns; sums ride the DECIMAL grid.
 *  - dedup_normalized: dedup AFTER text normalization (lowercase, strip
 *    non-alphanumerics, collapse whitespace) — catches the
 *    formatting-only duplicates exact hashing misses; reports how many
 *    normalized groups merge distinct raw variants.
 *  - epoch_shuffle: deterministic global shuffle + sharding for one
 *    training epoch: position = portable hash of the doc id, shard =
 *    hash mod nShards. Reproducible across engines/partitionings and
 *    stateless — the property a 100 TB data loader needs (no global
 *    sort by random() whose output changes per run).
 *  - stream_source_cap: the source_cap admission form as a Spark 4
 *    transformWithState processor — per-source quota state admits the
 *    first K docs in arrival order; exact vs the batch oracle when
 *    files arrive in doc-id order (the file monitor's mod-time
 *    contract, reference ContinuousFileMonitoringFunction.java:266-294).
 */
object ExtQueries23 {

  private val QueryTerms = Seq("key", "value", "table", "row", "scan")
  private val RrfK = 60 // the standard RRF dampening constant
  private val CapK = 40 // per-source doc budget
  private val NShards = 8

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Reciprocal-rank fusion: rank list A = BM25 (k1=1.2, b=0.75,
    // Lucene idf — same scoring discipline as text_bm25); rank list B =
    // query-term coverage (distinct terms matched, then total hits).
    // rrf(d) = 1/(60+rank_a) + 1/(60+rank_b); top-20 by fused score.
    // Both ranks are dense row_numbers with doc_id tiebreaks and the
    // fused score is a two-term IEEE sum rounded to 1e-8, so ordering
    // is bit-stable across engines.
    "rrf_fusion" -> ((s, dir) => {
      val toks = Tables.table(s, dir, "documents")
        .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
      val dl = toks.groupBy("doc_id").agg(count(lit(1)).as("dl"))
      val stats = dl.agg(count(lit(1)).as("n_docs"), avg(col("dl")).as("avgdl"))
      val tf = toks.where(col("term").isin(QueryTerms: _*))
        .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
      val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
      val bm = tf.join(broadcast(dfreq), "term").join(dl, "doc_id")
        .crossJoin(broadcast(stats))
        .withColumn("idf",
          log((col("n_docs") - col("df") + 0.5) / (col("df") + 0.5) + 1.0))
        .withColumn("tscore",
          col("idf") * col("tf") * 2.2 /
            (col("tf") + lit(1.2) * (lit(0.25) + lit(0.75) * col("dl") / col("avgdl"))))
        .groupBy("doc_id")
        .agg(round(sum(round(col("tscore"), 8).cast(DecimalType(20, 8)))
          .cast("double"), 4).as("bm25"))
      val ra = bm.withColumn("ra",
        row_number().over(Window.orderBy(col("bm25").desc, col("doc_id"))))
      val cov = toks.where(col("term").isin(QueryTerms: _*))
        .groupBy("doc_id")
        .agg(countDistinct(col("term")).as("cov"), count(lit(1)).as("hits"))
      val rb = cov.withColumn("rb",
        row_number().over(
          Window.orderBy(col("cov").desc, col("hits").desc, col("doc_id"))))
      val fused = ra.join(rb, "doc_id")
        .withColumn("rrf",
          round(lit(1.0) / (lit(RrfK) + col("ra")) +
            lit(1.0) / (lit(RrfK) + col("rb")), 8))
      fused
        .withColumn("rn",
          row_number().over(Window.orderBy(col("rrf").desc, col("doc_id"))))
        .where(col("rn") <= 20)
        .select(col("doc_id"), col("ra"), col("rb"), col("rrf"))
        .orderBy(col("doc_id"))
    }),

    // Per-source corpus cap: keep at most CapK docs per source, chosen
    // by portable hash of the doc id (reproducible pseudo-random
    // sample, no RNG state). Report shape: per-source before/after doc
    // and char budgets plus an id checksum of the kept set, so the
    // oracle pins WHICH docs were kept, not just how many.
    "source_cap" -> ((s, dir) => {
      val d = Tables.table(s, dir, "documents")
        .withColumn("hv",
          PortableHash.hMod(concat(lit("cap|"), col("doc_id").cast("string"))))
      val w = Window.partitionBy(col("source")).orderBy(col("hv"), col("doc_id"))
      d.withColumn("rn", row_number().over(w))
        .groupBy(col("source"))
        .agg(
          count(lit(1)).as("n_docs"),
          sum(when(col("rn") <= CapK, 1L).otherwise(0L)).as("n_kept"),
          sum(when(col("rn") <= CapK, col("doc_id")).otherwise(0L)).as("sum_kept_ids"),
          sum(col("n_chars")).as("chars_before"),
          sum(when(col("rn") <= CapK, col("n_chars")).otherwise(0L)).as("chars_after"))
        .orderBy(col("source"))
    }),

    // Winsorized per-group price stats: cut ranks are EXACT integer
    // order statistics — lo = ceil(0.05 n) = (5n+99) div 100, hi =
    // ceil(0.95 n) — so no float percentile interpolation can diverge
    // between engines (DuckDB would evaluate 0.05*n in DECIMAL, Spark
    // in DOUBLE; integer rank arithmetic sidesteps both). Values are
    // clipped to [v(lo), v(hi)] and summed through DECIMAL.
    "winsorize_stats" -> ((s, dir) => {
      val li = Tables.table(s, dir, "lineitem")
        .select(col("l_returnflag").as("flag"), col("l_extendedprice").as("price"),
          col("l_orderkey"), col("l_linenumber"))
      val w = Window.partitionBy(col("flag"))
        .orderBy(col("price"), col("l_orderkey"), col("l_linenumber"))
      val ranked = li
        .withColumn("rn", row_number().over(w))
        .withColumn("n", count(lit(1)).over(Window.partitionBy(col("flag"))))
        .withColumn("lo_rank", expr("(n * 5 + 99) DIV 100"))
        .withColumn("hi_rank", expr("(n * 95 + 99) DIV 100"))
      val cuts = ranked.groupBy(col("flag"))
        .agg(
          max(when(col("rn") === col("lo_rank"), col("price"))).as("lo_cut"),
          max(when(col("rn") === col("hi_rank"), col("price"))).as("hi_cut"))
      ranked.join(broadcast(cuts), "flag")
        .withColumn("clipped", least(greatest(col("price"), col("lo_cut")), col("hi_cut")))
        .groupBy(col("flag"))
        .agg(
          count(lit(1)).as("n_rows"),
          sum(when(col("price") < col("lo_cut"), 1L).otherwise(0L)).as("n_clip_low"),
          sum(when(col("price") > col("hi_cut"), 1L).otherwise(0L)).as("n_clip_high"),
          max(col("lo_cut")).as("lo_cut"),
          max(col("hi_cut")).as("hi_cut"),
          sum(col("clipped").cast(DecimalType(20, 4))).cast("double").as("sum_winsorized"))
        .orderBy(col("flag"))
    }),

    // Normalize-then-dedup: formatting-insensitive duplicate detection.
    // A "merged" group is a normalized text shared by >1 distinct RAW
    // text — exactly the duplicates exact hashing cannot see. Single-row
    // report (robust to corpora with no such dups).
    "dedup_normalized" -> ((s, dir) => {
      val d = Tables.table(s, dir, "documents")
        .withColumn("raw_h", md5(col("text").cast("binary")))
        .withColumn("norm",
          trim(regexp_replace(
            regexp_replace(lower(col("text")), "[^a-z0-9 ]", ""), " +", " ")))
        .withColumn("norm_h", md5(col("norm").cast("binary")))
      val groups = d.groupBy(col("norm_h"))
        .agg(count(lit(1)).as("n_docs"),
          countDistinct(col("raw_h")).as("n_raw"),
          min(col("doc_id")).as("keep_doc"))
      groups.agg(
        sum(col("n_docs")).as("n_docs"),
        count(lit(1)).as("n_norm_groups"),
        sum(when(col("n_raw") > 1, 1L).otherwise(0L)).as("n_merged_groups"),
        sum(when(col("n_raw") > 1, col("n_docs")).otherwise(0L)).as("n_docs_in_merged"))
    }),

    // Deterministic epoch shuffle + sharding: position key = portable
    // hash of the doc id, shard = key mod NShards, in-shard position =
    // rank by (key, doc_id). Stateless and reproducible — re-running
    // the epoch on any cluster layout yields byte-identical shards
    // (contrast ORDER BY random(): different every run, and a global
    // sort besides). The report pins shard sizes, char budgets, the
    // first doc per shard, and a position-weighted id checksum.
    "epoch_shuffle" -> ((s, dir) => {
      val d = Tables.table(s, dir, "documents")
        .withColumn("hv",
          PortableHash.hMod(concat(lit("ep1|"), col("doc_id").cast("string"))))
        .withColumn("shard", pmod(col("hv"), lit(NShards)).cast("int"))
      val w = Window.partitionBy(col("shard")).orderBy(col("hv"), col("doc_id"))
      d.withColumn("pos", row_number().over(w))
        .groupBy(col("shard"))
        .agg(
          count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("n_chars"),
          max(when(col("pos") === 1, col("doc_id"))).as("first_doc"),
          sum(col("doc_id") * col("pos")).as("checksum"))
        .orderBy(col("shard"))
    }),

    // Streaming admission quota: first CapK docs per source in arrival
    // (doc-id) order through a transformWithState processor whose state
    // is one counter per key. Same oracle family as source_cap but the
    // kept set is the FIRST-K-BY-ID set (arrival semantics), not the
    // hash sample — both ledgers are pinned by id checksums.
    "stream_source_cap" -> ((s, dir) =>
      graft.streaming.SourceCapStream.capped(s, dir, CapK))
  )

  def oracleSql: Map[String, String] = {
    val qt = QueryTerms.map(t => s"'$t'").mkString(", ")
    Map(

      "rrf_fusion" ->
        s"""WITH toks AS (SELECT doc_id, UNNEST(string_split(text, ' ')) AS term FROM documents),
           |dl AS (SELECT doc_id, COUNT(*) AS dl FROM toks GROUP BY doc_id),
           |stats AS (SELECT COUNT(*) AS n_docs, AVG(dl) AS avgdl FROM dl),
           |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks
           |       WHERE term IN ($qt) GROUP BY doc_id, term),
           |dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
           |bm AS (SELECT doc_id,
           |         round(CAST(SUM(CAST(round(
           |           ln((n_docs - df + 0.5) / (df + 0.5) + 1.0) * tf * 2.2 /
           |             (tf + 1.2 * (0.25 + 0.75 * dl / avgdl)), 8) AS DECIMAL(20,8)))
           |           AS DOUBLE), 4) AS bm25
           |       FROM tf JOIN dfreq USING (term) JOIN dl USING (doc_id)
           |       CROSS JOIN stats GROUP BY doc_id),
           |ra AS (SELECT doc_id, ROW_NUMBER() OVER (ORDER BY bm25 DESC, doc_id) AS ra FROM bm),
           |cov AS (SELECT doc_id, COUNT(DISTINCT term) AS cov, COUNT(*) AS hits
           |        FROM toks WHERE term IN ($qt) GROUP BY doc_id),
           |rb AS (SELECT doc_id, ROW_NUMBER() OVER (ORDER BY cov DESC, hits DESC, doc_id) AS rb FROM cov),
           |f AS (SELECT doc_id, ra, rb,
           |        round(1.0 / (${RrfK} + ra) + 1.0 / (${RrfK} + rb), 8) AS rrf
           |      FROM ra JOIN rb USING (doc_id)),
           |r AS (SELECT *, ROW_NUMBER() OVER (ORDER BY rrf DESC, doc_id) AS rn FROM f)
           |SELECT doc_id, ra, rb, rrf FROM r WHERE rn <= 20 ORDER BY doc_id""".stripMargin,

      "source_cap" -> {
        val hv = PortableHash.hModSql("'cap|' || CAST(doc_id AS VARCHAR)")
        s"""WITH h AS (SELECT source, doc_id, n_chars, $hv AS hv FROM documents),
           |r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY source ORDER BY hv, doc_id) AS rn FROM h)
           |SELECT source, COUNT(*) AS n_docs,
           |       CAST(SUM(CASE WHEN rn <= ${CapK} THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           |       CAST(SUM(CASE WHEN rn <= ${CapK} THEN doc_id ELSE 0 END) AS BIGINT) AS sum_kept_ids,
           |       CAST(SUM(n_chars) AS BIGINT) AS chars_before,
           |       CAST(SUM(CASE WHEN rn <= ${CapK} THEN n_chars ELSE 0 END) AS BIGINT) AS chars_after
           |FROM r GROUP BY source ORDER BY source""".stripMargin
      },

      "winsorize_stats" ->
        """WITH ranked AS (
          |  SELECT l_returnflag AS flag, l_extendedprice AS price,
          |         ROW_NUMBER() OVER (PARTITION BY l_returnflag
          |           ORDER BY l_extendedprice, l_orderkey, l_linenumber) AS rn,
          |         COUNT(*) OVER (PARTITION BY l_returnflag) AS n
          |  FROM lineitem),
          |cuts AS (
          |  SELECT flag,
          |         MAX(CASE WHEN rn = (n * 5 + 99) // 100 THEN price END) AS lo_cut,
          |         MAX(CASE WHEN rn = (n * 95 + 99) // 100 THEN price END) AS hi_cut
          |  FROM ranked GROUP BY flag)
          |SELECT r.flag, COUNT(*) AS n_rows,
          |       CAST(SUM(CASE WHEN price < lo_cut THEN 1 ELSE 0 END) AS BIGINT) AS n_clip_low,
          |       CAST(SUM(CASE WHEN price > hi_cut THEN 1 ELSE 0 END) AS BIGINT) AS n_clip_high,
          |       MAX(lo_cut) AS lo_cut, MAX(hi_cut) AS hi_cut,
          |       CAST(SUM(CAST(LEAST(GREATEST(price, lo_cut), hi_cut) AS DECIMAL(20,4))) AS DOUBLE)
          |         AS sum_winsorized
          |FROM ranked r JOIN cuts c ON r.flag = c.flag
          |GROUP BY r.flag ORDER BY r.flag""".stripMargin,

      "dedup_normalized" ->
        """WITH d AS (
          |  SELECT md5(text) AS raw_h,
          |         md5(trim(regexp_replace(regexp_replace(lower(text),
          |           '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g'))) AS norm_h
          |  FROM documents),
          |g AS (SELECT norm_h, COUNT(*) AS n_docs, COUNT(DISTINCT raw_h) AS n_raw
          |      FROM d GROUP BY norm_h)
          |SELECT CAST(SUM(n_docs) AS BIGINT) AS n_docs,
          |       COUNT(*) AS n_norm_groups,
          |       CAST(SUM(CASE WHEN n_raw > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_merged_groups,
          |       CAST(SUM(CASE WHEN n_raw > 1 THEN n_docs ELSE 0 END) AS BIGINT) AS n_docs_in_merged
          |FROM g""".stripMargin,

      "epoch_shuffle" -> {
        val hv = PortableHash.hModSql("'ep1|' || CAST(doc_id AS VARCHAR)")
        s"""WITH h AS (SELECT doc_id, n_chars, $hv AS hv FROM documents),
           |r AS (SELECT *, CAST(hv % ${NShards} AS INTEGER) AS shard FROM h),
           |p AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY shard ORDER BY hv, doc_id) AS pos FROM r)
           |SELECT shard, COUNT(*) AS n_docs,
           |       CAST(SUM(n_chars) AS BIGINT) AS n_chars,
           |       MAX(CASE WHEN pos = 1 THEN doc_id END) AS first_doc,
           |       CAST(SUM(doc_id * pos) AS BIGINT) AS checksum
           |FROM p GROUP BY shard ORDER BY shard""".stripMargin
      },

      "stream_source_cap" ->
        s"""WITH r AS (SELECT source, doc_id, n_chars,
           |             ROW_NUMBER() OVER (PARTITION BY source ORDER BY doc_id) AS rn
           |           FROM documents)
           |SELECT source, COUNT(*) AS n_kept,
           |       CAST(SUM(doc_id) AS BIGINT) AS sum_kept_ids,
           |       MAX(doc_id) AS max_kept_id,
           |       CAST(SUM(n_chars) AS BIGINT) AS chars_kept
           |FROM r WHERE rn <= ${CapK} GROUP BY source ORDER BY source""".stripMargin
    )
  }
}
