package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Tables, TextAnalysis}
import graft.operators.PortableHash.{hModSql, minhashSql, NumHashes, NumBands, BandRows}

/**
 * Round-6 eighth wave: corpus-curation methods from the published
 * LLM-data playbook that were still missing from the surface.
 *
 *  - dsir_select:      DSIR importance resampling (Xie et al. 2023) —
 *                      hashed-unigram importance log-ratios, integer
 *                      micro-nat quantization, top-N selection.
 *  - quality_gopher:   the Gopher/Dolma hard-threshold rule family
 *                      (Rae et al. 2021 A1.1) with per-rule flags.
 *  - dedup_incremental: ingest-time near-dup — a new shard checked
 *                      against the standing corpus index, asymmetric
 *                      band join, never corpus x corpus.
 *  - dedup_semantic:   SemDeDup-style (Abbas et al. 2023) semantic
 *                      dedup over embeddings: LSH-bucketed candidate
 *                      pairs, cosine >= tau, first-id-wins keep rule.
 */
object ExtQueries18 {

  /** Target domain for the DSIR importance model. */
  private val DsirTarget = "src0"
  private val DsirBuckets = 64

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // DSIR selection: importance weight per doc under a hashed-unigram
    // target-vs-raw model, top-100 docs by (weight, doc_id). The per-
    // bucket log-ratios are quantized to integer micro-nats before the
    // per-doc sum, so weights are exact BIGINTs on any engine and any
    // partitioning; the final selection is TakeOrderedAndProject (heap
    // per partition + driver merge of 100 rows), never a global sort.
    "dsir_select" -> ((s, dir) =>
      TextAnalysis.dsirWeights(Tables.table(s, dir, "documents"),
          DsirTarget, DsirBuckets)
        .orderBy(col("w_micro").desc, col("doc_id"))
        .limit(100)),

    // Gopher rule gate: published hard thresholds as one scan-shaped
    // report — word count, mean word length, alpha-word fraction,
    // stopword hits, top-word repetition fraction, each with its rule
    // flag and the conjunction. The only non-scan metric (top-word
    // fraction) costs one (doc_id, word) hash agg.
    "quality_gopher" -> ((s, dir) =>
      TextAnalysis.gopherRules(Tables.table(s, dir, "documents"))
        .orderBy(col("doc_id"))),

    // Incremental dedup at ingest: docs with doc_id % 5 == 4 play the
    // incoming shard, the rest the standing corpus. Asymmetric banded
    // join + exact-Jaccard verify at 0.9 — same verification contract
    // as dedup_minhash_lsh, but the candidate set is shard x index.
    "dedup_incremental" -> ((s, dir) =>
      Dedup.incrementalMinhashDedup(Tables.table(s, dir, "documents"),
          col("doc_id") % 5 === 4, 0.9)
        .orderBy(col("doc_id"))),

    // Streaming ingest dedup: the incoming shard arrives as a STREAM and
    // probes the static standing-corpus band index (stream-static
    // equi-join on (band, sig)). The minhash signature is computed
    // PER ROW with array expressions — no streaming shuffle, no state:
    // the word-hash array is built once, each of the 16 minhashes is an
    // array_min over it, and the word-set for exact verification rides
    // along as a sorted hash array. Must equal dedup_incremental exactly
    // (same oracle SQL).
    "stream_incremental_dedup" -> ((s, dir) => {
      import org.apache.spark.sql.types._
      import graft.operators.PortableHash
      val isIncoming = col("doc_id") % 5 === 4
      val standing = Tables.table(s, dir, "documents").where(!isIncoming)
      val indexSigs = Dedup.lshBands(Dedup.minhashSignatures(standing))
      val wordSets = Dedup.docWords(standing)
        .groupBy(col("doc_id"))
        .agg(sort_array(collect_list(xxhash64(col("word")))).as("wset_b"),
          count(lit(1)).as("n_b"))
      val index = indexSigs.join(wordSets, "doc_id")
        .select(col("doc_id").as("doc_b"), col("band"), col("sig"),
          col("wset_b"), col("n_b"))
      // schema probed from the file; literal is the zero-file fallback
      // (round-6 lesson: never hard-code a driver table's encoding)
      val docSchema = StructType(Seq(
        StructField("doc_id", LongType), StructField("text", StringType),
        StructField("lang", StringType), StructField("source", StringType),
        StructField("n_chars", LongType)))
      val shard = graft.streaming.StreamingOps
        .tableStream(s, dir, "documents.parquet", docSchema)
        .where(isIncoming)
      // per-row signature: distinct word hashes once, 16 array_min's —
      // stateless and shuffle-free on the stream side
      val hms = transform(array_distinct(split(col("text"), " ")),
        w => PortableHash.hMod(w))
      val mhs = (0 until PortableHash.NumHashes).map { j =>
        array_min(transform(col("hms"),
          h => (lit(PortableHash.A(j)) * h + lit(PortableHash.B(j))) % PortableHash.P))
          .as(s"mh$j")
      }
      val sigged = shard.withColumn("hms", hms)
        .withColumn("wset_a",
          sort_array(transform(array_distinct(split(col("text"), " ")),
            w => xxhash64(w))))
        .withColumn("n_a", size(col("wset_a")).cast("long"))
        .select(col("doc_id") +: col("wset_a") +: col("n_a") +: mhs: _*)
      val bandRows = (0 until PortableHash.NumBands).map { bnd =>
        val sig = concat_ws(",",
          (bnd * PortableHash.BandRows until (bnd + 1) * PortableHash.BandRows)
            .map(j => col(s"mh$j").cast("string")): _*)
        sigged.select(col("doc_id"), col("wset_a"), col("n_a"),
          lit(bnd).as("band"), sig.as("sig"))
      }.reduce(_ unionAll _)
      val verified = bandRows.join(index, Seq("band", "sig"))
        .where(least(col("n_a"), col("n_b")) >=
          lit(0.9) * greatest(col("n_a"), col("n_b")))
        .withColumn("n_common",
          graft.functions.SortedIntersect.size(col("wset_a"), col("wset_b")))
        .where(col("n_common") * lit(1.0) /
          (col("n_a") + col("n_b") - col("n_common")) >= 0.9)
        .select(col("doc_id"), col("doc_b"))
      val drained = graft.streaming.StreamingOps.runToMemory(
        verified, s"sincdedup_${System.nanoTime()}",
        org.apache.spark.sql.streaming.OutputMode.Append())
      val matches = drained.groupBy(col("doc_id"))
        .agg(min(col("doc_b")).as("match_doc"))
      Tables.table(s, dir, "documents").where(isIncoming)
        .select(col("doc_id"))
        .join(matches.withColumnRenamed("doc_id", "m_id"),
          col("doc_id") === col("m_id"), "left")
        .select(col("doc_id"), col("m_id").isNotNull.as("is_dup"),
          coalesce(col("match_doc"), lit(-1L)).as("match_doc"))
        .orderBy(col("doc_id"))
    }),

    // Semantic dedup: LSH-bucketed embedding pairs with cosine >= 0.30;
    // a vector is removed iff a lower-id vector in a shared bucket is
    // that similar (first-id-wins — the deterministic core of SemDeDup's
    // keep-one-per-cluster). Output is the full keep/remove ledger with
    // the removing representative.
    "dedup_semantic" -> ((s, dir) => {
      val embs = Tables.table(s, dir, "embeddings")
      val removers = Dedup.embeddingNearDupsLsh(embs, 0.30)
        .groupBy(col("vec_b")).agg(min(col("vec_a")).as("removed_by"))
      embs.select(col("vec_id"))
        .join(removers, col("vec_id") === col("vec_b"), "left")
        .select(col("vec_id"), col("vec_b").isNull.as("kept"),
          coalesce(col("removed_by"), lit(-1L)).as("removed_by"))
        .orderBy(col("vec_id"))
    })
  )

  // ------------------------------------------------------------------
  // DuckDB oracles
  // ------------------------------------------------------------------

  private val stopListSql =
    TextAnalysis.EnStopwords.map(s => s"'$s'").mkString("[", ", ", "]")

  def oracleSql: Map[String, String] = Map(

    "dsir_select" ->
      s"""WITH w AS (
         |  SELECT doc_id, source, unnest(string_split(text, ' ')) AS word
         |  FROM documents),
         |wb AS (SELECT doc_id, source, (${hModSql("word")} % $DsirBuckets) AS b FROM w),
         |hist AS (
         |  SELECT b, COUNT(*) AS s_cnt,
         |         COUNT(*) FILTER (source = '$DsirTarget') AS t_cnt
         |  FROM wb GROUP BY b),
         |tot AS (SELECT SUM(s_cnt) AS s_tot, SUM(t_cnt) AS t_tot FROM hist),
         |ratios AS (
         |  SELECT b, CAST(floor(ln(
         |           CAST((t_cnt + 1) * (s_tot + $DsirBuckets) AS DOUBLE) /
         |           CAST((s_cnt + 1) * (t_tot + $DsirBuckets) AS DOUBLE)) * 1000000 + 0.5)
         |         AS BIGINT) AS r_micro
         |  FROM hist CROSS JOIN tot)
         |SELECT wb.doc_id, CAST(SUM(r.r_micro) AS BIGINT) AS w_micro
         |FROM wb JOIN ratios r ON wb.b = r.b
         |GROUP BY wb.doc_id
         |ORDER BY w_micro DESC, doc_id LIMIT 100""".stripMargin,

    "quality_gopher" ->
      s"""WITH base AS (
         |  SELECT doc_id,
         |         len(string_split(text, ' ')) AS n_words,
         |         length(replace(text, ' ', '')) AS wchars,
         |         len(list_filter(string_split(text, ' '),
         |             w -> regexp_matches(w, '[a-z]'))) AS n_alpha_w,
         |         len(list_intersect(list_distinct(string_split(text, ' ')),
         |             $stopListSql)) AS stop_hits
         |  FROM documents),
         |tf AS (
         |  SELECT doc_id, word, COUNT(*) AS c
         |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents)
         |  GROUP BY doc_id, word),
         |top AS (SELECT doc_id, MAX(c) AS top_cnt FROM tf GROUP BY doc_id),
         |m AS (
         |  SELECT b.doc_id, b.n_words,
         |         ROUND(b.wchars * 1.0 / b.n_words, 4) AS mean_wlen,
         |         ROUND(b.n_alpha_w * 1.0 / b.n_words, 4) AS alpha_frac,
         |         b.stop_hits,
         |         ROUND(t.top_cnt * 1.0 / b.n_words, 4) AS top_frac
         |  FROM base b JOIN top t ON b.doc_id = t.doc_id)
         |SELECT doc_id, n_words, mean_wlen, alpha_frac, stop_hits, top_frac,
         |       (n_words BETWEEN 50 AND 100000) AS pass_len,
         |       (mean_wlen BETWEEN 3.0 AND 10.0) AS pass_wlen,
         |       (alpha_frac >= 0.8) AS pass_alpha,
         |       (stop_hits >= 2) AS pass_stop,
         |       (top_frac <= 0.2) AS pass_rep,
         |       ((n_words BETWEEN 50 AND 100000) AND (mean_wlen BETWEEN 3.0 AND 10.0)
         |        AND alpha_frac >= 0.8 AND stop_hits >= 2 AND top_frac <= 0.2) AS pass
         |FROM m ORDER BY doc_id""".stripMargin,

    "dedup_incremental" -> incrementalSql,

    // the streaming probe must land on exactly the batch verdict
    "stream_incremental_dedup" -> incrementalSql,

    "dedup_semantic" ->
      s"""WITH ${ExtQueries.quantSql},
         |bk AS (SELECT vec_id, qv, n2, ${ExtQueries.bucketSql(0 until 4)} AS bkt0,
         |              ${ExtQueries.bucketSql(4 until 8)} AS bkt1 FROM qn),
         |pairs AS (
         |  SELECT x.vec_id AS vec_a, y.vec_id AS vec_b
         |  FROM bk x JOIN bk y
         |    ON x.vec_id < y.vec_id AND (x.bkt0 = y.bkt0 OR x.bkt1 = y.bkt1)
         |  WHERE list_inner_product(x.qv, y.qv) / (sqrt(x.n2) * sqrt(y.n2)) >= 0.30),
         |rm AS (SELECT vec_b, MIN(vec_a) AS removed_by FROM pairs GROUP BY vec_b)
         |SELECT e.vec_id, r.vec_b IS NULL AS kept,
         |       COALESCE(r.removed_by, -1) AS removed_by
         |FROM embeddings e LEFT JOIN rm r ON e.vec_id = r.vec_b
         |ORDER BY e.vec_id""".stripMargin
  )

  private lazy val incrementalSql: String = {
      val mhExprs = (0 until NumHashes)
        .map(j => s"MIN(${minhashSql(j, "hm")}) AS mh$j").mkString(",\n  ")
      val bandSelects = (0 until NumBands).map { bnd =>
        val sig = (bnd * BandRows until (bnd + 1) * BandRows)
          .map(j => s"CAST(mh$j AS VARCHAR)").mkString(", ")
        s"SELECT doc_id, $bnd AS band, concat_ws(',', $sig) AS sig FROM sig"
      }.mkString("\n  UNION ALL ")
      s"""WITH w AS (SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS word FROM documents),
         |hm AS (SELECT doc_id, ${hModSql("word")} AS hm FROM w),
         |sig AS (SELECT doc_id, $mhExprs FROM hm GROUP BY doc_id),
         |bands AS (
         |  $bandSelects),
         |cand AS (
         |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM bands a JOIN bands b ON a.band = b.band AND a.sig = b.sig
         |  WHERE a.doc_id % 5 = 4 AND b.doc_id % 5 <> 4),
         |n AS (SELECT doc_id, COUNT(*) AS n_w FROM w GROUP BY doc_id),
         |common AS (
         |  SELECT c.doc_a, c.doc_b, COUNT(*) AS n_common
         |  FROM cand c
         |  JOIN w wa ON wa.doc_id = c.doc_a
         |  JOIN w wb ON wb.doc_id = c.doc_b AND wb.word = wa.word
         |  GROUP BY c.doc_a, c.doc_b),
         |ver AS (
         |  SELECT doc_a, MIN(doc_b) AS match_doc
         |  FROM common
         |  JOIN n na ON na.doc_id = doc_a
         |  JOIN n nb ON nb.doc_id = doc_b
         |  WHERE n_common * 1.0 / (na.n_w + nb.n_w - n_common) >= 0.9
         |  GROUP BY doc_a)
         |SELECT d.doc_id, v.doc_a IS NOT NULL AS is_dup,
         |       COALESCE(v.match_doc, -1) AS match_doc
         |FROM documents d LEFT JOIN ver v ON d.doc_id = v.doc_a
         |WHERE d.doc_id % 5 = 4 ORDER BY d.doc_id""".stripMargin
  }
}
