package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, DedupIndex, PortableHash, Similarity, Tables}

/**
 * Round-6 seventh wave: retrieval-quality evaluations.
 *
 *  - ann_dim_ablation: Matryoshka-style truncation eval — recall@10 of
 *                      exact search over the first 16 dims vs the full
 *                      64-dim exact ranking, fully oracled.
 *  - stream_ann_topk:  streamed query vectors probing the static LSH-
 *                      bucketed corpus (stream-static equi-join on the
 *                      bucket id) — the online-serving lookup path;
 *                      equals the batch multi-probe LSH result.
 */
object ExtQueries17 {

  private val TruncDims = 16

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Dimension-ablation recall: how much of the exact top-10 survives
    // when vectors are truncated to their first 16 dimensions — the
    // measurement behind Matryoshka/truncated-embedding serving
    // decisions. Both rankings are deterministic integer-quantized
    // scans, so the recall NUMBERS are oracled. Same bounded posture as
    // ann_recall: the corpus never shuffles, query sets broadcast.
    "ann_dim_ablation" -> ((s, dir) => {
      val emb = Tables.table(s, dir, "embeddings")
      val full = Similarity.bruteForceTopK(emb, ExtQueries.AnnQueries, 10)
        .select(col("query_id"), col("vec_id"))
      val truncated = emb.select(col("vec_id"),
        slice(col("embedding"), 1, TruncDims).as("embedding"))
      val trunc = Similarity.bruteForceTopK(truncated, ExtQueries.AnnQueries, 10)
        .select(col("query_id"), col("vec_id"), lit(1).as("hit"))
      full.join(trunc, Seq("query_id", "vec_id"), "left")
        .groupBy(col("query_id"))
        .agg(count(lit(1)).as("n_full"),
          count(col("hit")).as("n_kept"))
        .select(col("query_id"), col("n_full"), col("n_kept"),
          round(col("n_kept") * lit(1.0) / col("n_full"), 4).as("recall"))
        .orderBy(col("query_id"))
    }),

    // Banded-index fidelity eval: precision/recall of the SimHash
    // hamming<=3 candidate pairs against ground-truth trigram
    // Jaccard>=0.5 pairs — the dedup-family analogue of ann_recall. Both
    // sides are deterministic and individually oracled elsewhere; here
    // the PRECISION/RECALL numbers themselves are oracled. The product
    // of the two bounded pair sets is a full-outer join on pair keys —
    // pair-set-sized, never corpus-squared.
    // Measured (sf0.1): precision 0.0002, recall 0.21 — on this
    // small-vocab corpus SimHash proxies shared-vocabulary cosine, not
    // trigram overlap, so it is the WRONG near-dup index here and the
    // eval proves it with numbers; the minhash/ngram paths are the
    // high-fidelity ones. That mismatch is the reason this operator
    // belongs in the library.
    "dedup_simhash_eval" -> ((s, dir) => {
      val d = Tables.table(s, dir, "documents")
      val truth = Dedup.jaccardPairs(Dedup.ngramShingles(d, 3), 0.5)
        .select(col("doc_a"), col("doc_b"), lit(1).as("t"))
      val pred = DedupIndex.simhashPairs(s, dir, 3)
        .select(col("doc_a"), col("doc_b"), lit(1).as("p"))
      truth.join(pred, Seq("doc_a", "doc_b"), "full_outer")
        .agg(
          sum(coalesce(col("t"), lit(0))).cast("long").as("n_truth"),
          sum(coalesce(col("p"), lit(0))).cast("long").as("n_pred"),
          sum(when(col("t").isNotNull && col("p").isNotNull, 1L).otherwise(0L))
            .as("n_both"))
        .select(col("n_truth"), col("n_pred"), col("n_both"),
          round(when(col("n_pred") > 0, col("n_both") * lit(1.0) / col("n_pred")), 4)
            .as("precision"),
          round(when(col("n_truth") > 0, col("n_both") * lit(1.0) / col("n_truth")), 4)
            .as("recall"))
    }),

    // Schema-evolution read: two parquet generations of the same table —
    // v1 without l_discount, v2 with it — read back through ONE
    // mergeSchema scan; v1 rows surface NULL for the added column. The
    // lake reality every long-lived pipeline hits: columns get added,
    // old files stay. The aggregate proves rows from both generations
    // flow through one scan (count of the new column < count of rows).
    "schema_evolution" -> ((s, dir) => {
      import org.apache.spark.sql.types.DecimalType
      val base = new java.io.File(System.getProperty("java.io.tmpdir"),
        "graft_schema_evo/" + java.lang.Integer.toHexString(dir.hashCode)).getAbsolutePath
      val li = Tables.table(s, dir, "lineitem")
      li.where(pmod(col("l_orderkey"), lit(2)) === 0)
        .select(col("l_orderkey"), col("l_quantity"))
        .write.mode("overwrite").parquet(s"$base/gen=1")
      li.where(pmod(col("l_orderkey"), lit(2)) === 1)
        .select(col("l_orderkey"), col("l_quantity"), col("l_discount"))
        .write.mode("overwrite").parquet(s"$base/gen=2")
      s.read.option("mergeSchema", "true").parquet(base)
        .groupBy(pmod(col("l_orderkey"), lit(10)).as("bucket"))
        .agg(count(lit(1)).as("n_rows"),
          sum(col("l_quantity").cast(DecimalType(20, 4))).cast("double").as("sum_qty"),
          count(col("l_discount")).as("n_with_discount"),
          // all-v1 buckets sum NULL — pin 0.0 (both engines) rather than
          // engine-dependent NULL/NaN canonicalization
          coalesce(sum(col("l_discount").cast(DecimalType(20, 4))).cast("double"), lit(0.0))
            .as("sum_discount"))
        .orderBy(col("bucket"))
    }),

    // Mixture resampling: ACT on the domain-mixing weights (mix_domains
    // computes them; this applies them) — per-source acceptance
    // probability min(1, uniform-token-share / source-share), applied as
    // a deterministic portable-hash gate per doc (same accept set on any
    // engine/partitioning, no RNG state). Output: per-source before/after
    // doc+token counts — the achieved rebalance. Scan-shaped: one pass
    // for the per-source weights (tiny, broadcast back), one gated pass.
    "mix_resample" -> ((s, dir) => {
      import graft.operators.PortableHash
      val d = Tables.table(s, dir, "documents")
        .select(col("doc_id"), col("source"),
          size(split(col("text"), " ")).cast("long").as("n_tok"))
      val per = d.groupBy(col("source"))
        .agg(count(lit(1)).as("n_before"), sum(col("n_tok")).as("tok_before"))
      val tot = per.agg(sum(col("tok_before")).as("t_total"),
        count(lit(1)).as("n_sources"))
      val w = per.crossJoin(broadcast(tot))
        .select(col("source"), col("n_before"), col("tok_before"),
          least(lit(1.0),
            (col("t_total").cast("double") / col("n_sources")) / col("tok_before"))
            .as("wt"))
      val after = d.join(broadcast(w.select(col("source"), col("wt"))), Seq("source"))
        .where(PortableHash.hMod(col("doc_id").cast("string")) <
          col("wt") * lit(PortableHash.P.toDouble))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_after"), sum(col("n_tok")).as("tok_after"))
      w.join(after, Seq("source"), "left")
        .select(col("source"), col("n_before"),
          coalesce(col("n_after"), lit(0L)).as("n_after"),
          col("tok_before"),
          coalesce(col("tok_after"), lit(0L)).as("tok_after"),
          round(col("wt"), 6).as("weight"))
        .orderBy(col("source"))
    }),

    // MinHash-banding recall eval — the companion measurement to
    // dedup_simhash_eval, on the index that IS matched to word-Jaccard.
    // Ground truth: exhaustive word-Jaccard >= 0.9 within a bounded doc
    // sample (inverted-index candidates are provably complete for any
    // positive threshold: jac >= 0.9 implies a shared word). Prediction:
    // the production banded-minhash operator on the same sample.
    // Precision is 1.0 by construction (the operator verifies exact
    // Jaccard on candidates); recall measures what the 2x8 banding
    // misses — the number that justifies the band geometry.
    "dedup_minhash_eval" -> ((s, dir) => {
      val sample = Tables.table(s, dir, "documents").where(col("doc_id") < 500)
      val truth = Dedup.jaccardPairs(Dedup.ngramShingles(sample, 1), 0.9)
        .select(col("doc_a"), col("doc_b"), lit(1).as("t"))
      val pred = Dedup.minhashNearDups(sample, 0.9)
        .select(col("doc_a"), col("doc_b"), lit(1).as("p"))
      truth.join(pred, Seq("doc_a", "doc_b"), "full_outer")
        .agg(
          sum(coalesce(col("t"), lit(0))).cast("long").as("n_truth"),
          sum(coalesce(col("p"), lit(0))).cast("long").as("n_pred"),
          sum(when(col("t").isNotNull && col("p").isNotNull, 1L).otherwise(0L))
            .as("n_both"))
        .select(col("n_truth"), col("n_pred"), col("n_both"),
          round(when(col("n_pred") > 0, col("n_both") * lit(1.0) / col("n_pred")), 4)
            .as("precision"),
          round(when(col("n_truth") > 0, col("n_both") * lit(1.0) / col("n_truth")), 4)
            .as("recall"))
    }),

    // Streaming ANN: query vectors arrive on a stream, probe the STATIC
    // LSH-bucketed corpus through a stream-static equi-join on bucket id
    // (multi-probe: own bucket + each hamming-1 neighbor), then the
    // drained candidates rank top-10 per query. The serving-path shape:
    // the corpus index is a static broadcast-ready table, per-query work
    // is bucket-sized, and the only streamed state is the in-flight
    // microbatch. Result equals batch ann_topk_lsh by construction.
    "stream_ann_topk" -> ((s, dir) => {
      import org.apache.spark.sql.types._
      val nPlanes = 4
      val corpus = Similarity.quantizedWithNorm(Tables.table(s, dir, "embeddings"))
        .withColumn("bucket", Similarity.lshBucket(col("qv"), 64, nPlanes))
      // schema PROBED from the file (round-6 lesson: never hard-code a
      // driver table's encoding); the literal schema is only the
      // zero-file fallback
      val embSchema = StructType(Seq(
        StructField("vec_id", LongType),
        StructField("embedding", ArrayType(FloatType)),
        StructField("label", IntegerType)))
      val qStream = graft.streaming.StreamingOps
        .tableStream(s, dir, "embeddings.parquet", embSchema)
        .where(col("vec_id").isin(ExtQueries.AnnQueries: _*))
        .select(col("vec_id").as("query_id"),
          Similarity.quantize(col("embedding")).as("qqv"))
      val qNorm = qStream.select(col("query_id"), col("qqv"),
        sqrt(Similarity.dotQ(col("qqv"), col("qqv")).cast("double")).as("qnorm"),
        Similarity.lshBucket(col("qqv"), 64, nPlanes).as("bucket0"))
      val probed = qNorm.select(col("query_id"), col("qqv"), col("qnorm"),
        explode(array(
          col("bucket0") +:
            (0 until nPlanes).map(p => col("bucket0").bitwiseXOR(lit(1L << p))): _*))
          .as("bucket"))
      val scored = probed
        .join(corpus, Seq("bucket"))
        .where(col("vec_id") =!= col("query_id"))
        .select(col("query_id"), col("vec_id"),
          round(Similarity.cosineFromParts(
            Similarity.dotQ(col("qqv"), col("qv")),
            col("qnorm"), col("norm")), 4).as("cos"))
      val drained = graft.streaming.StreamingOps.runToMemory(
        scored, s"sann_${System.nanoTime()}",
        org.apache.spark.sql.streaming.OutputMode.Append())
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col("cos").desc, col("vec_id"))
      drained
        .withColumn("rnk", row_number().over(w))
        .where(col("rnk") <= 10)
        .select(col("query_id"), col("rnk"), col("vec_id"), col("cos"))
        .orderBy(col("query_id"), col("rnk"))
    })
  )

  def oracleSql: Map[String, String] = Map(

    "ann_dim_ablation" -> {
      val qs = ExtQueries.AnnQueries.mkString(", ")
      s"""WITH ${ExtQueries.quantSql},
         |q16 AS (
         |  SELECT vec_id,
         |         [CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT) for x in embedding[1:$TruncDims]] AS qv
         |  FROM embeddings),
         |qn16 AS (SELECT vec_id, qv, list_inner_product(qv, qv) AS n2 FROM q16),
         |fscored AS (
         |  SELECT qq.vec_id AS query_id, c.vec_id,
         |         ROUND(list_inner_product(qq.qv, c.qv) / (sqrt(qq.n2) * sqrt(c.n2)), 4) AS cos
         |  FROM qn qq JOIN qn c ON c.vec_id != qq.vec_id
         |  WHERE qq.vec_id IN ($qs)),
         |franked AS (
         |  SELECT query_id, vec_id,
         |         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS rnk
         |  FROM fscored),
         |fl AS (SELECT query_id, vec_id FROM franked WHERE rnk <= 10),
         |tscored AS (
         |  SELECT qq.vec_id AS query_id, c.vec_id,
         |         ROUND(list_inner_product(qq.qv, c.qv) / (sqrt(qq.n2) * sqrt(c.n2)), 4) AS cos
         |  FROM qn16 qq JOIN qn16 c ON c.vec_id != qq.vec_id
         |  WHERE qq.vec_id IN ($qs)),
         |tranked AS (
         |  SELECT query_id, vec_id,
         |         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS rnk
         |  FROM tscored),
         |tr AS (SELECT query_id, vec_id FROM tranked WHERE rnk <= 10)
         |SELECT f.query_id, CAST(COUNT(*) AS BIGINT) AS n_full,
         |       CAST(COUNT(t.vec_id) AS BIGINT) AS n_kept,
         |       round(COUNT(t.vec_id) * 1.0 / COUNT(*), 4) AS recall
         |FROM fl f LEFT JOIN tr t
         |  ON t.query_id = f.query_id AND t.vec_id = f.vec_id
         |GROUP BY f.query_id ORDER BY f.query_id""".stripMargin
    },

    "dedup_simhash_eval" ->
      s"""WITH ${ExtQueries.simhashPairsCtes},
         |pred AS (SELECT doc_a, doc_b FROM pairs
         |         WHERE bit_count(xor(fp_a, fp_b)) <= 3),
         |gd AS (SELECT doc_id, string_split(text, ' ') AS wd FROM documents),
         |gw AS (
         |  SELECT DISTINCT doc_id, wd[i] || ' ' || wd[i+1] || ' ' || wd[i+2] AS word
         |  FROM gd, UNNEST(range(1, len(wd) - 1)) AS r(i)),
         |gc AS (
         |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM gw a JOIN gw b ON a.word = b.word AND a.doc_id < b.doc_id),
         |gn AS (SELECT doc_id, COUNT(*) AS n_w FROM gw GROUP BY doc_id),
         |gcm AS (
         |  SELECT c.doc_a, c.doc_b, COUNT(*) AS n_common
         |  FROM gc c
         |  JOIN gw wa ON wa.doc_id = c.doc_a
         |  JOIN gw wb ON wb.doc_id = c.doc_b AND wb.word = wa.word
         |  GROUP BY c.doc_a, c.doc_b),
         |truth AS (
         |  SELECT doc_a, doc_b FROM gcm
         |  JOIN gn na ON na.doc_id = doc_a
         |  JOIN gn nb ON nb.doc_id = doc_b
         |  WHERE n_common * 1.0 / (na.n_w + nb.n_w - n_common) >= 0.5),
         |m AS (
         |  SELECT COALESCE(t2.one, 0) AS t, COALESCE(p2.one, 0) AS p
         |  FROM (SELECT doc_a, doc_b, 1 AS one FROM truth) t2
         |  FULL OUTER JOIN (SELECT doc_a, doc_b, 1 AS one FROM pred) p2
         |    USING (doc_a, doc_b))
         |SELECT CAST(SUM(t) AS BIGINT) AS n_truth,
         |       CAST(SUM(p) AS BIGINT) AS n_pred,
         |       CAST(SUM(t * p) AS BIGINT) AS n_both,
         |       round(CASE WHEN SUM(p) > 0 THEN SUM(t * p) * 1.0 / SUM(p) END, 4) AS "precision",
         |       round(CASE WHEN SUM(t) > 0 THEN SUM(t * p) * 1.0 / SUM(t) END, 4) AS recall
         |FROM m""".stripMargin,

    "schema_evolution" ->
      """SELECT CAST(l_orderkey % 10 AS BIGINT) AS bucket,
        |       CAST(COUNT(*) AS BIGINT) AS n_rows,
        |       CAST(SUM(CAST(l_quantity AS DECIMAL(20,4))) AS DOUBLE) AS sum_qty,
        |       CAST(COUNT(CASE WHEN l_orderkey % 2 = 1 THEN 1 END) AS BIGINT)
        |         AS n_with_discount,
        |       COALESCE(CAST(SUM(CASE WHEN l_orderkey % 2 = 1
        |                     THEN CAST(l_discount AS DECIMAL(20,4)) END) AS DOUBLE), 0.0)
        |         AS sum_discount
        |FROM lineitem
        |GROUP BY bucket ORDER BY bucket""".stripMargin,

    "mix_resample" -> {
      import PortableHash.{hModSql, P}
      s"""WITH d AS (
         |  SELECT doc_id, source,
         |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
         |  FROM documents),
         |per AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_before,
         |               CAST(SUM(n_tok) AS BIGINT) AS tok_before
         |        FROM d GROUP BY source),
         |tot AS (SELECT CAST(SUM(tok_before) AS BIGINT) AS t_total,
         |               CAST(COUNT(*) AS BIGINT) AS n_sources FROM per),
         |w AS (SELECT source, n_before, tok_before,
         |             least(1.0, (CAST(t_total AS DOUBLE) / n_sources) / tok_before) AS wt
         |      FROM per, tot),
         |kept AS (
         |  SELECT d.source, d.n_tok FROM d JOIN w ON w.source = d.source
         |  WHERE ${hModSql("CAST(doc_id AS VARCHAR)")} < wt * $P),
         |aft AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_after,
         |               CAST(SUM(n_tok) AS BIGINT) AS tok_after
         |        FROM kept GROUP BY source)
         |SELECT w.source, n_before,
         |       CAST(COALESCE(n_after, 0) AS BIGINT) AS n_after,
         |       tok_before,
         |       CAST(COALESCE(tok_after, 0) AS BIGINT) AS tok_after,
         |       round(wt, 6) AS weight
         |FROM w LEFT JOIN aft ON aft.source = w.source
         |ORDER BY w.source""".stripMargin
    },

    "dedup_minhash_eval" -> {
      import PortableHash.{hModSql, minhashSql, NumHashes, NumBands, BandRows}
      val mhExprs = (0 until NumHashes)
        .map(j => s"MIN(${minhashSql(j, "hm")}) AS mh$j").mkString(",\n  ")
      val bandSelects = (0 until NumBands).map { bnd =>
        val sig = (bnd * BandRows until (bnd + 1) * BandRows)
          .map(j => s"CAST(mh$j AS VARCHAR)").mkString(", ")
        s"SELECT doc_id, $bnd AS band, concat_ws(',', $sig) AS sig FROM sig"
      }.mkString("\n  UNION ALL ")
      s"""WITH sm AS (SELECT doc_id, text FROM documents WHERE doc_id < 500),
         |gw AS (SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS word FROM sm),
         |gn AS (SELECT doc_id, COUNT(*) AS n_w FROM gw GROUP BY doc_id),
         |gc AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |       FROM gw a JOIN gw b ON a.word = b.word AND a.doc_id < b.doc_id),
         |gcm AS (SELECT c.doc_a, c.doc_b, COUNT(*) AS n_common
         |        FROM gc c
         |        JOIN gw wa ON wa.doc_id = c.doc_a
         |        JOIN gw wb ON wb.doc_id = c.doc_b AND wb.word = wa.word
         |        GROUP BY c.doc_a, c.doc_b),
         |jv AS (SELECT doc_a, doc_b,
         |              n_common * 1.0 / (na.n_w + nb.n_w - n_common) AS jac
         |       FROM gcm
         |       JOIN gn na ON na.doc_id = doc_a
         |       JOIN gn nb ON nb.doc_id = doc_b),
         |truth AS (SELECT doc_a, doc_b FROM jv WHERE jac >= 0.9),
         |hm AS (SELECT doc_id, ${hModSql("word")} AS hm FROM gw),
         |sig AS (SELECT doc_id, $mhExprs FROM hm GROUP BY doc_id),
         |bands AS (
         |  $bandSelects),
         |cand AS (
         |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM bands a JOIN bands b
         |    ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id),
         |predv AS (
         |  SELECT c.doc_a, c.doc_b FROM cand c
         |  JOIN jv ON jv.doc_a = c.doc_a AND jv.doc_b = c.doc_b
         |  WHERE jv.jac >= 0.9),
         |m AS (
         |  SELECT COALESCE(t2.one, 0) AS t, COALESCE(p2.one, 0) AS p
         |  FROM (SELECT doc_a, doc_b, 1 AS one FROM truth) t2
         |  FULL OUTER JOIN (SELECT doc_a, doc_b, 1 AS one FROM predv) p2
         |    USING (doc_a, doc_b))
         |SELECT CAST(SUM(t) AS BIGINT) AS n_truth,
         |       CAST(SUM(p) AS BIGINT) AS n_pred,
         |       CAST(SUM(t * p) AS BIGINT) AS n_both,
         |       round(CASE WHEN SUM(p) > 0 THEN SUM(t * p) * 1.0 / SUM(p) END, 4) AS "precision",
         |       round(CASE WHEN SUM(t) > 0 THEN SUM(t * p) * 1.0 / SUM(t) END, 4) AS recall
         |FROM m""".stripMargin
    },

    // identical computation to the batch multi-probe LSH — reuse its oracle
    "stream_ann_topk" -> ExtQueries.oracleSql("ann_topk_lsh")
  )
}
