package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Multimodal, Tables}

/**
 * Round-6 fifth wave: perceptual-hash near-dup over the binary media
 * path (banded hamming join — the image-dedup shape), int8 scalar
 * quantization of embeddings (the vector-compression scan), and a
 * data-quality audit report (the pre-ingest integrity gate).
 */
object ExtQueries15 {

  private val PhashChunks = 4
  private val ChunkBits = 15 // 4 x 15 = 60-bit hash (fits the md5-prefix long)
  private val MaxHamming = 3 // pigeonhole: <= 3 flipped bits => >= 1 equal chunk

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Perceptual-hash near-dup on the MEDIA payload path: a 60-bit
    // "pHash" derived from the binary payload (stub: md5-prefix bits —
    // a real pHash would come from decoded pixels; the banded-join
    // plumbing is identical), banded into 4x15-bit chunks so hamming
    // distance <= 3 guarantees a chunk collision (pigeonhole). Each
    // candidate pair emits once (chunks before the matched one must
    // differ); exact hamming verify via bit_count(xor). Payloads never
    // shuffle — only (doc_id, phash, chunk) rows do.
    "media_phash_neardup" -> ((s, dir) => {
      val media = Multimodal.mediaTable(Tables.table(s, dir, "documents"))
        .select(col("doc_id"),
          conv(substring(hex(col("payload")), 1, 15), 16, 10).cast("long").as("phash"))
      val chunks = (0 until PhashChunks).map(j =>
        media.select(col("doc_id"), col("phash"), lit(j).as("c"),
          shiftright(col("phash"), j * ChunkBits).bitwiseAND(lit((1 << ChunkBits) - 1)).as("ck")))
        .reduce(_ unionAll _)
      val a = chunks.as("a")
      val b = chunks.as("b")
      val earlierChunksDiffer = (0 until PhashChunks).map(j =>
        when(col("a.c") > j,
          shiftright(col("a.phash"), j * ChunkBits).bitwiseAND(lit((1 << ChunkBits) - 1)) =!=
            shiftright(col("b.phash"), j * ChunkBits).bitwiseAND(lit((1 << ChunkBits) - 1)))
          .otherwise(lit(true)))
        .reduce(_ && _)
      a.join(b,
          col("a.c") === col("b.c") && col("a.ck") === col("b.ck") &&
            col("a.doc_id") < col("b.doc_id") && earlierChunksDiffer)
        .where(bit_count(col("a.phash").bitwiseXOR(col("b.phash"))) <= MaxHamming)
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
          bit_count(col("a.phash").bitwiseXOR(col("b.phash"))).as("hamming"))
        .orderBy(col("doc_a"), col("doc_b"))
    }),

    // Int8 scalar quantization of the embedding column: per-vector scale
    // 127/max|v|, quantized checksum via the engine-portable floor(x+0.5)
    // rounding, and the max reconstruction error. Scan-shaped — the
    // compression pass before shipping vectors to an index.
    "embed_quantize" -> ((s, dir) => {
      val vd = transform(col("embedding"), x => abs(x.cast("double")))
      val scale = lit(127.0) / array_max(vd)
      Tables.table(s, dir, "embeddings")
        .select(col("vec_id"),
          round(scale, 6).as("scale"),
          // integer-valued double terms (|q| <= 127, i <= dims): the sum
          // is exact whatever the accumulation order on either engine
          aggregate(
            transform(sequence(lit(1), size(col("embedding"))),
              i => floor(element_at(col("embedding"), i).cast("double") * scale + 0.5)
                * i.cast("double")),
            lit(0.0), (acc, x) => acc + x).cast("long").as("qcheck"),
          round(aggregate(col("embedding"), lit(0.0),
            (acc, v) => greatest(acc,
              abs(v.cast("double") - floor(v.cast("double") * scale + 0.5) / scale))), 6)
            .as("max_err"))
        .orderBy(col("vec_id"))
    }),

    // Data-quality audit: the integrity gate a pipeline runs before
    // ingest — range checks, null checks, referential integrity (anti
    // joins), derived-column consistency. Output is one row per check
    // with the violation count; every check is a scan or a single
    // broadcast/shuffle anti-join, unioned into a tiny report.
    "dq_audit" -> ((s, dir) => {
      val li = Tables.table(s, dir, "lineitem")
      val orders = Tables.table(s, dir, "orders")
      val cust = Tables.table(s, dir, "customer")
      val ev = Tables.events(s, dir)
      val docs = Tables.table(s, dir, "documents")
      def check(tag: String, violations: DataFrame): DataFrame =
        violations.agg(count(lit(1)).as("n_violations")).select(lit(tag).as("check"), col("n_violations"))
      check("lineitem.quantity_range", li.where(col("l_quantity") < 1 || col("l_quantity") > 50))
        .unionAll(check("lineitem.price_positive", li.where(col("l_extendedprice") <= 0)))
        .unionAll(check("lineitem.orphan_order",
          li.select(col("l_orderkey")).join(orders,
            col("l_orderkey") === col("o_orderkey"), "left_anti")))
        .unionAll(check("orders.orphan_customer",
          orders.select(col("o_custkey")).join(cust,
            col("o_custkey") === col("c_custkey"), "left_anti")))
        .unionAll(check("events.null_user", ev.where(col("user_id").isNull)))
        .unionAll(check("events.negative_value", ev.where(col("value") < 0)))
        .unionAll(check("documents.nchars_consistent",
          docs.where(col("n_chars") =!= length(col("text")))))
        .orderBy(col("check"))
    })
  )

  def oracleSql: Map[String, String] = Map(

    "media_phash_neardup" -> {
      val chunkSqls = (0 until PhashChunks).map { j =>
        s"SELECT doc_id, phash, $j AS c, (phash // ${1L << (j * ChunkBits)}) % ${1 << ChunkBits} AS ck FROM p"
      }.mkString("\n        | UNION ALL ")
      val earlier = (0 until PhashChunks).map { j =>
        s"(a.c <= $j OR (a.phash // ${1L << (j * ChunkBits)}) % ${1 << ChunkBits} <> (b.phash // ${1L << (j * ChunkBits)}) % ${1 << ChunkBits})"
      }.mkString(" AND ")
      s"""WITH p AS (
         |  SELECT doc_id, CAST('0x' || substr(md5(text), 1, 15) AS BIGINT) AS phash
         |  FROM documents),
         |chunks AS (
         | $chunkSqls),
         |pairs AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |         CAST(bit_count(xor(a.phash, b.phash)) AS INT) AS hamming
         |  FROM chunks a JOIN chunks b
         |    ON a.c = b.c AND a.ck = b.ck AND a.doc_id < b.doc_id AND $earlier)
         |SELECT doc_a, doc_b, hamming FROM pairs
         |WHERE hamming <= $MaxHamming ORDER BY doc_a, doc_b""".stripMargin
    },

    "embed_quantize" ->
      """WITH q AS (
        |  SELECT vec_id,
        |         127.0 / list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS s,
        |         embedding
        |  FROM embeddings)
        |SELECT vec_id, round(s, 6) AS scale,
        |       CAST(list_sum(list_transform(range(1, len(embedding) + 1),
        |              i -> floor(CAST(embedding[CAST(i AS INT)] AS DOUBLE) * s + 0.5) * i)) AS BIGINT)
        |         AS qcheck,
        |       round(list_max(list_transform(embedding,
        |              x -> abs(CAST(x AS DOUBLE) - floor(CAST(x AS DOUBLE) * s + 0.5) / s))), 6)
        |         AS max_err
        |FROM q ORDER BY vec_id""".stripMargin,

    "dq_audit" ->
      """SELECT 'lineitem.quantity_range' AS "check", CAST(COUNT(*) AS BIGINT) AS n_violations
        |FROM lineitem WHERE l_quantity < 1 OR l_quantity > 50
        |UNION ALL
        |SELECT 'lineitem.price_positive', CAST(COUNT(*) AS BIGINT)
        |FROM lineitem WHERE l_extendedprice <= 0
        |UNION ALL
        |SELECT 'lineitem.orphan_order', CAST(COUNT(*) AS BIGINT)
        |FROM lineitem l WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
        |UNION ALL
        |SELECT 'orders.orphan_customer', CAST(COUNT(*) AS BIGINT)
        |FROM orders o WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
        |UNION ALL
        |SELECT 'events.null_user', CAST(COUNT(*) AS BIGINT) FROM events WHERE user_id IS NULL
        |UNION ALL
        |SELECT 'events.negative_value', CAST(COUNT(*) AS BIGINT) FROM events WHERE value < 0
        |UNION ALL
        |SELECT 'documents.nchars_consistent', CAST(COUNT(*) AS BIGINT)
        |FROM documents WHERE n_chars <> length(text)
        |ORDER BY "check"""".stripMargin
  )
}
