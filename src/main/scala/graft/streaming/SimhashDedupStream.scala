package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ListState, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig}
import org.apache.spark.sql.types._

import graft.operators.PortableHash

/**
 * Streaming SimHash near-duplicate filter: as documents arrive, each is
 * checked against every previously-seen document that shares at least one
 * fingerprint band (the same 4x15-bit pigeonhole as the batch
 * `Dedup.simhashNearDups` — hamming <= 3 guarantees a band collision),
 * and dropped if a near-dup was already admitted. The streaming analogue
 * of the batch dedup, with first-arrival-wins semantics.
 *
 * Scale posture: state is keyed by BAND VALUE, so an incoming doc
 * compares only against its 4 band buckets, never the full corpus —
 * per-doc work is bucket-sized (the same candidate volume the batch
 * banded join generates). State holds (doc_id, fp) per seen doc per band:
 * 4 x 16 bytes per document, corpus-linear in RocksDB, payload text never
 * enters state.
 */
object SimhashDedupProcessor {
  case class DocFp(docId: Long, fp: Long)
}

class SimhashDedupProcessor(maxHamming: Int)
    extends StatefulProcessor[Long, SimhashDedupProcessor.DocFp, Long] {
  import SimhashDedupProcessor.DocFp

  @transient private var seen: ListState[DocFp] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    seen = getHandle.getListState[DocFp]("seen",
      Encoders.product[DocFp], TTLConfig.NONE)

  /** Emits the doc_id of every row matched by an EARLIER doc in this
    * band bucket (earlier = smaller doc_id; rows are folded in doc_id
    * order within the batch, prior batches are checked via state). A
    * matched doc still joins the bucket state — the batch oracle's
    * pair semantics let an already-duplicated doc drop later docs. */
  override def handleInputRows(band: Long, rows: Iterator[DocFp],
      timerValues: TimerValues): Iterator[Long] = {
    val prior = scala.collection.mutable.ArrayBuffer.empty[DocFp]
    if (seen.exists()) seen.get().foreach(prior += _)
    val out = scala.collection.mutable.ArrayBuffer.empty[Long]
    rows.toSeq.sortBy(_.docId).foreach { r =>
      if (prior.exists(p => p.docId < r.docId &&
          java.lang.Long.bitCount(p.fp ^ r.fp) <= maxHamming))
        out += r.docId
      prior += r
      seen.appendValue(r)
    }
    out.iterator
  }
}

object SimhashDedupStream {

  import PortableHash.{h, SimHashBits, SimHashChunks, ChunkBits}

  private val docsSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  /** Per-ROW SimHash fingerprint — since the r17 opt round this IS the
    * batch expression too (`Dedup.simhashFpExpr`; the grouped
    * aggregation form is gone). Kept as an alias for the streaming
    * call sites. */
  def simhashFpExpr(text: Column): Column =
    graft.operators.Dedup.simhashFpExpr(text)

  /**
   * Kept doc_ids after streaming near-dup filtering. The drain's match
   * stream (dropped doc_ids) anti-joins the batch table — the streaming
   * stage emits only matches, so the memory sink stays duplicate-sized.
   *
   * First-arrival-wins equals the batch smaller-id-wins oracle only when
   * the drain ingests in id order; like ItemCutStream this is ASSERTED
   * (single data microbatch — the documents table is one file), not
   * assumed.
   */
  def kept(spark: org.apache.spark.sql.SparkSession, dir: String,
      maxHamming: Int = 3): DataFrame = StreamingOps.withStreamWidth(spark, dir) {
    import spark.implicits._
    StreamingOps.withTransformWithStateConf(spark) {
      // schema probed from the file; docsSchema is the zero-file
      // fallback (round-6 lesson: never hard-code a table's encoding)
      val docs = StreamingOps.tableStream(spark, dir, "documents.parquet", docsSchema)
      val withFp = docs.select(col("doc_id"), simhashFpExpr(col("text")).as("fp"))
      // one row per (doc, band): band key packs (chunk index, chunk value)
      val banded = withFp.select(col("doc_id"), col("fp"), explode(array(
        (0 until SimHashChunks).map(c =>
          (shiftright(col("fp"), c * ChunkBits).bitwiseAND(lit((1L << ChunkBits) - 1)) +
            lit(c.toLong << ChunkBits)).cast("long")): _*)).as("band"))
      val matches = banded
        .select(col("band"), col("doc_id"), col("fp"))
        .as[(Long, Long, Long)]
        .map { case (band, id, fp) => (band, SimhashDedupProcessor.DocFp(id, fp)) }
        .groupByKey(_._1)
        .mapValues(_._2)
        .transformWithState(new SimhashDedupProcessor(maxHamming),
          TimeMode.None(), OutputMode.Append())
        .toDF("dropped_id")
      val name = s"shdedup_${System.nanoTime()}"
      val q = matches.writeStream
        .format("memory")
        .queryName(name)
        .outputMode(OutputMode.Append())
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      require(q.recentProgress.length < 2000,
        "progress window saturated; the one-data-microbatch check below would undercount")
      val dataBatches = q.recentProgress.count(_.numInputRows > 0)
      require(dataBatches <= 1,
        s"stream_simhash_dedup's id-order oracle needs one data microbatch, saw $dataBatches")
      val dropped = spark.table(name).distinct()
      graft.operators.Tables.table(spark, dir, "documents")
        .select(col("doc_id"))
        .join(dropped, col("doc_id") === col("dropped_id"), "left_anti")
        .orderBy(col("doc_id"))
    }
  }
}
