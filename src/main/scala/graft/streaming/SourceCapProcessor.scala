package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/**
 * Streaming per-key admission quota (the source_cap operator's online
 * form): each key (source) admits at most `k` rows, first-come in
 * arrival order; everything after the quota is dropped. State per key is
 * ONE long (the admitted count) — the minimal bounded-state shape, the
 * same admission-control pattern as the reference's item cut
 * (ItemInteractionCounterTwoInputStreamOperator.java:129-139) minus the
 * window/refund machinery.
 *
 * Ordering contract: rows are sorted by id WITHIN each batch's key
 * group before admission, so the admitted set is deterministic per
 * batch split; it equals the batch "first k by id per key" oracle when
 * files arrive in ascending-id order (the file monitor's mod-time
 * contract, reference ContinuousFileMonitoringFunction.java:266-294 —
 * here: one parquet file, one batch).
 */
object SourceCapProcessor {
  case class In(source: String, doc_id: Long, n_chars: Long)
  case class Admitted(source: String, doc_id: Long, n_chars: Long)
}

class SourceCapProcessor(k: Int)
    extends StatefulProcessor[String, SourceCapProcessor.In, SourceCapProcessor.Admitted] {
  import SourceCapProcessor._

  @transient private var st: ValueState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    st = getHandle.getValueState[Long]("admitted", Encoders.scalaLong, TTLConfig.NONE)

  override def handleInputRows(source: String, rows: Iterator[In],
      timerValues: TimerValues): Iterator[Admitted] = {
    val already = if (st.exists()) st.get() else 0L
    val take = math.max(0L, k - already)
    val admitted = rows.toArray.sortBy(_.doc_id).take(take.toInt)
    st.update(already + admitted.length)
    admitted.iterator.map(r => Admitted(r.source, r.doc_id, r.n_chars))
  }
}

object SourceCapStream {

  /**
   * Drain the documents table as a stream through the admission
   * processor; report per-source kept count, id checksum, and char
   * budget — the streaming half of the source_cap contract (batch half:
   * ExtQueries23.queries("source_cap"), arrival order = doc_id).
   */
  def capped(spark: SparkSession, dir: String, k: Int): DataFrame =
    StreamingOps.withStreamWidth(spark, dir) {
      import spark.implicits._
      StreamingOps.withTransformWithStateConf(spark) {
        import org.apache.spark.sql.types._
        val docSchema = StructType(Seq(
          StructField("doc_id", LongType), StructField("text", StringType),
          StructField("lang", StringType), StructField("source", StringType),
          StructField("n_chars", LongType)))
        val stream = StreamingOps
          .tableStream(spark, dir, "documents.parquet", docSchema)
          .select(col("source"), col("doc_id"), col("n_chars"))
          .as[SourceCapProcessor.In]
        val admitted = stream
          .groupByKey(_.source)
          .transformWithState(new SourceCapProcessor(k),
            org.apache.spark.sql.streaming.TimeMode.None(),
            OutputMode.Append())
        val drained = StreamingOps.runToMemory(admitted.toDF(),
          s"srccap_${System.nanoTime()}", OutputMode.Append())
        drained.groupBy(col("source"))
          .agg(count(lit(1)).as("n_kept"),
            sum(col("doc_id")).as("sum_kept_ids"),
            max(col("doc_id")).as("max_kept_id"),
            sum(col("n_chars")).as("chars_kept"))
          .orderBy(col("source"))
      }
    }
}
