package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/**
 * Streaming item-cut sampler as a Spark 4.x StatefulProcessor — the
 * reference's ItemInteractionCounterTwoInputStreamOperator re-expressed
 * on transformWithState (reference :119-143): per item, a running count
 * flags the first fMax interactions sample=true; everything after is
 * dropped (flagged false). Refunds are the batch loop's job (SURVEY
 * §7.4.1) — the acyclic streaming DAG runs cut-only.
 *
 * State per item is ONE int in RocksDB: bounded by |items| regardless of
 * stream length — the 100 TB load-shedding contract. Rows are folded in
 * (ts, event_id) order within each batch for the deterministic contract
 * shared with the batch fold (Sampling.itemCutFold).
 */
object ItemCutProcessor {
  case class EvRow(item: Int, event_id: Long, user: Int, tsMs: Long)
}

class ItemCutProcessor(fMax: Int)
    extends StatefulProcessor[Int, ItemCutProcessor.EvRow, ItemCutProcessor.EvRow] {
  import ItemCutProcessor.EvRow

  @transient private var cntState: ValueState[Int] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    cntState = getHandle.getValueState[Int]("cnt", Encoders.scalaInt, TTLConfig.NONE)

  override def handleInputRows(item: Int, rows: Iterator[EvRow],
      timerValues: TimerValues): Iterator[EvRow] = {
    var cnt = if (cntState.exists()) cntState.get() else 0
    val sampled = rows.toSeq.sortBy(e => (e.tsMs, e.event_id)).iterator
      .filter { _ =>
        val keep = cnt < fMax
        if (keep) cnt += 1
        keep
      }.toSeq
    cntState.update(cnt)
    sampled.iterator
  }
}

object ItemCutStream {

  /**
   * Streaming first-fMax-per-item sampler over the events stream.
   *
   * Streaming semantics select by ARRIVAL order (per microbatch, sorted
   * by (ts, event_id) within each batch) — the reference's own contract.
   * That equals the batch oracle's global (ts, event_id) order only when
   * the stream drains in ONE data microbatch, which is asserted on the
   * query's progress rather than assumed: a multi-file source could
   * deliver later-ts events first and legitimately select a different
   * arrival-order sample.
   */
  def sampled(spark: org.apache.spark.sql.SparkSession, dir: String, fMax: Int): DataFrame = StreamingOps.withStreamWidth(spark, dir) {
    import spark.implicits._
    // RocksDB provider + progress-retention cap, query-scoped and
    // restored after (see StreamingOps.withTransformWithStateConf); the
    // raised progress cap lets the one-data-microbatch assertion below
    // see every batch of the drain.
    StreamingOps.withTransformWithStateConf(spark) {
      val stream = StreamingOps.eventsStream(spark, dir)
        .select(
          get_json_object(col("props"), "$.k").cast("int").as("item"),
          col("event_id"),
          col("user_id").cast("int").as("user"),
          unix_millis(col("ts")).as("tsMs"))
        .as[ItemCutProcessor.EvRow]
      val out = stream
        .groupByKey(_.item)
        .transformWithState(new ItemCutProcessor(fMax),
          TimeMode.None(), OutputMode.Append())
        .toDF()
      val name = s"itemcut_${System.nanoTime()}"
      val q = out.writeStream
        .format("memory")
        .queryName(name)
        .outputMode(OutputMode.Append())
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      // the retention cap must not have evicted early progress entries,
      // or the data-batch count below could undercount and vacuously pass
      require(q.recentProgress.length < 2000,
        "progress window saturated; the one-data-microbatch check below would undercount")
      val dataBatches = q.recentProgress.count(_.numInputRows > 0)
      require(dataBatches <= 1,
        s"stream_item_cut's batch-oracle equivalence needs one data microbatch, saw $dataBatches")
      spark.table(name)
        .select(col("item"), col("event_id"), col("user"))
        .orderBy(col("item"), col("event_id"))
    }
  }
}
