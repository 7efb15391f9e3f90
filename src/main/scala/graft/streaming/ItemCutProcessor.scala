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
    // transformWithState requires the RocksDB provider; set it for THIS
    // query only and restore the session's prior value (shared sessions
    // must not inherit a permanently mutated state-store provider).
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val priorProvider = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    // recentProgress is capped by numRecentProgressUpdates (default 100)
    // and would undercount long drains; raise the cap for this query so
    // the one-data-microbatch assertion sees every batch, and restore it.
    // 2000 comfortably covers any AvailableNow drain while bounding the
    // driver's retained StreamingQueryProgress objects (each ~KBs) if a
    // concurrent stream shares the session inside this window.
    val progressKey = "spark.sql.streaming.numRecentProgressUpdates"
    val priorProgress = spark.conf.getOption(progressKey)
    spark.conf.set(progressKey, "2000")
    try {
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
      val dataBatches = q.recentProgress.count(_.numInputRows > 0)
      require(dataBatches <= 1,
        s"stream_item_cut's batch-oracle equivalence needs one data microbatch, saw $dataBatches")
      spark.table(name)
        .select(col("item"), col("event_id"), col("user"))
        .orderBy(col("item"), col("event_id"))
    } finally {
      priorProvider match {
        case Some(v) => spark.conf.set(providerKey, v)
        case None => spark.conf.unset(providerKey)
      }
      priorProgress match {
        case Some(v) => spark.conf.set(progressKey, v)
        case None => spark.conf.unset(progressKey)
      }
    }
  }
}
