package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, MapState, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/**
 * Streaming EWMA volume monitor: the ewma_anomaly control chart as an
 * online operator. Keyed by event_type; per key the state is the set of
 * OPEN days (day → running count, a MapState bounded by the watermark
 * lag in days) plus one fixed-point EWMA accumulator. An event-time
 * timer at each day's end fires when the watermark passes it; expired
 * days fold into the EWMA IN DAY ORDER and emit their control-chart row
 * (same integer recurrence as the batch query: e' = (3e + x·2^20) div 4).
 *
 * Contract vs the batch oracle: only days whose end the final watermark
 * passes are emitted (identical cutoff discipline to SessionStream);
 * since the recurrence only depends on the prefix, the emitted rows
 * equal the batch chart truncated at the watermark. Day boundaries are
 * exact milliseconds, so ms-grained timers cannot split a microsecond
 * sliver here (cf. SessionProcessor's precondition).
 */
object EwmaProcessor {
  val Scale = 1048576L // 2^20, same fixed-point as the batch query
  val DayUs = 86400000000L
  case class EvRow(event_type: String, tsUs: Long)
  case class EwmaSt(e: Long, init: Boolean)
  case class ChartRow(event_type: String, day: String, n: Long,
      ewma_scaled: Long, dev_scaled: Long, is_anomaly: Boolean)
}

class EwmaProcessor
    extends StatefulProcessor[String, EwmaProcessor.EvRow, EwmaProcessor.ChartRow] {
  import EwmaProcessor._

  @transient private var open: MapState[Long, Long] = _
  @transient private var acc: ValueState[EwmaSt] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    open = getHandle.getMapState[Long, Long]("open",
      Encoders.scalaLong, Encoders.scalaLong, TTLConfig.NONE)
    acc = getHandle.getValueState[EwmaSt]("ewma",
      Encoders.product[EwmaSt], TTLConfig.NONE)
  }

  override def handleInputRows(et: String, rows: Iterator[EvRow],
      timerValues: TimerValues): Iterator[ChartRow] = {
    // count per day within the batch, then merge into the open-day map
    val counts = scala.collection.mutable.LongMap[Long]().withDefaultValue(0L)
    rows.foreach { r => val d = (r.tsUs / DayUs) * DayUs; counts(d) += 1L }
    counts.foreach { case (dayUs, n) =>
      val prev = if (open.containsKey(dayUs)) open.getValue(dayUs) else 0L
      open.updateValue(dayUs, prev + n)
      // timers are a set keyed by expiry: re-registering the same day's
      // end on a later batch coalesces, no delete needed
      getHandle.registerTimer((dayUs + DayUs) / 1000L)
    }
    Iterator.empty
  }

  override def handleExpiredTimer(et: String, timerValues: TimerValues,
      info: ExpiredTimerInfo): Iterator[ChartRow] = {
    // fold ALL closed pending days in day order (several timers may land
    // in one batch; earlier fires drain earlier days, so this stays
    // idempotent as long as the order is ascending)
    val closed = open.iterator()
      .filter { case (dayUs, _) => (dayUs + DayUs) / 1000L <= info.getExpiryTimeInMs }
      .toArray.sortBy(_._1)
    val fmt = java.time.format.DateTimeFormatter.ISO_LOCAL_DATE
      .withZone(java.time.ZoneOffset.UTC)
    var st = if (acc.exists()) acc.get() else EwmaSt(0L, false)
    val out = closed.map { case (dayUs, n) =>
      open.removeKey(dayUs)
      val scaled = n * Scale
      val (dev, flag) =
        if (!st.init) (0L, false)
        else (scaled - st.e, math.abs(scaled - st.e) * 2 > st.e)
      st = EwmaSt(if (!st.init) scaled else (3 * st.e + scaled) / 4, true)
      ChartRow(et, fmt.format(java.time.Instant.ofEpochSecond(dayUs / 1000000L)),
        n, st.e, dev, flag)
    }
    acc.update(st)
    out.iterator
  }
}

object EwmaStream {

  /** Drain the events stream through the EWMA monitor; emitted rows are
    * the control chart for every day the final watermark closed. */
  def chart(spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame =
    StreamingOps.withStreamWidth(spark, dir) {
      import spark.implicits._
      StreamingOps.withTransformWithStateConf(spark) {
        val stream = StreamingOps.eventsStream(spark, dir)
          .withWatermark("ts", "0 seconds")
          .select(col("event_type"), expr("unix_micros(ts)").as("tsUs"))
          .as[EwmaProcessor.EvRow]
        val chart = stream
          .groupByKey(_.event_type)
          .transformWithState(new EwmaProcessor,
            TimeMode.EventTime(), OutputMode.Append())
        StreamingOps.runToMemory(chart.toDF(),
          s"ewma_${System.nanoTime()}", OutputMode.Append())
          .orderBy(col("event_type"), col("day"))
      }
    }
}
