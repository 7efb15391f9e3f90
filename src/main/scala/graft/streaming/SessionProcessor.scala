package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/**
 * Custom session windows on transformWithState with EVENT-TIME TIMERS —
 * the state-API feature the reference's operators are built on (both
 * interaction counters buffer per window and fire on an event-time
 * timer at the watermark: ItemInteractionCounterTwoInputStreamOperator
 * .java:119-143, UserInteractionCounterOneInputStreamOperator
 * .java:145-257). Here the timer closes an idle session: each user
 * keys one open-session row; an incoming event either extends it,
 * or closes it (emitting the finished session) and starts a new one;
 * the armed timer at (last event + gap) emits the session once the
 * watermark passes — the same merging-session semantics as Spark's
 * session_window, re-derived on raw state + timers, checkable against
 * the same oracle.
 *
 * State per user = one fixed-size row + one timer: bounded by |users|,
 * independent of stream length. Precision note: timers are
 * millisecond-grained while event time is microsecond-grained; a
 * session whose close falls in the same millisecond as the final
 * watermark may round across the boundary. Exactness at the gate is
 * over the driver datasets (micros at ms boundaries don't occur);
 * at true boundaries the divergence window is < 1 ms.
 */
object SessionProcessor {
  case class EvRow(user_id: Long, tsUs: Long, event_id: Long)
  case class OpenSession(startUs: Long, lastUs: Long, n: Long, timerMs: Long)
  case class SessionOut(user_id: Long, n_events: Long)
}

class SessionProcessor(gapUs: Long)
    extends StatefulProcessor[Long, SessionProcessor.EvRow, SessionProcessor.SessionOut] {
  import SessionProcessor._

  @transient private var st: ValueState[OpenSession] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    st = getHandle.getValueState[OpenSession]("open",
      Encoders.product[OpenSession], TTLConfig.NONE)

  override def handleInputRows(user: Long, rows: Iterator[EvRow],
      timerValues: TimerValues): Iterator[SessionOut] = {
    // deterministic fold order within the batch (same contract as the
    // batch sessionizer and the other processors)
    val sorted = rows.toArray.sortInPlaceBy(e => (e.tsUs, e.event_id))
    val out = scala.collection.mutable.ArrayBuffer[SessionOut]()
    var cur = if (st.exists()) st.get() else null
    sorted.foreach { e =>
      if (cur == null) cur = OpenSession(e.tsUs, e.tsUs, 1L, 0L)
      else if (e.tsUs - cur.lastUs >= gapUs) {
        // gap exceeded: the previous session is closed by evidence (a
        // later event exists) — emit now, no timer needed for it
        out += SessionOut(user, cur.n)
        cur = OpenSession(e.tsUs, e.tsUs, 1L, cur.timerMs)
      } else {
        // max(): a cross-batch late arrival (tsUs < lastUs, within the
        // gap) joins the session but must not move its end BACKWARD —
        // shrinking lastUs would re-arm the close timer too early and
        // split the session against the lag/cumsum oracle
        cur = cur.copy(lastUs = math.max(cur.lastUs, e.tsUs),
          startUs = math.min(cur.startUs, e.tsUs), n = cur.n + 1)
      }
    }
    if (cur != null) {
      // (re)arm the close timer at session end; timers are a set keyed
      // by expiry, so deregister the stale one when the session extends
      val newTimer = (cur.lastUs + gapUs) / 1000L
      if (cur.timerMs != newTimer) {
        if (cur.timerMs > 0L) getHandle.deleteTimer(cur.timerMs)
        getHandle.registerTimer(newTimer)
      }
      st.update(cur.copy(timerMs = newTimer))
    }
    out.iterator
  }

  override def handleExpiredTimer(user: Long, timerValues: TimerValues,
      info: ExpiredTimerInfo): Iterator[SessionOut] = {
    if (st.exists()) {
      val cur = st.get()
      // a timer raced by a same-batch extension was deleted; guard on
      // the armed expiry anyway (defensive against provider replay)
      if (cur.timerMs == info.getExpiryTimeInMs) {
        st.clear()
        return Iterator.single(SessionOut(user, cur.n))
      }
    }
    Iterator.empty
  }
}

object SessionStream {

  /**
   * Per-user session stats over CLOSED sessions (timer-emitted before
   * the final watermark), aggregated batch-side after the drain —
   * comparable against the same lag/cumsum closed-session oracle as
   * the session_window implementation (stream_session_agg).
   */
  def sessionAgg(spark: org.apache.spark.sql.SparkSession, dir: String,
      gapMinutes: Int = 30): DataFrame = StreamingOps.withStreamWidth(spark, dir) {
    import spark.implicits._
    val gapUsL = gapMinutes * 60L * 1000000L
    // Checkable exactness precondition (ADVICE r4): timers fire at
    // MILLIsecond grain while the closed-session oracle compares close
    // times at MICROsecond grain (close <= max(ts)). A close time c in
    // (maxUs, ceil-to-ms(maxUs)) would fire stream-side yet count open
    // oracle-side. c = lastUs + gap, so it suffices that NO event's
    // ts + gap lands in that sub-millisecond sliver — one tiny agg +
    // filter over the batch table turns the documented assumption into
    // a loud failure instead of a silent divergence.
    locally {
      // ONE extra job, not two (r5 advice): the 1-row max broadcasts
      // back against the scan inside the same action, so the hot path
      // pays a single precheck job per invocation
      val evUs = graft.operators.Tables.events(spark, dir)
        .select(expr("unix_micros(ts)").as("us"))
      val bad = evUs
        .crossJoin(broadcast(evUs.agg(max(col("us")).as("maxUs"))))
        .where(col("us") + gapUsL > col("maxUs") &&
          col("us") + gapUsL < col("maxUs") - pmod(col("maxUs"), lit(1000L)) + 1000L)
        .limit(1).collect()
      require(bad.isEmpty,
        "sessionAgg: a session close time lands within 1 ms of the final watermark " +
          s"(us=${bad.headOption.map(_.get(0)).orNull}); ms-grained timers cannot " +
          "match the microsecond oracle here")
    }
    StreamingOps.withTransformWithStateConf(spark) {
      val stream = StreamingOps.eventsStream(spark, dir)
        .withWatermark("ts", "0 seconds")
        .select(col("user_id"), expr("unix_micros(ts)").as("tsUs"), col("event_id"))
        .as[SessionProcessor.EvRow]
      val out = stream
        .groupByKey(_.user_id)
        .transformWithState(new SessionProcessor(gapUsL),
          TimeMode.EventTime(), OutputMode.Append())
        .toDF()
      StreamingOps.runToMemory(out, s"sesstimer_${System.nanoTime()}",
          org.apache.spark.sql.streaming.OutputMode.Append())
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_sessions"),
          sum(col("n_events")).as("n_events"),
          max(col("n_events")).as("max_session_events"))
        .orderBy(col("user_id"))
    }
  }
}
