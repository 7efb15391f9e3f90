package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/**
 * Streaming bounded top-K per key as a Spark 4.x StatefulProcessor — the
 * reference's IntDoublePriorityQueue (SURVEY §2 #14) lifted into
 * transformWithState keyed state, completing §7.3's "custom bounded-heap
 * for streaming state" item. State per key is exactly the K best
 * (score, id) entries plus a version counter — constant memory per key
 * however long the stream runs, the same bound as the reference's
 * IntDoublePriorityQueue (reference IntDoublePriorityQueue.java:34-46).
 *
 * Ordering contract: entries rank by (score DESC, id ASC) — fully
 * deterministic, so a drained stream's final state equals the batch
 * window-rank oracle.
 *
 * Emission: Append-mode transformWithState cannot retract earlier
 * emissions, so each batch emits the key's CURRENT top-K tagged with a
 * per-key version; the final answer keeps each key's max-version rows.
 * A single-batch drain (AvailableNow over one file) emits version 1
 * only.
 */
object TopKProcessor {
  case class Scored(item: Int, id: Long, score: Double)
  case class Emit(item: Int, version: Int, id: Long, score: Double)
  /** (version, ids, scores) — parallel arrays keep the state encoder flat. */
  case class HeapState(version: Int, ids: Array[Long], scores: Array[Double])
}

class TopKProcessor(k: Int)
    extends StatefulProcessor[Int, TopKProcessor.Scored, TopKProcessor.Emit] {
  import TopKProcessor._

  @transient private var st: ValueState[HeapState] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    st = getHandle.getValueState[HeapState]("topk", Encoders.product[HeapState], TTLConfig.NONE)

  override def handleInputRows(item: Int, rows: Iterator[Scored],
      timerValues: TimerValues): Iterator[Emit] = {
    val prev = if (st.exists()) st.get() else HeapState(0, Array.empty, Array.empty)
    // explicit comparator, NOT sortBy(-s): SQL descending order puts NaN
    // above all values (and -0.0 == 0.0); IEEE `<` on a negated Double
    // would sink NaN and split the zeros, diverging from the oracle at
    // the rank-k boundary. java.lang.Double.compare gives the total
    // order (NaN greatest, -0.0 < 0.0) that ORDER BY score DESC uses.
    val merged = (prev.scores.zip(prev.ids) ++ rows.map(r => (r.score, r.id)))
      .sortWith { case ((s1, id1), (s2, id2)) =>
        val c = java.lang.Double.compare(s2, s1) // descending, NaN first
        c < 0 || (c == 0 && id1 < id2)
      }
      .take(k)
    val version = prev.version + 1
    st.update(HeapState(version, merged.map(_._2), merged.map(_._1)))
    merged.iterator.map { case (s, id) => Emit(item, version, id, s) }
  }
}

object TopKStream {

  /**
   * Streaming per-item top-K events by (value DESC, event_id ASC) over
   * the events table; drained AvailableNow, final state selected by max
   * version per key. Equals the batch window-rank result for any batch
   * split (the bounded state is merge-order-insensitive given the
   * deterministic ordering).
   */
  def topK(spark: org.apache.spark.sql.SparkSession, dir: String, k: Int): DataFrame =
    StreamingOps.withStreamWidth(spark, dir) {
      import spark.implicits._
      // RocksDB provider, query-scoped and restored after (see
      // StreamingOps.withTransformWithStateConf)
      StreamingOps.withTransformWithStateConf(spark) {
        val stream = StreamingOps.eventsStream(spark, dir)
          .select(
            get_json_object(col("props"), "$.k").cast("int").as("item"),
            col("event_id").as("id"),
            col("value").as("score"))
          .as[TopKProcessor.Scored]
        val out = stream
          .groupByKey(_.item)
          .transformWithState(new TopKProcessor(k),
            TimeMode.None(), OutputMode.Append())
          .toDF()
        val name = s"stopk_${System.nanoTime()}"
        val q = out.writeStream
          .format("memory")
          .queryName(name)
          .outputMode(OutputMode.Append())
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        val t = spark.table(name)
        val wmax = org.apache.spark.sql.expressions.Window.partitionBy(col("item"))
        t.withColumn("vmax", max(col("version")).over(wmax))
          .where(col("version") === col("vmax"))
          .select(col("item"), col("id").as("event_id"), col("score").as("value"))
          .orderBy(col("item"), col("event_id"))
      }
    }
}
