package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * EXACT distributed heavy hitters (frequent items) via the two-phase
 * Misra-Gries pattern:
 *
 *   phase 1  mapPartitions Misra-Gries with k counters per partition —
 *            one pass, O(k) memory, no shuffle. MG guarantee: any item
 *            whose count within a partition exceeds n_part/(k+1)
 *            survives that partition's summary; summing guarantees any
 *            item with GLOBAL count > N/(k+1) survives in at least one
 *            partition (pigeonhole). With k >= N/threshold the
 *            candidate set is a superset of the true answer.
 *   phase 2  exact recount of the (<= k x partitions, tiny) candidate
 *            set via a broadcast semi-join + hash aggregate, then the
 *            threshold filter — so the OUTPUT is exact, not a sketch.
 *
 * This is the scalable form of "GROUP BY x HAVING count >= s": the full
 * groupBy shuffles every distinct key (billions at 100 TB); this plan
 * shuffles only rows matching the few candidates.
 *
 * Reference tie-in: the item cut's "most-active items" intuition
 * (ItemInteractionCounterTwoInputStreamOperator.java:129-139) is the
 * streaming cousin; this is the batch-exact operator.
 */
object HeavyHitters {

  /** Per-partition Misra-Gries summary of the single key column. */
  private def mgCandidates(keys: DataFrame, k: Int): DataFrame = {
    val spark = keys.sparkSession
    import spark.implicits._
    keys.as[String].mapPartitions { it =>
      val counters = new scala.collection.mutable.HashMap[String, Long]()
      it.foreach { key =>
        if (counters.contains(key)) counters(key) += 1
        else if (counters.size < k) counters(key) = 1
        else {
          // decrement-all step; drop zeroed counters
          val dead = new scala.collection.mutable.ArrayBuffer[String]()
          counters.keysIterator.foreach { c =>
            val v = counters(c) - 1
            if (v == 0) dead += c else counters(c) = v
          }
          dead.foreach(counters.remove)
        }
      }
      counters.keysIterator
    }.toDF("key").distinct()
  }

  /**
   * Exact counts of every key with global count >= threshold.
   * `key` must be a string column named or aliasable to one key.
   */
  /**
   * Null keys are EXCLUDED (the left-semi recount's equi-join would
   * silently drop them on one path but not the other); filter upstream
   * or map nulls to a sentinel if the null group matters.
   */
  def exact(df: DataFrame, key: Column, threshold: Long): DataFrame = {
    require(threshold > 0, "threshold must be positive")
    // cache the projected key column: the operator is inherently
    // multi-pass (N for sizing k, the MG pass, the recount), and without
    // the cache each pass re-runs the upstream extraction (e.g. JSON
    // parsing). One narrow string column; MEMORY_AND_DISK spills fine.
    val keys = df.select(key.cast("string").as("key"))
      .where(col("key").isNotNull).persist()
    val n = keys.count()
    // k >= N/threshold makes MG's N/(k+1) bound strictly below threshold:
    // if x survived NO partition then count_i(x) <= n_i/(k+1) everywhere,
    // so C(x) <= N/(k+1) < threshold — contradiction
    val k = math.max(1L, n / threshold + 1L)
    // The BROADCAST candidate set can reach k x numPartitions keys (each
    // partition's MG summary holds up to k): fall back to the plain
    // aggregate whenever that bound isn't comfortably broadcastable.
    val partitions = math.max(1, keys.rdd.getNumPartitions)
    // materialize the (tiny: keys above threshold) result eagerly so the
    // cached key column is released before returning — repeated calls in
    // a long-lived session must not accumulate storage memory
    val out = recountPlan(keys, k, partitions, threshold).localCheckpoint(true)
    keys.unpersist()
    out
  }

  /** The lazy recount plan — split out so PlanSpec can assert the
    * broadcast-semi-join shape before `exact` materializes it. */
  private[graft] def recountPlan(keys: DataFrame, k: Long, partitions: Int,
      threshold: Long): DataFrame =
    if (k > 1000000L || k * partitions > 8000000L) {
      keys.groupBy(col("key")).agg(count(lit(1)).as("n"))
        .where(col("n") >= threshold)
    } else {
      val cands = mgCandidates(keys, k.toInt)
      keys
        .join(broadcast(cands), Seq("key"), "left_semi")
        .groupBy(col("key"))
        .agg(count(lit(1)).as("n"))
        .where(col("n") >= threshold)
    }
}
