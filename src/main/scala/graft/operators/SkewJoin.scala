package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Salted join for skewed keys: replicate the (small-ish) right side
 * `salt` times and scatter the left side's hot keys across the replicas,
 * so one hot key's rows spread over `salt` reducers instead of one.
 *
 * Equivalence: join output is identical to the unsalted join (spec-
 * checked); only the physical key distribution changes.
 *
 * When to use at 100 TB: AQE's skew-join handles *post-shuffle partition*
 * skew automatically, but a single pathological key that exceeds one
 * task's memory still needs salting (or a broadcast if the right side
 * fits). `salt` should be ~(hot-key rows / target partition rows).
 */
object SkewJoin {

  /** Join types whose output is provably identical to the unsalted join:
    * right/full outer would replicate each unmatched RIGHT row once per
    * salt replica (null-padded `salt`-fold duplicates), so they are
    * rejected rather than silently wrong. */
  private val SupportedJoinTypes =
    Set("inner", "left", "leftouter", "leftsemi", "leftanti", "semi", "anti", "cross")

  def saltedJoin(left: DataFrame, right: DataFrame, key: String, salt: Int,
      joinType: String = "inner"): DataFrame = {
    require(salt > 1, "salt must be > 1")
    require(SupportedJoinTypes.contains(joinType.toLowerCase.replace("_", "")),
      s"saltedJoin supports inner/left-variant join types only, got $joinType " +
        "(right/full outer would duplicate unmatched right rows per salt replica)")
    // left: random-ish but DETERMINISTIC scatter (hash of all columns mod salt
    // would be ideal; monotonically_increasing_id is partition-dependent, so
    // derive the scatter from the row content via a stable hash)
    val l = left.withColumn("__salt",
      pmod(hash(left.columns.map(col): _*), lit(salt)))
    // right: replicate each row salt times
    val r = right.withColumn("__salt", explode(array((0 until salt).map(lit): _*)))
    l.join(r, Seq(key, "__salt"), joinType).drop("__salt")
  }
}
