package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.execution.LogicalRDD

/**
 * Deterministic release of an eagerly-localCheckpointed Dataset's blocks.
 *
 * `localCheckpoint(eager = true)` is the one materialization primitive
 * that (a) runs a single job and (b) leaves EXACT size statistics on the
 * resulting LogicalRDD — which is what lets Catalyst pick broadcast
 * sides at planning time instead of planning sort-merge exchanges it
 * would only convert (after paying their shuffle writes) at runtime.
 * Its drawback is cleanup: the checkpoint blocks are released only when
 * the context cleaner GCs the unreferenced RDD, and a tight per-batch
 * maintenance loop can outrun the cleaner (a 24-batch sf3 soak retained
 * +570 MB before collection caught up). This helper closes that gap:
 * call it once the checkpointed frame's consumers have materialized.
 */
object CheckpointBridge {

  /** Unpersist the RDD behind an eagerly-localCheckpointed Dataset.
    * No-op for plans that are not a bare LogicalRDD (nothing to free). */
  def release(ds: Dataset[_]): Unit = ds.queryExecution.analyzed match {
    case l: LogicalRDD => l.rdd.unpersist(blocking = false); ()
    case _ => ()
  }

  /** True iff the Dataset is already a bare materialized RDD (the result
    * of a localCheckpoint) — callers that need "materialized exactly
    * once" semantics use this to skip a REDUNDANT second checkpoint of a
    * frame some upstream stage already pinned. */
  def isMaterialized(ds: Dataset[_]): Boolean =
    ds.queryExecution.analyzed.isInstanceOf[LogicalRDD]

  /** True iff the Dataset is a bare LogicalRDD whose blocks have been
    * unpersisted (storage level NONE) — test support for observing
    * [[release]]. */
  def isReleased(ds: Dataset[_]): Boolean = ds.queryExecution.analyzed match {
    case l: LogicalRDD =>
      l.rdd.getStorageLevel == org.apache.spark.storage.StorageLevel.NONE
    case _ => false
  }
}
