package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

import graft.operators.{Cooccurrence, Sampling, Tables}
import graft.operators.Sampling.{CoocDelta, Interaction, ItemCount, UserState}

/**
 * Incremental streaming co-occurrence pipeline: each microbatch runs the
 * same window step as the batch loop (Sampling.processWindow — item cut,
 * user reservoir, refunds), accumulating the delta stream; the rescorer
 * (row sums -> LLR -> top-K) runs over the accumulated matrix, mirroring
 * the reference's watermark-flush ordering: row sums are recomputed
 * BEFORE scoring within each flush
 * (reference: ItemRowRescorerTwoInputStreamOperator.java:116-142 — the
 * cross-input ordering invariant, trivial under microbatch sequencing).
 *
 * This is SURVEY §7.0's design stance realized: the batch-proven window
 * step lifted into a foreachBatch shell, with refunds applied
 * synchronously inside each batch (exact, unlike the Flink in-JVM queue).
 */
object StreamingCooc {

  /** Mutable cross-batch state for one streaming pipeline instance. */
  final class State(spark: SparkSession) {
    import spark.implicits._
    var itemState: Dataset[ItemCount] = spark.emptyDataset[ItemCount]
    var userState: Dataset[UserState] = spark.emptyDataset[UserState]
    var deltas: Dataset[CoocDelta] = spark.emptyDataset[CoocDelta]
    /** Event-time watermark after the previous batch (max ts seen). Late
      * filtering uses the PREVIOUS batch's value — the same split Spark's
      * own watermark operators apply to multi-batch late data. */
    var watermarkMs: Long = Long.MinValue
  }

  /**
   * Run one microbatch through the window step and fold its deltas into
   * the accumulated matrix state. Returns the updated accumulated deltas.
   *
   * With `metrics` attached the reference's late-element contract is
   * enforced at ingest (the item stage is the first operator to see an
   * interaction): events with ts <= the previous batch's watermark are
   * dropped and counted as `ItemInteractionCounterLateElements`
   * (reference: ItemInteractionCounterTwoInputStreamOperator.java:66,76).
   * The user stage then processes an already-filtered batch under the
   * same watermark, so `UserInteractionCounterLateElements` is 0 by
   * construction here (see PipelineMetrics scaladoc). Without metrics
   * the ingest filter is off and every arrival is processed — the
   * arrival-sequenced mode the streaming oracles pin.
   */
  def processBatch(st: State, batch: Dataset[Interaction], batchId: Long,
      fMax: Int, kMax: Int, seed: Long,
      metrics: Option[Sampling.PipelineMetrics] = None): Dataset[CoocDelta] = {
    val admitted = metrics match {
      case None => batch
      case Some(m) =>
        val wm = st.watermarkMs
        // one instrumented-mode job: late count + new watermark together
        val row = batch.groupBy()
          .agg(
            sum(when(col("ts") <= wm, 1L).otherwise(0L)).as("late"),
            max(col("ts")).as("mx"))
          .head()
        if (!row.isNullAt(0)) m.itemLateElements.add(row.getLong(0))
        if (!row.isNullAt(1)) {
          st.watermarkMs = math.max(wm, row.getLong(1))
          // non-empty batch = exactly one forwarded file under the
          // maxFilesPerTrigger=1 contract (see PipelineMetrics.numSplits)
          m.numSplits.add(1)
        }
        batch.filter(col("ts") > wm)
    }
    val (d, is, us) =
      Sampling.processWindow(admitted, st.itemState, st.userState, fMax, kMax, seed, batchId,
        metrics)
    st.itemState = is
    st.userState = us
    // dropCarriedStats: chained checkpoint-union-checkpoint would compound
    // carried stats estimates across batches (see StatsBridge scaladoc)
    st.deltas = org.apache.spark.sql.graftbridge.StatsBridge
      .dropCarriedStats(st.deltas.union(d).localCheckpoint(true))
    // this batch's NET delta increment — a lazy agg over the (already
    // checkpointed) window-step output, so persisting it is one small
    // extra job, not a recompute of the window step
    d
  }

  // ---------------------------------------------------------------------
  // Durable cross-restart state (checkpointed CLI runs, Main -st -cp).
  //
  // Spark's streaming checkpoint persists SOURCE offsets; the pipeline's
  // cross-batch state (item counts, user reservoirs, accumulated delta
  // matrix) lives in `State`, so a killed run would otherwise resume the
  // file monitor against empty state. Layout under <ckpt>/graft-state:
  //
  //   delta/id=<b>/   this batch's NET delta increment (O(batch), not
  //                   O(accumulated matrix) — the matrix is reconstructed
  //                   on restore as the union of all committed increments)
  //   items/<b>/      post-batch item-count state (bounded by #items)
  //   users/<b>/      post-batch user-reservoir state (bounded by #users)
  //   meta/<b>        COMMIT MARKER, written last: a batch is restorable
  //                   iff its meta file exists; partial writes from a
  //                   crash are overwritten on replay (mode=overwrite)
  //
  // Exactly-once under foreachBatch replay: Spark commits source offsets
  // AFTER foreachBatch returns, so a crash can leave batch b persisted
  // here but uncommitted there. On restart the caller restores to the
  // newest meta and SKIPS replayed batch ids <= that watermark — the
  // standard idempotent-foreachBatch protocol, expressed at the CLI
  // layer the reference's checkpointable monitor exposes
  // (ContinuousFileMonitoringFunction.java snapshotState/restoreState).
  // ---------------------------------------------------------------------

  private def stateRoot(checkpoint: String) = s"$checkpoint/graft-state"

  /** Persist batch `id`'s delta increment + post-batch state tables,
    * then the commit marker (watermark inside). Overwrite mode makes a
    * replayed half-written batch self-healing. */
  def persistBatch(st: State, d: Dataset[CoocDelta], checkpoint: String, id: Long): Unit = {
    val root = stateRoot(checkpoint)
    d.write.mode("overwrite").parquet(s"$root/delta/id=$id")
    st.itemState.write.mode("overwrite").parquet(s"$root/items/$id")
    st.userState.write.mode("overwrite").parquet(s"$root/users/$id")
    // the marker must APPEAR atomically: a kill mid-create would otherwise
    // leave a partial/empty meta/<id> that a restore could pick as "newest
    // committed" — CommitMarkers.commit writes a dot-prefixed temp sibling
    // and atomically renames it into place, even when replaying an
    // already-committed batch. restoreState additionally ignores
    // unparsable markers as a second line of defence.
    CommitMarkers.commit(st.itemState.sparkSession,
      new org.apache.hadoop.fs.Path(s"$root/meta"), id,
      s"""{"watermarkMs":${st.watermarkMs}}""")
  }

  /** Restore `st` to the newest committed batch under `checkpoint`.
    * Returns that batch id (the replay watermark: the caller must skip
    * foreachBatch invocations with id <= it), or None for a fresh start. */
  def restoreState(spark: SparkSession, st: State, checkpoint: String): Option[Long] = {
    import spark.implicits._
    val root = stateRoot(checkpoint)
    val metaDir = new org.apache.hadoop.fs.Path(s"$root/meta")
    val fs = metaDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val committed = CommitMarkers.committed(spark, metaDir)
    if (committed.isEmpty) return None
    // Markers are written via temp+rename (atomic), but stay defensive: a
    // marker that exists yet doesn't parse is treated as UNCOMMITTED and we
    // fall back to the next-newest — the crash-tolerance contract is
    // "resume from the last good commit", never "refuse to resume".
    def readWatermark(id: Long): Option[Long] = {
      val json = scala.util.Try {
        val in = fs.open(new org.apache.hadoop.fs.Path(s"$root/meta/$id"))
        try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
      }.getOrElse("")
      """"watermarkMs":(-?\d+)""".r.findFirstMatchIn(json).map(_.group(1).toLong)
    }
    val resolved = committed.sorted(Ordering[Long].reverse).iterator
      .map(id => (id, readWatermark(id)))
      .collectFirst { case (id, Some(wm)) => (id, wm) }
    if (resolved.isEmpty) return None
    val (last, wm) = resolved.get
    st.watermarkMs = wm
    st.itemState = spark.read.parquet(s"$root/items/$last").as[ItemCount]
    st.userState = spark.read.parquet(s"$root/users/$last").as[UserState]
    // partition discovery over delta/id=N gives the id column back; only
    // COMMITTED increments participate (a crash can leave id dirs past
    // the newest meta — they will be overwritten on replay)
    st.deltas = spark.read.parquet(s"$root/delta")
      .where(col("id") <= last)
      .select(col("item").cast("int"), col("other").cast("int"), col("inc").cast("int"))
      .as[CoocDelta]
      .localCheckpoint(true)
    Some(last)
  }

  /** Rescore the accumulated matrix: row sums first, then LLR top-K.
    *
    * `devReconcile` (default: the `graft.dev.reconcile` system property)
    * mirrors the reference's DEV-mode row-sum reconciliation
    * (ItemRowRescorerTwoInputStreamOperator.java:183-193): the row sums
    * derived from the raw delta stream must equal the row sums of the
    * materialized matrix. A mismatch means a cell went negative (a
    * refund/eviction bug) and fails loudly instead of mis-scoring. */
  def rescore(st: State, k: Int,
      devReconcile: Boolean = java.lang.Boolean.getBoolean("graft.dev.reconcile"),
      metrics: Option[Sampling.PipelineMetrics] = None): DataFrame = {
    val counts = st.deltas
      .groupBy(col("item"), col("other"))
      .agg(sum(col("inc")).as("cnt"))
      .where(col("cnt") > 0)
    // harness parity: one rescored-item-row per item with a pending delta
    // at this flush (ItemRowRescorerTwoInputStreamOperator.java:60,169)
    // plus the net row-sum mass (RowSumAggregator.java:50,67) — ONE
    // instrumented-mode-only job for both, like the DEV reconcile below
    metrics.foreach { m =>
      val r = counts.agg(
        count_distinct(col("item")).as("n_items"),
        sum(col("cnt")).as("mass")).head()
      if (!r.isNullAt(0)) m.rescoredItems.add(r.getLong(0))
      if (!r.isNullAt(1)) m.rowSumMass.add(r.getLong(1))
    }
    if (devReconcile) {
      val fromDeltas = st.deltas.groupBy(col("item")).agg(sum(col("inc")).as("delta_sum"))
      val fromMatrix = counts.groupBy(col("item")).agg(sum(col("cnt")).as("matrix_sum"))
      val bad = fromDeltas.join(fromMatrix, Seq("item"), "full_outer")
        .where(coalesce(col("delta_sum"), lit(0L)) =!= coalesce(col("matrix_sum"), lit(0L)))
        .limit(1).collect()
      require(bad.isEmpty,
        s"row-sum reconciliation failed (item=${bad.headOption.map(_.get(0)).orNull}: " +
          s"delta-sum=${bad.headOption.map(_.get(1)).orNull}, " +
          s"matrix-sum=${bad.headOption.map(_.get(2)).orNull}) — a cooc cell went negative")
    }
    Cooccurrence.llrTopKFromCounts(counts, k)
  }

  /**
   * End-to-end streaming run over the events table: file-source stream ->
   * foreachBatch window step -> final rescore. With cuts >= data size the
   * result equals the batch pipeline exactly (same oracle).
   */
  def llrTopKStreaming(spark: SparkSession, dir: String, fMax: Int, kMax: Int,
      seed: Long, k: Int): DataFrame = {
    import spark.implicits._
    val st = new State(spark)
    val stream = StreamingOps.eventsStream(spark, dir)
      .select(
        col("user_id").cast("int").as("user"),
        get_json_object(col("props"), "$.k").cast("int").as("item"),
        unix_millis(col("ts")).as("ts"))
    val q = stream.writeStream
      .outputMode(OutputMode.Update())
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batchDf: DataFrame, batchId: Long) =>
        processBatch(st, batchDf.as[Interaction], batchId, fMax, kMax, seed)
        ()
      }
      .start()
    q.awaitTermination()
    rescore(st, k)
  }
}
