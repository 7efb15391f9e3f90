package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import scala.collection.mutable.ArrayBuffer

/**
 * Sampling-mode co-occurrence: the reference's two "interaction cuts" that
 * bound state and work at any scale — the 100 TB enabler.
 *
 * Semantics (reference, re-derived not copied):
 *  - Item cut (ItemInteractionCounterTwoInputStreamOperator.java:119-143):
 *    per item, across windows, the first `fMax` interactions are flagged
 *    sample=true (count increments only when sampled); refunds decrement
 *    the count, re-opening slots.
 *  - User stage (UserInteractionCounterOneInputStreamOperator.java:145-257):
 *    per user, `total` counts every interaction (sampled or not). For a
 *    sampled interaction: while history < kMax, APPEND — emit +1 cooc
 *    deltas between the new item and every history entry (both
 *    directions); else draw k = rng.nextInt(total): if k < kMax, REPLACE
 *    history[k] — emit paired +1/-1 deltas (new item and displaced item
 *    vs history excluding index k, both directions); else REFUND the item
 *    slot.
 *  - Refund cycle (FeedbackSource.java): Flink feeds refunds back through
 *    an in-JVM queue (racy, same-JVM only). Our batch contract is
 *    stronger: refunds from window w apply to item counts before window
 *    w+1 — deterministic.
 *  - Row sums are derived relationally (groupBy(item).sum(inc)) instead of
 *    being a second delta stream; the reference's DEV-mode reconciliation
 *    (rowSum == sum of row, ItemRowRescorer...java:183-193) makes the two
 *    formulations identical by invariant.
 *
 * Determinism contract (stronger than the reference, which depends on
 * Flink arrival order and per-subtask RNG): events fold in (ts, user,
 * item) order within each (key, window); the reservoir draw is a pure
 * hash of (job seed, user, the user's event counter) — see [[drawFor]].
 * Results are identical across partitionings, cluster sizes, and
 * engines (the DuckDB oracle replays the identical sample); the
 * sampling distribution matches the reference's.
 *
 * Scale posture: the driver loop over windows IS the microbatch model —
 * each window is two keyed cogroups (shuffle by item, shuffle by user)
 * over that window's slice plus the (bounded) state: item state is one
 * int per item, user state at most kMax ints per user. Emission is
 * bounded by 2*kMax deltas per interaction regardless of data size.
 */
object Sampling {

  case class Interaction(user: Int, item: Int, ts: Long)
  case class Flagged(user: Int, item: Int, ts: Long, sample: Boolean)
  case class CoocDelta(item: Int, other: Int, inc: Int)

  /** Item-stage cogroup row: kind 0 = flagged event, 1 = new count state. */
  case class ItemStageRow(kind: Int, user: Int, item: Int, ts: Long,
      sample: Boolean, cnt: Int)
  /** User-stage cogroup row: kind 0 = delta, 1 = refund, 2 = new user
    * state, 3 = item-count state passed through from the item stage (the
    * count rides in `inc`), 4/5 = item-cut flag record (sampled /
    * dropped; emitted only when the step runs with emitFlags — the
    * reference operator #6's observable `(user, item, sampleFlag)`
    * output, ItemInteractionCounterTwoInputStreamOperator.java:129-139). */
  case class UserStageRow(kind: Int, item: Int, other: Int, inc: Int,
      user: Int, total: Int, history: Array[Int], ts: Long = 0L)

  case class ItemCount(item: Int, cnt: Int)
  case class UserState(user: Int, total: Int, history: Array[Int])

  /** One item-cut flag record: the sample bit assigned to an interaction
    * in window `wnd` (refunds from earlier windows already applied). */
  case class FlagRow(wnd: Long, user: Int, item: Int, tsMs: Long, sample: Boolean)


  /**
   * Accumulator parity with the reference's measurement harness
   * (BASELINE.md): same counter names, collected per job. Accumulators
   * travel into the fold closures and aggregate across executors.
   */
  final class PipelineMetrics(sc: org.apache.spark.SparkContext) extends Serializable {
    val observedCooccurrences =
      sc.longAccumulator("UserInteractionCounterObservedCooccurrences")
    val sampledInteractions = sc.longAccumulator("ItemInteractionCounterSampled")
    val droppedInteractions = sc.longAccumulator("ItemInteractionCounterDropped")
    val feedbackElements = sc.longAccumulator("ItemInteractionCounterFeedbackElements")
    /** Late arrivals dropped at the (upstream) item stage — reference
      * counts an element late when its ts <= the operator's current
      * watermark (ItemInteractionCounterTwoInputStreamOperator.java:66,76).
      * Incremented by the streaming shell's ingest filter (StreamingCooc):
      * lateness is a stream-arrival concept, so the batch loop — which
      * sees each window complete — never increments it. */
    val itemLateElements = sc.longAccumulator("ItemInteractionCounterLateElements")
    /** Late arrivals at the user stage (UserInteractionCounterOneInput-
      * StreamOperator.java:111,122). In Flink the two stages' watermarks
      * advance independently over async channels, so an element can pass
      * the item stage and still be late downstream. Under synchronous
      * microbatch sequencing both stages share one watermark per batch,
      * making this set empty BY CONSTRUCTION — the counter exists for
      * harness parity and stays 0 (asserted in StreamingSpec). */
    val userLateElements = sc.longAccumulator("UserInteractionCounterLateElements")
    /** Item rows (re)scored by the rescorer — one per item with a
      * pending delta at each flush
      * (ItemRowRescorerTwoInputStreamOperator.java:60,169). */
    val rescoredItems = sc.longAccumulator("ItemRowRescorerRescoredItems")
    /** Net row-sum mass of the materialized matrix at each rescorer
      * flush (RowSumAggregator.java:50,67 — the aggregator's net
      * accumulated mass). Collected in the same instrumented-mode job
      * as rescoredItems. */
    val rowSumMass = sc.longAccumulator("RowSumProcessWindowRowSum")
    /** Input splits forwarded by the file monitor
      * (ContinuousFileMonitoringFunction.java:277). Under the
      * maxFilesPerTrigger=1 + never-split contract each data microbatch
      * ingests exactly one file, so the streaming shell counts one split
      * per non-empty batch. */
    val numSplits = sc.longAccumulator("SplitReaderNumSplits")
  }

  /**
   * The reservoir draw, PORTABLE (r12 verdict #4): k = H(seed#user#total)
   * mod total, where H is [[PortableHash.h]] (first 15 hex digits of md5
   * as a 60-bit long) and `total` is the user's event counter at the
   * draw. Three properties the old per-(user, window) java.util.Random
   * stream lacked:
   *  - ENGINE-REPLAYABLE: the identical draw is computable in the DuckDB
   *    oracle via the hSql mirror, so the sampled pipeline is
   *    SQL-verifiable end-to-end instead of golden-hash-pinned;
   *  - ORDER-FREE: the draw is a pure function of (seed, user, total) —
   *    no sequential RNG state, so batch windows and streaming batches
   *    cannot drift apart and no window-salt is needed;
   *  - still Algorithm-R: (user, total) is unique per event, H is
   *    uniform over 60 bits, and total <= 2^31 makes the mod bias
   *    negligible — the reservoir-uniformity property test holds.
   * Pass a reused per-partition MessageDigest (hJvm resets it per call).
   */
  private[graft] def drawFor(md: java.security.MessageDigest, seed: Long,
      user: Int, total: Int): Int =
    (PortableHash.hJvm(md, s"$seed#$user#$total") % total).toInt

  /** SQL mirror of [[drawFor]] (DuckDB dialect): same string, same hash,
    * same mod — `userE`/`totalE` are SQL expressions. */
  private[graft] def drawForSql(seed: Long, userE: String, totalE: String): String =
    s"(${PortableHash.hSql(s"('$seed#' || CAST($userE AS VARCHAR) || '#' || CAST($totalE AS VARCHAR))")} % $totalE)"

  /** Width for per-window loop shuffles: sized to per-window volume
    * (~20k rows/partition, floor 4), capped at the session default — at
    * real scale rows/window exceeds the cap and this is the default
    * unchanged; at test scale it strips empty-partition overhead. */
  private[graft] def windowLoopParts(spark: SparkSession, totalRows: Long,
      nWindows: Int): Int = {
    val defaultParts = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val rowsPerWindow = totalRows / math.max(1, nWindows)
    math.max(4L, math.min(defaultParts.toLong, rowsPerWindow / 20000L + 1)).toInt
  }

  /**
   * DuckDB oracle for the FULL sampled pipeline (r12 verdict #4): replays
   * item cut, user reservoir, refund cycle and delta accumulation in SQL
   * and hands the resulting C matrix to the shared LLR rank tail. The
   * portable [[drawFor]] is what makes this possible — every reservoir
   * decision is a pure function of precomputable inputs:
   *
   *  - `t`    the user's event counter in canonical fold order
   *           (windows ascending, then (ts, item) within user) — static;
   *  - `riw`  the event's rank within (item, window) in item-stage fold
   *           order (ts, user) — static; the first max(0, fMax - cnt)
   *           ranks of a window are sampled, where cnt is the item's
   *           count entering the window;
   *  - draw   H(seed#user#t) mod t — static (hSql mirror).
   *
   * Only the per-window state (item counts net of refunds, user sampled
   * counts) is sequential, so the recursion iterates over WINDOWS — each
   * step derives flags from entering counts with plain joins + window
   * functions, classifies sampled events (append while the user's
   * sampled count < kMax; then replace if draw < kMax else refund), and
   * folds sampled/refund totals into the next window's state. Slot
   * occupancy is then reconstructed statically: appends write slot
   * `sampled-count-before`, replaces write slot `draw`; the occupant a
   * reservoir event sees in slot j is the latest earlier write to
   * (user, j) (an ASOF join); deltas follow the reference's emission
   * rules and aggregate into `pairs`.
   *
   * Shapes verified against the Spark pipeline by the driver gate at
   * sf0.01 and by SamplingSpec's fixtures at fold grain.
   */
  def sampledLlrOracleSql(interSql: String, fMax: Int, kMax: Int, seed: Long,
      windowMs: Long, llrRankTail: String): String = {
    val draw = drawForSql(seed, "usr", "t")
    s"""WITH RECURSIVE
       |inter AS ($interSql),
       |ev AS (SELECT usr, item, epoch_ms(ts) // $windowMs AS wnd,
       |              epoch_ms(ts) AS tsm FROM inter),
       |wnds AS (SELECT wnd, CAST(ROW_NUMBER() OVER (ORDER BY wnd) AS BIGINT) AS wi
       |         FROM (SELECT DISTINCT wnd FROM ev) z),
       |evt AS (
       |  SELECT e.usr, e.item, e.tsm, w.wi,
       |         CAST(ROW_NUMBER() OVER (PARTITION BY e.usr
       |              ORDER BY e.wnd, e.tsm, e.item) AS BIGINT) AS t,
       |         CAST(ROW_NUMBER() OVER (PARTITION BY e.item, e.wnd
       |              ORDER BY e.tsm, e.usr) AS BIGINT) AS riw
       |  FROM ev e JOIN wnds w USING (wnd)),
       |nw AS (SELECT MAX(wi) AS n FROM wnds),
       |rec(wi, kind, key, val, item, t, sb, act, slot) AS (
       |  SELECT CAST(1 AS BIGINT), 0, CAST(NULL AS BIGINT), CAST(0 AS BIGINT),
       |         CAST(NULL AS INT), CAST(NULL AS BIGINT), CAST(NULL AS BIGINT),
       |         CAST(NULL AS VARCHAR), CAST(NULL AS BIGINT)
       |  UNION ALL
       |  (
       |  WITH cur AS (SELECT MAX(wi) AS w FROM rec WHERE kind IN (0, 1)),
       |  f AS (
       |    SELECT e.*, COALESCE(uc.val, 0) AS scnt0,
       |           (e.riw <= $fMax - COALESCE(ic.val, 0)) AS smp
       |    FROM evt e
       |    LEFT JOIN rec ic ON ic.kind = 0 AND ic.key = e.item
       |    LEFT JOIN rec uc ON uc.kind = 1 AND uc.key = e.usr
       |    WHERE e.wi = (SELECT w FROM cur)),
       |  s AS (
       |    SELECT f.*, scnt0 + CAST(ROW_NUMBER() OVER (PARTITION BY usr
       |             ORDER BY tsm, item) AS BIGINT) - 1 AS sb,
       |           $draw AS k
       |    FROM f WHERE smp),
       |  c AS (
       |    SELECT s.*,
       |           CASE WHEN sb < $kMax THEN 'A'
       |                WHEN k < $kMax THEN 'R' ELSE 'F' END AS act,
       |           CASE WHEN sb < $kMax THEN sb
       |                WHEN k < $kMax THEN k END AS slot
       |    FROM s),
       |  ichg AS (SELECT item AS key,
       |                  CAST(COUNT(*) AS BIGINT) -
       |                  CAST(SUM(CASE WHEN act = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS d
       |           FROM c GROUP BY item),
       |  uchg AS (SELECT usr AS key, CAST(COUNT(*) AS BIGINT) AS d FROM c GROUP BY usr),
       |  inext AS (
       |    SELECT COALESCE(o.key, d.key) AS key, COALESCE(o.val, 0) + COALESCE(d.d, 0) AS val
       |    FROM (SELECT key, val FROM rec WHERE kind = 0 AND key IS NOT NULL) o
       |    FULL OUTER JOIN ichg d ON o.key = d.key),
       |  unext AS (
       |    SELECT COALESCE(o.key, d.key) AS key, COALESCE(o.val, 0) + COALESCE(d.d, 0) AS val
       |    FROM (SELECT key, val FROM rec WHERE kind = 1 AND key IS NOT NULL) o
       |    FULL OUTER JOIN uchg d ON o.key = d.key)
       |  SELECT * FROM (
       |    SELECT (SELECT w FROM cur), 2, CAST(usr AS BIGINT), CAST(NULL AS BIGINT),
       |           item, t, sb, act, slot FROM c
       |    UNION ALL
       |    SELECT (SELECT w FROM cur) + 1, 0, key, val, NULL, NULL, NULL, NULL, NULL
       |    FROM inext WHERE (SELECT w FROM cur) < (SELECT n FROM nw)
       |    UNION ALL
       |    SELECT (SELECT w FROM cur) + 1, 1, key, val, NULL, NULL, NULL, NULL, NULL
       |    FROM unext WHERE (SELECT w FROM cur) < (SELECT n FROM nw)
       |    UNION ALL
       |    SELECT (SELECT w FROM cur) + 1, 0, NULL, 0, NULL, NULL, NULL, NULL, NULL
       |    WHERE (SELECT w FROM cur) < (SELECT n FROM nw)
       |  ) z
       |  )
       |),
       |acts AS (SELECT key AS usr, item, t, sb, act, slot FROM rec WHERE kind = 2),
       |writes AS (SELECT usr, slot, t, item FROM acts WHERE act IN ('A', 'R')),
       |reads AS (
       |  SELECT a.usr, a.t, a.item, a.act, a.slot, g.j
       |  FROM acts a JOIN (SELECT UNNEST(range(0, $kMax)) AS j) g
       |    ON (a.act = 'A' AND g.j < a.slot) OR a.act = 'R'),
       |occ AS (
       |  SELECT r.usr, r.t, r.item, r.act, r.slot, r.j, w.item AS o
       |  FROM reads r ASOF JOIN writes w
       |    ON r.usr = w.usr AND r.j = w.slot AND r.t > w.t),
       |prevs AS (SELECT usr, t, o AS prev FROM occ WHERE act = 'R' AND j = slot),
       |others AS (SELECT usr, t, item, o FROM occ WHERE act = 'R' AND j <> slot),
       |deltas AS (
       |  SELECT item, o AS other, 1 AS inc FROM occ WHERE act = 'A'
       |  UNION ALL SELECT o, item, 1 FROM occ WHERE act = 'A'
       |  UNION ALL SELECT item, o, 1 FROM others
       |  UNION ALL SELECT o, item, 1 FROM others
       |  UNION ALL SELECT p.prev, x.o, -1 FROM others x
       |            JOIN prevs p ON x.usr = p.usr AND x.t = p.t
       |  UNION ALL SELECT x.o, p.prev, -1 FROM others x
       |            JOIN prevs p ON x.usr = p.usr AND x.t = p.t),
       |pairs AS (
       |  SELECT item, other, CAST(SUM(inc) AS BIGINT) AS cnt
       |  FROM deltas GROUP BY item, other HAVING SUM(inc) > 0)
       |$llrRankTail"""
      .stripMargin
  }

  /** Item-cut fold for one item's window slice (events pre-sorted). */
  private def itemCutFold(events: Seq[Interaction], startCnt: Int, fMax: Int,
      metrics: Option[PipelineMetrics])
      : (Seq[Flagged], Int) = {
    var cnt = startCnt
    val out = events.map { e =>
      val sample = cnt < fMax
      metrics.foreach(m => if (sample) m.sampledInteractions.add(1) else m.droppedInteractions.add(1))
      if (sample) cnt += 1
      Flagged(e.user, e.item, e.ts, sample)
    }
    (out, cnt)
  }

  /** User-stage fold for one user's window slice (events pre-sorted).
    * Returns (deltas, refundedItems, newState). private[graft] for the
    * reservoir-uniformity property test. */
  private[graft] def userFold(events: Seq[Flagged], st: UserState, kMax: Int,
      draw: Int => Int, metrics: Option[PipelineMetrics])
      : (Seq[CoocDelta], Seq[Int], UserState) = {
    val deltas = new ArrayBuffer[CoocDelta]()
    val refunds = new ArrayBuffer[Int]()
    var total = st.total
    val history = ArrayBuffer[Int](st.history: _*)
    events.foreach { e =>
      total += 1
      if (e.sample) {
        if (history.length < kMax) {
          var i = 0
          while (i < history.length) {
            deltas += CoocDelta(e.item, history(i), 1)
            deltas += CoocDelta(history(i), e.item, 1)
            i += 1
          }
          metrics.foreach(_.observedCooccurrences.add(2L * (history.length)))
          history += e.item
        } else {
          val k = draw(total)
          if (k < kMax) {
            val prev = history(k)
            var i = 0
            while (i < history.length) {
              if (i != k) {
                deltas += CoocDelta(e.item, history(i), 1)
                deltas += CoocDelta(history(i), e.item, 1)
                deltas += CoocDelta(prev, history(i), -1)
                deltas += CoocDelta(history(i), prev, -1)
              }
              i += 1
            }
            history(k) = e.item
          } else {
            metrics.foreach(_.feedbackElements.add(1))
            refunds += e.item
          }
        }
      }
    }
    (deltas.toSeq, refunds.toSeq, UserState(st.user, total, history.toArray))
  }

  /**
   * One window/microbatch step at the Dataset boundary: item-cut cogroup
   * (shuffle by item), user reservoir cogroup (shuffle by user), refunds
   * folded into item counts for the next step. Used by the streaming
   * foreachBatch shell (StreamingCooc); the batch loop drives the shared
   * windowStepRdd directly with co-partitioned state.
   *
   * EXACTLY ONE materialization job per window: the item stage's new
   * per-item counts are routed THROUGH the user-stage cogroup as
   * passthrough rows under tag-bit synthetic keys, so the single RDD
   * localCheckpoint of the user-stage output captures the whole window —
   * flagged-event fold, netted deltas, refunds, user state AND item
   * state. Everything downstream (delta aggregation, both state tables
   * for the next window) derives LAZILY from that one checkpoint with
   * depth-1 plans, so lineage never chains across windows (chaining lazy
   * Catalyst cogroups grows tree-shaped plans exponentially; per-window
   * checkpoints keep every plan shallow, the same reason ALS checkpoints
   * its iterations).
   */
  def processWindow(evW: Dataset[Interaction], itemState: Dataset[ItemCount],
      userState: Dataset[UserState], fMax: Int, kMax: Int, seed: Long, w: Long,
      metrics: Option[PipelineMetrics] = None)
      : (Dataset[CoocDelta], Dataset[ItemCount], Dataset[UserState]) = {
    val spark = evW.sparkSession
    import spark.implicits._
    val (userOut, newItemState, newUserState) =
      windowStepDs(evW, itemState, userState, fMax, kMax, seed, w, metrics, emitFlags = false)

    // Aggregate the window's deltas lazily over the checkpointed output —
    // the reference's windowed map-agg (#11, ItemRowAggregator): consumers
    // only ever see per-window NET deltas (windowStepRdd already netted
    // per user; this nets across users).
    val deltas = userOut.filter(_.kind == 0)
      .select(col("item"), col("other"), col("inc"))
      .groupBy(col("item"), col("other"))
      .agg(sum(col("inc")).cast("int").as("inc"))
      .where(col("inc") =!= 0)
      .as[CoocDelta]

    (deltas, newItemState, newUserState)
  }

  /**
   * processWindow variant exposing the item stage's OBSERVABLE output —
   * per-interaction sample flags, with refunds from prior windows already
   * folded into the counts (reference operator #6's output stream,
   * ItemInteractionCounterTwoInputStreamOperator.java:129-139). Same
   * single-job window step; only what is read off the checkpoint differs.
   */
  def processWindowFlags(evW: Dataset[Interaction], itemState: Dataset[ItemCount],
      userState: Dataset[UserState], fMax: Int, kMax: Int, seed: Long, w: Long,
      numParts: Int = -1)
      : (Dataset[FlagRow], Dataset[ItemCount], Dataset[UserState]) = {
    val spark = evW.sparkSession
    import spark.implicits._
    val (userOut, newItemState, newUserState) =
      windowStepDs(evW, itemState, userState, fMax, kMax, seed, w, None,
        emitFlags = true, numParts = numParts)
    val flags = userOut.filter(r => r.kind == 4 || r.kind == 5)
      .map(r => FlagRow(w, r.user, r.item, r.ts, r.kind == 4))
    (flags, newItemState, newUserState)
  }

  /** Shared Dataset-boundary window step: run windowStepRdd once (the ONE
    * eager job of the window), return the checkpointed user-stage output
    * plus the two next-window state tables derived lazily from it. */
  private def windowStepDs(evW: Dataset[Interaction], itemState: Dataset[ItemCount],
      userState: Dataset[UserState], fMax: Int, kMax: Int, seed: Long, w: Long,
      metrics: Option[PipelineMetrics], emitFlags: Boolean,
      numParts: Int = -1)
      : (Dataset[UserStageRow], Dataset[ItemCount], Dataset[UserState]) = {
    val spark = evW.sparkSession
    import spark.implicits._

    // Dataset boundary -> the shared RDD window step (windowStepRdd owns
    // fold order, RNG keying, and the tag-bit passthrough routing). At
    // this single-shot boundary the state sides carry no partitioner, so
    // the cogroups shuffle them once — the batch loop is where the
    // co-partitioning pays off across windows. numParts lets window-loop
    // callers size the cogroups to per-window volume (the same
    // rows-per-partition rule as sampledCoocDeltas) instead of paying
    // the session default's per-partition overhead on tiny windows.
    val parts =
      if (numParts > 0) numParts
      else spark.conf.get("spark.sql.shuffle.partitions").toInt
    val part = new org.apache.spark.HashPartitioner(parts)
    val evByItem = evW.rdd.map(e => (e.item.toLong, e))
    val itemCnt = itemState.rdd.map(c => (c.item.toLong, c.cnt))
    val userSt = userState.rdd.map(u => (u.user.toLong, (u.total, u.history)))
    val userOutR = windowStepRdd(evByItem, itemCnt, userSt, part,
      fMax, kMax, seed, w, metrics, emitFlags).localCheckpoint()
    userOutR.count() // the ONE eager job of the window
    val userOut = spark.createDataset(userOutR.map(_._2))

    val newUserState = userOut.filter(_.kind == 2)
      .map(r => UserState(r.user, r.total, r.history))

    // --- refunds: re-open item slots before the next window (lazy over
    // the checkpoint; the next window's own job materializes it) ---
    val itemStateAfterCut = userOut.filter(_.kind == 3)
      .map(r => ItemCount(r.item, r.inc))
    val refundCounts = userOut.filter(_.kind == 1)
      .groupByKey(_.item).count()
      .map { case (item, n) => ItemCount(item, -n.toInt) }
    val newItemState = itemStateAfterCut.union(refundCounts)
      .groupByKey(_.item)
      .reduceGroups((a, b) => ItemCount(a.item, a.cnt + b.cnt))
      .map(_._2)

    (userOut, newItemState, newUserState)
  }

  /**
   * Full sampled pipeline: windowed interactions -> co-occurrence deltas.
   * Each window: item-cut cogroup (shuffle by item), user-stage cogroup
   * (shuffle by user), refunds folded into item counts for the next
   * window.
   */
  def sampledCoocDeltas(interactions: DataFrame, fMax: Int, kMax: Int,
      seed: Long, windowMs: Long,
      metrics: Option[PipelineMetrics] = None): Dataset[CoocDelta] = {
    val spark = interactions.sparkSession
    import spark.implicits._

    val ds = interactions
      .select(col("user").cast("int"), col("item").cast("int"),
        (unix_millis(col("ts")) / windowMs).cast("long").as("wnd"),
        unix_millis(col("ts")).as("ts"))
      .as[(Int, Int, Long, Long)]
      .map { case (u, i, w, t) => (w, Interaction(u, i, t)) }
      .toDF("wnd", "ev").cache()

    // Fast path: if NO event can hit either cut (max per-item count <=
    // fMax and max per-user count <= kMax), the reservoir and refund
    // machinery can never trigger — every event takes the append path and
    // window boundaries carry no state effects. One pass over everything
    // (same (ts,user,item) fold order per key) emits the identical delta
    // stream with 2 jobs instead of 2 per window.
    // None = fast path (all data, one pass). The flag is OUT OF BAND —
    // an in-band sentinel window id would collide with a legitimate
    // window id (pre-epoch timestamps yield negative ids, including -1).
    val windowsOpt: Option[Array[Long]] = {
      // coalesce: agg(max) over an empty input yields one NULL row, which
      // the non-nullable Long encoder would reject
      // one job for both maxima: the per-item and per-user histograms
      // union into a single two-row aggregate (was two collect() jobs)
      val maxima = ds.select($"ev.item".as("key"), lit(0).as("side"))
        .union(ds.select($"ev.user".as("key"), lit(1).as("side")))
        .groupBy($"side", $"key").count()
        .groupBy($"side").agg(coalesce(max($"count"), lit(0L)).as("mx"))
        .as[(Int, Long)].collect().toMap
      val maxPerItem = maxima.getOrElse(0, 0L)
      val maxPerUser = maxima.getOrElse(1, 0L)
      if (maxPerItem <= fMax && maxPerUser <= kMax) None
      else {
        // Guard the driver-side collect: distinct window ids are bounded
        // by timeRange/windowMs, which is config-controlled — a 1 ms
        // window over years of data would otherwise materialize millions
        // of ids here. limit(bound+1) enforces the cap in the SAME job
        // that materializes the ids (no second distinct pass).
        val bound = 1000000
        val ids = ds.select($"wnd").distinct().limit(bound + 1).as[Long].collect()
        require(ids.length <= bound,
          s"sampledCoocDeltas: more than $bound distinct windows; " +
            "increase windowMs (window-size/window-unit) so the window count stays bounded")
        Some(ids.sorted)
      }
    }

    // RDD loop with CO-PARTITIONED state for every path (the sentinel
    // single pass included — per-user delta netting inside the fold
    // beats materializing the raw delta stream through a Dataset
    // cogroup). Size the loop's shuffles to per-window volume (a window
    // carrying a few thousand rows gains nothing from default-width
    // stages; at real scale rows/window >> targetRowsPerPartition and
    // this keeps the session default). Partitioning is explicit per-RDD
    // — the session's shuffle.partitions is never touched.
    val loopParts = windowLoopParts(spark, ds.count(),
      windowsOpt.map(_.length).getOrElse(1))
    val out = windowsOpt match {
      case Some(ws) if ws.isEmpty => spark.emptyDataset[CoocDelta]
      case _ => sampledLoopRdd(ds, windowsOpt, fMax, kMax, seed, loopParts, metrics)
    }
    ds.unpersist()
    out
  }

  /**
   * The multi-window sampled loop on raw RDDs with co-partitioned state —
   * the Spark analogue of the reference's keyed operator state
   * (UserInteractionCounterOneInputStreamOperator: state lives WITH the
   * key; events shuffle to it, state never moves).
   *
   * Why not the Dataset cogroup per window: each window would pay
   * Catalyst analysis + 5-6 scheduled stages + a full shuffle of BOTH
   * state tables. Here per window exactly ONE job runs with the window's
   * event slice as the only meaningful shuffle:
   *  - item counts and user reservoirs keep their HashPartitioner across
   *    windows, so the cogroup reads them as NARROW deps (zero state
   *    bytes move — at 100 TB the state is |users|*kMax ints, the one
   *    thing that must not reshuffle every window);
   *  - refunds are the single genuinely cross-keyspace flow (user ->
   *    item, the reference's feedback edge) and shuffle as a tiny
   *    |items|-row reduceByKey;
   *  - the per-window output is RDD-localCheckpointed (one action), so
   *    lineage never chains across windows;
   *  - per-user delta netting happens inside the fold output (associative
   *    pre-aggregation, the reference's ItemRowAggregator #11), bounding
   *    checkpoint volume.
   * Fold order, RNG keying, and refund timing are byte-identical to
   * processWindow — SamplingSpec's fixture + determinism tests pin both.
   */
  /**
   * One window's two keyed stages on raw RDDs: item-cut fold (cogroup by
   * item) then user reservoir fold (cogroup by user), with item-count
   * state riding through the user stage under tag-bit synthetic keys and
   * per-user delta netting in the output. The single physical unit shared
   * by the batch loop and processWindow — fold order and RNG keying live
   * HERE, once.
   */
  private def windowStepRdd(
      evByItem: org.apache.spark.rdd.RDD[(Long, Interaction)],
      itemCnt: org.apache.spark.rdd.RDD[(Long, Int)],
      userSt: org.apache.spark.rdd.RDD[(Long, (Int, Array[Int]))],
      part: org.apache.spark.HashPartitioner,
      fMax: Int, kMax: Int, seed: Long, w: Long,
      metrics: Option[PipelineMetrics],
      emitFlags: Boolean = false)
      : org.apache.spark.rdd.RDD[(Long, UserStageRow)] = {
    // --- item stage: flag sample bits against per-item counts ---
    val itemOut = evByItem.cogroup(itemCnt, part).mapPartitions(_.flatMap {
      case (itemL, (evs, cnts)) =>
        val startCnt = cnts.headOption.getOrElse(0)
        val sorted = evs.toSeq.sortBy(e => (e.ts, e.user, e.item))
        val (flagged, endCnt) = itemCutFold(sorted, startCnt, fMax, metrics)
        flagged.iterator.map(f =>
          (f.user.toLong, ItemStageRow(0, f.user, f.item, f.ts, f.sample, 0))) ++
          Iterator.single(((1L << 32) | (itemL & 0xFFFFFFFFL),
            ItemStageRow(1, 0, itemL.toInt, 0L, false, endCnt)))
    })

    // --- user stage: reservoir fold; state rows pass through under
    // tag-bit synthetic keys (the tag bit lives above the 32-bit id, so
    // negative user/item ids can never collide with a real user group) ---
    itemOut.cogroup(userSt, part).mapPartitions({ iter =>
      val md = java.security.MessageDigest.getInstance("MD5")
      iter.flatMap {
      case (key, (rows, sts)) =>
        val seq = rows.toSeq
        val (stateRows, eventRows) = seq.partition(_.kind == 1)
        val passthrough = stateRows.iterator
          .map(r => (key, UserStageRow(3, r.item, 0, r.cnt, 0, 0, null)))
        if (eventRows.isEmpty && sts.isEmpty) passthrough
        else {
          val user = key.toInt // only event/user-state groups reach here
          val st = sts.headOption
            .map { case (t, h) => UserState(user, t, h) }
            .getOrElse(UserState(user, 0, Array.empty[Int]))
          val sorted = eventRows
            .map(r => Flagged(r.user, r.item, r.ts, r.sample))
            .sortBy(e => (e.ts, e.item, e.user))
          val (deltas, refunds, newSt) =
            userFold(sorted, st, kMax, t => drawFor(md, seed, user, t), metrics)
          // net this user's deltas before emission (associative)
          val net = new scala.collection.mutable.LinkedHashMap[(Int, Int), Int]()
          deltas.foreach(d => net.update((d.item, d.other),
            net.getOrElse((d.item, d.other), 0) + d.inc))
          // flag records re-emit the item stage's observable output (the
          // reference's (user, item, sampleFlag) stream) — opt-in so the
          // delta-only pipelines pay nothing for them
          val flagRows =
            if (!emitFlags) Iterator.empty
            else sorted.iterator.map(e =>
              (key, UserStageRow(if (e.sample) 4 else 5, e.item, 0, 0, e.user, 0, null, e.ts)))
          passthrough ++ flagRows ++
            net.iterator.filter(_._2 != 0).map { case ((i, o), inc) =>
              (key, UserStageRow(0, i, o, inc, 0, 0, null)) } ++
            refunds.iterator.map(i => (key, UserStageRow(1, i, 0, 0, 0, 0, null))) ++
            Iterator.single((key,
              UserStageRow(2, 0, 0, 0, newSt.user, newSt.total, newSt.history)))
        }
      }
    }, preservesPartitioning = true)
  }

  private def sampledLoopRdd(ds: DataFrame, windowsOpt: Option[Array[Long]],
      fMax: Int, kMax: Int, seed: Long, loopParts: Int,
      metrics: Option[PipelineMetrics]): Dataset[CoocDelta] = {
    val spark = ds.sparkSession
    import spark.implicits._
    val sc = spark.sparkContext
    val part = new org.apache.spark.HashPartitioner(loopParts)

    // one deserialized, cached object RDD for all window slices
    val evRdd = ds.select($"wnd".as("_1"), $"ev".as("_2"))
      .as[(Long, Interaction)].rdd
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    var itemCnt: org.apache.spark.rdd.RDD[(Long, Int)] =
      sc.parallelize(Seq.empty[(Long, Int)], loopParts).partitionBy(part)
    var userSt: org.apache.spark.rdd.RDD[(Long, (Int, Array[Int]))] =
      sc.parallelize(Seq.empty[(Long, (Int, Array[Int]))], loopParts).partitionBy(part)
    val checkpoints = new ArrayBuffer[org.apache.spark.rdd.RDD[(Long, UserStageRow)]]()

    // exception-safe cache lifetime: a mid-loop or final-job failure must
    // still release evRdd and every window's persisted output
    try {
    // fast path (None): one pseudo-window over everything; its RNG salt
    // is fixed at -1 but never drawn (no event can reach the reservoir)
    val windowPlan: Array[Option[Long]] =
      windowsOpt.map(_.map(Option(_))).getOrElse(Array(None))
    for (wOpt <- windowPlan) {
      val evW = wOpt.fold(evRdd)(w => evRdd.filter(_._1 == w))
        .map { case (_, e) => (e.item.toLong, e) }
      val userOut = windowStepRdd(evW, itemCnt, userSt, part,
          fMax, kMax, seed, wOpt.getOrElse(-1L), metrics)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

      // The window's output is PERSISTED but not materialized: the final
      // action computes the whole loop as ONE RDD DAG (RDD deps form a
      // shared DAG, so unlike chained Catalyst cogroups there is no tree
      // blow-up), and the persist makes each window's cogroup compute
      // once even though three consumers read it. Every 8th window is
      // eagerly localCheckpointed to bound lineage depth and failure
      // recovery at long horizons (365 daily windows at cluster scale).
      checkpoints += userOut
      // With metrics attached, EVERY window is eagerly materialized:
      // accumulators inside the folds are exactly-once only if the
      // transformation runs under exactly one action (lazy persisted
      // windows could recompute on cache eviction and double-count).
      // Without metrics only every 8th window materializes (lineage
      // bounding); delta output is deterministic either way.
      if (metrics.isDefined || checkpoints.size % 8 == 0) {
        userOut.localCheckpoint(); userOut.count()
      }

      // next-window states derive from the checkpoint: user state narrow
      // (partitioner preserved), item counts + refunds re-keyed by item
      // (the feedback edge) through one tiny reduceByKey
      itemCnt = userOut.flatMap { case (_, r) =>
        if (r.kind == 3) Iterator.single((r.item.toLong, r.inc))
        else if (r.kind == 1) Iterator.single((r.item.toLong, -1))
        else Iterator.empty
      }.reduceByKey(part, _ + _)
      userSt = userOut.filter(_._2.kind == 2).mapValues(r => (r.total, r.history))
    }

    // net across windows/users, materialize eagerly, release all caches
    val all = sc.union(checkpoints.toSeq.map(_.flatMap { case (_, r) =>
      if (r.kind == 0) Iterator.single(CoocDelta(r.item, r.other, r.inc))
      else Iterator.empty
    }))
    val net = spark.createDataset(all)
      .groupBy(col("item"), col("other"))
      .agg(sum(col("inc")).cast("int").as("inc"))
      .where(col("inc") =!= 0)
      .as[CoocDelta]
    org.apache.spark.sql.graftbridge.StatsBridge
      .dropCarriedStats(net.localCheckpoint(true))
    } finally {
      evRdd.unpersist(blocking = false)
      checkpoints.foreach(_.unpersist(blocking = false))
    }
  }

  /** Aggregated co-occurrence counts from the sampled delta stream. */
  def sampledCoocCounts(interactions: DataFrame, fMax: Int, kMax: Int,
      seed: Long, windowMs: Long): DataFrame =
    sampledCoocDeltas(interactions, fMax, kMax, seed, windowMs)
      .groupBy(col("item"), col("other"))
      .agg(sum(col("inc")).as("cnt"))
      .where(col("cnt") > 0)

  /** Sampled pipeline end-to-end: LLR top-K from sampled counts. */
  def llrTopKSampled(spark: SparkSession, dir: String, fMax: Int, kMax: Int,
      seed: Long, windowMs: Long, k: Int): DataFrame = {
    val inter = Cooccurrence.interactions(spark, dir)
    Cooccurrence.llrTopKFromCounts(
      sampledCoocCounts(inter, fMax, kMax, seed, windowMs), k)
  }

  /**
   * Windowed item-cut FLAG stream with the refund cycle live: the full
   * two-stage machinery (item cut → user reservoir → refunds folded into
   * item counts before the next window) run window-by-window in event-time
   * order, emitting the per-interaction sample flags.
   *
   * With kMax = 0 the reservoir deterministically REFUNDS every sampled
   * interaction (history can never hold an entry, so the k < kMax draw
   * can never win) — the RNG is drawn but cannot influence output, so the
   * refund path becomes exactly SQL-expressible: each window starts with
   * every item count restored to 0, i.e. flags = first-fMax per
   * (item, window). That is the oracle for cooc_item_cut_refunds /
   * stream_item_cut_refunds; a refund that is dropped, double-applied, or
   * folded at the wrong boundary shifts flags in later windows and
   * hash-fails. (reference: FeedbackSource.java:16-69 and the refund
   * consumption in ItemInteractionCounterTwoInputStreamOperator.java:94-116)
   */
  def itemCutFlags(interactions: DataFrame, fMax: Int, kMax: Int, seed: Long,
      windowMs: Long): DataFrame = {
    val spark = interactions.sparkSession
    import spark.implicits._
    val ds = interactions
      .select(col("user").cast("int"), col("item").cast("int"),
        (unix_millis(col("ts")) / windowMs).cast("long").as("wnd"),
        unix_millis(col("ts")).as("ts"))
      .as[(Int, Int, Long, Long)]
      .map { case (u, i, w, t) => (w, Interaction(u, i, t)) }
      .toDF("wnd", "ev").cache()
    val bound = 1000000
    val windows = ds.select($"wnd").distinct().limit(bound + 1).as[Long].collect()
    require(windows.length <= bound,
      s"itemCutFlags: more than $bound distinct windows; increase windowMs")
    // size the per-window cogroups to per-window volume (the
    // sampledCoocDeltas rule): tiny windows gain nothing from the
    // session default's width and pay its per-partition overhead
    val loopParts = windowLoopParts(spark, ds.count(), windows.length)
    var itemState = spark.emptyDataset[ItemCount]
    var userState = spark.emptyDataset[UserState]
    val parts = new ArrayBuffer[Dataset[FlagRow]]()
    for (w <- windows.sorted) {
      val evW = ds.where($"wnd" === w).select($"ev.*").as[Interaction]
      val (flags, is, us) =
        processWindowFlags(evW, itemState, userState, fMax, kMax, seed, w, loopParts)
      itemState = is
      userState = us
      parts += flags // lazy over that window's checkpoint — no extra job
    }
    ds.unpersist()
    if (parts.isEmpty) spark.emptyDataset[FlagRow].toDF()
    else parts.reduce(_ union _).toDF()
  }
}
