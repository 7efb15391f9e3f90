package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}
import org.apache.spark.sql.types._

/**
 * Structured Streaming shell: file-source ingestion with event time +
 * watermarks, tumbling-window aggregation, and a run-to-memory harness so
 * streaming queries are checkable against the same DuckDB oracles as
 * batch.
 *
 * Reference mapping: #1-#3 file source -> readStream.parquet; #5
 * ascending-timestamp watermark -> withWatermark(ts, 0) (SURVEY §2);
 * #10 windowed row-sum agg -> window() + sum with partial aggregation and
 * watermark-driven state cleanup; late drop is Spark's own watermark
 * filter.
 */
object StreamingOps {

  // (The events read schema is probed from the files themselves — see
  // eventsStream; a hard-coded ts type here was the round-6 regression.)
  // Fallback for a zero-file source, where there is nothing to probe: the
  // driver's current events layout. No data can flow under it, so only
  // the column names/count must line up with downstream selects.
  private val emptyEventsSchema = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /**
   * Stateful-shuffle width for a drained file stream. A streaming
   * query's shuffle width doubles as its state-store count and is FIXED
   * at the first checkpoint, so it is sized to the stream's volume
   * (bytes-based, the way `files.maxPartitionBytes` sizes a scan)
   * rather than inherited from the session's batch default: every state
   * store adds per-microbatch commit overhead, and 32 stores over a few
   * MB of input is pure overhead. At cluster scale the byte rule
   * returns the session default unchanged.
   *
   * Sizing goes through the Hadoop FileSystem API so any supported
   * scheme (HDFS, S3A, file:) measures correctly; when the path is
   * missing or unreadable the SESSION DEFAULT is returned — an unknown
   * volume must never clamp a query to the 4-partition floor, because
   * the width is frozen into the query's first checkpoint.
   */
  def statefulShuffleWidth(spark: SparkSession, dir: String): Int = {
    val default = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val bytes =
      try {
        val p = new org.apache.hadoop.fs.Path(s"$dir/events.parquet")
        val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        fs.getContentSummary(p).getLength
      } catch { case _: Throwable => 0L }
    if (bytes <= 0L) default
    else {
      val bytesPerStatePartition = 4L << 20
      math.max(4L, math.min(default.toLong, bytes / bytesPerStatePartition + 1)).toInt
    }
  }

  /**
   * Run a drain-to-completion streaming action with the stateful width
   * set, restoring the session default after. NOTE: shuffle.partitions
   * is SESSION-scoped — same caveat as the Sampling window loop; don't
   * share the session with concurrent batch work while draining.
   */
  def withStreamWidth[A](spark: SparkSession, dir: String)(f: => A): A = {
    val default = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", statefulShuffleWidth(spark, dir))
    try f finally spark.conf.set("spark.sql.shuffle.partitions", default)
  }

  /**
   * transformWithState session setup shared by every StatefulProcessor
   * drain: the RocksDB provider (required by transformWithState) and a
   * progress-retention cap high enough for drain assertions, both set
   * for the enclosed query only and restored after (shared sessions
   * must not inherit a permanently mutated provider).
   */
  def withTransformWithStateConf[A](spark: SparkSession)(f: => A): A = {
    val swaps = Seq(
      "spark.sql.streaming.stateStore.providerClass" ->
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
      "spark.sql.streaming.numRecentProgressUpdates" -> "2000")
    val prior = swaps.map { case (k, _) => k -> spark.conf.getOption(k) }
    swaps.foreach { case (k, v) => spark.conf.set(k, v) }
    try f finally prior.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  /** Streaming scan of the events table (file source, event-time ts).
    *
    * Per-file order contract (reference:
    * ContinuousFileMonitoringFunction.java:266-294 — splits are forwarded
    * in modification-time order and input files are never split):
    * `maxFilesPerTrigger=1` + `latestFirst=false` reproduces it — each
    * microbatch ingests exactly one file, oldest mod-time first, so the
    * 0-delay watermark advances between files exactly as the reference's
    * monitor would, and multi-file late-drop behavior is deterministic.
    *
    * A file stream needs an explicit read schema, and `ts` has shipped
    * under multiple encodings (see [[graft.operators.Tables.events]]) —
    * so the schema is PROBED from a batch read of the same files, never
    * hard-coded: a forced `ts: LongType` over `timestamp[us]` files made
    * micros parse as nanos and compressed every event time 1000×
    * (round-6 regression). The probe also runs the one-row unit check on
    * the ambiguous raw-INT64 path. */
  def eventsStream(spark: SparkSession, dir: String,
      glob: String = "events.parquet"): DataFrame = {
    try spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    catch { case _: Throwable => () }
    val probeOpt =
      try Some(spark.read.option("pathGlobFilter", glob).parquet(dir))
      catch { case _: org.apache.spark.sql.AnalysisException => None } // zero files
    val stream = spark.readStream
      .schema(probeOpt.map(_.schema).getOrElse(emptyEventsSchema))
      .option("pathGlobFilter", glob)
      .option("maxFilesPerTrigger", "1")
      .option("latestFirst", "false")
      .parquet(dir)
    probeOpt match {
      case Some(probe) => graft.operators.Tables.normalizeTs(stream, probe, s"$dir::$glob")
      case None => stream
    }
  }

  /**
   * Probed-schema one-file-per-microbatch stream over a driver table —
   * the same probe-don't-assume contract as [[eventsStream]] (the
   * round-6 regression class: a hard-coded read schema silently
   * reinterprets values when the driver re-encodes a column), for
   * tables that need no ts normalization. `fallback` is used only when
   * zero files match (nothing to probe, nothing to mis-read).
   */
  def tableStream(spark: SparkSession, dir: String, fileName: String,
      fallback: StructType): DataFrame = {
    val probed =
      try Some(spark.read.option("pathGlobFilter", fileName).parquet(dir).schema)
      catch { case _: org.apache.spark.sql.AnalysisException => None } // zero files
    spark.readStream
      .schema(probed.getOrElse(fallback))
      .option("pathGlobFilter", fileName)
      .option("maxFilesPerTrigger", "1")
      .option("latestFirst", "false")
      .parquet(dir)
  }

  /**
   * Tumbling event-time window aggregation with a 0-delay watermark
   * (ascending-timestamp contract, reference #5/#10): per (day-window,
   * event_type) count + decimal-exact value sum.
   */
  def windowedAgg(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "0 seconds")
      .groupBy(window(col("ts"), "1 day").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(20, 4))).cast("double").as("sum_value"))
      .select(date_format(col("w.start"), "yyyy-MM-dd").as("day"),
        col("event_type"), col("n"), col("sum_value"))

  /**
   * Run a streaming DataFrame to completion (AvailableNow) into an
   * in-memory sink and return the final table. For aggregations use
   * Complete mode: the memory sink APPENDS each batch's rows, so in
   * Update mode a key updated in two microbatches (multiple files /
   * maxFilesPerTrigger) would appear twice in the final table; Complete
   * rewrites the full table each trigger, so the final table always
   * equals the batch result.
   */
  def runToMemory(df: DataFrame, name: String,
      mode: OutputMode = OutputMode.Complete()): DataFrame = {
    val spark = df.sparkSession
    val q = df.writeStream
      .format("memory")
      .queryName(name)
      .outputMode(mode)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(name)
  }

  /** Streaming windowed agg over the events table, materialized. */
  def streamWindowedAgg(spark: SparkSession, dir: String): DataFrame =
    withStreamWidth(spark, dir) {
      runToMemory(windowedAgg(eventsStream(spark, dir)), s"wagg_${System.nanoTime()}")
        .orderBy(col("day"), col("event_type"))
    }

  /**
   * Sliding event-time windows in streaming (2-day window, 1-day slide):
   * each event contributes to two windows; watermark-driven state
   * cleanup bounds window state exactly as the tumbling case.
   */
  def slidingAgg(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "0 seconds")
      .groupBy(window(col("ts"), "2 days", "1 day").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(date_format(col("w.start"), "yyyy-MM-dd").as("wstart"),
        col("event_type"), col("n"))

  /** Streaming sliding-window agg over the events table, materialized. */
  def streamSlidingAgg(spark: SparkSession, dir: String): DataFrame =
    withStreamWidth(spark, dir) {
      runToMemory(slidingAgg(eventsStream(spark, dir)), s"slide_${System.nanoTime()}")
        .orderBy(col("wstart"), col("event_type"))
    }

  /**
   * Chained streaming aggregation — two stateful operators in one
   * query (Spark 4 multi-stateful-operator support): per (day, user)
   * counts re-aggregated to per-day user counts / extremes via
   * window(window_time(...)). Multiple stateful aggs require Append
   * mode, so only watermark-closed windows emit: the day containing
   * max(ts) is still open when the AvailableNow drain ends and is
   * (deterministically) absent — the oracle excludes it the same way.
   */
  def streamTwoLevelAgg(spark: SparkSession, dir: String): DataFrame = withStreamWidth(spark, dir) {
    val lvl1 = eventsStream(spark, dir)
      .withWatermark("ts", "0 seconds")
      .groupBy(window(col("ts"), "1 day").as("w1"), col("user_id"))
      .agg(count(lit(1)).as("n"))
    val lvl2 = lvl1
      .groupBy(window(window_time(col("w1")), "1 day").as("w2"))
      .agg(count(lit(1)).as("n_users"), max(col("n")).as("max_n"),
        sum(col("n")).as("n_events"))
      .select(date_format(col("w2.start"), "yyyy-MM-dd").as("day"),
        col("n_users"), col("max_n"), col("n_events"))
    runToMemory(lvl2, s"twolevel_${System.nanoTime()}", OutputMode.Append())
      .orderBy(col("day"))
  }

  /**
   * Watermarked stream-stream inner join — the Spark-native form of the
   * reference's keyed two-input connect (SURVEY §2.1(a): a stream-stream
   * co-partitioned join on the key). Each event joins the same user's
   * purchase events within the following hour; the event-time range
   * constraint plus both watermarks bound the join state on each side.
   */
  def streamStreamJoin(spark: SparkSession, dir: String): DataFrame = withStreamWidth(spark, dir) {
    val l = eventsStream(spark, dir)
      .where(col("event_type") === "view")
      .select(col("event_id").as("l_id"), col("user_id").as("l_user"), col("ts").as("l_ts"))
      .withWatermark("l_ts", "0 seconds")
    val r = eventsStream(spark, dir)
      .where(col("event_type") === "purchase")
      .select(col("event_id").as("r_id"), col("user_id").as("r_user"), col("ts").as("r_ts"))
      .withWatermark("r_ts", "0 seconds")
    val joined = l.join(r,
      col("l_user") === col("r_user") &&
        col("r_ts") >= col("l_ts") &&
        col("r_ts") <= col("l_ts") + expr("INTERVAL 1 HOUR") &&
        col("l_id") =!= col("r_id"))
    runToMemory(joined.select(col("l_id"), col("r_id")),
        s"ssjoin_${System.nanoTime()}", OutputMode.Append())
      .orderBy(col("l_id"), col("r_id"))
  }

  /**
   * LEFT OUTER watermarked stream-stream join — same key/time-range
   * contract as [[streamStreamJoin]], but unmatched left rows emit with
   * a null right side once the watermark passes their join window
   * (state eviction IS the null-emission trigger; the no-data final
   * microbatch flushes everything except lefts whose window straddles
   * the final watermark — the batch oracle reproduces that cutoff
   * exactly). Nulls are surfaced as -1 for engine-portable compare.
   */
  def streamStreamOuterJoin(spark: SparkSession, dir: String): DataFrame = withStreamWidth(spark, dir) {
    val l = eventsStream(spark, dir)
      .where(col("event_type") === "view")
      .select(col("event_id").as("l_id"), col("user_id").as("l_user"), col("ts").as("l_ts"))
      .withWatermark("l_ts", "0 seconds")
    val r = eventsStream(spark, dir)
      .where(col("event_type") === "purchase")
      .select(col("event_id").as("r_id"), col("user_id").as("r_user"), col("ts").as("r_ts"))
      .withWatermark("r_ts", "0 seconds")
    val joined = l.join(r,
      col("l_user") === col("r_user") &&
        col("r_ts") >= col("l_ts") &&
        col("r_ts") <= col("l_ts") + expr("INTERVAL 1 HOUR") &&
        col("l_id") =!= col("r_id"),
      "leftOuter")
    runToMemory(joined.select(col("l_id"), coalesce(col("r_id"), lit(-1L)).as("r_id")),
        s"ssojoin_${System.nanoTime()}", OutputMode.Append())
      .orderBy(col("l_id"), col("r_id"))
  }

  /**
   * Observed metrics over a streaming pipeline — the reference's
   * accumulator surface (its per-run counters: elements buffered,
   * observed co-occurrences, late drops — SURVEY §6) in Structured
   * Streaming form. `Dataset.observe` attaches aggregates to the
   * flowing data (zero extra pass, evaluated inside the stream's own
   * stages); each microbatch reports them in its progress event and
   * they reduce across batches (sum/min/max are associative). The
   * result is returned AS a table so the same DuckDB oracle checks the
   * counter values exactly.
   */
  def streamObserveMetrics(spark: SparkSession, dir: String): DataFrame = withStreamWidth(spark, dir) {
    // recentProgress is a ring buffer (default cap 100): raise the cap
    // query-scoped so a many-microbatch drain cannot silently evict
    // early counter values, and assert non-saturation below
    val progressKey = "spark.sql.streaming.numRecentProgressUpdates"
    val prior = spark.conf.getOption(progressKey)
    spark.conf.set(progressKey, "2000")
    try {
      val observed = eventsStream(spark, dir)
        .observe("graft_metrics",
          count(lit(1)).as("n_rows"),
          sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("n_purchase"),
          min(col("event_id")).as("min_event"),
          max(col("event_id")).as("max_event"))
      // noop sink: only the progress-event counters are consumed — the
      // aggregate itself must not pile up in driver memory / the catalog
      val q = windowedAgg(observed).writeStream
        .format("noop")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      require(q.recentProgress.length < 2000,
        "progress window saturated; observed counters would undercount")
      val batches = q.recentProgress.toSeq
        .flatMap(p => Option(p.observedMetrics.get("graft_metrics")))
        .filter(_.getAs[Long]("n_rows") > 0L) // no-data batches carry null extremes
      import spark.implicits._
      Seq((
        batches.map(_.getAs[Long]("n_rows")).sum,
        batches.map(_.getAs[Long]("n_purchase")).sum,
        if (batches.isEmpty) -1L else batches.map(_.getAs[Long]("min_event")).min,
        if (batches.isEmpty) -1L else batches.map(_.getAs[Long]("max_event")).max))
        .toDF("n_rows", "n_purchase", "min_event", "max_event")
    } finally prior match {
      case Some(v) => spark.conf.set(progressKey, v)
      case None => spark.conf.unset(progressKey)
    }
  }

  /**
   * Chained stateful streaming DISTINCT: per-day distinct users via
   * streaming dropDuplicates (state = one row per (day, user), cleaned
   * up as the watermark passes the day) re-aggregated by a windowed
   * count — dedup followed by agg, the second two-stateful-operator
   * shape next to streamTwoLevelAgg's agg->agg. Append mode emits only
   * watermark-closed days; the day containing max(ts) is still open at
   * the AvailableNow drain's end and is (deterministically) absent —
   * the oracle excludes it the same way.
   */
  def streamWindowedDistinct(spark: SparkSession, dir: String): DataFrame = withStreamWidth(spark, dir) {
    val agg = eventsStream(spark, dir)
      .withWatermark("ts", "0 seconds")
      .select(window(col("ts"), "1 day").as("w"), col("user_id"))
      .dropDuplicates("w", "user_id")
      .groupBy(col("w"))
      .agg(count(lit(1)).as("n_users"))
      .select(date_format(col("w.start"), "yyyy-MM-dd").as("day"), col("n_users"))
    runToMemory(agg, s"wdistinct_${System.nanoTime()}", OutputMode.Append())
      .orderBy(col("day"))
  }

  /**
   * foreachBatch upsert sink with keep-latest-per-key merge semantics —
   * the CDC-compaction write path. Each microbatch is pre-reduced
   * DISTRIBUTED (max-by-(ts, event_id) per user, a hash agg with
   * map-side combine) and written under a batchId-keyed path with
   * overwrite, so a retried batch rewrites the same directory —
   * exactly-once without a transactional sink. The final read compacts
   * across batch directories with the same max-by; the result is
   * independent of how the input was split into microbatches because
   * max is associative/commutative over the (ts, event_id) key.
   *
   * Struct-max note: the struct's trailing value field participates in
   * comparison only on (tus, event_id) ties, which cannot occur —
   * event_id is unique.
   */
  def streamUpsertLatest(spark: SparkSession, dir: String): DataFrame = withStreamWidth(spark, dir) {
    // per-invocation sink dir (two concurrent drains in one JVM must not
    // clobber each other's batch directories), deleted after the
    // compacted result is materialized — no cross-run disk accumulation
    val sinkDir = graft.operators.Sinks.dir(s"stream_upsert_latest_${System.nanoTime()}")
    val sinkPath = new org.apache.hadoop.fs.Path(sinkDir)
    val fs = sinkPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(sinkPath, true)
    val latest = (df: DataFrame) => df
      .groupBy(col("user_id"))
      .agg(max(struct(col("tus"), col("event_id"), col("value"))).as("m"))
      .select(col("user_id"), col("m.tus").as("tus"),
        col("m.event_id").as("event_id"), col("m.value").as("value"))
    val q = eventsStream(spark, dir)
      .select(col("user_id"), expr("unix_micros(ts)").as("tus"),
        col("event_id"), col("value"))
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        latest(batch).write.mode("overwrite").parquet(s"$sinkDir/batch=$batchId")
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    // Compact across batch dirs DISTRIBUTED (the result is one row per
    // user — linear in users, so a driver collect would become a
    // bottleneck at scale; r9 verdict item 5) into a final parquet
    // sibling, then drop the per-batch dirs. The returned plan is a plain
    // scan of the compacted file: durable against executor loss (unlike
    // localCheckpoint blocks) and carrying no lineage into the deleted
    // batch paths. The compacted dir itself lives until JVM exit — the
    // Sinks root's shutdown hook deletes it, so disk stays bounded
    // across runs while the caller's DataFrame stays valid for the
    // session's lifetime.
    val finalDir = s"$sinkDir.compacted"
    latest(spark.read.parquet(sinkDir))
      .select(col("user_id"),
        date_format(timestamp_micros(col("tus")), "yyyy-MM-dd HH:mm:ss").as("last_ts"),
        col("event_id").as("last_event"), col("value").as("last_value"))
      .write.mode("overwrite").parquet(finalDir)
    fs.delete(sinkPath, true)
    spark.read.parquet(finalDir).orderBy("user_id")
  }

  /**
   * Session windows (30-min inactivity gap) through Structured Streaming
   * — merging-window state, the hardest window shape (dynamic extents,
   * sessions merge when a bridging event arrives).
   *
   * Session aggregation supports ONLY Append mode, which emits a session
   * when the watermark passes its end (last event + gap). The final
   * watermark of a drained AvailableNow stream is max(ts), so the
   * emitted set is exactly the CLOSED sessions — sessions whose end <=
   * max(ts). Each key's trailing session stays open by construction
   * (its end is always past the last event). The oracle mirrors the
   * closed-session semantics explicitly.
   */
  def streamSessionAgg(spark: SparkSession, dir: String): DataFrame = withStreamWidth(spark, dir) {
    val agg = eventsStream(spark, dir)
      .withWatermark("ts", "0 seconds")
      .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
    runToMemory(agg, s"sess_${System.nanoTime()}", OutputMode.Append())
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_sessions"),
        sum(col("n_events")).as("n_events"),
        max(col("n_events")).as("max_session_events"))
      .orderBy(col("user_id"))
  }
}
