package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR, prints one JSON line. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // optional comma-separated filter for targeted profiling runs
    val only = sys.env.get("SPARK_GRAFT_QUERIES").map(_.split(",").toSet)
    // JIT/codegen warm-up outside the timed region: one batch query, one
    // default-provider streaming drain, and one RocksDB/transformWithState
    // drain (provider init + rocksdbjni load otherwise land on whichever
    // timed query runs them first). Warm-ups run only when the filter
    // would time a query of that kind.
    def warm(name: String, kindTimed: Boolean): Unit =
      if (kindTimed) try SparkEntry.queries(name)(spark, sfDir).count()
      catch { case _: Throwable => () }
    def timedAny(p: String => Boolean): Boolean =
      SparkEntry.queries.keys.exists(n => p(n) && only.forall(_.contains(n)))
    warm("q1_agg", timedAny(n => !n.startsWith("stream")))
    warm("stream_windowed_agg", timedAny(_.startsWith("stream")))
    warm("stream_group_topk", timedAny(Set(
      "stream_item_cut", "stream_reservoir_cooc", "stream_group_topk")))
    val selected = SparkEntry.queries.filter { case (n, _) => only.forall(_.contains(n)) }
    // Per-query MEDIANS over `reps` full suite passes (round-4 verdict:
    // single-pass timings on a shared box swung ±20-40% from contention,
    // masking and faking regressions). Median of 3 rejects a one-off
    // spike per query; run walls are reported alongside for transparency.
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt
    require(reps >= 1, s"SPARK_GRAFT_BENCH_REPS must be >= 1, got $reps")
    val failures = scala.collection.mutable.LinkedHashSet[String]()
    // Per-query JVM PROCESS CPU seconds alongside wall (round-11 verdict:
    // a +13% suite-wall drift could not be adjudicated as contention vs
    // plan regression from wall alone). Wall up + CPU flat = external
    // contention / IO wait; wall up + CPU up = the query really does more
    // work. Local mode runs driver + all executor threads in this one
    // JVM, so process CPU covers the whole query, including GC.
    val osBean = java.lang.management.ManagementFactory.getOperatingSystemMXBean
      .asInstanceOf[com.sun.management.OperatingSystemMXBean]
    // a rep that FAILS records None, not its fail-fast wall time — medians
    // are over successful reps only, so a partially-failing query can't
    // report a misleadingly low number (round-5 advice)
    // SELF-CALIBRATING REGIME PROBE (r15 verdict #7): a fixed scalar
    // query (scalar_trig — pure projection over lineitem, no
    // shuffle/join/stream machinery, plan unchanged for 12 rounds) timed
    // 3x before each full rep. Its median moves ONLY with box conditions
    // (CPU contention, thermal/VM noise), never with this repo's plans —
    // so the record itself says which regime each rep ran in: divide a
    // rep's walls by (probe_median / historical quiet-box probe) to
    // normalize before calling anything a regression. PERF.md documents
    // the normalization once; no more per-round hand adjudication of
    // "uniform 1.8x inflation on identical code".
    def probeOnce(): Double = {
      val t0 = System.nanoTime()
      try SparkEntry.queries("scalar_trig")(spark, sfDir).count()
      catch { case _: Throwable => () }
      (System.nanoTime() - t0) / 1e9
    }
    def median(xs: Seq[Double]): Double = xs.sorted.apply((xs.size - 1) / 2)
    // one untimed probe first: the probe must measure the box, not its
    // own first-use plan/codegen warm-up
    probeOnce()
    val probes = scala.collection.mutable.ArrayBuffer[Double]()
    val runs: Seq[Map[String, Option[(Double, Double)]]] = (1 to reps).map { _ =>
      probes += median(Seq.fill(3)(probeOnce()))
      selected.map { case (name, fn) =>
        val t0 = System.nanoTime()
        val c0 = osBean.getProcessCpuTime
        val ok =
          try { fn(spark, sfDir).count(); true }
          catch { case t: Throwable =>
            if (failures.add(name))
              System.err.println(s"[bench] $name FAILED: ${t.getClass.getName}: ${t.getMessage}")
            false
          }
        name -> (if (ok)
          Some(((System.nanoTime() - t0) / 1e9, (osBean.getProcessCpuTime - c0) / 1e9))
        else None)
      }
    }
    val perQuery = selected.keys.toSeq.map(n => n -> runs.flatMap(_(n)))
    val medians = perQuery
      .collect { case (n, ok) if ok.nonEmpty => n -> median(ok.map(_._1)) }
      .toMap
    val cpuMedians = perQuery
      .collect { case (n, ok) if ok.nonEmpty => n -> median(ok.map(_._2)) }
      .toMap
    val qs = medians.toSeq.sortBy(_._1).map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val cpus_ = cpuMedians.toSeq.sortBy(_._1)
      .map { case (k, v) => s"\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val fails = failures.map("\"" + _ + "\"").mkString("[", ",", "]")
    val runWalls = runs.map(_.values.flatten.map(_._1).sum).map(w => f"$w%.1f").mkString("[", ",", "]")
    val probeJson = probes.map(p => f"$p%.3f").mkString("[", ",", "]")
    val total = if (medians.nonEmpty) medians.values.sum else 0.0
    val totalCpu = if (cpuMedians.nonEmpty) cpuMedians.values.sum else 0.0
    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","cpu_total":${f"$totalCpu%.1f"},"reps":$reps,"run_walls":$runWalls,"probe_walls":$probeJson,"queries":$qs,"cpu":$cpus_,"failures":$fails,"sf":"$sfDir"}"""
    println(json)
    // the driver captures only the tail of stdout (r5: 116/179 per-query
    // medians lost to truncation) — always persist the full JSON to a file
    // that gets committed per round
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_full.json")
    java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
      json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    System.err.println(s"[bench] full JSON written to $outPath")
    spark.stop()
  }
}
