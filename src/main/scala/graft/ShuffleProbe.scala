package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/**
 * Plan-evidence probe: runs the named SparkEntry queries and reports, per
 * query, wall seconds plus the TOTAL shuffle write bytes, shuffle read
 * bytes, memory+disk spill, and the PEAK single-task execution memory
 * across every stage the query scheduled —
 * the numbers PLANS.md / PERF.md cite when a rewrite claims "less data
 * moves". Usage:
 *
 *   SPARK_GRAFT_SF_DIR=<dir> SPARK_GRAFT_QUERIES=a,b \
 *     tools/runmain.sh graft.ShuffleProbe
 *
 * One JSON line per query on stdout. Stage metrics are collected with a
 * listener keyed on nothing — each query runs with a quiesced scheduler
 * (sequential main), so stages between two marks belong to that query.
 */
object ShuffleProbe {

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val names = sys.env.getOrElse("SPARK_GRAFT_QUERIES", "")
      .split(",").map(_.trim).filter(_.nonEmpty)
    require(names.nonEmpty, "set SPARK_GRAFT_QUERIES=q1,q2")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    @volatile var write = 0L
    @volatile var read = 0L
    @volatile var spill = 0L
    @volatile var peakMem = 0L // max single-task execution memory
    // per-TASK metrics, not StageInfo.taskMetrics — the latter is not a
    // reliable aggregate (it under-reported a 5.7 MB-shuffle query as 46
    // bytes; the Exchange nodes' own SQL metrics confirmed the task sums)
    val listener = new SparkListener {
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
        val m = te.taskMetrics
        if (m != null) {
          write += m.shuffleWriteMetrics.bytesWritten
          read += m.shuffleReadMetrics.totalBytesRead
          spill += m.memoryBytesSpilled + m.diskBytesSpilled
          peakMem = math.max(peakMem, m.peakExecutionMemory)
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)

    names.foreach { name =>
      val fn = SparkEntry.queries.getOrElse(name,
        throw new IllegalArgumentException(s"unknown query $name"))
      // full materialization through the noop sink: .count() would let
      // Catalyst PRUNE the query's own expressions (count of a grouped
      // aggregate needs no aggregate values — a probe over .count()
      // reported 46 bytes for a 5.7 MB-shuffle query)
      def run(): Unit = {
        val df = fn(spark, sfDir)
        df.write.format("noop").mode("overwrite").save()
      }
      write = 0L; read = 0L; spill = 0L; peakMem = 0L
      val t0 = System.nanoTime()
      run()
      org.apache.spark.sql.graftbridge.ListenerBridge.waitUntilEmpty(spark.sparkContext)
      val wall = (System.nanoTime() - t0) / 1e9
      val (cw, cr, cs, cp) = (write, read, spill, peakMem)
      write = 0L; read = 0L; spill = 0L; peakMem = 0L
      val t1 = System.nanoTime()
      run()
      org.apache.spark.sql.graftbridge.ListenerBridge.waitUntilEmpty(spark.sparkContext)
      val wall2 = (System.nanoTime() - t1) / 1e9
      println(f"""{"query":"$name","wall_sec":$wall%.2f,""" +
        s""""shuffle_write_bytes":$cw,"shuffle_read_bytes":$cr,"spill_bytes":$cs,""" +
        s""""peak_task_mem_bytes":$cp,""" +
        f""""warm_wall_sec":$wall2%.2f,"warm_shuffle_write_bytes":$write,""" +
        s""""warm_peak_task_mem_bytes":$peakMem}""")
    }
    spark.stop()
  }
}
