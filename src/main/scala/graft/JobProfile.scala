package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/**
 * Per-JOB wall breakdown for one or more SparkEntry queries — the
 * measurement companion to [[ShuffleProbe]] (which totals shuffle bytes).
 * A drain-style query (streaming maintenance, multi-action folds) spends
 * its wall across MANY Spark jobs plus driver-side gaps; optimizing it
 * needs to know which jobs (and which non-job driver work) own the time.
 *
 *   SPARK_GRAFT_SF_DIR=<dir> SPARK_GRAFT_QUERIES=a,b \
 *     tools/runmain.sh graft.JobProfile
 *
 * Prints, per query: total wall, sum of job walls (the difference is
 * driver-side planning/FS work), and every job >= 50 ms with its
 * description/callsite. Runs each query TWICE and reports the second
 * (warm) pass — codegen/JIT warm-up otherwise dominates the first.
 */
object JobProfile {

  private final case class JobRec(id: Int, desc: String, ms: Long)

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

    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val jobs = new java.util.concurrent.ConcurrentLinkedQueue[JobRec]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val jd = Option(js.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
        val desc = jd.filterNot(_.contains("runId")).getOrElse {
          val call = Option(js.properties)
            .flatMap(p => Option(p.getProperty("callSite.short")))
          val batch = jd.flatMap(_.split('\n').find(_.startsWith("batch")))
          (call.toSeq ++ batch.toSeq).mkString(" ")
        }
        starts.put(js.jobId, (js.time, if (desc.isEmpty) "?" else desc))
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        val s = starts.remove(je.jobId)
        if (s != null) jobs.add(JobRec(je.jobId, s._2, je.time - s._1))
      }
    })

    names.foreach { name =>
      val fn = SparkEntry.queries.getOrElse(name,
        throw new IllegalArgumentException(s"unknown query $name"))
      def run(): Double = {
        jobs.clear()
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        org.apache.spark.sql.graftbridge.ListenerBridge.waitUntilEmpty(spark.sparkContext)
        (System.nanoTime() - t0) / 1e9
      }
      val cold = run()
      val warm = run()
      import scala.jdk.CollectionConverters._
      val recs = jobs.asScala.toVector.sortBy(_.id)
      val jobSum = recs.map(_.ms).sum / 1e3
      println(f"=== $name cold=$cold%.2fs warm=$warm%.2fs warm_jobs=${recs.size} " +
        f"warm_job_wall=$jobSum%.2fs driver_gap=${warm - jobSum}%.2fs ===")
      recs.filter(_.ms >= 50).foreach { r =>
        println(f"  job ${r.id}%4d ${r.ms}%6d ms  ${r.desc.take(120)}")
      }
    }
    spark.stop()
  }
}
