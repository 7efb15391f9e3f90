package graft
import org.apache.spark.sql.SparkSession
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions","4")
      .config("spark.ui.enabled","false")
      .config("spark.sql.session.timeZone","UTC").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (q <- (if (args.nonEmpty) args.toSeq else Seq("quantile_bins","vq_assign","join_interval_binned","sink_partitioned_prune"))) {
      val df = SparkEntry.queries(q)(spark, "/root/testdata/sf0.001")
      df.count()
      println(s"===== $q =====")
      println(df.queryExecution.executedPlan.toString.take(4000))
    }
    spark.stop()
  }
}
