package graft
object PlanPeek {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]").config("spark.sql.shuffle.partitions","4")
      .config("spark.ui.enabled","false").config("spark.sql.session.timeZone","UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (q <- args) {
      println(s"===== $q =====")
      val df = SparkEntry.queries(q)(spark, "/root/testdata/sf0.001")
      println(df.queryExecution.executedPlan.toString.take(3500))
    }
    spark.stop()
  }
}
