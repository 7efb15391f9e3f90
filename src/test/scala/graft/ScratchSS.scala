package graft

import org.apache.spark.sql.SparkSession

object ScratchSS {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[scratch] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    time("ssj warm-up") { SparkEntry.queries("stream_stream_join")(spark, sfDir).count() }
    time("ssj parts=32") { SparkEntry.queries("stream_stream_join")(spark, sfDir).count() }
    for (p <- Seq("8", "4")) {
      spark.conf.set("spark.sql.shuffle.partitions", p)
      time(s"ssj parts=$p") { SparkEntry.queries("stream_stream_join")(spark, sfDir).count() }
    }
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    spark.stop()
  }
}
