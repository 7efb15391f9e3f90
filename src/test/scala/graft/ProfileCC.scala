package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc stage profiler for dedup_groups_cc (not part of the driver contract). */
object ProfileCC {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators._

    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    val docs = Tables.table(spark, sfDir, "documents")
    for (round <- 1 to 2) {
      val pairs = time(s"r$round simhashNearDups") {
        val p = Dedup.simhashNearDups(docs, 3); p.count(); p
      }
      time(s"r$round components") {
        ConnectedComponents.components(pairs).count()
      }
      time(s"r$round full query") {
        SparkEntry.queries("dedup_groups_cc")(spark, sfDir).count()
      }
    }
    spark.stop()
  }
}
