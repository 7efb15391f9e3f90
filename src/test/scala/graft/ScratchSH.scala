package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object ScratchSH {
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
      println(f"[scratch] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    val docs = Tables.table(spark, sfDir, "documents")
    time("simhash fingerprints") { Dedup.simhashFingerprints(docs).count() }
    val sh = time("simhash full") { Dedup.simhashNearDups(docs, 3) }
    println("simhash pairs=" + time("simhash count") { sh.count() })
    val sh2 = time("simhash again") { Dedup.simhashNearDups(docs, 3).count() }

    val shingles = time("ngram shingles") {
      val s = Dedup.ngramShingles(docs, 3); println("shingles=" + s.count()); s }
    time("ngram jaccard full") { println("njpairs=" + Dedup.jaccardPairs(Dedup.ngramShingles(docs, 3), 0.1).count()) }
    spark.stop()
  }
}
