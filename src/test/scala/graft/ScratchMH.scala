package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object ScratchMH {
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
    // stage 1: distinct doc words
    val words = time("docWords persist+count") {
      val w = Dedup.docWords(docs).persist(); println("words=" + w.count()); w }
    val sigs = time("minhash signatures") {
      val s = Dedup.minhashSignaturesFromWords(words); s.count(); s }
    val cands = time("lsh candidates") {
      val c = Dedup.lshCandidates(Dedup.minhashSignaturesFromWords(words)); println("cands=" + c.count()); c }
    time("full minhashNearDups") { Dedup.minhashNearDups(docs, 0.8).count() }
    time("full again (warm)") { Dedup.minhashNearDups(docs, 0.8).count() }
    spark.stop()
  }
}
