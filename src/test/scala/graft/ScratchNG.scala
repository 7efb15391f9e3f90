package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object ScratchNG {
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
    val sh = Dedup.ngramShingles(docs, 3).persist()
    time("shingles") { sh.count() }
    val stop = sh.groupBy(col("shingle")).agg(count(lit(1)).as("df")).where(col("df") > 5).select(col("shingle"))
    val index = sh.join(broadcast(stop), Seq("shingle"), "left_anti")
    val aa = index.as("a"); val bb = index.as("b")
    val cands = aa.join(bb, col("a.shingle") === col("b.shingle") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b")).distinct()
    time("cands") { cands.count() }
    val sets = sh.groupBy(col("doc_id"))
      .agg(sort_array(collect_list(xxhash64(col("shingle")))).as("sset"), count(lit(1)).as("n_sh"))
    time("sets") { sets.count() }
    val out = cands
      .join(sets.select(col("doc_id").as("doc_a"), col("sset").as("sset_a"), col("n_sh").as("n_a")), Seq("doc_a"))
      .join(sets.select(col("doc_id").as("doc_b"), col("sset").as("sset_b"), col("n_sh").as("n_b")), Seq("doc_b"))
      .withColumn("n_common", graft.functions.SortedIntersect.size(col("sset_a"), col("sset_b")))
    time("verify join") { out.count() }
    spark.stop()
  }
}
