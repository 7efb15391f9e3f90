package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc profiling main (not part of the driver contract). */
object Scratch {
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


    val embs = Tables.table(spark, sfDir, "embeddings")
    val corpus = time("quantize+persist") { val c = Similarity.quantizedWithNorm(embs).persist(); c.count(); c }
    val cents = time("kmeans fit (3 iters)") { IvfIndex.fitCentroids(corpus.select(col("vec_id"), col("qv")), 16, 3) }
    time("assign+search") { IvfIndex.ivfTopK(embs, Seq(0L,1L,2L,3L,4L), 10, 16, 4).count() }
    val docs = Tables.table(spark, sfDir, "documents")
    val words = time("docWords+persist") { val w = Dedup.docWords(docs).persist(); w.count(); w }
    val sigs = time("signatures") { val s = Dedup.minhashSignaturesFromWords(words).persist(); s.count(); s }
    val cands = time("lshCandidates") { val c = Dedup.lshCandidates(sigs).persist(); c.count(); c }
    println(s"[scratch] n_cands = ${cands.count()}, n_docs = ${docs.count()}")
    time("verify-join") {
      val sizes = words.groupBy(col("doc_id")).agg(count(lit(1)).as("n_w"))
      val wa = words.select(col("doc_id").as("doc_a"), col("word"))
      val wb = words.select(col("doc_id").as("doc_b"), col("word").as("word_b"))
      cands.join(wa, Seq("doc_a")).join(wb, Seq("doc_b"))
        .where(col("word") === col("word_b"))
        .groupBy(col("doc_a"), col("doc_b")).agg(count(lit(1)).as("n_common"))
        .count()
    }
    time("full minhashNearDups") { Dedup.minhashNearDups(docs, 0.9).count() }
    spark.stop()
  }
}
