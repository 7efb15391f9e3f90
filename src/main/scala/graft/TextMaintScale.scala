package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Cooccurrence, Retrieval, Tables}
import graft.streaming.{CoocMaintenance, LexicalIndexMaintenance}

/**
 * Measurement main for the wave-C maintenance members — the decade
 * protocol of [[AnnMaintScale]]/[[IndexMaintScale]] applied to the
 * LEXICAL (BM25) index and the standing CO-OCCURRENCE matrix: split the
 * corpus into N ingest batches, fold them in, record per-batch walls
 * (flat in the batch index = the O(batch) claim), assert the drained
 * artifact equals the batch-pipeline rebuild, and report the root size.
 *
 * Env: SPARK_GRAFT_SF_DIR (corpus dir), SPARK_GRAFT_KIND (lex | cooc,
 * default lex), SPARK_GRAFT_BATCHES (default 24),
 * SPARK_GRAFT_COMPACT_EVERY (default 8). One JSON line on stdout.
 *
 * Split rules: lex splits documents by doc_id mod N (any split works —
 * postings are per-doc); cooc splits EVENTS by a (user, item, ts) hash
 * so each user's history spans batches and the cross-term algebra
 * carries real weight (CoocMaintSpec proves split invariance; this main
 * measures the cost of the honest split).
 */
object TextMaintScale {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val kind = sys.env.getOrElse("SPARK_GRAFT_KIND", "lex")
    val batches = sys.env.getOrElse("SPARK_GRAFT_BATCHES", "24").toInt
    val compactEvery = sys.env.getOrElse("SPARK_GRAFT_COMPACT_EVERY", "8").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    val root = java.nio.file.Files
      .createTempDirectory(s"text_maint_$kind").toString
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def rootMb: Double =
      fs.getContentSummary(new org.apache.hadoop.fs.Path(root)).getLength / 1e6

    val (n, walls) = kind match {
      case "lex" =>
        val docs = Tables.table(spark, sfDir, "documents")
          .select("doc_id", "text").localCheckpoint(true)
        val nDocs = docs.count()
        val m = new LexicalIndexMaintenance(spark, root, compactEvery)
        val ws = (0 until batches).map { b =>
          timed { m.processBatch(b.toLong,
            docs.where(pmod(col("doc_id"), lit(batches)) === b)) }
        }
        val terms = Seq("key", "value", "table", "row", "scan")
        val got = m.bm25(terms).collect()
          .map(r => (r.getLong(0), r.getDouble(1))).toSet
        val want = Retrieval.bm25(docs, terms).collect()
          .map(r => (r.getLong(0), r.getDouble(1))).toSet
        require(got == want, "drained BM25 diverged from the batch scorer")
        (nDocs, ws)
      case "cooc" =>
        val inter = Cooccurrence.interactions(spark, sfDir)
          .localCheckpoint(true)
        val nEv = inter.count()
        val m = new CoocMaintenance(spark, root, compactEvery)
        val ws = (0 until batches).map { b =>
          timed { m.processBatch(b.toLong, inter.where(
            pmod(xxhash64(col("user"), col("item"), col("ts")),
              lit(batches)) === b)) }
        }
        val got = m.currentCounts().collect()
          .map(r => (r.getInt(0), r.getInt(1), r.getLong(2))).toSet
        val want = Cooccurrence.coocCounts(inter).collect()
          .map(r => (r.getInt(0), r.getInt(1), r.getLong(2))).toSet
        require(got == want, "drained C matrix diverged from coocCounts")
        (nEv, ws)
      case other => throw new IllegalArgumentException(s"unknown kind $other")
    }

    def fmt(xs: Seq[Double]) = xs.map(x => f"$x%.3f").mkString(",")
    def med(xs: Seq[Double]) = xs.sorted.apply((xs.size - 1) / 2)
    val q = math.max(1, batches / 4)
    println(
      s"""{"metric":"text_maint_scale","kind":"$kind","sf":"$sfDir","n_rows":$n,""" +
      s""""batches":$batches,"compact_every":$compactEvery,""" +
      s""""walls":[${fmt(walls)}],""" +
      s""""q1_med":${f"${med(walls.take(q))}%.3f"},""" +
      s""""q4_med":${f"${med(walls.takeRight(q))}%.3f"},""" +
      s""""total":${f"${walls.sum}%.2f"},""" +
      s""""root_mb":${f"$rootMb%.1f"},"equal_to_batch":true}""")
    spark.stop()
  }
}
