package graft

import org.apache.spark.sql.SparkSession

import graft.operators.{BpeTrainer, Tables}

/**
 * A/B measurement for the BPE training loop at realistic merge counts
 * (r13 verdict next-round #6): the driver-local incremental loop vs the
 * distributed per-round loop, over the SAME word-frequency table (the
 * one corpus-sized job, built and persisted untimed). One JSON line:
 *
 *   SPARK_GRAFT_SF_DIR=<dir> SPARK_GRAFT_BPE_MERGES=500 \
 *     [SPARK_GRAFT_BPE_MODE=local|dist|both] tools/runmain.sh graft.BpeScale
 */
object BpeScale {

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val nMerges = sys.env.getOrElse("SPARK_GRAFT_BPE_MERGES", "500").toInt
    val mode = sys.env.getOrElse("SPARK_GRAFT_BPE_MODE", "both")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // default corpus is documents.text; its driver-data vocabulary is
    // tiny (31 word types), so the merge loop exhausts early — the
    // table/column knobs let the A/B run a big-vocabulary column
    // (customer.c_name: 15k types) to sustain >= 500 real merge rounds
    val table = sys.env.getOrElse("SPARK_GRAFT_BPE_TABLE", "documents")
    val column = sys.env.getOrElse("SPARK_GRAFT_BPE_COL", "text")
    val freqsDf = BpeTrainer.wordFreqs(
        Tables.table(spark, sfDir, table)
          .select(org.apache.spark.sql.functions.col(column).as("text")))
      .persist()
    val nVocab = freqsDf.count() // untimed: the corpus-sized job both paths share

    def sec[T](f: => T): (Double, T) = {
      val t0 = System.nanoTime()
      val r = f
      ((System.nanoTime() - t0) / 1e9, r)
    }

    val (localSec, localMerges) =
      if (mode == "dist") (-1.0, Seq.empty)
      else sec {
        val freqs = freqsDf.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
        BpeTrainer.localTrain(freqs, nMerges)
      }
    val (distSec, distMerges) =
      if (mode == "local") (-1.0, Seq.empty)
      else sec(BpeTrainer.distributedTrain(freqsDf.toDF("w", "freq"), nMerges))

    val agree =
      if (mode == "both") localMerges == distMerges else true
    require(agree, "local and distributed merge sequences DIVERGED")
    val trained = math.max(localMerges.length, distMerges.length)
    println(s"""{"n_vocab":$nVocab,"n_merges":$nMerges,"n_trained":$trained,""" +
      f""""local_sec":$localSec%.2f,"dist_sec":$distSec%.2f,"agree":$agree}""")
    spark.stop()
  }
}
