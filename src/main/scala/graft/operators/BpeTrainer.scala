package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/**
 * Distributed BPE (byte-pair-encoding) merge training — the iterative
 * vocabulary-induction loop of a subword tokenizer, the one genuinely
 * iterative text operator a training-data engine needs.
 *
 * Standard formulation (Sennrich et al. 2016, public): train on the
 * WORD-FREQUENCY table, not the raw corpus — the corpus aggregates once
 * into (word, freq), and every merge round then runs over the bounded
 * vocabulary. That is also the 100 TB stance: the only corpus-sized job
 * is the initial word count (one hash agg); the loop's per-round cost is
 * vocabulary-sized, independent of corpus size.
 *
 * Round discipline follows PERF.md #5/#19: the vocabulary Dataset is
 * localCheckpointed every round (plans stay depth-1, no lineage/analysis
 * blow-up across rounds), and the only driver-side data is the argmax
 * pair — ONE row per round.
 *
 * Determinism: pair counts are exact integer sums; the winning pair is
 * argmax by (count desc, left asc, right asc) — a total order, so the
 * merge sequence is identical on any partitioning/cluster size.
 */
object BpeTrainer {

  case class VocabWord(syms: Seq[String], freq: Long)
  case class Merge(rank: Int, left: String, right: String, pair_freq: Long)

  /** End-of-word marker (keeps merges from crossing word boundaries). */
  val EndMark = "</w>"

  /** Word-frequency table from a text column: the single corpus-sized agg. */
  def wordFreqs(docs: DataFrame): DataFrame =
    docs.select(explode(split(col("text"), " ")).as("w"))
      .where(col("w") =!= "")
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))

  /** Train `nMerges` BPE merges over the word-frequency table. */
  def train(docs: DataFrame, nMerges: Int): Seq[Merge] = {
    val spark = docs.sparkSession
    import spark.implicits._
    var vocab: Dataset[VocabWord] = wordFreqs(docs)
      .as[(String, Long)]
      .map { case (w, f) => VocabWord(w.map(_.toString) :+ EndMark, f) }
      .localCheckpoint(true)
    val merges = scala.collection.mutable.ArrayBuffer[Merge]()
    var done = false
    for (r <- 1 to nMerges if !done) {
      // pair counts: vocabulary-sized flatMap + one hash agg
      val best = vocab
        .flatMap(v => v.syms.iterator.sliding(2).withPartial(false)
          .map(p => (p.head, p(1), v.freq)))
        .toDF("l", "r", "f")
        .groupBy(col("l"), col("r")).agg(sum(col("f")).as("pf"))
        .orderBy(col("pf").desc, col("l"), col("r"))
        .limit(1).collect() // bounded: exactly one row
      if (best.isEmpty) done = true
      else {
        val (l, rr, pf) = (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
        merges += Merge(r, l, rr, pf)
        val prev = vocab
        vocab = vocab.map { v =>
          val out = scala.collection.mutable.ArrayBuffer[String]()
          var i = 0
          while (i < v.syms.length) {
            if (i + 1 < v.syms.length && v.syms(i) == l && v.syms(i + 1) == rr) {
              out += l + rr; i += 2
            } else { out += v.syms(i); i += 1 }
          }
          VocabWord(out.toSeq, v.freq)
        }.localCheckpoint(true) // depth-1 plan per round
        prev.unpersist()
        ()
      }
    }
    vocab.unpersist()
    merges.toSeq
  }

  /** Merge table as a DataFrame (the `queries` surface). */
  def merges(docs: DataFrame, nMerges: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    train(docs, nMerges).toDF()
      .select(col("rank"), col("left"), col("right"), col("pair_freq"))
      .orderBy(col("rank"))
  }

  /** Apply a merge sequence to one word — shared by encode and the spec. */
  def applyMerges(w: String, merges: Seq[Merge]): Seq[String] = {
    var syms: Seq[String] = w.map(_.toString) :+ EndMark
    merges.sortBy(_.rank).foreach { m =>
      val out = scala.collection.mutable.ArrayBuffer[String]()
      var i = 0
      while (i < syms.length) {
        if (i + 1 < syms.length && syms(i) == m.left && syms(i + 1) == m.right) {
          out += m.left + m.right; i += 2
        } else { out += syms(i); i += 1 }
      }
      syms = out.toSeq
    }
    syms
  }

  /**
   * Token counts per document under a trained merge list — the encode
   * side of the tokenizer, in its scale shape: the WORD VOCABULARY is
   * encoded once (bounded work), then documents join the (word ->
   * subtoken count) table broadcast — the corpus-sized pass is one
   * explode + hash agg + broadcast join, with no per-document merge
   * loops.
   */
  def encode(docs: DataFrame, merges: Seq[Merge]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val docWords = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .where(col("w") =!= "")
      .groupBy(col("doc_id"), col("w")).agg(count(lit(1)).as("cnt"))
    val ms = merges
    val vocabTok = docWords.select(col("w")).distinct().as[String]
      .map(w => (w, applyMerges(w, ms).length.toLong))
      .toDF("w", "n_sub")
    docWords.join(broadcast(vocabTok), "w")
      .groupBy(col("doc_id"))
      .agg(sum(col("cnt") * col("n_sub")).as("n_tokens"))
      .orderBy(col("doc_id"))
  }

  /**
   * Token SEQUENCES per document (doc_id, pos, token) — what a training
   * pipeline actually feeds a model, next to encode()'s counts. Same
   * scale shape: the word vocabulary is tokenized once (bounded work)
   * and broadcast; the corpus pass is explode + broadcast join +
   * per-document position assignment. The ordering window partitions by
   * doc_id — bounded by one document's token count, never corpus-sized.
   * `pos` is the contiguous 0-based index over the document's final
   * token stream (word order, then sub-token order within the word).
   */
  def tokenize(docs: DataFrame, merges: Seq[Merge]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val docWords = docs
      .select(col("doc_id"),
        posexplode(split(col("text"), " ")).as(Seq("wpos", "w")))
      .where(col("w") =!= "")
    val ms = merges
    val vocabTok = docWords.select(col("w")).distinct().as[String]
      .map(w => (w, applyMerges(w, ms)))
      .toDF("w", "toks")
    val byDoc = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("wpos"), col("spos"))
    docWords.join(broadcast(vocabTok), "w")
      .select(col("doc_id"), col("wpos"),
        posexplode(col("toks")).as(Seq("spos", "token")))
      .withColumn("pos", row_number().over(byDoc) - 1)
      .select(col("doc_id"), col("pos"), col("token"))
      .orderBy(col("doc_id"), col("pos"))
  }

  /**
   * Reference single-machine BPE over a word-freq map — used by the spec
   * to cross-check the distributed loop exactly.
   */
  def referenceTrain(freqs: Map[String, Long], nMerges: Int): Seq[Merge] = {
    var vocab: Map[Seq[String], Long] =
      freqs.map { case (w, f) => (w.map(_.toString) :+ EndMark, f) }
    val out = scala.collection.mutable.ArrayBuffer[Merge]()
    var r = 1
    while (r <= nMerges) {
      val counts = scala.collection.mutable.Map[(String, String), Long]()
      vocab.foreach { case (syms, f) =>
        syms.sliding(2).filter(_.length == 2).foreach { p =>
          counts((p.head, p(1))) = counts.getOrElse((p.head, p(1)), 0L) + f
        }
      }
      if (counts.isEmpty) r = nMerges + 1
      else {
        // tie-break in UNSIGNED UTF-8 byte order — the order Spark's
        // orderBy uses on strings — so the reference matches the
        // distributed loop on supplementary-plane text too (Java
        // compareTo is UTF-16-unit order, which disagrees beyond the
        // BMP; signed-byte compare disagrees from 0x80 up)
        val utf8Order: Ordering[String] = (x: String, y: String) =>
          java.util.Arrays.compareUnsigned(x.getBytes("UTF-8"), y.getBytes("UTF-8"))
        val ((l, rr), pf) = counts.minBy { case ((a, b), c) => (-c, a, b) }(
          Ordering.Tuple3(Ordering.Long, utf8Order, utf8Order))
        out += Merge(r, l, rr, pf)
        vocab = vocab.map { case (syms, f) =>
          val ns = scala.collection.mutable.ArrayBuffer[String]()
          var i = 0
          while (i < syms.length) {
            if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == rr) {
              ns += l + rr; i += 2
            } else { ns += syms(i); i += 1 }
          }
          ns.toSeq -> f
        }
        r += 1
      }
    }
    out.toSeq
  }
}
