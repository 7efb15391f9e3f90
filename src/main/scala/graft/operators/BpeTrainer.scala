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

  /** Vocab-size cap for the DRIVER-LOCAL merge loop (sysprop
    * `graft.bpe.localVocabCap`; 0 forces the distributed loop). ~2M
    * (word, freq) rows is tens of MB on the driver — comfortably inside
    * the guarded-collect budget, and larger than the distinct-word
    * vocabulary of almost any real corpus (100 TB of English text still
    * has a bounded word-type count; the corpus-sized work is the word
    * COUNT, which always stays distributed). */
  private def localVocabCap: Long =
    sys.props.get("graft.bpe.localVocabCap").map(_.toLong).getOrElse(1L << 21)

  /**
   * Train `nMerges` BPE merges over the word-frequency table.
   *
   * Two-tier shape (r13 verdict next-round #6): the ONE corpus-sized job
   * is the initial word count; the merge loop itself runs over the
   * bounded (word, freq) vocabulary. When that vocabulary fits under
   * [[localVocabCap]] — the overwhelmingly common case at ANY corpus
   * scale, since word types grow sub-linearly in corpus size — it is
   * collected once (bounded by the cap via limit(cap+1)) and the loop
   * runs DRIVER-LOCAL with incremental pair-count maintenance (the
   * standard Sennrich 2016 formulation): at real vocab sizes this is
   * ~1000x faster than scheduling one tiny Spark job per merge round.
   * A vocabulary that exceeds the cap falls back to the distributed
   * per-round loop. Both paths produce the identical merge sequence
   * (same exact integer counts, same (count desc, UTF-8 left, right)
   * total-order argmax) — BpeSpec cross-checks them.
   */
  def train(docs: DataFrame, nMerges: Int): Seq[Merge] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val freqsDf = wordFreqs(docs)
    val cap = localVocabCap
    if (cap > 0) {
      // limit(cap+1) bounds driver memory even on a pathological vocab:
      // overflow is detected by the row count, not by materializing it
      val head = freqsDf.as[(String, Long)].limit((cap + 1).toInt).collect()
      if (head.length <= cap) return localTrain(head.toMap, nMerges)
    }
    distributedTrain(freqsDf, nMerges)
  }

  /** The distributed per-round merge loop — the fallback when the
    * vocabulary exceeds the driver cap. One vocabulary-sized flatMap +
    * hash agg + single-row argmax collect per round. */
  private[graft] def distributedTrain(freqsDf: DataFrame, nMerges: Int): Seq[Merge] = {
    val spark = freqsDf.sparkSession
    import spark.implicits._
    var vocab: Dataset[VocabWord] = freqsDf
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

  /** Spark's string ordering (orderBy on the distributed path) is
    * unsigned UTF-8 byte order — both local loops tie-break with it. */
  private val utf8Order: Ordering[String] = (x: String, y: String) =>
    java.util.Arrays.compareUnsigned(x.getBytes("UTF-8"), y.getBytes("UTF-8"))

  /**
   * Driver-local merge loop with INCREMENTAL pair-count maintenance —
   * the fast path of [[train]]. Unlike [[referenceTrain]] (which
   * recounts every pair every round and exists as the spec's simplest-
   * possible cross-check), each merge round here touches only the words
   * that CONTAIN the winning pair (tracked by an inverted pair->words
   * index), so a round costs O(occurrences of the merged pair), not
   * O(vocabulary). Identical merge sequence to both other paths: exact
   * long counts, argmax by (count desc, UTF-8 left asc, right asc).
   */
  private[graft] def localTrain(freqs: Map[String, Long], nMerges: Int): Seq[Merge] = {
    import scala.collection.mutable
    val words = freqs.keysIterator
      .map(w => mutable.ArrayBuffer[String]((w.map(_.toString) :+ EndMark): _*))
      .toArray
    val wfreq = freqs.valuesIterator.toArray // aligned: same iterator order
    val counts = mutable.HashMap.empty[(String, String), Long]
    val where = mutable.HashMap.empty[(String, String), mutable.BitSet]

    /** Add/retract word i's adjacent pairs to the counts (+index). */
    def applyWord(i: Int, retract: Boolean): Unit = {
      val syms = words(i)
      var j = 0
      while (j + 1 < syms.length) {
        val p = (syms(j), syms(j + 1))
        val c = counts.getOrElse(p, 0L) + (if (retract) -wfreq(i) else wfreq(i))
        if (c == 0L) { counts.remove(p); () } else counts(p) = c
        if (retract) {
          where.get(p).foreach { s =>
            s -= i
            if (s.isEmpty) { where.remove(p); () }
          }
        } else where.getOrElseUpdate(p, mutable.BitSet.empty) += i
        j += 1
      }
    }

    words.indices.foreach(applyWord(_, retract = false))

    val out = scala.collection.mutable.ArrayBuffer[Merge]()
    var r = 1
    while (r <= nMerges && counts.nonEmpty) {
      // argmax by the shared total order — a linear scan of the live
      // pair set (bounded by distinct adjacent pairs, shrinks as merges
      // consume symbols)
      var best: ((String, String), Long) = null
      counts.foreach { kv =>
        if (best == null) best = kv
        else {
          val c = java.lang.Long.compare(kv._2, best._2)
          val better =
            if (c != 0) c > 0
            else {
              val l = utf8Order.compare(kv._1._1, best._1._1)
              if (l != 0) l < 0 else utf8Order.compare(kv._1._2, best._1._2) < 0
            }
          if (better) best = kv
        }
      }
      val ((l, rr), pf) = best
      out += Merge(r, l, rr, pf)
      // only words CONTAINING the winning pair change; retract their
      // pairs, apply the merge in place, re-add
      val touched = where.getOrElse((l, rr), mutable.BitSet.empty).toArray
      touched.foreach { i =>
        applyWord(i, retract = true)
        val syms = words(i)
        val merged = mutable.ArrayBuffer.empty[String]
        var k = 0
        while (k < syms.length) {
          if (k + 1 < syms.length && syms(k) == l && syms(k + 1) == rr) {
            merged += l + rr; k += 2
          } else { merged += syms(k); k += 1 }
        }
        words(i) = merged
        applyWord(i, retract = false)
      }
      r += 1
    }
    out.toSeq
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
        // tie-break in UNSIGNED UTF-8 byte order (the shared utf8Order —
        // the order Spark's orderBy uses on strings) so the reference
        // matches the distributed loop on supplementary-plane text too
        // (Java compareTo is UTF-16-unit order, which disagrees beyond
        // the BMP; signed-byte compare disagrees from 0x80 up)
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
