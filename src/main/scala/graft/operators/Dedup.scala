package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import PortableHash._

/**
 * Document deduplication operators for training-data pipelines: exact
 * (hash-groupBy), n-gram Jaccard, MinHash+LSH, SimHash, and
 * embedding-cosine near-dup.
 *
 * Scale posture (100 TB):
 *  - Exact dedup is one hash shuffle on a 16-byte key — optimal.
 *  - Pairwise Jaccard is only computed on *candidate* pairs produced by an
 *    inverted index (n-gram) or LSH banding (MinHash) — never all-pairs.
 *  - MinHash signatures are ONE shuffle (groupBy doc with 16 min()
 *    aggregations, map-side partial agg); banding fans out x4 rows of a
 *    ~100-byte signature, then buckets self-join — the standard
 *    shuffle-bounded LSH plan. Hot buckets are bounded because band
 *    signatures of 4x31-bit hashes rarely collide for dissimilar docs.
 *  - SimHash near-dup uses the pigeonhole banded join (4 chunks of 15
 *    bits): any pair within hamming distance 3 shares at least one exact
 *    chunk, so the join key is an equi-key — no cross product.
 *  - Embedding near-dup below is the exact quadratic verifier; at scale,
 *    candidates come from Similarity.lshBuckets first.
 */
object Dedup {

  /** Words (unigram shingles) per doc, distinct. One narrow explode. */
  def docWords(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
      .distinct()

  /**
   * Exact duplicate groups by content hash. With no dups every group has
   * n_docs=1; the operator is the same hash-groupBy either way.
   */
  def exactGroups(docs: DataFrame): DataFrame =
    docs
      .groupBy(md5(col("text").cast("binary")).as("text_hash"))
      .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("keep_doc"))

  /**
   * Distinct word-n-gram shingles per doc. posexplode + windowed lead
   * rather than `transform(sequence, i => concat_ws(slice(...)))`: the
   * higher-order lambda is interpreted per element (measured 3.5x
   * slower); the window runs inside codegen, and its per-doc shuffle is
   * subsumed by the distinct's shuffle anyway. Docs with < n words emit
   * nothing (lead(n-1) is null on every row), matching the array form.
   */
  def ngramShingles(docs: DataFrame, n: Int): DataFrame = {
    val w = docs.select(col("doc_id"),
      posexplode(split(col("text"), " ")).as(Seq("pos", "word")))
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("pos"))
    val parts = (0 until n).map(i =>
      if (i == 0) col("word") else lead(col("word"), i).over(win))
    w.select(col("doc_id"), concat_ws(" ", parts: _*).as("shingle"),
        parts.last.isNotNull.as("__full"))
      .where(col("__full")).drop("__full")
      .distinct()
  }

  /**
   * Shared expansion machinery for the identical-content compressions
   * (minhash word sets, capped-jaccard shingle sets, simhash
   * fingerprints): verified REPRESENTATIVE pairs stand for all
   * cross-group member pairs, and each multi-member group is its own
   * clique. Scale note (accepted posture, same as the round-7 minhash
   * form): each group row carries its member-id array, so one row is
   * O(cohort size); a corpus where a single identical-content cohort
   * approaches a task's memory would need the (setid, member) pair-table
   * form instead — the expansion joins below would translate directly.
   */

  /** Cross-group member pairs of `verified` (keyA, keyB, valueCol) rep
    * pairs, ordered doc_a < doc_b; `groups` supplies (groupKey, members). */
  private def expandCross(verified: DataFrame, groups: DataFrame,
      keyA: String, keyB: String, groupKey: String, valueCol: String): DataFrame =
    verified
      .join(groups.select(col(groupKey).as(keyA), col("members").as("ma")), Seq(keyA))
      .join(groups.select(col(groupKey).as(keyB), col("members").as("mb")), Seq(keyB))
      .select(explode(col("ma")).as("a"), col("mb"), col(valueCol))
      .select(col("a"), explode(col("mb")).as("b"), col(valueCol))
      .select(least(col("a"), col("b")).as("doc_a"),
        greatest(col("a"), col("b")).as("doc_b"), col(valueCol))

  /** All ordered within-group pairs (doc_a < doc_b via the sorted members
    * array) of every multi-member group, with the constant `withinValue`
    * (identical content: jaccard 1.0 / hamming 0). Callers pre-gate
    * `groups` where the uncompressed plan would not have emitted the
    * clique (e.g. the df-capped path's non-stop-shingle requirement). */
  private def withinPairs(groups: DataFrame, withinValue: Column,
      valueCol: String): DataFrame =
    groups
      .where(size(col("members")) > 1)
      .select(posexplode(col("members")).as(Seq("i", "a")), col("members"))
      .select(col("a").as("doc_a"),
        explode(expr("slice(members, i + 2, size(members))")).as("doc_b"),
        withinValue.as(valueCol))

  /**
   * Jaccard similarity of all pairs sharing >= 1 shingle, thresholded.
   * The shingle equi-join IS the inverted index: fan-out is bounded by
   * shingle document frequency, not by |docs|^2.
   */
  def jaccardPairs(shingles: DataFrame, threshold: Double): DataFrame =
    jaccardPairs(shingles, threshold, maxDf = Int.MaxValue)

  /**
   * maxDf bounds the inverted-index skew: shingles appearing in more than
   * maxDf documents are dropped from CANDIDATE GENERATION (their join
   * fan-out is df^2 — a single stop-shingle can go quadratic in corpus
   * size). Jaccard is still computed over the FULL shingle sets; ultra-
   * common shingles contribute little discrimination anyway (standard
   * near-dup practice). Exactness caveat: the capped branch intersects
   * xxhash64(shingle) arrays, not the shingle strings (the uncapped
   * branch joins on the exact string), so its common counts are exact
   * only modulo 64-bit hash collisions — probability ~n^2/2^64 per doc
   * pair, negligible in practice but a weaker guarantee than uncapped.
   */
  def jaccardPairs(shingles: DataFrame, threshold: Double, maxDf: Int): DataFrame = {
    if (maxDf == Int.MaxValue) {
      // uncapped: postings-form inverted index — group the doc ids per
      // shingle ONCE and expand ordered pairs per posting list, so the
      // shingle strings cross one exchange (the groupBy) instead of two
      // (both sides of the former self-join) and no join executes; the
      // per-posting pair count IS the true common count. Pair multiset
      // identical to the self-join's (shingles are distinct per doc and
      // members sorted, so doc_a < doc_b exactly once per shared
      // shingle). Single-posting skew (one stop shingle's df^2 fan-out,
      // now also one collected row) is the documented reason the CAPPED
      // path is the web-scale plan; this branch is the exact-string
      // ground-truth form.
      val sizes = shingles.groupBy(col("doc_id")).agg(count(lit(1)).as("n_sh"))
      val postings = shingles.groupBy(col("shingle"))
        .agg(sort_array(collect_list(col("doc_id"))).as("members"))
        .where(size(col("members")) > 1)
      postings
        .select(posexplode(col("members")).as(Seq("i", "doc_a")), col("members"))
        .select(col("doc_a"),
          explode(expr("slice(members, i + 2, size(members))")).as("doc_b"))
        .groupBy(col("doc_a"), col("doc_b"))
        .agg(count(lit(1)).as("n_common"))
        .join(broadcast(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n_sh", "n_a")), "doc_a")
        .join(broadcast(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n_sh", "n_b")), "doc_b")
        .withColumn("jaccard",
          col("n_common") * lit(1.0) / (col("n_a") + col("n_b") - col("n_common")))
        .where(col("jaccard") >= threshold)
        .select(col("doc_a"), col("doc_b"), round(col("jaccard"), 4).as("jaccard"))
    } else {
      // capped: candidates from the df-capped index, true common count
      // over the FULL shingle sets via the native sorted-merge intersect.
      // The STOP set (df > maxDf) is what gets broadcast — it is bounded
      // by N/maxDf entries, small by construction; the rare set (most of
      // the vocabulary at web scale) never materializes on the driver.
      val sh = shingles.persist()
      try { // exception-safe: release the cached shingle table on any failure
      // df computed over the FULL corpus (cap semantics are corpus-level),
      // before any compression
      val stop = sh.groupBy(col("shingle"))
        .agg(count(lit(1)).as("df")).where(col("df") > maxDf)
        .select(col("shingle"))
      // --- identical-shingle-set compression (exact; round-8, same move
      // as minhashNearDups) --- candidate membership and Jaccard are both
      // functions of the shingle SET, so docs with equal sets are
      // interchangeable: run candidate generation + verification on one
      // representative per distinct set and expand afterwards. Bounds the
      // per-shingle join fan-out by DISTINCT sets containing the shingle,
      // not doc count — the same content-diversity bound that fixed the
      // minhash sf1 OOM. Set identity keys on the xxhash64 arrays (same
      // collision bound as the verification arrays, documented above).
      val groups = sh.groupBy(col("doc_id"))
        .agg(sort_array(collect_list(xxhash64(col("shingle")))).as("sset"),
          count(lit(1)).as("n_sh"))
        .groupBy(col("sset"), col("n_sh"))
        .agg(min(col("doc_id")).as("setid"),
          sort_array(collect_list(col("doc_id"))).as("members"))
        .persist()
      try {
      val reps = groups.select(col("setid").as("doc_id"),
        col("sset"), col("n_sh"))
      val index = sh.join(reps.select(col("doc_id")), Seq("doc_id"))
        .join(broadcast(stop), Seq("shingle"), "left_anti")
      val a = index.as("a")
      val b = index.as("b")
      val cands = a
        .join(b, col("a.shingle") === col("b.shingle") && col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        .distinct()
      val verified = cands
        .join(reps.select(col("doc_id").as("doc_a"),
          col("sset").as("sset_a"), col("n_sh").as("n_a")), Seq("doc_a"))
        .join(reps.select(col("doc_id").as("doc_b"),
          col("sset").as("sset_b"), col("n_sh").as("n_b")), Seq("doc_b"))
        // size-ratio prefilter: jac <= min/max of the set sizes
        .where(least(col("n_a"), col("n_b")) >=
          lit(threshold) * greatest(col("n_a"), col("n_b")))
        .withColumn("n_common",
          graft.functions.SortedIntersect.size(col("sset_a"), col("sset_b")))
        .withColumn("jaccard",
          col("n_common") * lit(1.0) / (col("n_a") + col("n_b") - col("n_common")))
        .where(col("jaccard") >= threshold)
        .select(col("doc_a"), col("doc_b"), col("jaccard"))
      // expansion: a rep pair stands for all cross-group member pairs,
      // ordered doc_a < doc_b like the direct join emitted
      val cross = expandCross(verified, groups, "doc_a", "doc_b", "setid", "jaccard")
      // within-group pairs: identical sets, jaccard exactly 1.0 — but only
      // for groups that retain at least one NON-STOP shingle: a group whose
      // every shingle is df-capped generates no candidate pair in the
      // uncompressed plan either (this is where the capped path differs
      // from minhash, whose identical signatures always collide)
      val indexedGroups = index.select(col("doc_id").as("setid")).distinct()
      val within = withinPairs(
        groups.join(indexedGroups, Seq("setid")).where(lit(1.0) >= threshold),
        lit(1.0), "jaccard")
      cross.unionAll(within)
        .select(col("doc_a"), col("doc_b"), round(col("jaccard"), 4).as("jaccard"))
        // materialize the (small) pair set eagerly so the cached tables
        // can be released before returning — long-lived sessions must
        // not accumulate storage memory per invocation
        .localCheckpoint(true)
      } finally groups.unpersist()
      } finally sh.unpersist()
    }
  }

  /** Per-row distinct-word array of `text` — the docWords set,
    * row-shaped (r17 opt round: signatures/fingerprints/word sets are
    * pure per-document functions, so staging them per row removes the
    * explode + distinct exchange + aggregation exchange the grouped
    * forms paid per invocation/batch). Callers pair it with a
    * text-not-null filter: the exploded forms dropped null-text docs
    * (explode of a null array emits no row). */
  private def wordArr(text: Column): Column = array_distinct(split(text, " "))

  /** Per-row SimHash fingerprint of `text` — bit-identical to the
    * grouped form ([[graft.functions.SimhashFp]] sets bit i iff strictly
    * more distinct words have it set than clear == sum(+-1) > 0; the
    * streaming dedup stage has used this expression since r9). */
  def simhashFpExpr(text: Column): Column =
    graft.functions.SimhashFp.fp(
      transform(wordArr(text), w => h(w)), SimHashBits)

  /** Per-row MinHash signature array (length NumHashes): element j =
    * min over distinct words of (A(j)*hMod(word) + B(j)) % P — the
    * grouped form's 16 min() aggregates in one codegen'd pass. */
  private def minhashSigArr(text: Column): Column =
    graft.functions.MinhashSigs.sigs(
      transform(wordArr(text), w => hMod(w)), A, B, P)

  /**
   * MinHash signatures `(doc_id, mh0..mhN-1)` — one narrow per-row
   * projection (no explode, no exchange; see [[minhashSigArr]]).
   */
  def minhashSignatures(docs: DataFrame): DataFrame = {
    val withArr = docs.where(col("text").isNotNull)
      .select(col("doc_id"), minhashSigArr(col("text")).as("_mh"))
    withArr.select(col("doc_id") +:
      (0 until NumHashes).map(j => element_at(col("_mh"), j + 1).as(s"mh$j")): _*)
  }

  def minhashSignaturesFromWords(words: DataFrame): DataFrame = {
    val hashed = words.withColumn("hm", hMod(col("word")))
    val aggs = (0 until NumHashes).map(j => min(minhash(j, col("hm"))).as(s"mh$j"))
    hashed.groupBy(col("doc_id")).agg(aggs.head, aggs.tail: _*)
  }

  /** LSH banding: (band, signature-string) buckets per doc. */
  def lshBands(signatures: DataFrame): DataFrame = {
    val bands = (0 until NumBands).map { bnd =>
      val sig = concat_ws(",",
        (bnd * BandRows until (bnd + 1) * BandRows).map(j => col(s"mh$j").cast("string")): _*)
      signatures.select(col("doc_id"), lit(bnd).as("band"), sig.as("sig"))
    }
    bands.reduce(_ unionAll _)
  }

  /**
   * Candidate pairs: docs sharing any LSH bucket. Each pair is emitted
   * ONCE by construction — band b's join requires all bands < b to
   * differ (the same pigeonhole-dedup used for SimHash chunks) — so the
   * quadratic `distinct()` shuffle over the candidate fan-out is gone.
   * Each per-band join is an equi-join on the band signature; the
   * signature table is |docs| rows of ~100 B, so AQE broadcasts it when
   * it fits.
   */
  def lshCandidates(signatures: DataFrame): DataFrame = {
    // one row per doc (~100 B): cache so the signature aggregation runs
    // once, not once per band-join branch (ReuseExchange only catches
    // the broadcast side); the candidate set (bounded by collision rate,
    // far smaller than the corpus) is materialized eagerly so the cache
    // is released before returning.
    val sigs = bandedSignatures(signatures).persist()
    try lshCandidatesFromBanded(sigs).localCheckpoint(true)
    finally sigs.unpersist()
  }

  /** One row per doc with its NumBands band-signature strings. */
  private def bandedSignatures(signatures: DataFrame): DataFrame = {
    val sigCols = (0 until NumBands).map { bnd =>
      concat_ws(",",
        (bnd * BandRows until (bnd + 1) * BandRows).map(j => col(s"mh$j").cast("string")): _*)
        .as(s"band$bnd")
    }
    signatures.select(col("doc_id") +: sigCols: _*)
  }

  /** Pair-once banded self-join over a (cached) banded-signature table;
    * the caller owns the cache lifetime. */
  private def lshCandidatesFromBanded(sigs: DataFrame): DataFrame = {
    val a = sigs.as("a")
    val b = sigs.as("b")
    (0 until NumBands).map { bnd =>
      val first = (0 until bnd)
        .map(p => col(s"a.band$p") =!= col(s"b.band$p"))
        .foldLeft(col("a.doc_id") < col("b.doc_id"))(_ && _)
      a.join(b, col(s"a.band$bnd") === col(s"b.band$bnd") && first)
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
    }.reduce(_ unionAll _)
  }

  /** Identical-word-set groups over the distinct (doc_id, word) set: one
    * row per DISTINCT word set with its sorted hash array (`wset`), size
    * (`n_w`), representative (`setid` = min member doc_id) and sorted
    * `members`. Jaccard and the minhash signature are functions of the
    * word set alone, so all banding/verification downstream runs at this
    * compressed grain (see minhashNearDups' compression note). */
  private def wordSetGroups(words: DataFrame): DataFrame =
    words
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_list(xxhash64(col("word")))).as("wset"),
        count(lit(1)).as("n_w"))
      .groupBy(col("wset"), col("n_w"))
      .agg(min(col("doc_id")).as("setid"),
        sort_array(collect_list(col("doc_id"))).as("members"))

  /** Verified near-dup pairs between word-set REPRESENTATIVES: banded
    * LSH candidates (pair-once), exactness-preserving size-ratio
    * prefilter, then exact Jaccard via the native sorted-merge intersect.
    * Both endpoints are `setid`s from `groups`. */
  private def repVerifiedPairs(words: DataFrame, groups: DataFrame,
      threshold: Double): DataFrame = {
    val reps = groups.select(col("setid").as("doc_id"),
      col("wset"), col("n_w"))
    val repWords = words.join(reps.select(col("doc_id")), Seq("doc_id"))
    val setsA = reps.select(col("doc_id").as("doc_a"),
      col("wset").as("wset_a"), col("n_w").as("n_a"))
    val setsB = reps.select(col("doc_id").as("doc_b"),
      col("wset").as("wset_b"), col("n_w").as("n_b"))
    lshCandidates(minhashSignaturesFromWords(repWords))
      .join(setsA, Seq("doc_a"))
      .join(setsB, Seq("doc_b"))
      // size-ratio prefilter (exactness-preserving): jac(A,B) <=
      // min(|A|,|B|)/max(|A|,|B|), so mismatched-size candidates can't
      // reach the threshold — skip their merge loop entirely
      .where(least(col("n_a"), col("n_b")) >=
        lit(threshold) * greatest(col("n_a"), col("n_b")))
      .withColumn("n_common",
        graft.functions.SortedIntersect.size(col("wset_a"), col("wset_b")))
      .withColumn("jaccard",
        col("n_common") * lit(1.0) / (col("n_a") + col("n_b") - col("n_common")))
      .where(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
  }

  /**
   * Connected components over MinHash near-dup pairs (unigram Jaccard >=
   * threshold) — the MinHash twin of `simhashComponents`, with the same
   * rep-graph contraction: members of a multi-doc identical-word-set
   * group are pairwise jaccard-1.0 duplicates, so each group contracts to
   * ONE CC node (its setid) and the label propagation only ever moves
   * over verified rep pairs — never the within-group cliques the
   * doc-grain edge list would carry (C(n,2) edges per duplicate cohort).
   * Output (node, comp): every doc in a >=2-doc component, comp = min
   * reachable doc_id. Labels agree with the doc-grain CC because setid is
   * by construction the min doc_id of its group, so min-over-setids ==
   * min-over-docs.
   */
  def minhashComponents(docs: DataFrame, threshold: Double): DataFrame = {
    val words = docWords(docs).persist()
    val groups = wordSetGroups(words).persist()
    try {
      val repEdges = repVerifiedPairs(words, groups, threshold)
        .select(col("doc_a"), col("doc_b"))
      val repComps = ConnectedComponents.components(repEdges)
      // multi-member groups are components even with no cross edge
      // (their within-group jaccard is exactly 1.0 >= any threshold);
      // singleton groups with no edges are excluded, exactly as docs
      // with no pairs are absent from the doc-grain output
      groups.join(repComps.withColumnRenamed("node", "setid"), Seq("setid"), "left_outer")
        .where(size(col("members")) > 1 || col("comp").isNotNull)
        .select(explode(col("members")).as("m"),
          coalesce(col("comp"), col("setid")).as("comp"))
        .select(col("m").cast("long").as("node"), col("comp"))
        .localCheckpoint(true)
    } finally { words.unpersist(); groups.unpersist() }
  }

  /**
   * MinHash+LSH near-dup: LSH candidates verified with unigram Jaccard
   * >= threshold over per-doc xxhash64(word) arrays — exact modulo
   * 64-bit hash collisions (~n^2/2^64 per pair, see jaccardPairs).
   * Deterministic (fixed hash family) so the SQL oracle reproduces the
   * exact candidate set.
   */
  def minhashNearDups(docs: DataFrame, threshold: Double): DataFrame = {
    // Exact verification via a native sorted-merge intersect over per-doc
    // word-hash arrays. Earlier shapes, both measurably slower: (1) the
    // word equi-join (shuffle rows = candidates x |doc| through a hash
    // aggregate); (2) size(array_intersect) — interpreted, builds a hash
    // set per row, 2.4x slower than even the explode join. The arrays
    // attach map-side (AQE broadcasts the doc-set table when it fits, as
    // here; at larger corpora it degrades to a shuffle join of
    // |candidates| rows — still no element fan-out), and the count runs
    // inside whole-stage codegen.
    // the distinct (doc, word) set feeds the set arrays and the signature
    // hash — cache it so the distinct shuffle runs once per consumer
    val words = docWords(docs).persist()
    // --- identical-word-set compression (exact; round-7 soak finding) ---
    // Jaccard and the minhash signature are functions of the word SET
    // alone, so docs with equal sets are fully interchangeable: group
    // them, run banding + candidate join + verification on ONE
    // representative per distinct set, and expand verified set pairs
    // back to doc pairs afterwards (plus all within-group pairs, whose
    // jaccard is exactly 1.0). On a small-vocabulary corpus this is the
    // difference between a working query and an OOM: the regenerated
    // testdata packs 1792 of 5000 docs into one band bucket (35% of the
    // corpus; sum C(n,2) = 2.9M candidate pairs at sf0.1, 26M at sf1),
    // and attaching two word-hash arrays to every candidate blew the
    // heap at sf1. Compression cuts the bucket to its ~900 distinct
    // sets, and — decisively — the expansion pairs carry no arrays.
    // Set identity keys on the xxhash64 word-hash array: same collision
    // bound as the verification arrays themselves (documented there).
    val groups = wordSetGroups(words).persist()
    try { // exception-safe: release the cached tables on any failure
    val verified = repVerifiedPairs(words, groups, threshold)
    // expansion: a rep pair stands for all cross-group member pairs (two
    // docs collide in a band iff their reps do, and jaccard is constant
    // across each group), ordered doc_a < doc_b like the direct join
    val cross = expandCross(verified, groups, "doc_a", "doc_b", "setid", "jaccard")
    // within-group pairs: identical sets, jaccard exactly 1.0
    val within = withinPairs(groups.where(lit(1.0) >= threshold), lit(1.0), "jaccard")
    cross.unionAll(within)
      .select(col("doc_a"), col("doc_b"), round(col("jaccard"), 4).as("jaccard"))
      // release the cached tables before returning (see jaccardPairs)
      .localCheckpoint(true)
    } finally { words.unpersist(); groups.unpersist() }
  }

  /**
   * Incremental near-dup check of an incoming shard against the standing
   * corpus — the ingest-time shape of `minhashNearDups`. Asymmetric by
   * construction: incoming band signatures equi-join the index side's, so
   * no incoming×incoming or index×index pair is ever generated and
   * re-ingesting a shard can't re-verify the standing corpus against
   * itself. Only band-colliding candidates pay the exact-Jaccard
   * verification (sorted-merge intersect over word-hash arrays, with the
   * exactness-preserving size-ratio prefilter).
   *
   * Returns one row per incoming doc: (doc_id, is_dup, match_doc) where
   * match_doc is the lowest verified standing doc id (-1 when clean).
   *
   * Scale shape: the standing side is bucketed by (band, signature) — at
   * a real lakehouse this is the persisted dedup index, scanned not
   * rebuilt; the shard side is ingest-batch-sized and broadcasts. The
   * per-band joins reuse the pigeonhole earlier-bands-differ guard so a
   * pair colliding in k bands is emitted once, not k times.
   */
  def incrementalMinhashDedup(docs: DataFrame, isIncoming: Column,
      threshold: Double): DataFrame = {
    val words = docWords(docs).persist()
    try {
      val sigs = bandedSignatures(minhashSignaturesFromWords(words))
      val inc = sigs.where(isIncoming).as("a")
      val idx = sigs.where(!isIncoming).as("b")
      val cand = (0 until NumBands).map { bnd =>
        val earlierDiffer = (0 until bnd)
          .map(p => col(s"a.band$p") =!= col(s"b.band$p"))
          .foldLeft(lit(true))(_ && _)
        inc.join(idx, col(s"a.band$bnd") === col(s"b.band$bnd") && earlierDiffer)
          .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      }.reduce(_ unionAll _)
      val wordSets = words.groupBy(col("doc_id"))
        .agg(sort_array(collect_list(xxhash64(col("word")))).as("wset"),
          count(lit(1)).as("n_w"))
      val setsA = wordSets.select(col("doc_id").as("doc_a"),
        col("wset").as("wset_a"), col("n_w").as("n_a"))
      val setsB = wordSets.select(col("doc_id").as("doc_b"),
        col("wset").as("wset_b"), col("n_w").as("n_b"))
      val matches = cand
        .join(setsA, Seq("doc_a")).join(setsB, Seq("doc_b"))
        .where(least(col("n_a"), col("n_b")) >=
          lit(threshold) * greatest(col("n_a"), col("n_b")))
        .withColumn("n_common",
          graft.functions.SortedIntersect.size(col("wset_a"), col("wset_b")))
        .where(col("n_common") * lit(1.0) /
          (col("n_a") + col("n_b") - col("n_common")) >= threshold)
        .groupBy(col("doc_a")).agg(min(col("doc_b")).as("match_doc"))
      docs.select(col("doc_id")).where(isIncoming)
        .join(matches, col("doc_id") === col("doc_a"), "left")
        .select(col("doc_id"), col("doc_a").isNotNull.as("is_dup"),
          coalesce(col("match_doc"), lit(-1L)).as("match_doc"))
        .localCheckpoint(true)
    } finally words.unpersist()
  }

  /**
   * SimHash fingerprints: per doc, bit i of the fingerprint is the sign of
   * sum over distinct words of (bit i of H(word) ? +1 : -1). One shuffle,
   * SimHashBits sum() aggregations.
   */
  def simhashFingerprints(docs: DataFrame): DataFrame =
    docs.where(col("text").isNotNull)
      .select(col("doc_id"), simhashFpExpr(col("text")).as("fp"))

  /**
   * SimHash near-dup via the pigeonhole banded join: maxHamming must be
   * < SimHashChunks so every qualifying pair shares an exact chunk.
   */
  /** Distinct-fingerprint groups: one row per distinct simhash fp with the
    * sorted member doc_id list. The compression substrate for
    * simhashNearDups/simhashComponents — NOT persisted here; callers own
    * the cache lifetime. */
  private def simhashGroups(docs: DataFrame): DataFrame =
    simhashFingerprints(docs).groupBy(col("fp"))
      .agg(sort_array(collect_list(col("doc_id"))).as("members"))

  /** Duplicate-free (fp_a, fp_b, hamming) pairs over DISTINCT fingerprints
    * via the pigeonhole banded join: each pair is emitted ONLY by its first
    * matching chunk (join c requires all chunks < c to differ), so the
    * union needs no distinct shuffle. fp is unique per `groups` row, so
    * `fp_a < fp_b` is the dedup ordering. */
  private def simhashRepPairs(groups: DataFrame, maxHamming: Int): DataFrame = {
    val chunked = groups.select(
      col("fp") +:
        (0 until SimHashChunks).map(c =>
          shiftright(col("fp"), c * ChunkBits).bitwiseAND(lit((1L << ChunkBits) - 1)).as(s"c$c")): _*)
    (0 until SimHashChunks).map { c =>
      val a = chunked.as("a")
      val b = chunked.as("b")
      val firstMatch = (0 until c)
        .map(p => col(s"a.c$p") =!= col(s"b.c$p"))
        .foldLeft(col(s"a.c$c") === col(s"b.c$c"))(_ && _)
      a.join(b, firstMatch && col("a.fp") < col("b.fp"))
        .select(col("a.fp").as("fp_a"), col("b.fp").as("fp_b"))
    }.reduce(_ unionAll _)
      .withColumn("hamming", bit_count(col("fp_a").bitwiseXOR(col("fp_b"))))
      .where(col("hamming") <= maxHamming)
  }

  def simhashNearDups(docs: DataFrame, maxHamming: Int): DataFrame = {
    require(maxHamming < SimHashChunks, "pigeonhole needs maxHamming < #chunks")
    // --- identical-fingerprint compression (exact; round-8, same move as
    // minhashNearDups' identical-word-set compression) --- Hamming distance
    // is a function of the fingerprint PAIR alone, so docs with equal fps
    // are fully interchangeable: run the chunk joins over one representative
    // per distinct fp and expand afterwards (cross-group pairs inherit the
    // rep pair's hamming; within-group pairs have hamming exactly 0). This
    // bounds every chunk bucket's quadratic join by the DISTINCT
    // fingerprints in the bucket — content diversity, not corpus size: on
    // the small-vocab sf0.1 corpus 5000 docs hold 3812 distinct fps with
    // one 251-doc group, and at 100 TB boilerplate-heavy feeds produce
    // far larger identical-fp cohorts.
    val groups = simhashGroups(docs).persist()
    try { // exception-safe: release the cached group table on any failure
    val repPairs = simhashRepPairs(groups, maxHamming)
    // expansion: every member pair across the two fp groups, ordered
    // doc_a < doc_b like the direct join emitted
    val cross = expandCross(repPairs, groups, "fp_a", "fp_b", "fp", "hamming")
    // within-group pairs: identical fingerprints, hamming exactly 0
    val within = withinPairs(groups, lit(0), "hamming")
    cross.unionAll(within)
      .select(col("doc_a"), col("doc_b"), col("hamming"))
      // release the cached group table before returning (see jaccardPairs)
      .localCheckpoint(true)
    } finally groups.unpersist()
  }

  /**
   * Connected components of the simhash near-dup graph, computed on the
   * DISTINCT-FINGERPRINT graph and expanded — identical output to
   * `ConnectedComponents.components(simhashNearDups(docs, maxHamming))`,
   * proven by the same interchangeability argument as the pair
   * compression plus two observations:
   *  - equal-fp docs always land in one component (their within-group
   *    clique has hamming 0), so contracting each fp group to one node
   *    preserves the component structure exactly;
   *  - labels agree: the doc-level label is the min doc_id in the
   *    component; the rep-level label is the min setid, and setid is by
   *    construction the min doc_id of its group, so min-over-setids ==
   *    min-over-docs.
   * The CC loop's edge list shrinks from the EXPANDED pair set (within-
   * group cliques contribute C(n,2) edges each — 31k for one 251-doc
   * cohort at sf0.1) to the rep pair set, and its node set from docs to
   * distinct fps. Groups with >1 member but no cross edge still emit all
   * members as one component (their clique made them CC nodes in the
   * doc-level form); singleton groups with no edges are excluded, exactly
   * as docs with no pairs are absent from the doc-level output.
   */
  def simhashComponents(docs: DataFrame, maxHamming: Int): DataFrame = {
    require(maxHamming < SimHashChunks, "pigeonhole needs maxHamming < #chunks")
    val groups = simhashGroups(docs).persist()
    try {
    val gid = groups.select(col("fp"),
      element_at(col("members"), 1).cast("long").as("setid"), col("members"))
    val repEdges = simhashRepPairs(groups, maxHamming)
      .join(gid.select(col("fp").as("fp_a"), col("setid").as("sa")), Seq("fp_a"))
      .join(gid.select(col("fp").as("fp_b"), col("setid").as("sb")), Seq("fp_b"))
      .select(col("sa").as("doc_a"), col("sb").as("doc_b"))
    val repComps = ConnectedComponents.components(repEdges)
    gid.join(repComps.withColumnRenamed("node", "setid"), Seq("setid"), "left_outer")
      .where(size(col("members")) > 1 || col("comp").isNotNull)
      .select(explode(col("members")).as("m"),
        coalesce(col("comp"), col("setid")).as("comp"))
      .select(col("m").cast("long").as("node"), col("comp"))
      .localCheckpoint(true)
    } finally groups.unpersist()
  }

  /**
   * Incremental refresh of the simhash cluster index: merge an incoming
   * shard into a standing `(node, comp)` assignment WITHOUT re-pairing
   * the standing corpus against itself — the maintenance path of the
   * persisted dedup index ([[graft.operators.DedupIndex]]): build once,
   * then each ingest batch runs this refresh.
   *
   * Output is IDENTICAL to the full rebuild
   * `simhashComponents(docs, maxHamming)`, by contraction: every
   * base-base near-dup pair lies inside one base component (that is what
   * the base index records), so contracting each base component to its
   * label preserves the connectivity of the full pair graph — new pairs
   * always have an incoming endpoint. Labels agree because a base
   * component's label is already the min doc_id of its members, so the
   * min over contracted nodes equals the min over docs.
   *
   * Scale shape: the banded candidate join is ASYMMETRIC — incoming
   * against the whole corpus, plus incoming x incoming pair-once; a
   * base x base pair is never generated. The CC loop runs on the TOUCHED
   * subgraph only (incoming endpoints + contracted component labels), so
   * its edge list is bounded by ingest activity, not corpus size;
   * untouched components keep their labels through a component-count-
   * sized remap join. (Identical-fingerprint cohort compression, as in
   * simhashComponents, composes here too if ingest batches grow
   * boilerplate-heavy; at ingest-batch grain the doc-level join is the
   * simpler right default.)
   */
  def simhashComponentsRefresh(docs: DataFrame, isIncoming: Column,
      maxHamming: Int, baseComps: DataFrame): DataFrame = {
    val flagged = docs.select(col("doc_id"), isIncoming.as("inc"))
    // read twice (two sides of the banded join): materialize once
    val fps = simhashFingerprints(docs).join(flagged, "doc_id")
      .localCheckpoint(true)
    simhashComponentsRefreshFromFps(fps, maxHamming, baseComps)
  }

  /**
   * Fingerprint-level form of [[simhashComponentsRefresh]] for callers
   * that PERSIST fingerprints across refreshes — the true incremental
   * regime: a lakehouse stores `fp` as an indexed column, so each ingest
   * batch fingerprints only its own docs and the standing corpus is
   * never re-scanned, let alone re-hashed. `fps` must carry
   * (doc_id, fp, inc) with `inc` true exactly for the incoming shard.
   * The streaming maintenance query (stream_index_refresh) folds batches
   * through this form with an accumulated fp table.
   */
  def simhashComponentsRefreshFromFps(fps: DataFrame,
      maxHamming: Int, baseComps: DataFrame): DataFrame =
    refreshAssemble(simhashRefreshPairs(fps, maxHamming), baseComps)

  /** Delta twin of [[simhashComponentsRefreshFromFps]]: same asymmetric
    * banded candidates, but the output is only the MERGE payload
    * (see [[refreshDelta]]) — what [[graft.streaming.IndexMaintenance]]
    * persists per ingest batch. */
  def simhashComponentsRefreshFromFpsDelta(fps: DataFrame,
      maxHamming: Int, baseComps: DataFrame): DataFrame =
    refreshDelta(simhashRefreshPairs(fps, maxHamming), baseComps)

  /** Sink form of [[simhashComponentsRefreshFromFpsDelta]] — the delta is
    * materialized exactly once, by `sink` (see [[refreshDeltaTo]]). */
  def simhashComponentsRefreshFromFpsDeltaTo(fps: DataFrame,
      maxHamming: Int, baseComps: DataFrame, sink: DataFrame => Unit): Unit =
    refreshDeltaTo(simhashRefreshPairs(fps, maxHamming), baseComps, sink)

  /** Test/measurement hook for the private candidate stage. */
  private[graft] def probeRefreshPairs(fps: DataFrame, maxHamming: Int): DataFrame =
    simhashRefreshPairs(fps, maxHamming)

  /** (incoming x corpus) near-dup pairs at fingerprint grain — the shared
    * candidate stage of the simhash refresh family. `fps` carries
    * (doc_id, fp, inc); a base x base pair is never generated. */
  private def simhashRefreshPairs(fps: DataFrame, maxHamming: Int): DataFrame = {
    require(maxHamming < SimHashChunks, "pigeonhole needs maxHamming < #chunks")
    def side(tag: String): DataFrame = fps.select(
      col("doc_id").as(s"id_$tag") +: col("inc").as(s"inc_$tag") +:
        col("fp").as(s"fp_$tag") +:
        (0 until SimHashChunks).map(c =>
          shiftright(col("fp"), c * ChunkBits)
            .bitwiseAND(lit((1L << ChunkBits) - 1)).as(s"${tag}c$c")): _*)
    // the incoming restriction is a WHERE on side a, NOT a join-condition
    // conjunct (r13): as a filter it pushes through the union of staged fp
    // shards — the standing branches constant-fold to empty and side a
    // becomes just the new batch's parquet with exact file stats, so the
    // planner reliably broadcasts the O(batch) side and STREAMS the
    // corpus. As a join conjunct, side a was the whole corpus with an
    // estimate, and a conservative threshold flipped the join to
    // sort-merge — re-shuffling every standing fingerprint per batch.
    val a = side("a").where(col("inc_a")) // incoming candidates
    val b = side("b") // the whole corpus
    (0 until SimHashChunks).map { c =>
      val firstMatch = (0 until c)
        .map(p => col(s"ac$p") =!= col(s"bc$p"))
        .foldLeft(col(s"ac$c") === col(s"bc$c"))(_ && _)
      a.join(b, firstMatch &&
          // pair-once: (inc, base) pairs have a unique orientation;
          // (inc, inc) pairs order by id
          (!col("inc_b") || col("id_a") < col("id_b")))
        .select(col("id_a"), col("id_b"),
          bit_count(col("fp_a").bitwiseXOR(col("fp_b"))).as("hamming"))
    }.reduce(_ unionAll _)
      .where(col("hamming") <= maxHamming)
      .select(col("id_a").as("doc_a"), col("id_b").as("doc_b"))
  }

  /** Document-level delta refresh: fingerprint the docs, then
    * [[simhashComponentsRefreshFromFpsDelta]]. Output is only the
    * changed/new `(node, comp)` rows vs `baseComps`. */
  def simhashComponentsRefreshDelta(docs: DataFrame, isIncoming: Column,
      maxHamming: Int, baseComps: DataFrame): DataFrame = {
    val flagged = docs.select(col("doc_id"), isIncoming.as("inc"))
    val fps = simhashFingerprints(docs).join(flagged, "doc_id")
      .localCheckpoint(true)
    simhashComponentsRefreshFromFpsDelta(fps, maxHamming, baseComps)
  }

  /**
   * Shared tail of the index-refresh family: contract corpus-side pair
   * endpoints to their standing component label, run CC over the touched
   * subgraph only, remap merged standing labels, and re-emit untouched
   * members unchanged. `pairs` rows are (doc_a = incoming endpoint,
   * doc_b = any corpus endpoint); `baseComps` is the standing index.
   */
  private def refreshAssemble(pairs: DataFrame, baseComps: DataFrame): DataFrame = {
    val delta = refreshDelta(pairs, baseComps)
    // untouched standing members pass through unchanged; the delta is
    // small (ingest-activity-sized) and already materialized, so the
    // anti-join's build side broadcasts under AQE
    baseComps.join(delta.select(col("node")), Seq("node"), "left_anti")
      .unionByName(delta).localCheckpoint(true)
  }

  /**
   * Delta form of the refresh tail: ONLY the `(node, comp)` rows a
   * lakehouse MERGE must write. Two kinds of row come back:
   *   - UPDATE half: members of a standing component whose label merged
   *     into a smaller one (every member is rewritten to the new label);
   *   - INSERT half: nodes newly entering the index — incoming docs that
   *     clustered, plus previously-unclustered standing docs an incoming
   *     pair touched.
   * Untouched standing rows are never emitted, so the payload is bounded
   * by ingest activity, not index size — the property that makes
   * continuous index maintenance affordable at 100 TB (the full index is
   * scanned, never rewritten). `full refreshed index = baseComps rows
   * whose node is absent from the delta + the delta` (refreshAssemble is
   * literally that composition).
   */
  private def refreshDelta(pairs: DataFrame, baseComps: DataFrame): DataFrame = {
    var out: DataFrame = null
    refreshDeltaTo(pairs, baseComps, df => { out = df.localCheckpoint(true); () })
    out
  }

  /** Sink form of [[refreshDelta]] (r17 opt round): the delta plan is
    * handed to `sink` for its ONE materialization (the streaming
    * maintenance loop writes it straight to the batch's parquet shard),
    * instead of localCheckpoint-then-write — the checkpoint existed only
    * so the per-batch caches below could be released before the caller's
    * write, which this shape does after the sink returns. One
    * materialization job per batch saved; identical rows either way. */
  private def refreshDeltaTo(pairs: DataFrame, baseComps: DataFrame,
      sink: DataFrame => Unit): Unit = {
    // materialized ONCE via eager local checkpoint (exact size stats ->
    // Catalyst picks the broadcast sides below at PLANNING time; a
    // lazily-cached frame carries child-plan estimates, under which AQE
    // plans sort-merge exchanges and pays their shuffle writes even when
    // it later converts the join), then explicitly RELEASED on return —
    // per-batch maintenance loops outran the context cleaner when this
    // was left to GC (+570 MB retained over a 24-batch sf3 soak)
    // the minhash candidate stage already returns a checkpointed frame;
    // re-checkpointing a bare materialized RDD would serialize the whole
    // pair list a second time for nothing (+3s/+20 CPU-s on the sf0.1
    // streaming maintenance bench)
    val preMaterialized =
      org.apache.spark.sql.graftbridge.CheckpointBridge.isMaterialized(pairs)
    val p = if (preMaterialized) pairs else pairs.localCheckpoint(true)
    try {
      // The standing index is SCANNED, never shuffled (r13, r12 verdict
      // #2). Every index access below is a join whose OTHER side is
      // activity-bounded (pair endpoints, merged labels, touched labels),
      // so each carries an explicit broadcast hint: stats cannot make the
      // call here — a checkpoint carries its origin plan's ESTIMATE (the
      // banded join's, effectively infinite), so Catalyst would plan
      // sort-merge exchanges and re-shuffle the index every batch. The
      // hint encodes the structural invariant instead; if a pathological
      // ingest batch ever outgrows broadcast, split the batch — the knob
      // the operator already owns.
      // DISTINCT before the broadcast: candidate pairs carry heavy
      // endpoint multiplicity (dup-dense corpora: 42x at sf3), so the
      // distinct's map-side combine collapses the set before one small
      // exchange, and what broadcasts is bounded by distinct near-dup
      // NEIGHBORS of the batch — not by the raw pair count
      val endpoints = p.select(col("doc_b").as("node")).distinct()
      // materialized once (and released below): two consumers, and the
      // broadcast of `endpoints` inside it should be built once, not per
      // consuming query
      val touched = baseComps.join(broadcast(endpoints), Seq("node"), "left_semi")
        .localCheckpoint(true)
      val edges = p
        .join(broadcast(
          touched.select(col("node").as("doc_b"), col("comp").as("comp_b"))),
          Seq("doc_b"), "left_outer")
        .select(col("doc_a"), coalesce(col("comp_b"), col("doc_b")).as("doc_b"))
        // local sort, no exchange: broadcast joins preserve the candidate
        // stream's arbitrary order, and CC's first shuffle of the pair
        // multiset compresses ~3x better over doc_b runs
        .sortWithinPartitions(col("doc_b"))
      val cc = ConnectedComponents.components(edges).localCheckpoint(true)
      // standing components whose label merged into another: a contracted
      // node in cc IS a standing label (incoming doc_ids and standing
      // labels live in disjoint doc_id sets — a label is the min member
      // of a base component, so its doc is in base, never incoming)
      val changed = cc.select(col("node").as("comp"), col("comp").as("finalc"))
        .where(col("finalc") =!= col("comp"))
      val changedBase = baseComps.join(broadcast(changed), "comp")
        .select(col("node"), col("finalc").as("comp"))
      // a cc node present in the standing index is necessarily a
      // CONTRACTED LABEL of a touched row (incoming doc_ids are disjoint
      // from standing nodes; an uncontracted endpoint has no base row by
      // construction), so "newly entering the index" needs an anti-join
      // against only the touched labels — small both sides — not against
      // the whole index
      val newOut = cc.join(
        broadcast(touched.select(col("comp").as("node")).distinct()),
        Seq("node"), "left_anti")
      sink(changedBase.unionByName(newOut))
      // the sink's materialization above is the last consumer of `touched`
      // AND of `cc` (changed/newOut both fold into the sunk plan) —
      // release both eagerly: per-batch maintenance loops outrun the
      // context cleaner (the +570 MB r13 soak finding applied to cc too)
      org.apache.spark.sql.graftbridge.CheckpointBridge.release(touched)
      org.apache.spark.sql.graftbridge.CheckpointBridge.release(cc)
    } finally {
      // only release what THIS method pinned: a caller-provided
      // checkpoint may have later consumers
      if (!preMaterialized)
        org.apache.spark.sql.graftbridge.CheckpointBridge.release(p)
    }
  }

  /**
   * MinHash twin of [[simhashComponentsRefresh]]: merge an incoming shard
   * into a standing unigram-Jaccard cluster index. Asymmetric banded LSH
   * candidates (incoming x corpus, pair-once via the earlier-bands-differ
   * guard — a base x base candidate is never generated), the
   * exactness-preserving size-ratio prefilter, exact Jaccard verification
   * over sorted word-hash arrays, then the shared contracted-CC tail.
   * Identical output to `minhashComponents(docs, threshold)` by the same
   * contraction argument: every verified base-base pair lies inside one
   * standing component, and labels are member minima.
   */
  def minhashComponentsRefresh(docs: DataFrame, isIncoming: Column,
      threshold: Double, baseComps: DataFrame): DataFrame =
    refreshAssemble(minhashRefreshPairs(docs, isIncoming, threshold), baseComps)

  /** Delta twin of [[minhashComponentsRefresh]] — only the MERGE payload
    * (see [[refreshDelta]]). */
  def minhashComponentsRefreshDelta(docs: DataFrame, isIncoming: Column,
      threshold: Double, baseComps: DataFrame): DataFrame =
    refreshDelta(minhashRefreshPairs(docs, isIncoming, threshold), baseComps)

  /** Verified (incoming x corpus) Jaccard pairs — the shared candidate +
    * verification stage of the MinHash refresh family. */
  private def minhashRefreshPairs(docs: DataFrame, isIncoming: Column,
      threshold: Double): DataFrame = {
    val flagged = docs.select(col("doc_id"), isIncoming.as("inc"))
    val words = docWords(docs).persist()
    try {
      val sigs = bandedSignatures(minhashSignaturesFromWords(words))
        .join(flagged, "doc_id").localCheckpoint(true) // both join sides
      val wordSets = words.groupBy(col("doc_id"))
        .agg(sort_array(collect_list(xxhash64(col("word")))).as("wset"),
          count(lit(1)).as("n_w"))
      // the returned pairs are materialized inside FromSigs, so `words`
      // (backing the lazy wordSets) can be released on exit
      minhashRefreshPairsFromSigs(sigs, wordSets, threshold)
    } finally words.unpersist()
  }

  /**
   * Signature-level form of the MinHash refresh candidate stage, for
   * callers that PERSIST signatures and word-hash sets across refreshes
   * (the stored-column lakehouse regime, twin of
   * [[simhashComponentsRefreshFromFps]]). `sigs` carries
   * (doc_id, band0..bandN-1, inc) with `inc` true exactly for the
   * incoming shard; `wordSets` carries (doc_id, wset, n_w) with `wset`
   * the sorted distinct word hashes. Output pairs are materialized.
   */
  private[graft] def minhashRefreshPairsFromSigs(sigs: DataFrame,
      wordSets: DataFrame, threshold: Double): DataFrame = {
    // incoming restriction as a WHERE, not a join conjunct — same
    // union-pruning/broadcast rationale as simhashRefreshPairs (r13)
    val a = sigs.where(col("inc")).as("a")
    val b = sigs.as("b")
    val cand = (0 until NumBands).map { bnd =>
      val first = (0 until bnd)
        .map(p => col(s"a.band$p") =!= col(s"b.band$p"))
        .foldLeft(!col("b.inc") || col("a.doc_id") < col("b.doc_id"))(_ && _)
      a.join(b, col(s"a.band$bnd") === col(s"b.band$bnd") && first)
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
    }.reduce(_ unionAll _)
    cand
      .join(wordSets.select(col("doc_id").as("doc_a"),
        col("wset").as("wset_a"), col("n_w").as("n_a")), Seq("doc_a"))
      .join(wordSets.select(col("doc_id").as("doc_b"),
        col("wset").as("wset_b"), col("n_w").as("n_b")), Seq("doc_b"))
      .where(least(col("n_a"), col("n_b")) >=
        lit(threshold) * greatest(col("n_a"), col("n_b")))
      .withColumn("n_common",
        graft.functions.SortedIntersect.size(col("wset_a"), col("wset_b")))
      .where(col("n_common") * lit(1.0) /
        (col("n_a") + col("n_b") - col("n_common")) >= lit(threshold))
      .select(col("doc_a"), col("doc_b"))
      .localCheckpoint(true)
  }

  /** Signature-level MinHash refresh (full assembled index) — what an
    * ingest batch pays when signatures and word sets are stored columns:
    * no corpus re-tokenization, no signature recompute. */
  def minhashComponentsRefreshFromSigs(sigs: DataFrame, wordSets: DataFrame,
      threshold: Double, baseComps: DataFrame): DataFrame =
    refreshAssemble(
      minhashRefreshPairsFromSigs(sigs, wordSets, threshold), baseComps)

  /** Delta twin of [[minhashComponentsRefreshFromSigs]] — only the MERGE
    * payload (see [[refreshDelta]]). */
  def minhashComponentsRefreshFromSigsDelta(sigs: DataFrame, wordSets: DataFrame,
      threshold: Double, baseComps: DataFrame): DataFrame =
    refreshDelta(
      minhashRefreshPairsFromSigs(sigs, wordSets, threshold), baseComps)

  /** Sink form of [[minhashComponentsRefreshFromSigsDelta]] — the delta is
    * materialized exactly once, by `sink` (see [[refreshDeltaTo]]). */
  def minhashComponentsRefreshFromSigsDeltaTo(sigs: DataFrame, wordSets: DataFrame,
      threshold: Double, baseComps: DataFrame, sink: DataFrame => Unit): Unit =
    refreshDeltaTo(
      minhashRefreshPairsFromSigs(sigs, wordSets, threshold), baseComps, sink)

  /** The MinHash stored columns for ONE ingest batch, as a single frame
    * `(doc_id, band0..bandN-1, wset, n_w)` — what
    * [[graft.streaming.IndexMaintenance]] persists per batch. Lazy (the
    * caller's parquet write materializes it); per-batch-sized work. */
  def minhashStagedColumns(docs: DataFrame): DataFrame = {
    // ONE narrow projection (r17 opt round): bands, word-hash set and
    // set size are all per-row functions of `text` — the grouped form
    // paid a distinct exchange + two aggregation exchanges + a join
    // PER INGEST BATCH for the same values
    val withArr = docs.where(col("text").isNotNull)
      .select(col("doc_id"), minhashSigArr(col("text")).as("_mh"),
        wordArr(col("text")).as("_w"))
    val bandCols = (0 until NumBands).map { bnd =>
      concat_ws(",", (bnd * BandRows until (bnd + 1) * BandRows)
        .map(j => element_at(col("_mh"), j + 1).cast("string")): _*)
        .as(s"band$bnd")
    }
    withArr.select(col("doc_id") +: bandCols :+
      array_sort(transform(col("_w"), w => xxhash64(w))).as("wset") :+
      size(col("_w")).cast("long").as("n_w"): _*)
  }

  /** Read schema for [[minhashStagedColumns]] parquet (empty ingest
    * files are legal, so readers can't rely on inference). */
  def minhashStagedSchema: org.apache.spark.sql.types.StructType = {
    import org.apache.spark.sql.types._
    (0 until NumBands)
      .foldLeft(new StructType().add("doc_id", LongType)) {
        (st, b) => st.add(s"band$b", StringType)
      }
      .add("wset", ArrayType(LongType, containsNull = false))
      .add("n_w", LongType)
  }

  /** One-time (per corpus snapshot) computation of the stored columns
    * [[minhashComponentsRefreshFromSigs]] reads: banded signatures and
    * sorted word-hash sets, both materialized. This is the UNTIMED setup
    * of the refresh-scale protocol — in a lakehouse these live in the
    * doc table and are written at ingest, amortized over every later
    * refresh. */
  def minhashRefreshInputs(docs: DataFrame,
      isIncoming: Column): (DataFrame, DataFrame) = {
    // per-row staging (see minhashStagedColumns): the inc flag rides the
    // same projection — no explode, no exchange, no join
    val withArr = docs.where(col("text").isNotNull)
      .select(col("doc_id"), minhashSigArr(col("text")).as("_mh"),
        wordArr(col("text")).as("_w"), isIncoming.as("inc"))
    val bandCols = (0 until NumBands).map { bnd =>
      concat_ws(",", (bnd * BandRows until (bnd + 1) * BandRows)
        .map(j => element_at(col("_mh"), j + 1).cast("string")): _*)
        .as(s"band$bnd")
    }
    val sigs = withArr
      .select(col("doc_id") +: bandCols :+ col("inc"): _*)
      .localCheckpoint(true)
    val wordSets = withArr
      .select(col("doc_id"),
        array_sort(transform(col("_w"), w => xxhash64(w))).as("wset"),
        size(col("_w")).cast("long").as("n_w"))
      .localCheckpoint(true)
    (sigs, wordSets)
  }

  /**
   * Benchmark decontamination: drop every corpus document whose content
   * hash appears in the eval/benchmark set — the pipeline step that keeps
   * test data out of training corpora. Output is EXACT in both regimes;
   * corpus(doc_id, text) x eval(text) -> surviving doc_ids.
   *
   * Two regimes by eval-set size:
   *  - eval fits a broadcast (the common case — eval sets are small):
   *    ONE corpus scan, broadcast anti-join, zero shuffle. A bloom gate
   *    here would only add a scan and a UDF for nothing.
   *  - eval beyond broadcast: a Bloom filter (|eval|*~10 bits) gates the
   *    corpus scan so only bloom-POSITIVE rows (true matches + fpp of
   *    the corpus) shuffle into the exact anti-join; bloom-negative rows
   *    are definite keeps that never shuffle. Two corpus scans, but the
   *    anti-join's shuffle shrinks from |corpus| to ~fpp * |corpus| —
   *    the right trade once the eval side itself must shuffle.
   */
  def decontaminate(corpus: DataFrame, evalDocs: DataFrame,
      broadcastLimit: Long = 500000L): DataFrame = {
    val spark = corpus.sparkSession
    val ch = corpus.select(col("doc_id"), md5(col("text").cast("binary")).as("h"))
    // materialized once: the count, the (optional) bloom build, and the
    // anti-join all read it
    val eh = evalDocs.select(md5(col("text").cast("binary")).as("h")).distinct()
      .localCheckpoint(true)
    val nEval = eh.count()
    if (nEval == 0) corpus.select(col("doc_id")) // nothing to remove
    else if (nEval <= broadcastLimit) {
      ch.join(org.apache.spark.sql.functions.broadcast(eh), Seq("h"), "left_anti")
        .select(col("doc_id"))
    } else {
      val bf = eh.stat.bloomFilter("h", nEval, 0.01)
      val bfB = spark.sparkContext.broadcast(bf)
      // null hash (null text) can't match any eval doc -> definite keep
      val might = udf((h: String) => h != null && bfB.value.mightContain(h))
      val keepsDefinite = ch.where(!might(col("h")))
      val keepsVerified = ch.where(might(col("h")))
        .join(eh, Seq("h"), "left_anti") // shuffle join: eval exceeds broadcast
      keepsDefinite.unionByName(keepsVerified).select(col("doc_id"))
    }
  }

  /**
   * Embedding-cosine near-dup over quantized vectors (exact integer dot
   * products — engine-portable, see Similarity.quantize).
   *
   * TEST-SIDE RECALL VERIFIER ONLY — this is the Ω(N²) exhaustive form
   * (a theta-join over corpus²) and is deliberately NOT on the query
   * surface; `dedup_embedding` routes through [[embeddingNearDupsLsh]]
   * (banded equi-join, pair-once). ExtOperatorsSpec uses this form to
   * measure the banded path's recall on small corpora.
   */
  def embeddingNearDups(embeddings: DataFrame, threshold: Double): DataFrame = {
    val q = Similarity.quantizedWithNorm(embeddings)
    val a = q.as("a")
    val b = q.as("b")
    a.join(b, col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
        Similarity.cosineFromParts(
          Similarity.dotQ(col("a.qv"), col("b.qv")), col("a.norm"), col("b.norm")).as("cos"))
      .where(col("cos") >= threshold)
      .select(col("vec_a"), col("vec_b"), round(col("cos"), 4).as("cos"))
  }

  /**
   * Embedding near-dup at scale — the documented 100 TB path: candidate
   * pairs come from BANDED sign-random-projection buckets (nBands
   * independent plane sets, same shape as MinHash banding), the exact
   * cosine verifier runs only inside buckets. Corpus² never materializes:
   * the join is an equi-join on (band, bucket) and each pair is emitted
   * EXACTLY ONCE — in its first colliding band (pair rows carry both
   * sides' bucket columns, so "no earlier band collided" is a local
   * predicate, not a distinct()).
   *
   * Recall < 1 by design (a pair colliding in no band is missed);
   * ExtOperatorsSpec measures recall against the exact quadratic
   * verifier. Every EMITTED pair is exact — same scores as
   * embeddingNearDups.
   */
  def embeddingNearDupsLsh(embeddings: DataFrame, threshold: Double,
      dims: Int = 64, nPlanes: Int = 4, nBands: Int = 2): DataFrame = {
    val q = (0 until nBands).foldLeft(Similarity.quantizedWithNorm(embeddings)) {
      case (df, band) =>
        // band b uses planes [b*nPlanes, (b+1)*nPlanes) — independent sets
        df.withColumn(s"bkt$band",
          (0 until nPlanes).map { p =>
            val signs = array(Similarity.planeSigns(band * nPlanes + p, dims).map(lit): _*)
            when(Similarity.dotQ(col("qv"), signs) > 0, lit(1L << p)).otherwise(lit(0L))
          }.reduce(_ + _))
    }
    val bandRows = q.select(col("*"),
      explode(array((0 until nBands).map(b =>
        struct(lit(b).as("band"), col(s"bkt$b").as("bucket"))): _*)).as("bb"))
      .select(col("vec_id"), col("qv"), col("norm"), col("bb.band").as("band"),
        col("bb.bucket").as("bucket"),
        array((0 until nBands).map(b => col(s"bkt$b")): _*).as("allBkts"))
    val a = bandRows.as("a")
    val b = bandRows.as("b")
    a.join(b, Seq("band", "bucket"))
      .where(col("a.vec_id") < col("b.vec_id"))
      // first-colliding-band canonicalization: emit only if no band
      // before this one also collides (pairs colliding in k bands would
      // otherwise appear k times)
      .where(not(exists(zip_with(
        slice(col("a.allBkts"), lit(1), col("band").cast("int")),
        slice(col("b.allBkts"), lit(1), col("band").cast("int")),
        (x, y) => x === y), p => p)))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
        Similarity.cosineFromParts(
          Similarity.dotQ(col("a.qv"), col("b.qv")), col("a.norm"), col("b.norm")).as("cos"))
      .where(col("cos") >= threshold)
      .select(col("vec_a"), col("vec_b"), round(col("cos"), 4).as("cos"))
  }

  /**
   * Near-dup candidate generation FROM A STANDING IVF INDEX with a
   * HOT-CELL CAP (r15 verdict #3) — the coarse quantizer as the blocking
   * key, guarded by the df-cap discipline: cell size is ~N/nLists only
   * when clusters are balanced, and a duplicate-heavy corpus (exactly
   * where this pipeline runs) concentrates mass in few cells, making
   * the within-cell self-join quadratic in the hot cell. Cells larger
   * than `cellCap` are SUB-SPLIT by a portable hash of vec_id into
   * ceil(n/cellCap) blocks and pairs form only WITHIN a block, so the
   * expected per-block pair count is bounded by ~cellCap²/2 regardless
   * of skew and total candidate work stays O(N·cellCap) — linear in the
   * corpus at a fixed cap.
   *
   * Capped SEMANTICS (same trade as jaccardPairs' maxDf): pairs crossing
   * sub-blocks of a hot cell are dropped from candidate generation. For
   * near-dup harvesting that is the standard posture — a hot cell's
   * members are mutually similar, so each doc still pairs with ~cellCap
   * of its neighbors and downstream connected components re-merge the
   * blocks through shared members. When no cell exceeds cellCap the
   * output is IDENTICAL to the uncapped within-cell join (nsub = 1
   * everywhere). The sub-split hash is [[PortableHash.h]], so the DuckDB
   * oracle replays the capped blocking exactly.
   *
   * `indexed` must have the [[IvfIndex.buildIndex]] layout
   * `(vec_id, qv, norm, cluster)`; the per-cell counts join is a
   * broadcast of nLists rows.
   */
  def embeddingNearDupsIvfCells(indexed: DataFrame, threshold: Double,
      cellCap: Int): DataFrame = {
    require(cellCap >= 2, s"cellCap must be >= 2, got $cellCap")
    val counts = indexed.groupBy(col("cluster")).agg(count(lit(1)).as("n_cell"))
    val blocks = indexed.join(broadcast(counts), Seq("cluster"))
      .withColumn("sub", PortableHash.h(col("vec_id").cast("string")) %
        ceil(col("n_cell") / lit(cellCap.toDouble)).cast("long"))
    val x = blocks.select(col("cluster"), col("sub"),
      col("vec_id").as("vec_a"), col("qv").as("qa"), col("norm").as("na"))
    val y = blocks.select(col("cluster"), col("sub"),
      col("vec_id").as("vec_b"), col("qv").as("qb"), col("norm").as("nb"))
    x.join(y, Seq("cluster", "sub"))
      .where(col("vec_a") < col("vec_b"))
      .select(col("vec_a"), col("vec_b"),
        (Similarity.dotQ(col("qa"), col("qb")).cast("double") /
          (col("na") * col("nb"))).as("cosr"))
      .where(col("cosr") >= threshold)
      .select(col("vec_a"), col("vec_b"), round(col("cosr"), 4).as("cos"))
  }
}
