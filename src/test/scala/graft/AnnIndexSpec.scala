package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.operators.{AnnIndex, IvfIndex, Tables}

/** Contract tests for the standing ANN index lifecycle (r13 verdict #1):
  * one k-means build per (corpus fingerprint, params); durable parquet
  * round-trip in the inverted-file (partitioned-by-cluster) layout;
  * ingest refresh byte-equal to assigning the grown corpus against the
  * frozen centroids; serving from the standing index identical to the
  * one-shot build-and-probe path. */
class AnnIndexSpec extends AnyFunSuite with BeforeAndAfterAll {

  @transient private var spark: SparkSession = _
  private var dir: String = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    dir = Files.createTempDirectory("ann_index").toString
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  /** 24 deterministic 4-dim vectors in 4 well-separated blobs. */
  private def writeEmbs(shift: Double = 0.0): Unit = {
    val rows = (0L until 24L).map { i =>
      val blob = (i % 4).toInt
      val base = Array.fill(4)(0.05f)
      base(blob) = (1.0 + 0.001 * i + shift).toFloat
      (i, base.toSeq)
    }
    spark.createDataFrame(rows).toDF("vec_id", "embedding")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
  }

  private def pairs(df: DataFrame): Set[(Long, Int)] =
    df.select(col("vec_id"), col("cluster")).collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSet

  test("session memo: one build per key, standing serve == one-shot ivfTopK") {
    writeEmbs()
    AnnIndex.invalidateAll()
    val builds0 = AnnIndex.buildCount.get()
    val idx = AnnIndex.ivf(spark, dir, nLists = 4, iters = 2)
    val again = AnnIndex.ivf(spark, dir, nLists = 4, iters = 2)
    assert(idx eq again, "second lookup must return the memoized instance")
    assert(AnnIndex.buildCount.get() == builds0 + 1)

    val served = AnnIndex.topK(idx, Seq(0L, 1L), 3, nProbe = 2)
      .orderBy(col("query_id"), col("rnk")).collect().toSeq
    val oneShot = IvfIndex.ivfTopK(Tables.table(spark, dir, "embeddings"),
        Seq(0L, 1L), 3, nLists = 4, nProbe = 2, iters = 2)
      .orderBy(col("query_id"), col("rnk")).collect().toSeq
    assert(served == oneShot, "standing-index serve must equal the one-shot path")

    // different params are a different entry
    val other = AnnIndex.ivf(spark, dir, nLists = 2, iters = 2)
    assert(!(other eq idx))
    assert(AnnIndex.buildCount.get() == builds0 + 2)
  }

  test("ingest refresh == assigning the grown corpus against frozen centroids") {
    writeEmbs()
    AnnIndex.invalidateAll()
    val isIngest = col("vec_id") % 3 === 2
    val base = AnnIndex.ivfFiltered(spark, dir, nLists = 4, iters = 2,
      "mod3test", !isIngest)
    val all = Tables.table(spark, dir, "embeddings")
    val refreshed = AnnIndex.refreshedAssign(base, all.where(isIngest))
    val rebuilt = IvfIndex.assignBatch(all, base.centroids)
    assert(pairs(refreshed) == pairs(rebuilt),
      "refresh must equal the frozen-centroid full assignment")
    // and the refresh really covers everything exactly once
    assert(refreshed.count() == 24)
    assert(refreshed.select(col("vec_id")).distinct().count() == 24)
  }

  test("PQ artifact memo: one build per key; durable round-trip exact") {
    val cacheDir = Files.createTempDirectory("graft_pq_cache").toString
    System.setProperty("graft.index.cache", cacheDir)
    try {
      writeEmbs()
      AnnIndex.invalidateAll()
      val builds0 = AnnIndex.pqBuildCount.get()
      // 4-dim vectors: 2 subspaces x 2 dims, 4 codes
      val art = AnnIndex.pq(spark, dir, m = 2, ksub = 4, iters = 2, dims = 4)
      val again = AnnIndex.pq(spark, dir, m = 2, ksub = 4, iters = 2, dims = 4)
      assert(art eq again)
      assert(AnnIndex.pqBuildCount.get() == builds0 + 1)
      val expect = art.codes.collect().map(_.toSeq).toSet
      val expectBooks = art.books.map(_.map(_.toSeq).toSeq).toSeq

      AnnIndex.invalidateAll()
      val loaded = AnnIndex.pq(spark, dir, m = 2, ksub = 4, iters = 2, dims = 4)
      assert(AnnIndex.pqBuildCount.get() == builds0 + 1, "durable hit rebuilt")
      assert(loaded.books.map(_.map(_.toSeq).toSeq).toSeq == expectBooks)
      assert(loaded.codes.collect().map(_.toSeq).toSet == expect)
    } finally {
      System.clearProperty("graft.index.cache")
      AnnIndex.invalidateAll()
    }
  }

  test("durable layer: inverted-file layout on disk, fresh session loads, changed corpus rebuilds") {
    val cacheDir = Files.createTempDirectory("graft_ann_cache").toString
    System.setProperty("graft.index.cache", cacheDir)
    try {
      writeEmbs()
      AnnIndex.invalidateAll()
      val builds0 = AnnIndex.buildCount.get()
      val built = AnnIndex.ivf(spark, dir, nLists = 4, iters = 2)
      val expect = pairs(built.assigned)
      val expectCents = built.centroids.map(_.toSeq).toSeq
      assert(AnnIndex.buildCount.get() == builds0 + 1)

      // published entry: assign/ partitioned by cluster (the IVF layout —
      // a probe's pruned read shape), centroids/ alongside, no tmp debris
      val entries = new java.io.File(cacheDir).listFiles().map(_.getName).toSeq
      assert(entries.exists(_.matches("[0-9a-f]{32}")), s"no entry: $entries")
      assert(!entries.exists(_.startsWith(".tmp_")), s"tmp debris: $entries")
      val entry = new java.io.File(cacheDir,
        entries.find(_.matches("[0-9a-f]{32}")).get)
      val assignDirs = new java.io.File(entry, "assign").listFiles()
        .map(_.getName).filter(_.startsWith("cluster="))
      assert(assignDirs.nonEmpty,
        s"assign/ must be partitioned by cluster, found: ${assignDirs.toSeq}")

      // fresh session layer -> durable load: no rebuild, identical index
      AnnIndex.invalidateAll()
      val loaded = AnnIndex.ivf(spark, dir, nLists = 4, iters = 2)
      assert(AnnIndex.buildCount.get() == builds0 + 1, "durable hit rebuilt")
      assert(loaded.centroids.map(_.toSeq).toSeq == expectCents,
        "centroids must round-trip exactly")
      assert(pairs(loaded.assigned) == expect)
      // and serving from the loaded index matches serving from the built one
      val a = AnnIndex.topK(built, Seq(0L), 3, 2).collect().toSeq
      val b = AnnIndex.topK(loaded, Seq(0L), 3, 2)
        .orderBy(col("rnk")).collect().toSeq
      assert(a.sortBy(_.getInt(1)) == b.sortBy(_.getInt(1)))

      // new corpus content at the same path must miss and rebuild
      writeEmbs(shift = 0.5)
      AnnIndex.invalidateAll()
      AnnIndex.ivf(spark, dir, nLists = 4, iters = 2)
      assert(AnnIndex.buildCount.get() == builds0 + 2,
        "changed corpus must not be served from the durable cache")
    } finally {
      System.clearProperty("graft.index.cache")
      AnnIndex.invalidateAll()
    }
  }

  test("IVFADC single-table memo: one stitch per key; durable layout partitioned by cluster") {
    val cacheDir = Files.createTempDirectory("graft_ivfpq_cache").toString
    System.setProperty("graft.index.cache", cacheDir)
    try {
      writeEmbs()
      AnnIndex.invalidateAll()
      val stitches0 = AnnIndex.ivfpqBuildCount.get()
      val art = AnnIndex.ivfpq(spark, dir, nLists = 4, iters = 2,
        m = 2, ksub = 4, pqIters = 2, dims = 4)
      val again = AnnIndex.ivfpq(spark, dir, nLists = 4, iters = 2,
        m = 2, ksub = 4, pqIters = 2, dims = 4)
      assert(art eq again)
      assert(AnnIndex.ivfpqBuildCount.get() == stitches0 + 1)
      // the table carries BOTH halves: cluster (IVF) + codes/recon2 (PQ)
      assert(art.table.columns.toSet ==
        Set("vec_id", "cluster", "recon2", "code_0", "code_1"))
      val expect = art.table.collect().map(_.toSeq).toSet

      // durable entry: table/ partitioned by cluster — the probe's
      // pruned read shape
      val entry = new java.io.File(cacheDir).listFiles()
        .filter(_.getName.matches("[0-9a-f]{32}"))
        .find(e => new java.io.File(e, "table").isDirectory)
        .getOrElse(fail(s"no ivfpq durable entry under $cacheDir"))
      val clusterDirs = new java.io.File(entry, "table").listFiles()
        .map(_.getName).filter(_.startsWith("cluster="))
      assert(clusterDirs.nonEmpty,
        s"table/ must be partitioned by cluster, found: ${clusterDirs.toSeq}")

      // fresh session -> durable load: no re-stitch, identical table
      AnnIndex.invalidateAll()
      val loaded = AnnIndex.ivfpq(spark, dir, nLists = 4, iters = 2,
        m = 2, ksub = 4, pqIters = 2, dims = 4)
      assert(AnnIndex.ivfpqBuildCount.get() == stitches0 + 1, "durable hit re-stitched")
      assert(loaded.table.select(expectCols(loaded.table): _*)
        .collect().map(_.toSeq).toSet == expect)
      assert(loaded.centroids.map(_.toSeq).toSeq == art.centroids.map(_.toSeq).toSeq)
      assert(loaded.books.map(_.map(_.toSeq).toSeq).toSeq ==
        art.books.map(_.map(_.toSeq).toSeq).toSeq)
    } finally {
      System.clearProperty("graft.index.cache")
      AnnIndex.invalidateAll()
    }
  }

  /** Columns of `df` reordered to the stitch layout for set comparison. */
  private def expectCols(df: org.apache.spark.sql.DataFrame) =
    Seq(col("vec_id"), col("cluster"), col("recon2"), col("code_0"), col("code_1"))

  test("one tag, two filters: entries key apart (filter hash in the memo key)") {
    writeEmbs()
    AnnIndex.invalidateAll()
    val builds0 = AnnIndex.buildCount.get()
    val a = AnnIndex.ivfFiltered(spark, dir, nLists = 2, iters = 1,
      "sharedtag", col("vec_id") % 3 =!= 2)
    val b = AnnIndex.ivfFiltered(spark, dir, nLists = 2, iters = 1,
      "sharedtag", col("vec_id") % 3 =!= 1)
    assert(!(a eq b), "a reused tag with a different filter must not " +
      "silently serve the other filter's standing index")
    assert(AnnIndex.buildCount.get() == builds0 + 2)
    def ids(idx: AnnIndex.Ivf): Set[Long] =
      idx.assigned.select(col("vec_id")).collect().map(_.getLong(0)).toSet
    assert(ids(a) == (0L until 24L).filter(_ % 3 != 2).toSet)
    assert(ids(b) == (0L until 24L).filter(_ % 3 != 1).toSet)
    // and the same (tag, filter) pair still memo-hits
    val a2 = AnnIndex.ivfFiltered(spark, dir, nLists = 2, iters = 1,
      "sharedtag", col("vec_id") % 3 =!= 2)
    assert(a2 eq a)
    assert(AnnIndex.buildCount.get() == builds0 + 2)
  }

  test("refit-and-swap: new index == full-corpus fit; aged entry dropped and released") {
    writeEmbs()
    AnnIndex.invalidateAll()
    import org.apache.spark.sql.graftbridge.CheckpointBridge
    val agedFilter = col("vec_id") % 3 =!= 2
    val aged = AnnIndex.ivfFiltered(spark, dir, nLists = 4, iters = 2,
      "agedtest", agedFilter)
    assert(!CheckpointBridge.isReleased(aged.assigned))
    val builds0 = AnnIndex.buildCount.get()

    val refit = AnnIndex.refitIvfTo(spark, dir, nLists = 4, iters = 2,
      "agedtest", agedFilter)
    // the refit IS the standard full-corpus index (shared memo)
    val full = AnnIndex.ivf(spark, dir, nLists = 4, iters = 2)
    assert(refit eq full)
    assert(AnnIndex.buildCount.get() == builds0 + 1)
    assert(pairs(refit.assigned) ==
      pairs(IvfIndex.assignBatch(Tables.table(spark, dir, "embeddings"),
        refit.centroids)))
    // swap semantics: the aged entry is gone and its blocks are released
    assert(CheckpointBridge.isReleased(aged.assigned),
      "the swap must release the aged entry's checkpoint blocks")
    val rebuilt = AnnIndex.ivfFiltered(spark, dir, nLists = 4, iters = 2,
      "agedtest", agedFilter)
    assert(!(rebuilt eq aged) && AnnIndex.buildCount.get() == builds0 + 2,
      "the aged key must be free for the next maintenance cycle")
    // the refit index itself must survive the swap untouched
    assert(!CheckpointBridge.isReleased(refit.assigned))
  }

  test("a changed corpus evicts AND releases the superseded session entry") {
    writeEmbs()
    AnnIndex.invalidateAll()
    val old = AnnIndex.ivf(spark, dir, nLists = 4, iters = 2)
    import org.apache.spark.sql.graftbridge.CheckpointBridge
    assert(CheckpointBridge.isMaterialized(old.assigned) &&
      !CheckpointBridge.isReleased(old.assigned),
      "a fresh session build is an eagerly-checkpointed frame")
    val oldPq = AnnIndex.pq(spark, dir, m = 2, ksub = 4, iters = 2, dims = 4)
    assert(!CheckpointBridge.isReleased(oldPq.codes))

    // same (dir, params) alias, new corpus fingerprint: the rebuild must
    // drop the superseded entry and unpersist its checkpoint blocks
    // instead of pinning them for the session lifetime (r14 advice)
    writeEmbs(shift = 0.25)
    val fresh = AnnIndex.ivf(spark, dir, nLists = 4, iters = 2)
    assert(!(fresh eq old))
    assert(CheckpointBridge.isReleased(old.assigned),
      "superseded IVF entry's checkpoint blocks must be released")
    val freshPq = AnnIndex.pq(spark, dir, m = 2, ksub = 4, iters = 2, dims = 4)
    assert(!(freshPq eq oldPq))
    assert(CheckpointBridge.isReleased(oldPq.codes),
      "superseded PQ entry's checkpoint blocks must be released")
    assert(!CheckpointBridge.isReleased(fresh.assigned) &&
      !CheckpointBridge.isReleased(freshPq.codes),
      "the live entries must keep their blocks")
  }
}
