package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.operators.DedupIndex

/** Contract tests for the memoized cluster index: one build per
  * (corpus fingerprint, algorithm, params), and a changed corpus —
  * same path, new file content — must rebuild, never serve stale
  * clusters. */
class DedupIndexSpec extends AnyFunSuite with BeforeAndAfterAll {

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
    dir = Files.createTempDirectory("dedup_index").toString
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def writeDocs(rows: Seq[(Long, String)]): Unit =
    spark.createDataFrame(rows).toDF("doc_id", "text")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")

  test("same corpus memoizes (identical frame instance); new content rebuilds") {
    writeDocs(Seq((1L, "a b c d"), (2L, "a b c d"), (3L, "x y z w")))
    val first = DedupIndex.simhashComponents(spark, dir, 3)
    val again = DedupIndex.simhashComponents(spark, dir, 3)
    assert(first eq again, "second lookup must return the memoized instance")
    val got1 = first.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got1 == Set((1L, 1L), (2L, 1L)))

    // regenerate the corpus at the SAME path: 3 now duplicates 1, and 2
    // is gone — a stale index would still pair (1,2)
    writeDocs(Seq((1L, "a b c d"), (3L, "a b c d"), (5L, "q r s t")))
    val rebuilt = DedupIndex.simhashComponents(spark, dir, 3)
    assert(!(rebuilt eq first), "changed corpus fingerprint must rebuild")
    val got2 = rebuilt.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got2 == Set((1L, 1L), (3L, 1L)), s"stale index served: $got2")
  }

  test("different params are different cache entries") {
    writeDocs(Seq((1L, "a b c d"), (2L, "a b c d")))
    val h3 = DedupIndex.simhashComponents(spark, dir, 3)
    val h1 = DedupIndex.simhashComponents(spark, dir, 1)
    assert(!(h3 eq h1), "maxHamming must be part of the cache key")
    // exact duplicates cluster at every threshold — values agree here
    assert(h3.collect().toSet == h1.collect().toSet)
  }

  test("fingerprint is 128-bit and distinguishes same-named files in subdirs") {
    val a = Files.createTempDirectory("fp_a")
    val b = Files.createTempDirectory("fp_b")
    def put(root: java.nio.file.Path, rel: String, content: String): Unit = {
      val p = root.resolve(rel)
      Files.createDirectories(p.getParent)
      Files.write(p, content.getBytes("UTF-8"))
      // pin mod-times so only the PATH STRUCTURE differs between a and b
      p.toFile.setLastModified(1700000000000L)
    }
    // same base names, same lengths, same mod-times — different subdirs.
    // The old base-name hashCode keyed these identically.
    put(a, "x/part-0.parquet", "12345678")
    put(b, "y/part-0.parquet", "12345678")
    val fa = DedupIndex.fingerprint(spark, a.toString)
    val fb = DedupIndex.fingerprint(spark, b.toString)
    assert(fa.matches("[0-9a-f]{32}"), s"expected md5 hex, got $fa")
    assert(fa != fb, "relative path must be part of the fingerprint")
  }

  test("durable cache: a fresh session layer loads from disk, zero rebuilds") {
    val cacheDir = Files.createTempDirectory("graft_index_cache").toString
    System.setProperty("graft.index.cache", cacheDir)
    try {
      writeDocs(Seq((10L, "m n o p"), (11L, "m n o p"), (12L, "q r s t")))
      DedupIndex.invalidateAll()
      val builds0 = DedupIndex.buildCount.get()
      val built = DedupIndex.simhashComponents(spark, dir, 3)
      val expect = built.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(DedupIndex.buildCount.get() == builds0 + 1)
      assert(expect == Set((10L, 10L), (11L, 10L)))

      // a NEW SparkSession has fresh (applicationId, startTime) keys, so
      // every session-layer lookup misses — invalidateAll() simulates
      // exactly that miss pattern within this JVM. The durable layer
      // must then serve the index as a plain parquet load: no build
      // (counter), no CC job cascade (job count).
      DedupIndex.invalidateAll()
      val jobs = new java.util.concurrent.atomic.AtomicInteger()
      val listener = new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          jobs.incrementAndGet(); ()
        }
      }
      spark.sparkContext.addSparkListener(listener)
      try {
        val loaded = DedupIndex.simhashComponents(spark, dir, 3)
        val got = loaded.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        org.apache.spark.sql.graftbridge.ListenerBridge
          .waitUntilEmpty(spark.sparkContext)
        assert(DedupIndex.buildCount.get() == builds0 + 1,
          "durable hit must not rebuild")
        assert(got == expect)
        // a parquet load + collect is 1-2 jobs; the CC build's iterative
        // loop plus checkpointing runs far more
        assert(jobs.get() <= 4,
          s"load path ran ${jobs.get()} jobs — looks like a rebuild")
      } finally spark.sparkContext.removeSparkListener(listener)

      // self-invalidation composes with durability: new corpus content
      // at the same path must MISS the durable entry and rebuild
      writeDocs(Seq((10L, "m n o p"), (12L, "m n o p")))
      DedupIndex.invalidateAll()
      val rebuilt = DedupIndex.simhashComponents(spark, dir, 3)
      assert(DedupIndex.buildCount.get() == builds0 + 2,
        "changed corpus must not be served from the durable cache")
      val got2 = rebuilt.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got2 == Set((10L, 10L), (12L, 10L)), s"stale durable index: $got2")
    } finally {
      System.clearProperty("graft.index.cache")
      DedupIndex.invalidateAll()
    }
  }

  test("durable cache publishes and loads through a scheme-qualified Hadoop URI") {
    // the r12 layer resolved the root with java.nio, so any URI root
    // (file://, hdfs://) silently never hit and writes landed at a bogus
    // local path named after the URI; the Hadoop-FS port must treat a
    // file://-qualified root exactly like a plain local one
    val cacheDir = Files.createTempDirectory("graft_index_cache_uri")
    System.setProperty("graft.index.cache", s"file://$cacheDir")
    try {
      writeDocs(Seq((20L, "h i j k"), (21L, "h i j k"), (22L, "v w x y")))
      DedupIndex.invalidateAll()
      val builds0 = DedupIndex.buildCount.get()
      val expect = DedupIndex.simhashComponents(spark, dir, 3)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(DedupIndex.buildCount.get() == builds0 + 1)
      assert(expect == Set((20L, 20L), (21L, 20L)))
      // the publish must have landed UNDER the URI's local path (one
      // md5-named completed entry, no .tmp debris)
      val entries = cacheDir.toFile.listFiles().map(_.getName).toSeq
      assert(entries.exists(_.matches("[0-9a-f]{32}")),
        s"no published entry under $cacheDir: $entries")
      assert(!entries.exists(_.startsWith(".tmp_")), s"tmp debris left: $entries")

      // fresh session layer -> durable load, zero rebuilds
      DedupIndex.invalidateAll()
      val got = DedupIndex.simhashComponents(spark, dir, 3)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(DedupIndex.buildCount.get() == builds0 + 1,
        "URI-rooted durable hit must not rebuild")
      assert(got == expect)
    } finally {
      System.clearProperty("graft.index.cache")
      DedupIndex.invalidateAll()
    }
  }
}
