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
}
