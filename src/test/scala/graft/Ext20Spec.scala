package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.operators.{Dedup, Tables}

/** Cross-checks for the round-6 tenth wave (split hygiene). */
class Ext20Spec extends AnyFunSuite with BeforeAndAfterAll {

  private val sfDir = "/root/testdata/sf0.001"
  @transient private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("word-bag dedup groups a planted reordered duplicate") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma delta"),
      (2L, "delta gamma beta alpha"), // same bag, different order
      (3L, "alpha beta gamma delta"), // raw-exact copy of 1
      (4L, "entirely different words here")
    ).toDF("doc_id", "text")
    val grouped = docs
      .select(col("doc_id"), col("text"),
        md5(array_join(array_sort(split(col("text"), " ")), " ")).as("bag_hash"))
      .groupBy(col("bag_hash"))
      .agg(count(lit(1)).as("n_docs"), countDistinct(col("text")).as("n_variants"),
        min(col("doc_id")).as("keep_doc"))
      .where(col("n_docs") >= 2)
      .collect()
    assert(grouped.length == 1)
    assert(grouped.head.getLong(1) == 3L) // docs 1, 2, 3
    assert(grouped.head.getLong(2) == 2L) // two raw variants in the group
    assert(grouped.head.getLong(3) == 1L)
  }

  test("audit pair-class counts sum to the full near-dup pair count") {
    val total = Dedup.simhashNearDups(
      Tables.table(spark, sfDir, "documents"), 3).count()
    val classes = SparkEntry.queries("split_leakage_audit")(spark, sfDir).collect()
    assert(classes.map(_.getLong(2)).sum == total)
    assert(classes.exists(r => r.getBoolean(3)), "corpus should show leakage")
    classes.foreach { r =>
      assert(r.getBoolean(3) == (r.getString(0) != r.getString(1)))
    }
  }

  test("histogram join-cardinality prediction is exact on a skewed synthetic join") {
    val s = spark
    import s.implicits._
    val a = Seq(1, 1, 1, 2, 2, 3, 5).toDF("k")     // skewed left
    val b = Seq(1, 1, 2, 4).toDF("k2")             // partial overlap
    val pred = a.groupBy(col("k")).agg(count(lit(1)).as("n_a"))
      .join(b.groupBy(col("k2")).agg(count(lit(1)).as("n_b")), col("k") === col("k2"))
      .agg(sum(col("n_a") * col("n_b"))).collect().head.getLong(0)
    val actual = a.join(b, col("k") === col("k2")).count()
    assert(pred == actual)
    assert(actual == 3 * 2 + 2 * 1) // key 1: 3x2, key 2: 2x1
    val r = SparkEntry.queries("join_cardinality")(spark, sfDir).collect().head
    assert(r.getBoolean(2), "prediction must equal the materialized join count")
  }

  test("repair eliminates every cross-split near-dup pair") {
    val repaired = SparkEntry.queries("split_leakage_repair")(spark, sfDir)
      .select(col("doc_id"), col("new_split"))
    val pairs = Dedup.simhashNearDups(Tables.table(spark, sfDir, "documents"), 3)
    val crossSplit = pairs
      .join(repaired.select(col("doc_id").as("doc_a"), col("new_split").as("sa")), "doc_a")
      .join(repaired.select(col("doc_id").as("doc_b"), col("new_split").as("sb")), "doc_b")
      .where(col("sa") =!= col("sb"))
      .count()
    assert(crossSplit == 0L)
    // and the repair is conservative: only docs inside near-dup groups move
    val movers = SparkEntry.queries("split_leakage_repair")(spark, sfDir)
      .where(col("moved")).select(col("doc_id")).collect().map(_.getLong(0)).toSet
    val inPairs = pairs.select(col("doc_a").as("d")).union(pairs.select(col("doc_b")))
      .distinct().collect().map(_.getLong(0)).toSet
    assert(movers.subsetOf(inPairs))
  }
}
