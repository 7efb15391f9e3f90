package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/**
 * Semantic cross-checks for the round-6 wave: each query's distributed
 * plan must equal the naive definition computed driver-side at sf0.001,
 * plus the greedy/merge invariants the oracle hash can't express.
 */
class Ext11Spec extends AnyFunSuite with BeforeAndAfterAll {

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

  test("dedup_substring: emitted spans == naive 10-gram recount; a planted cross-doc span surfaces") {
    val docs = graft.operators.Tables.table(spark, sfDir, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val grams = docs.flatMap { case (id, t) =>
      val w = t.split(" ")
      if (w.length < 10) Seq.empty
      else (0 to w.length - 10).map(i => w.slice(i, i + 10).mkString(" ") -> id)
    }
    val naive = grams.groupBy(_._1)
      .map { case (g, occ) => (g, occ.map(_._2).distinct.size.toLong, occ.size.toLong, occ.map(_._2).min) }
      .filter(_._2 >= 2).toSet
    val got = ExtQueries11.queries("dedup_substring")(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == naive)
    assert(naive.nonEmpty, "the sf0.001 corpus contains duplicated spans by construction")
  }

  test("select_token_budget: greedy-maximal prefix — monotone cumsum, under budget, next doc would overflow") {
    val out = ExtQueries11.queries("select_token_budget")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val docs = graft.operators.Tables.table(spark, sfDir, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .select(col("doc_id"), size(col("w")).cast("long").as("n"),
        (size(array_distinct(col("w"))).cast("double") / size(col("w"))).as("s"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val budget = 0.4 * docs.map(_._2).sum
    // cumsum strictly increasing and the reported cum matches a re-fold
    // over the same (score desc, doc_id) order
    val ordered = docs.sortBy { case (id, _, s) => (1.0 - s) * 1e9 + id }
    val expect = ordered.scanLeft(0L) { case (c, (_, n, _)) => c + n }.tail
      .zip(ordered).takeWhile { case (c, _) => c <= budget }
      .map { case (c, (id, n, _)) => (id, n, c) }
    assert(out.toSeq == expect.toSeq)
    // greedy maximality: the next doc in order would cross the budget
    if (expect.length < ordered.length)
      assert(expect.last._3 + ordered(expect.length)._2 > budget)
  }

  test("quality_classify: keep iff score >= 0.5 iff z >= 0 (algebraic sigmoid is monotone)") {
    val rows = ExtQueries11.queries("quality_classify")(spark, sfDir).collect()
    rows.foreach { r =>
      val (score, keep) = (r.getDouble(1), r.getBoolean(2))
      assert(keep == (score >= 0.5), s"doc ${r.getLong(0)}: score=$score keep=$keep")
    }
    assert(rows.exists(_.getBoolean(2)) , "some docs must pass")
  }

  test("merge_upsert: deletes drop, updates win, untouched keys keep their balance") {
    val out = ExtQueries11.queries("merge_upsert")(spark, sfDir).collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getString(2))).toMap
    val base = graft.operators.Tables.table(spark, sfDir, "customer")
      .select(col("c_custkey"), col("c_acctbal")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val latest = graft.operators.Tables.table(spark, sfDir, "orders")
      .select(col("o_custkey"), col("o_orderkey"), expr("unix_millis(o_orderdate::timestamp)").as("odms"),
        col("o_orderstatus"), col("o_totalprice"))
      .collect().groupBy(_.getLong(0)).map { case (k, rs) =>
        val r = rs.maxBy(x => (x.getLong(2), x.getLong(1)))
        k -> (r.getString(3), r.getDouble(4))
      }
    base.foreach { case (k, bal) =>
      latest.get(k) match {
        case Some(("F", _)) => assert(!out.contains(k), s"finalized $k must be deleted")
        case Some((_, p)) => assert(out(k) == ((p, "U")), s"updated $k")
        case None => assert(out(k) == ((bal, "K")), s"untouched $k")
      }
    }
    assert(out.size == base.size - latest.count(_._2._1 == "F"))
  }

  test("shard_manifest: shards partition the corpus and checksums re-verify per shard") {
    val out = ExtQueries11.queries("shard_manifest")(spark, sfDir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(5)))
    val docs = graft.operators.Tables.table(spark, sfDir, "documents").count()
    assert(out.map(_._2).sum == docs)
    assert(out.map(_._1).toSeq == (0 until 16))
    // recompute one shard's checksum independently via the JVM-side hash
    val md = java.security.MessageDigest.getInstance("MD5")
    val shard0 = graft.operators.Tables.table(spark, sfDir, "documents")
      .where(pmod(col("doc_id"), lit(16)) === 0).select(col("text")).collect()
      .map(r => graft.operators.PortableHash.hJvm(md, r.getString(0)) % graft.operators.PortableHash.P)
      .sum
    assert(out.find(_._1 == 0).get._3 == shard0)
  }
}
