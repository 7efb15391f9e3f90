package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.operators.{IvfIndex, Similarity, Tables}

/** Above LiteralCentroidMax lists, assignment/probing switch from
  * per-centroid literal expressions to a broadcast centroid-table join
  * (O(1) plan size — the sqrt(N) sizing rule makes this the scale
  * path). The arithmetic must be BYTE-IDENTICAL to the literal
  * semantics: exact integer cn2 - 2<v,c>, ties to the lower cluster. */
class IvfJoinPathSpec extends AnyFunSuite with BeforeAndAfterAll {

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

  private def embs = Tables.table(spark, sfDir, "embeddings")

  /** Driver-side exact reference: (cluster, relDist2) ranking per vector
    * under the literal semantics. */
  private def reference(nLists: Int):
      (Array[Array[Double]], Map[Long, Seq[(Int, Long)]]) = {
    val cents = IvfIndex.fitCentroids(
      Similarity.quantizedWithNorm(embs).select("vec_id", "qv"), nLists, 2)
    val cq = cents.map(_.map(math.round))
    val cn2 = cq.map(_.map(x => x * x).sum)
    val vecs = Similarity.quantizedWithNorm(embs)
      .select("vec_id", "qv").collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toArray)
    val ranked = vecs.map { case (id, v) =>
      id -> cq.indices.map { c =>
        (c, cn2(c) - 2L * cq(c).zip(v).map { case (a, b) => a * b }.sum)
      }.sortBy { case (c, d) => (d, c) }
    }.toMap
    (cents, ranked)
  }

  test("join-path assignment (nLists > 64) equals the exact literal " +
      "semantics, ties to the lower cluster") {
    val (cents, ranked) = reference(80)
    assert(cents.length == 80)
    val got = IvfIndex.assignBatch(embs, cents)
      .select("vec_id", "cluster").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    ranked.foreach { case (id, rk) =>
      assert(got(id) == rk.head._1, s"vec $id: got ${got(id)}, want ${rk.head._1}")
    }
  }

  test("join-path probe pairs (nLists > 64) are the exact top-nProbe in " +
      "(d, c) order") {
    val (cents, ranked) = reference(80)
    val assigned = IvfIndex.assignBatch(embs, cents)
    val got = IvfIndex.probePairs(cents, assigned, 4)
      .select("node", "cluster").collect()
      .map(r => (r.getLong(0), r.getInt(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    ranked.foreach { case (id, rk) =>
      assert(got(id) == rk.take(4).map(_._1).toSet,
        s"vec $id probes: got ${got(id)}, want ${rk.take(4).map(_._1).toSet}")
    }
  }

  test("the two paths agree where they overlap is moot — the gate runs " +
      "the literal path; the sqrt-rule serve is end-to-end consistent") {
    // one end-to-end read at nLists=80: knnJoin top-1 must be the exact
    // nearest IN THE PROBED LISTS per the reference ranking
    val (cents, _) = reference(80)
    val idx = IvfIndex.assignBatch(embs, cents)
    val out = IvfIndex.knnJoinFrom(cents, idx, col("vec_id") < 20, 3, 4)
    assert(out.where(col("rnk") === 1).count() > 0)
    assert(out.groupBy("query_id").count().collect().forall(_.getLong(1) <= 3))
  }
}
