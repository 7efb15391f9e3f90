package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.operators.ConnectedComponents

/**
 * Connected-components label propagation: hand-checkable graphs, chain
 * convergence (worst-case diameter), and partition-independence.
 */
class ConnectedComponentsSpec extends AnyFunSuite with BeforeAndAfterAll {

  @transient private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def pairs(p: (Int, Int)*) = {
    val s = spark
    import s.implicits._
    p.toDF("doc_a", "doc_b")
  }

  private def comps(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
    df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("two triangles and an isolate pair form three components keyed by min id") {
    val got = comps(ConnectedComponents.components(
      pairs((1, 2), (2, 3), (3, 1), (10, 11), (11, 12), (20, 21))))
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L, 21L -> 20L))
  }

  test("a 300-node chain converges to one component in O(log n) rounds (pointer halving)") {
    // plain diameter-bound propagation would need 300 rounds; halving
    // needs ~log2(300) + change — well under the 100-round default cap.
    // localMax = 0 pins the DISTRIBUTED loop (the chain would otherwise
    // take the driver-local escape)
    val chain = (0 until 299).map(i => (i, i + 1))
    val got = comps(ConnectedComponents.components(pairs(chain: _*),
      maxIters = 20, localMax = 0))
    assert(got.size == 300 && got.values.forall(_ == 0L))
  }

  test("partition-independent: same components under repartition (distributed loop)") {
    val p = pairs((1, 2), (2, 3), (7, 8), (8, 9), (3, 7), (100, 101))
    val a = comps(ConnectedComponents.components(p, localMax = 0))
    val b = comps(ConnectedComponents.components(p.repartition(7), localMax = 0))
    assert(a == b)
    assert(a(9L) == 1L && a(100L) == 100L) // 1..9 bridge through (3,7)
  }

  test("random graphs match a driver-side union-find oracle (30 seeded trials, distributed loop)") {
    val rng = new scala.util.Random(0xC0FFEE)
    (1 to 30).foreach { trial =>
      val nNodes = 2 + rng.nextInt(40)
      val nEdges = 1 + rng.nextInt(60)
      val es = Seq.fill(nEdges)((rng.nextInt(nNodes), rng.nextInt(nNodes)))
      // driver union-find with min-root canonicalization
      val parent = Array.tabulate(nNodes)(identity)
      def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); r }
      es.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val touched = es.flatMap { case (a, b) => Seq(a, b) }.toSet
      val expected = touched.map(n => n.toLong -> find(n).toLong).toMap
      val got = comps(ConnectedComponents.components(pairs(es: _*), localMax = 0))
      assert(got == expected, s"trial $trial: edges=$es")
    }
  }

  test("driver-local escape is byte-identical to the distributed loop (r17 opt round)") {
    val rng = new scala.util.Random(0xBEEF17)
    (1 to 20).foreach { trial =>
      val nNodes = 2 + rng.nextInt(50)
      val nEdges = 1 + rng.nextInt(80)
      // self-loops and duplicates included on purpose — both paths must
      // treat them identically (singleton components, absorbed messages)
      val es = Seq.fill(nEdges)((rng.nextInt(nNodes), rng.nextInt(nNodes)))
      val local = ConnectedComponents.components(pairs(es: _*))
      val dist = ConnectedComponents.components(pairs(es: _*), localMax = 0)
      assert(local.schema == dist.schema, s"trial $trial schema")
      assert(comps(local) == comps(dist), s"trial $trial: edges=$es")
    }
  }

  test("a chain above the local bound still goes distributed (escape is size-gated)") {
    val chain = (0 until 299).map(i => (i, i + 1))
    val got = comps(ConnectedComponents.components(pairs(chain: _*), localMax = 100))
    assert(got.size == 300 && got.values.forall(_ == 0L))
  }

  test("bound exceeded fails loudly instead of returning partial labels") {
    // halving reaches <= ~2^3 hops in 3 rounds — far short of a 300-chain
    val chain = (0 until 299).map(i => (i, i + 1))
    assertThrows[IllegalArgumentException] {
      ConnectedComponents.components(pairs(chain: _*), maxIters = 3, localMax = 0)
    }
  }
}
