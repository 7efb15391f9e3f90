package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.operators.{ConnectedComponents, Dedup, Tables}

/** Graph-statistics wave checks + the dedup IDEMPOTENCE property. */
class Ext38Spec extends AnyFunSuite with BeforeAndAfterAll {

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

  test("graph_assortativity: r in [-1, 1] and matches a driver recompute") {
    val row = ExtQueries38.queries("graph_assortativity")(spark, sfDir).collect().head
    val r = row.getAs[Double]("assortativity")
    assert(r >= -1.0 && r <= 1.0)
    // driver recompute from the same edge list
    val edges = operators.Cooccurrence
      .coocCounts(operators.Cooccurrence.interactions(spark, sfDir))
      .where(col("item") =!= col("other"))
      .select(col("item"), col("other")).collect()
      .map(e => (e.getInt(0), e.getInt(1)))
    val deg = edges.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val xs = edges.map(e => deg(e._1))
    val ys = edges.map(e => deg(e._2))
    val n = edges.length.toLong
    val (sx, sy) = (xs.sum, ys.sum)
    val sxx = xs.map(x => x * x).sum
    val syy = ys.map(y => y * y).sum
    val sxy = xs.zip(ys).map { case (x, y) => x * y }.sum
    val expect = (n * sxy - sx * sy).toDouble /
      (math.sqrt((n * sxx - sx * sx).toDouble) * math.sqrt((n * syy - sy * sy).toDouble))
    assert(math.abs(r - expect) < 1e-3, s"got $r want $expect")
    assert(row.getAs[Long]("n_edges") == n)
  }

  test("dedup keep-best is IDEMPOTENT: survivors contain no near-dup pair") {
    val docs = Tables.table(spark, sfDir, "documents")
    val pairs = Dedup.simhashNearDups(docs, 3)
    val comps = ConnectedComponents.components(pairs)
    // keep one canonical doc per component (min doc_id), drop the rest
    val keep = comps.groupBy(col("comp")).agg(min(col("node")).as("doc_id"))
      .select(col("doc_id"))
    val dropped = comps.select(col("node").as("doc_id"))
      .join(keep, Seq("doc_id"), "left_anti")
    val survivors = docs.join(dropped, Seq("doc_id"), "left_anti")
    assert(survivors.count() ==
      docs.count() - dropped.count(), "drop set must be within the corpus")
    // second pass finds nothing: every pair lived inside one component,
    // and exactly one member of each component survived
    assert(Dedup.simhashNearDups(survivors, 3).count() == 0,
      "a second dedup pass over the survivors must be empty")
  }
}
