package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Property test for the native SimhashFp expression: random hash arrays
  * vs an independent Scala-side reference, interpreted AND codegen paths
  * (the expression evals through codegen in the projection; the direct
  * eval covers nullSafeEval). */
class SimhashFpSpec extends AnyFunSuite with BeforeAndAfterAll {

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

  private def referenceFp(hs: Array[Long], bits: Int): Long = {
    var fp = 0L
    for (b <- 0 until bits) {
      val nSet = hs.count(h => ((h >>> b) & 1L) == 1L)
      if (2 * nSet > hs.length) fp |= (1L << b)
    }
    fp
  }

  test("SimhashFp matches the reference on random arrays (incl. empty and single)") {
    val sp = spark
    import sp.implicits._
    val rnd = new scala.util.Random(42)
    val cases: Seq[Array[Long]] =
      Seq(Array.empty[Long], Array(rnd.nextLong() & ((1L << 60) - 1))) ++
        (1 to 50).map(_ => Array.fill(1 + rnd.nextInt(200))(rnd.nextLong() & ((1L << 60) - 1)))
    val df = cases.zipWithIndex.map { case (a, i) => (i, a.toSeq) }.toDF("id", "hs")
    val got = df.select(col("id"), graft.functions.SimhashFp.fp(col("hs"), 60).as("fp"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    cases.zipWithIndex.foreach { case (a, i) =>
      assert(got(i) == referenceFp(a, 60), s"case $i (n=${a.length})")
    }
    // interpreted path (nullSafeEval): evaluate the expression directly
    // against the same rows via a non-codegen context (local relation +
    // collect on an RDD map would still codegen; use eval on literals)
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.sql.types.{ArrayType, LongType}
    cases.zipWithIndex.foreach { case (a, i) =>
      val lit = Literal.create(new GenericArrayData(a), ArrayType(LongType))
      val out = graft.functions.SimhashFp(lit, 60).eval(null)
      assert(out == referenceFp(a, 60), s"interpreted case $i")
    }
  }
}
