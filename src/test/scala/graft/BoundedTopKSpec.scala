package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.IntDoubleTopK

/** Port of the reference's heap tests (reference:
  * IntDoublePriorityQueueTest.java:13-98) plus randomized property checks. */
class BoundedTopKSpec extends AnyFunSuite {

  test("ascending inserts: least is (0, 0.0)") {
    val q = new IntDoubleTopK(10)
    (0 until 10).foreach(i => q.add(i, i.toDouble))
    assert(q.size == 10)
    assert(q.leastScore == 0.0)
    assert(q.leastValue == 0)
  }

  test("descending inserts: least is (0, 0.0)") {
    val q = new IntDoubleTopK(10)
    (9 to 0 by -1).foreach(i => q.add(i, i.toDouble))
    assert(q.leastScore == 0.0)
    assert(q.leastValue == 0)
  }

  test("randomized top-10 of 100 == full-sort top-10 (seed 0xC0FFEE)") {
    val rnd = new java.util.Random(0xC0FFEE)
    val scores = Array.fill(100)(rnd.nextDouble())
    val q = new IntDoubleTopK(10)
    scores.zipWithIndex.foreach { case (s, i) => q.offer(i, s) }
    val expected = scores.zipWithIndex.map { case (s, i) => (i, s) }
      .sortBy { case (v, s) => (-s, v) }.take(10).toSeq
    assert(q.dumpDescending().toSeq == expected)
  }

  test("reset then refill") {
    val q = new IntDoubleTopK(5)
    (0 until 5).foreach(i => q.add(i, i.toDouble))
    q.reset()
    assert(q.size == 0)
    (10 until 15).foreach(i => q.add(i, i.toDouble))
    assert(q.size == 5)
    assert(q.dumpDescending().head == ((14, 14.0)))
  }

  test("property: bounded heap top-K == sortBy(-score).take(K), 200 random trials") {
    val rnd = new java.util.Random(42)
    (0 until 200).foreach { _ =>
      val k = 1 + rnd.nextInt(20)
      val n = rnd.nextInt(200)
      val xs = List.fill(n)((rnd.nextInt(1000), (rnd.nextDouble() - 0.5) * 2e6))
      val q = new IntDoubleTopK(k)
      xs.foreach { case (v, s) => q.offer(v, s) }
      val expected = xs.sortBy { case (v, s) => (-s, v) }.take(k)
      assert(q.dumpDescending().toSeq == expected, s"k=$k n=$n")
    }
  }

  test("property: merge of two heaps == top-K of concatenation, 200 random trials") {
    val rnd = new java.util.Random(7)
    (0 until 200).foreach { _ =>
      val k = 1 + rnd.nextInt(10)
      // small value range on purpose: forces duplicate values + tied scores
      def mk() = List.fill(rnd.nextInt(100))((rnd.nextInt(100), rnd.nextInt(20).toDouble))
      val xs = mk(); val ys = mk()
      val q1 = new IntDoubleTopK(k); xs.foreach { case (v, s) => q1.offer(v, s) }
      val q2 = new IntDoubleTopK(k); ys.foreach { case (v, s) => q2.offer(v, s) }
      val expected = (xs ++ ys).sortBy { case (v, s) => (-s, v) }.take(k)
      assert(q1.merge(q2).dumpDescending().toSeq == expected, s"k=$k")
    }
  }
}
