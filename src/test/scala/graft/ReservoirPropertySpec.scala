package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Sampling
import graft.operators.Sampling.{Flagged, UserState}

/**
 * Statistical property of the reservoir (SURVEY §5 test plan): after
 * folding N events with user cut kMax, every event's item must be in the
 * final history with probability ~= kMax/N (the classic Algorithm-R
 * guarantee the reference inherits via k = rng.nextInt(total),
 * UserInteractionCounterOneInputStreamOperator.java:207-245; here the
 * draw is the portable hash k = H(seed#user#total) mod total, which must
 * preserve the same guarantee). Pure fold-level test — no Spark session.
 */
class ReservoirPropertySpec extends AnyFunSuite {

  private def drawOf(seed: Long, user: Int): Int => Int = {
    val md = java.security.MessageDigest.getInstance("MD5")
    t => Sampling.drawFor(md, seed, user, t)
  }

  private def finalHistory(items: Seq[Int], kMax: Int, seed: Long): Array[Int] = {
    val events = items.zipWithIndex.map { case (it, i) =>
      Flagged(user = 1, item = it, ts = i.toLong, sample = true)
    }
    val (_, _, st) = Sampling.userFold(events, UserState(1, 0, Array.empty), kMax,
      drawOf(seed, user = 1), None)
    st.history
  }

  test("uniform inclusion probability ~ kMax/N across 400 trials") {
    val n = 200
    val kMax = 40
    val trials = 400
    val counts = new Array[Int](n)
    (0 until trials).foreach { t =>
      val hist = finalHistory(0 until n, kMax, seed = 1000L + t)
      hist.foreach(item => counts(item) += 1)
    }
    val expected = trials.toDouble * kMax / n // 80 inclusions per item
    // 3-sigma band for Binomial(trials, kMax/n): sigma ~= sqrt(80*0.8) ~= 8
    val sigma = math.sqrt(trials * (kMax.toDouble / n) * (1.0 - kMax.toDouble / n))
    val bad = counts.zipWithIndex.filter { case (c, _) =>
      math.abs(c - expected) > 4 * sigma
    }
    assert(bad.length == 0,
      s"items outside 4-sigma: ${bad.take(5).mkString(",")} (expected $expected +- $sigma)")
    // positions must not be biased either: early vs late halves include equally
    val early = counts.slice(0, n / 2).sum.toDouble
    val late = counts.slice(n / 2, n).sum.toDouble
    assert(math.abs(early - late) / (early + late) < 0.05,
      s"positional bias: early=$early late=$late")
  }

  test("draw keyed by adjacent user ids is uniform (one shared job seed)") {
    // one fixed job seed, varying USER — exactly the structurally-related
    // key family that a weak seed scrambler correlated in earlier rounds;
    // the hash draw must show no positional bias across adjacent users
    val n = 200
    val kMax = 40
    val trials = 400
    val counts = new Array[Int](n)
    (0 until trials).foreach { user =>
      val events = (0 until n).map(i => Flagged(user, i, i.toLong, sample = true))
      val (_, _, st) = Sampling.userFold(events, UserState(user, 0, Array.empty), kMax,
        drawOf(seed = 42L, user = user), None)
      st.history.foreach(item => counts(item) += 1)
    }
    val expected = trials.toDouble * kMax / n
    val sigma = math.sqrt(trials * (kMax.toDouble / n) * (1.0 - kMax.toDouble / n))
    val bad = counts.zipWithIndex.filter { case (c, _) => math.abs(c - expected) > 4 * sigma }
    assert(bad.length == 0,
      s"items outside 4-sigma: ${bad.take(5).mkString(",")} (expected $expected +- $sigma)")
    val early = counts.slice(0, n / 2).sum.toDouble
    val late = counts.slice(n / 2, n).sum.toDouble
    assert(math.abs(early - late) / (early + late) < 0.05,
      s"positional bias: early=$early late=$late")
  }

  test("history size is exactly min(kMax, distinct positions) and refunds happen when k >= kMax") {
    val hist = finalHistory(0 until 100, 10, seed = 7L)
    assert(hist.length == 10)
    val (_, refunds, _) = Sampling.userFold(
      (0 until 100).map(i => Flagged(1, i, i.toLong, sample = true)),
      UserState(1, 0, Array.empty), 10, drawOf(seed = 7L, user = 1), None)
    assert(refunds.nonEmpty, "with N >> kMax some draws must be rejected (refunded)")
  }

  test("the JVM draw equals the SQL mirror's definition") {
    // drawFor and drawForSql must be the same function: spot-check the
    // JVM value against a direct re-derivation of the SQL formula
    val md = java.security.MessageDigest.getInstance("MD5")
    val mdCheck = java.security.MessageDigest.getInstance("MD5")
    (1 to 50).foreach { t =>
      val total = t + 20
      val k = Sampling.drawFor(md, 42L, 7, total)
      val h = graft.operators.PortableHash.hJvm(mdCheck, s"42#7#$total")
      assert(k == (h % total).toInt && k >= 0 && k < total)
    }
  }
}
