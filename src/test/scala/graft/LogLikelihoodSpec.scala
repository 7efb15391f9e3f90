package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.LogLikelihood.logLikelihoodRatio

/** Golden vectors from Ted Dunning's "Accurate Methods for the Statistics of
  * Surprise and Coincidence" cases (reference: LogLikelihoodTest.java:12-17). */
class LogLikelihoodSpec extends AnyFunSuite {
  test("Dunning golden vectors (tolerance 0.1)") {
    assert(math.abs(logLikelihoodRatio(110, 2442, 111, 29114) - 270.72) < 0.1)
    assert(math.abs(logLikelihoodRatio(29, 13, 123, 31612) - 263.90) < 0.1)
    assert(math.abs(logLikelihoodRatio(9, 12, 429, 31327) - 48.94) < 0.1)
  }

  test("zero cells: xLogX(0) == 0, no NaN") {
    assert(!logLikelihoodRatio(0, 0, 0, 0).isNaN)
    assert(logLikelihoodRatio(0, 0, 0, 0) == 0.0)
    assert(!logLikelihoodRatio(1, 0, 0, 1).isNaN)
    assert(logLikelihoodRatio(1, 0, 0, 1) > 0.0)
  }

  test("independence gives ~0; round-off clamps to exactly 0.0") {
    // perfectly independent table -> ~0; the clamp only fires on negative
    // round-off (reference: LogLikelihood.java:51-54), so tiny positive
    // round-off can survive — assert near-zero and never-negative.
    assert(math.abs(logLikelihoodRatio(10, 10, 10, 10)) < 1e-10)
    assert(math.abs(logLikelihoodRatio(100, 200, 300, 600)) < 1e-10)
    assert(logLikelihoodRatio(100, 200, 300, 600) >= 0.0)
  }

  test("symmetry in the off-diagonal") {
    assert(logLikelihoodRatio(5, 7, 11, 13) == logLikelihoodRatio(5, 11, 7, 13))
  }
}
