package graft

import org.scalatest.funsuite.AnyFunSuite

/** Unit coverage for the bench's contention self-diagnosis — the two
  * per-query interference witnesses must each fire independently so the
  * recorded JSON can never pass a contaminated min silently.
  */
class BenchSpec extends AnyFunSuite {

  test("absolute witness: spread > 0.3 s flags regardless of min") {
    assert(Bench.noisyWitness(minT = 2.0, spread = 0.31))
    assert(!Bench.noisyWitness(minT = 2.0, spread = 0.29))
  }

  test("relative witness: spread > 3x min flags sub-0.3s bursts (r7 blind band)") {
    // the round-7 blind band: 0.2 s swing on a 60 ms query passed un-flagged
    assert(Bench.noisyWitness(minT = 0.06, spread = 0.2))
    // but tens-of-ms jitter on a tiny query stays under the 0.1 s floor
    assert(!Bench.noisyWitness(minT = 0.02, spread = 0.07))
    // 3x boundary itself is not enough — must exceed
    assert(!Bench.noisyWitness(minT = 0.1, spread = 0.3))
  }

  test("extreme witness needs BOTH absolute size and 3x-min dominance") {
    // round-6 failure mode: 4.04 s spread on a 0.80 s min → disqualify
    assert(Bench.extremeWitness(minT = 0.80, spread = 4.04))
    // big spread on a big query (2x min) is noisy but not extreme
    assert(!Bench.extremeWitness(minT = 1.0, spread = 0.5))
    // relative-only (small absolute) never disqualifies the whole run alone
    assert(!Bench.extremeWitness(minT = 0.06, spread = 0.2))
  }
}
