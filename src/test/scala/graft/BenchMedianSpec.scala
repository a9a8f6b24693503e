package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the bench's failure honesty ([[Bench.medianOfReps]], r21): a rep
  * that throws must flag the query as failed instead of silently folding
  * its time-to-throw into the median — the r19 bench timed ~40 rows'
  * exceptions as if they were query times. */
class BenchMedianSpec extends AnyFunSuite {

  test("all reps succeed: ok=true, median of the rep times") {
    var n = 0
    val (median, ok) = Bench.medianOfReps(3) { n += 1 } { _ => () }
    assert(ok)
    assert(n == 3)
    assert(median >= 0.0)
  }

  test("any throwing rep flags the query as failed") {
    var n = 0
    val (_, ok) = Bench.medianOfReps(3) {
      n += 1
      if (n == 2) throw new RuntimeException("injected rep failure")
    } { _ => () }
    assert(!ok, "a query with a failed rep must report ok=false")
    assert(n == 3, "remaining reps still run (the suite must not abort)")
  }

  test("afterRep hygiene runs after every rep, including failed ones") {
    var after = 0
    Bench.medianOfReps(3) { throw new RuntimeException("boom") } { _ =>
      after += 1
    }
    assert(after == 3)
  }
}
