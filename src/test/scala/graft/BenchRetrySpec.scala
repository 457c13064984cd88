package graft

import org.scalatest.funsuite.AnyFunSuite

/** Bookkeeping rules of Bench's end-of-run clean-window retry pass — pure
  * logic, so the artifact semantics are pinned without running a bench.
  */
class BenchRetrySpec extends AnyFunSuite {
  private def q(median: Double, suspect: Boolean) =
    Bench.QStat(median, median * 0.8, 1.2, suspect)

  test("retryOrder re-measures the hottest suspects first") {
    val suspects = Seq(3 -> q(0.5, true), 7 -> q(9.0, true), 1 -> q(2.0, true))
    assert(Bench.retryOrder(suspects) == Seq(7, 1, 3))
  }

  test("a clean retry replaces the original even when slower") {
    // the loaded-window number is unproven in BOTH directions: a clean
    // re-measure is the honest value even if the original looked faster
    val (chosen, replaced) = Bench.mergeRetry(q(1.0, true), q(1.4, false))
    assert(replaced && chosen.median == 1.4 && !chosen.loadSuspect)
  }

  test("a clean retry replaces an inflated original") {
    val (chosen, replaced) = Bench.mergeRetry(q(47.7, true), q(9.9, false))
    assert(replaced && chosen.median == 9.9 && !chosen.loadSuspect)
  }

  test("a suspect retry keeps the lower median and stays flagged") {
    val (c1, r1) = Bench.mergeRetry(q(5.0, true), q(3.0, true))
    assert(r1 && c1.median == 3.0 && c1.loadSuspect)
    val (c2, r2) = Bench.mergeRetry(q(2.0, true), q(6.0, true))
    assert(!r2 && c2.median == 2.0 && c2.loadSuspect)
  }
}
