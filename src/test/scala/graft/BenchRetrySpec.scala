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

  // ---- honest-headline arithmetic (round-13: total_min_floor /
  // load_normalized_total survive a never-quiet box) ----

  test("inflationFactor averages the bracketing sentinel samples over best") {
    // best 0.5; query at idx 7 sits between samples at 5 (1.0) and 10 (2.0)
    val series = Seq(0 -> 0.5, 5 -> 1.0, 10 -> 2.0)
    assert(Bench.inflationFactor(7, series, 0.5) == 3.0) // (1.0+2.0)/2 / 0.5
  }

  test("inflationFactor clamps at 1 on a quiet box and degrades safely") {
    val quiet = Seq(0 -> 0.5, 10 -> 0.45)
    assert(Bench.inflationFactor(3, quiet, 0.5) == 1.0) // never deflate below median
    assert(Bench.inflationFactor(3, Seq.empty, 0.5) == 1.0) // no evidence
    assert(Bench.inflationFactor(3, quiet, 0.0) == 1.0) // degenerate best
    // tail query after the last sample: the single available bracket rules
    assert(Bench.inflationFactor(42, Seq(0 -> 0.5, 10 -> 2.0), 0.5) == 4.0)
  }

  test("load_normalized_total deflates only the suspects") {
    val entries = Seq(
      (q(10.0, true), true, 4.0),   // loaded block → contributes 2.5
      (q(3.0, false), false, 4.0),  // clean (e.g. accepted retry) → raw 3.0
      (q(1.0, false), false, 1.0))  // quiet block → raw 1.0
    assert(Bench.loadNormalizedTotal(entries) == 6.5)
    // factor below 1 never inflates a suspect's contribution
    assert(Bench.loadNormalizedTotal(Seq((q(2.0, true), true, 0.5))) == 2.0)
  }

  test("total floor + normalized equal the plain total on a quiet box") {
    val entries = Seq((q(2.0, false), false, 1.0), (q(5.0, false), false, 1.0))
    assert(Bench.loadNormalizedTotal(entries) == 7.0)
  }

  // ---- committed-stamp drift flag (round-14: sustained load inflates
  // every sample uniformly — spread ~1.1, sentinel brackets can land in
  // lulls — so only the shipped clean stamp can see it) ----

  test("stampDrift flags the r13 sustained-load shape the spread rule missed") {
    // q_cms_estimate, driver r13: median 5.81 / min 5.71 / spread 1.13
    // (self-suspect rules all quiet) vs committed stamp 0.44
    val med = 5.81
    assert(med / 5.71 < 1.5, "precondition: the med/min rule stays blind")
    assert(Bench.stampDrift(med, Some(0.44)))
  }

  test("stampDrift needs BOTH the ratio and the absolute delta") {
    assert(!Bench.stampDrift(0.11, Some(0.04))) // 2.75x but 70ms — noise
    assert(!Bench.stampDrift(1.1, Some(0.9)))   // 200ms over but only 1.2x
    assert(Bench.stampDrift(1.2, Some(0.4)))    // 3x and +0.8 s — real
    assert(!Bench.stampDrift(1.0, Some(0.4)))   // exactly 2.5x: not above
  }

  test("stampDrift degrades safely with no stamp") {
    assert(!Bench.stampDrift(99.0, None))
    assert(!Bench.stampDrift(99.0, Some(0.0))) // degenerate stamp entry
  }

  // ---- sentinel-gated stamp acceptance (round-15: the r14 driver window,
  // sentinel 0.87 vs the committed 0.61 clean stamp, replaced a 90.3 s
  // baseline with 97.9 s — a loaded session must not clobber a quieter
  // committed stamp) ----

  test("acceptStamp refuses a measurably-loaded session") {
    // the exact r14 shape: session 0.8738 vs committed 0.6139 (ratio 1.42)
    assert(!Bench.acceptStamp(0.8738, Some(0.6139), force = false))
  }

  test("acceptStamp accepts a comparable-or-quieter session") {
    assert(Bench.acceptStamp(0.61, Some(0.61), force = false))  // same window
    assert(Bench.acceptStamp(0.45, Some(0.61), force = false))  // quieter
    assert(Bench.acceptStamp(0.70, Some(0.61), force = false))  // 1.15x: inside band
  }

  test("acceptStamp boundary: exactly the factor is refused") {
    assert(!Bench.acceptStamp(0.61 * Bench.StampSentinelFactor, Some(0.61), force = false))
  }

  test("acceptStamp degrades safely and honors the override") {
    assert(Bench.acceptStamp(9.9, None, force = false))      // nothing to protect
    assert(Bench.acceptStamp(9.9, Some(0.0), force = false)) // degenerate stamp
    assert(Bench.acceptStamp(0.0, Some(0.6), force = false)) // degenerate session
    assert(Bench.acceptStamp(9.9, Some(0.6), force = true))  // intentional re-stamp
  }

  test("parseStampSentinel reads the artifact's own sentinel block") {
    val line = """{"metric":"total","value":90.2875,"queries":{"q1":0.5},"sentinel":{"best":0.6139,"series":[{"at_query":0,"sec":0.6139}]},"sf":"/root/testdata/sf0.1"}"""
    assert(Bench.parseStampSentinel(line).contains(0.6139))
    assert(Bench.parseStampSentinel("{}").isEmpty)
  }

  test("parseStampQueries reads the artifact's own queries map") {
    val line = """{"metric":"total","value":73.2,"unit":"sec","queries":{"q1_pricing_summary":0.5123,"q_cms_estimate":0.44,"q_broken":"error","q_sci":1.2e-1},"queries_detail":{"q1_pricing_summary":{"median":0.5123,"min":0.4,"spread":1.2,"load_suspect":false}},"sf":"/root/testdata/sf0.1"}"""
    val m = Bench.parseStampQueries(line)
    assert(m("q1_pricing_summary") == 0.5123)
    assert(m("q_cms_estimate") == 0.44)
    assert(m("q_sci") == 0.12)
    assert(!m.contains("q_broken")) // error entries carry no timing
    // detail map must NOT leak in (brace matching stops at queries' end)
    assert(!m.contains("median") && !m.contains("min"))
    assert(Bench.parseStampQueries("{}").isEmpty)
  }
}
