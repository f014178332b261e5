package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench estimator's scheduling math is pure and load-bearing:
  * round 6's driver artifact was LOST (rc 124, parsed: null) because
  * the schedule's worst case exceeded the driver's wall clock. These
  * tests pin the deadline arithmetic that makes that impossible now. */
class BenchSpec extends AnyFunSuite {

  test("agreed: ratio test with sub-second jitter floor") {
    assert(!Bench.agreed(Seq(1.0)))              // one sample never agrees
    assert(Bench.agreed(Seq(1.0, 1.9)))          // within 2x
    assert(!Bench.agreed(Seq(1.0, 2.6)))         // beyond 2x and beyond floor
    assert(Bench.agreed(Seq(0.1, 0.4)))          // 4x apart but under 0.5s floor
    assert(Bench.agreed(Seq(1.0, 30.0, 1.8)))    // min pair anchors agreement
  }

  test("needsMoreSamples: slow queries keep hunting until the cap") {
    assert(Bench.needsMoreSamples(Seq(10.0, 40.0)))          // disagree
    assert(Bench.needsMoreSamples(Seq(30.0, 42.0)))          // agree but slow, n<5
    assert(!Bench.needsMoreSamples(Seq(30.0, 42.0, 31.0, 35.0, 33.0))) // slow cap hit
    assert(!Bench.needsMoreSamples(Seq(1.0, 1.5)))           // agreed and fast
  }

  test("sampleCap: equal budget split, clamped to [MinCap, MaxCap]") {
    // plenty of budget: ceiling binds
    assert(Bench.sampleCap(100000.0, 10) == Bench.MaxCapSec)
    // tight budget: floor binds (overshoot bounded by MinCap per sample)
    assert(Bench.sampleCap(Bench.FinishReserveSec + 1.0, 50) == Bench.MinCapSec)
    // mid-range: the split itself
    val cap = Bench.sampleCap(1590.0, 78)
    assert(cap == (1590.0 - Bench.FinishReserveSec) / 78)
    assert(cap >= Bench.MinCapSec && cap <= Bench.MaxCapSec)
  }

  test("sweep 1 worst case fits the default deadline from constants alone") {
    // simulate the REAL suite: every sample runs to its full watchdog
    // cap (pure pessimism — clean queries finish in 1-3 s)
    val n = SparkEntry.queries.size
    var remaining = Bench.DefaultDeadlineSec
    for (idx <- 0 until n) {
      remaining -= Bench.sampleCap(remaining, n - idx)
    }
    // while the equal split binds it is budget-preserving by induction
    // (the per-sample split stays constant), so the all-caps sweep ends
    // with the finish reserve intact; this breaks — and should — if the
    // suite grows past DefaultDeadlineSec/MinCapSec queries
    assert(remaining >= 0,
      s"sweep-1 worst case overshot the deadline by ${-remaining}s for $n queries")
  }

  test("declared worst-case suite size fits the default deadline") {
    // the suite WILL grow; provision the all-capped sweep for
    // WorstCaseQueries before the growth, not after the driver's
    // artifact dies to it (round-8 ask #7)
    val n = Bench.WorstCaseQueries
    assert(SparkEntry.queries.size <= n,
      s"suite (${SparkEntry.queries.size}) outgrew the declared worst case $n — renegotiate the floor/deadline")
    var remaining = Bench.DefaultDeadlineSec
    for (idx <- 0 until n) remaining -= Bench.sampleCap(remaining, n - idx)
    assert(remaining >= 0,
      s"all-capped worst case overshoots the deadline by ${-remaining}s at $n queries")
  }

  test("totals line is constant-size in the query count and fits any capture window") {
    // five rounds of parsed:null came from per-query data on the
    // contract line; the totals line must stay small no matter how
    // large the suite or the total gets
    val line = Bench.totalsLine(123456.7891, 1000, 1000, complete = true,
      "/root/testdata/sf100.0")
    assert(line.length < 200, s"totals line grew to ${line.length} bytes: $line")
    assert(line.startsWith("""{"metric":"total","value":"""))
    assert(!line.contains("\"queries\":"), "per-query map must never ride the stdout line")
  }

  test("refinement phases never start a sample the reserve cannot absorb") {
    assert(!Bench.canRefine(Bench.FinishReserveSec))
    assert(!Bench.canRefine(Bench.FinishReserveSec + Bench.MinCapSec))
    assert(Bench.canRefine(Bench.FinishReserveSec + Bench.MinCapSec + 1.0))
  }

  test("trimmed retry schedule: pauses alone cannot eat a suite length") {
    assert(Bench.RetryPauseMs * Bench.MaxRetryRounds <= 30000L,
      "total guaranteed retry idle must stay under half a clean suite")
  }
}
