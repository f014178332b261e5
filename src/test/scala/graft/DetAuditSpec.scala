package graft

import org.scalatest.funsuite.AnyFunSuite

/** CI face of the determinism audit (round-17 verdict Next #6: the
  * q152 class regressed silently between hand runs of DetAudit — this
  * runs the SAME three-regime sweep over the representative
  * merge-order-sensitive shapes inside the suite, plus the mechanical
  * no-nondeterministic-expressions pin the retry adjudication in
  * [[DetAudit]]'s scaladoc rests on).
  *
  * The full 198-query sweep stays a (recorded) hand run — at sf0.01
  * it is a ~15 min job, not a unit test. The subset here is chosen by
  * failure mode, not coverage: one representative per combine-order
  * hazard class.
  */
class DetAuditSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  /** One per hazard class:
    *  - q152: LATTICE-VALUED MEAN over grouped doubles — the exact
    *    shape the r17 hand run caught flaking in its 4th decimal
    *    (fixed by scaled-integer summation; this keeps it fixed);
    *  - q01: float sum/avg hash agg (the largest oracle family);
    *  - q37: exact percentiles (sort-based, rank boundaries move if
    *    partitioning leaks into ordering);
    *  - q93: approx percentiles (mergeable sketch — merge ORDER must
    *    not change the digest's answer);
    *  - q96: full-text line explode → wide string hash agg (the
    *    text-volume-bound shape);
    *  - q187: iterative float PageRank (error compounds over rounds
    *    if any single round is merge-order-sensitive). */
  private val Representatives = Seq(
    "q152_crosssource_neardup", "q01_pricing_summary", "q37_percentiles",
    "q93_approx_percentiles", "q96_boilerplate", "q187_pagerank")

  test("three-regime determinism sweep over the representative merge-order-sensitive shapes (sf0.01)") {
    val dir = TestSpark.sf001
    val bad = Representatives.flatMap { q =>
      val hs = DetAudit.sweep(spark, dir, q)
      if (hs.distinct.size == 1) None else Some(s"$q: ${hs.mkString(" ")}")
    }
    assert(bad.isEmpty,
      "partitioning-sensitive output (rerun `runMain graft.DetAudit` " +
        s"for the full sweep):\n${bad.mkString("\n")}")
  }
}
