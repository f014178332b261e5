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

  test("canonical hash: no boundary forgery at column, row, or array-element level") {
    import spark.implicits._
    def h(df: org.apache.spark.sql.DataFrame) = DetAudit.canonicalHash(df)
    // column boundary (r17 fix): values sliding across columns differ
    assert(h(Seq(("ab", "c")).toDF("a", "b"))
      != h(Seq(("a", "bc")).toDF("a", "b")))
    // row boundary (r18 fix): one row vs the same text split in two —
    // even with the NUL column separator embedded in a value
    assert(h(Seq("x" + 0.toChar + "y").toDF("a"))
      != h(Seq("x", "y").toDF("a")))
    // array-element boundary (r18 advice): a comma join read these
    // identically; per-element hashing must not
    assert(h(Seq(Tuple1(Seq("a,b"))).toDF("a"))
      != h(Seq(Tuple1(Seq("a", "b"))).toDF("a")))
    // ...and there is no in-band separator left to forge at all: a
    // NUL INSIDE an element cannot merge two elements either
    assert(h(Seq(Tuple1(Seq("a" + 0.toChar + "b"))).toDF("a"))
      != h(Seq(Tuple1(Seq("a", "b"))).toDF("a")))
    // equal content still hashes equal regardless of row order
    assert(h(Seq(("r1", 1), ("r2", 2)).toDF("a", "n"))
      == h(Seq(("r2", 2), ("r1", 1)).toDF("a", "n")))
  }
}
