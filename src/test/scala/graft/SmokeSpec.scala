package graft

import org.scalatest.funsuite.AnyFunSuite

/** Every declared query runs at sf0.001 and returns rows; entry > 0.
  * (Value-level correctness is the driver's DuckDB gate at sf0.01 —
  * mirrored locally by tools/compare_oracle.py.) */
class SmokeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracleSql keys are a subset of queries keys") {
    val unknown = SparkEntry.oracleSql.keySet.diff(SparkEntry.queries.keySet)
    assert(unknown.isEmpty, s"oracleSql without a query: $unknown")
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name runs and returns rows at sf0.001") {
      val n = fn(spark, TestSpark.sf0001).count()
      assert(n > 0, s"$name returned no rows")
    }
  }
}
