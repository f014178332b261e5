package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.RangeJoin

class RangeJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("range join plan keeps the equi prefix — no product join") {
    val plan = RangeJoin.q52RangeJoin(spark, TestSpark.sf0001)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"range join must keep user_id as an equi key:\n$plan")
  }

  test("window semantics: inclusive start, exclusive end, per-user isolation") {
    val rows = RangeJoin.q52RangeJoin(spark, TestSpark.sf0001).collect()
    assert(rows.nonEmpty)
    // brute-force re-derivation on the driver (sf0.001 events are tiny)
    val ev = Tables.events(spark, TestSpark.sf0001)
      .withColumn("ts_us", unix_micros(col("ts")))
      .select("event_id", "user_id", "event_type", "ts_us", "value")
      .collect()
    val purchases = ev.filter(_.getString(2) == "purchase")
    val win = 30L * 86400 * 1000000
    rows.foreach { r =>
      val (uid, sTs) = (r.getLong(1), r.getLong(2))
      val expected = purchases.filter(p =>
        p.getLong(1) == uid && p.getLong(3) >= sTs && p.getLong(3) < sTs + win)
      assert(r.getLong(3) == expected.length,
        s"signup ${r.getLong(0)}: n_purchases ${r.getLong(3)} != ${expected.length}")
      if (expected.isEmpty) assert(r.isNullAt(4)) // sum over no rows is null
    }
  }
}
