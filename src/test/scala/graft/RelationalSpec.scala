package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Relational

class RelationalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("approx_count_distinct within 10% of exact per group") {
    Relational.q29ApproxDistinct(spark, TestSpark.sf0001).collect().foreach { r =>
      val approx = r.getAs[Long]("approx_parts").toDouble
      val exact = r.getAs[Long]("exact_parts").toDouble
      assert(math.abs(approx - exact) / exact < 0.10,
        s"${r.getString(0)}: approx $approx vs exact $exact")
    }
  }

  test("q93 approx percentiles: rank error bounded by the sketch accuracy") {
    // the GK sketch guarantees |rank(approx_p) − p·n| ≤ n/accuracy;
    // verify every returned value against the group's true
    // distribution (q29's bound-the-estimator discipline)
    val byStatus = Tables.orders(spark, TestSpark.sf0001)
      .select(col("o_orderstatus"), col("o_totalprice")).collect()
      .groupBy(_.getString(0)).map { case (k, rows) =>
        k -> rows.map(_.getDouble(1)).sorted
      }
    val got = Relational.q93ApproxPercentiles(spark, TestSpark.sf0001).collect()
    assert(got.nonEmpty)
    val tol = 1.0 / Relational.ApproxPercentileAccuracy
    got.foreach { r =>
      val vals = byStatus(r.getString(0))
      val n = vals.length.toDouble
      assert(r.getAs[Long]("n") == vals.length)
      for ((p, field) <- Seq(0.5 -> "ap50", 0.9 -> "ap90", 0.99 -> "ap99")) {
        val v = r.getAs[Double](field)
        // rank band of v in the true distribution: [#(< v), #(≤ v)] / n
        val lo = vals.count(_ < v) / n
        val hi = vals.count(_ <= v) / n
        assert(p >= lo - tol - 1 / n && p <= hi + tol + 1 / n,
          s"${r.getString(0)} $field=$v: rank band [$lo,$hi] misses p=$p beyond ±$tol")
      }
    }
  }

  test("top-k equals full-sort head") {
    val topk = Relational.q15TopK(spark, TestSpark.sf0001).collect().map(_.getLong(0))
    val full = Tables.orders(spark, TestSpark.sf0001)
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(10).collect().map(_.getAs[Long]("o_orderkey"))
    assert(topk.sameElements(full))
  }

  test("sessionize: session counts are positive and bounded by events") {
    Relational.q28Sessionize(spark, TestSpark.sf0001).collect().foreach { r =>
      val s = r.getAs[Long]("n_sessions"); val e = r.getAs[Long]("n_events")
      assert(s >= 1 && s <= e)
    }
  }
}
