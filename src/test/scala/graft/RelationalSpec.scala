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
