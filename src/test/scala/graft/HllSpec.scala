package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.HllSketchAgg.hllDistinct

class HllSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("estimate within the p=12 error envelope on 50k distinct values") {
    import spark.implicits._
    val df = spark.range(50000).map(i => s"value-$i").toDF("v")
    val est = df.agg(hllDistinct(col("v")).as("n")).head().getLong(0)
    // standard error at p=12 is ~1.6%; 5% is a conservative gate
    assert(math.abs(est - 50000) < 2500, s"estimate $est too far from 50000")
  }

  test("estimate is independent of partitioning (merge is slot-wise max)") {
    import spark.implicits._
    val df = spark.range(20000).map(i => s"k-${i % 7000}").toDF("v")
    val one = df.coalesce(1).agg(hllDistinct(col("v"))).head().getLong(0)
    val many = df.repartition(17).agg(hllDistinct(col("v"))).head().getLong(0)
    assert(one == many, s"partitioning changed the estimate: $one vs $many")
  }

  test("nulls are ignored; higher precision tightens the estimate") {
    import spark.implicits._
    val df = (1 to 1000).map(i => if (i % 10 == 0) None else Some(s"x-$i"))
      .toDF("v")
    val exact = 900
    val loose = df.agg(hllDistinct(col("v"), 6)).head().getLong(0)   // se ~13%
    val tight = df.agg(hllDistinct(col("v"), 14)).head().getLong(0)  // se ~0.8%
    assert(math.abs(tight - exact) <= math.max(20, math.abs(loose - exact)),
      s"p=14 ($tight) should not be worse than p=6 ($loose) vs $exact")
    assert(math.abs(tight - exact) < 30)
  }

  test("grouped q53 estimates track the exact distinct counts per source") {
    val rows = graft.ops.Text.q53HllDistinct(spark, TestSpark.sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val approx = r.getLong(1).toDouble
      val exact = r.getLong(2).toDouble
      assert(math.abs(approx - exact) / exact < 0.05,
        s"source ${r.getString(0)}: approx $approx vs exact $exact")
    }
  }
}
