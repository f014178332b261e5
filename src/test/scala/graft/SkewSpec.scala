package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Skew

class SkewSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("salted join is bag-equal to the plain join") {
    val orders = Tables.orders(spark, TestSpark.sf0001)
      .withColumnRenamed("o_custkey", "custkey")
    val customer = Tables.customer(spark, TestSpark.sf0001)
      .withColumnRenamed("c_custkey", "custkey")
    val saltedProj = Skew.saltedJoin(orders, customer, "custkey", 8)
      .select("o_orderkey", "c_name")
    val plainProj = orders.join(customer, Seq("custkey"))
      .select("o_orderkey", "c_name")
    assert(saltedProj.count() == plainProj.count())
    assert(saltedProj.exceptAll(plainProj).count() == 0)
    assert(plainProj.exceptAll(saltedProj).count() == 0)
  }

  test("salt spreads a hot key across buckets") {
    import spark.implicits._
    val hot = Seq.tabulate(1000)(i => (1L, s"row$i")).toDF("k", "payload")
    val dim = Seq((1L, "dim")).toDF("k", "name")
    val salted = hot.withColumn("_salt",
      pmod(xxhash64(struct(col("k"), col("payload"))), lit(8)).cast("int"))
    val nBuckets = salted.select("_salt").distinct().count()
    assert(nBuckets >= 6, s"expected the hot key spread over ~8 salts, got $nBuckets")
    assert(Skew.saltedJoin(hot, dim, "k", 8).count() == 1000)
  }
}
