package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Skew

class SkewSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def assertBagEqual(a: org.apache.spark.sql.DataFrame,
                             b: org.apache.spark.sql.DataFrame): Unit = {
    assert(a.count() == b.count())
    assert(a.exceptAll(b).count() == 0)
    assert(b.exceptAll(a).count() == 0)
  }

  test("salted join is bag-equal to the plain join (unskewed: all keys cold)") {
    val orders = Tables.orders(spark, TestSpark.sf0001)
      .withColumnRenamed("o_custkey", "custkey")
    val customer = Tables.customer(spark, TestSpark.sf0001)
      .withColumnRenamed("c_custkey", "custkey")
    val saltedProj = Skew.saltedJoin(orders, customer, "custkey", 8)
      .select("o_orderkey", "c_name")
    val plainProj = orders.join(customer, Seq("custkey"))
      .select("o_orderkey", "c_name")
    assertBagEqual(saltedProj, plainProj)
  }

  test("salted join is bag-equal in a MIXED regime (some keys hot, some cold)") {
    // ~10 orders per custkey at sf0.001; threshold 5 puts most keys on
    // the hot path and the light tail on the cold path — both branches
    // populated, the union must still be exactly the plain join
    val orders = Tables.orders(spark, TestSpark.sf0001)
      .withColumnRenamed("o_custkey", "custkey")
    val customer = Tables.customer(spark, TestSpark.sf0001)
      .withColumnRenamed("c_custkey", "custkey")
    val salted = Skew.saltedJoin(orders, customer, "custkey", 8, hotThreshold = 5L)
      .select("o_orderkey", "c_name")
    val plain = orders.join(customer, Seq("custkey"))
      .select("o_orderkey", "c_name")
    // sanity: the regime really is mixed
    val counts = orders.groupBy("custkey").count()
    assert(counts.filter(col("count") > 5).count() > 0, "expected hot keys")
    assert(counts.filter(col("count") <= 5).count() > 0, "expected cold keys")
    assertBagEqual(salted, plain)
  }

  test("explicit hot-key set: empty set degenerates to the plain join") {
    import spark.implicits._
    val left = Seq((1L, "a"), (1L, "b"), (2L, "c")).toDF("k", "v")
    val right = Seq((1L, "x"), (2L, "y")).toDF("k", "w")
    val empty = Seq.empty[Long].toDF("k")
    assertBagEqual(
      Skew.saltedJoinWithHotKeys(left, right, "k", 8, empty),
      left.join(right, Seq("k")))
  }

  test("salt spreads a hot key across buckets") {
    import spark.implicits._
    val hot = Seq.tabulate(1000)(i => (1L, s"row$i")).toDF("k", "payload")
    val dim = Seq((1L, "dim")).toDF("k", "name")
    val salted = hot.withColumn("_salt",
      pmod(xxhash64(struct(col("k"), col("payload"))), lit(8)).cast("int"))
    val nBuckets = salted.select("_salt").distinct().count()
    assert(nBuckets >= 6, s"expected the hot key spread over ~8 salts, got $nBuckets")
    // threshold 100 < 1000 rows: the key is detected hot and salted
    assert(Skew.saltedJoin(hot, dim, "k", 8, hotThreshold = 100L).count() == 1000)
  }
}
