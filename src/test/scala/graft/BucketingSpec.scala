package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Bucketing

class BucketingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("bucketed tables join with zero exchanges and correct results") {
    // the in-memory catalog forgets tables between JVMs but the
    // warehouse directories persist — clear both before writing
    Seq("b_orders", "b_customer").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val dir = new java.io.File(s"/tmp/graft-test-warehouse/$t")
      if (dir.exists()) {
        java.nio.file.Files.walk(dir.toPath)
          .sorted(java.util.Comparator.reverseOrder())
          .forEach(p => java.nio.file.Files.delete(p))
      }
    }
    // MULTI-partition inputs on purpose (round-14 review): bucketBy
    // writes one file per bucket PER TASK, and Spark only trusts the
    // per-bucket sort when a bucket is exactly one file — a
    // single-partition sf0.001 frame would hide a missing write-side
    // repartition and the join would silently re-Sort at read time
    Bucketing.writeBucketed(
      Tables.orders(spark, TestSpark.sf0001).repartition(5)
        .withColumnRenamed("o_custkey", "custkey"), "b_orders", "custkey", 8)
    Bucketing.writeBucketed(
      Tables.customer(spark, TestSpark.sf0001).repartition(5)
        .withColumnRenamed("c_custkey", "custkey"), "b_customer", "custkey", 8)

    val joined = Bucketing.bucketedJoin(spark, "b_orders", "b_customer", "custkey")
    val plan = joined.queryExecution.executedPlan.toString

    assert(plan.contains("SortMergeJoin"), s"expected SMJ in:\n$plan")
    assert(!plan.contains("Exchange"), s"bucketed join must not shuffle:\n$plan")
    // "Sort [" matches a Sort exec's argument list but not the
    // SortMergeJoin node name
    assert(!plan.contains("Sort ["),
      s"bucketed join must read the write-time sort, not re-sort:\n$plan")

    // correctness: same count as the plain join
    val plain = Tables.orders(spark, TestSpark.sf0001)
      .join(Tables.customer(spark, TestSpark.sf0001),
            col("o_custkey") === col("c_custkey")).count()
    assert(joined.count() == plain)
  }
}
