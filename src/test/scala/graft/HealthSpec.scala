package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Health

/** The composed corpus-health report: every constituent family
  * contributes its digest rows under its tag, payloads are valid JSON
  * carrying the constituent's own column names, and the tagged sink
  * routes one directory per check (Mapwarper.writeTagged's shape). */
class HealthSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("healthReport carries every audit family's rows under its tag") {
    val rep = Health.healthReport(spark, TestSpark.sf0001).cache()
    try {
      val byCheck = rep.groupBy(col("check")).count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(byCheck.keySet == Set("key_skew", "ivf_balance", "dim_stats",
        "dup_spectrum", "curation_funnel"),
        s"all five families must report: ${byCheck.keySet}")
      // counts match the constituents run standalone
      assert(byCheck("key_skew") == 3L, "q155 profiles the 3 fact key columns")
      assert(byCheck("curation_funnel") == 4L, "q124 reports the 4 stages")
      assert(byCheck("dim_stats") ==
        graft.ops.Similarity.q136DimStats(spark, TestSpark.sf0001).count())
      assert(byCheck("ivf_balance") ==
        graft.ops.Ivf.q150IvfBalance(spark, TestSpark.sf0001).count())
      assert(byCheck("dup_spectrum") ==
        graft.ops.Dedup.q129DupGroupSpectrum(spark, TestSpark.sf0001).count())

      // payloads are JSON objects with the constituent's column names
      val skew = rep.filter(col("check") === "key_skew")
        .select(from_json(col("payload"),
          org.apache.spark.sql.types.MapType(
            org.apache.spark.sql.types.StringType,
            org.apache.spark.sql.types.StringType)).as("m"))
        .select(map_keys(col("m")).as("ks")).collect()
      skew.foreach { r =>
        val ks = r.getSeq[String](0).toSet
        assert(ks.contains("key_col") && ks.contains("max_mult") &&
          ks.contains("hot_keys"), s"key_skew payload keys: $ks")
      }
    } finally rep.unpersist()
  }

  test("writeHealthReport routes one directory per check") {
    val out = java.nio.file.Files.createTempDirectory("health_out").toString
    Health.writeHealthReport(spark, TestSpark.sf0001, out)
    val dirs = new java.io.File(out).listFiles()
      .filter(_.isDirectory).map(_.getName).toSet
    assert(dirs == Set("check=key_skew", "check=ivf_balance", "check=dim_stats",
      "check=dup_spectrum", "check=curation_funnel"), s"got $dirs")
    // round-trips as NDJSON
    val back = spark.read.json(out)
    assert(back.count() == Health.healthReport(spark, TestSpark.sf0001).count())
  }
}
