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

  test("map-typed children fail at ANALYSIS — entry order would inflate the estimate") {
    import spark.implicits._
    import graft.functions.HllSketchAgg.{hllDistinct, hllSketch}
    val maps = Seq(Map("a" -> 1, "b" -> 2)).toDF("m")
    val e1 = intercept[org.apache.spark.sql.AnalysisException] {
      maps.agg(hllDistinct(col("m"))).collect()
    }
    assert(e1.getMessage.contains("map"), e1.getMessage)
    val e2 = intercept[org.apache.spark.sql.AnalysisException] {
      maps.agg(hllSketch(col("m"))).collect()
    }
    assert(e2.getMessage.contains("map"), e2.getMessage)
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

  test("stored-sketch rollup is register-identical to a direct pass") {
    import spark.implicits._
    import graft.functions.HllSketchAgg.{hllSketch, hllMergeEstimate}
    val df = spark.range(30000).map(i => (s"g-${i % 5}", s"v-${i % 9000}"))
      .toDF("g", "v")
    // one sketch per group (the persisted table), merged back to global
    val merged = df.groupBy(col("g")).agg(hllSketch(col("v")).as("sk"))
      .agg(hllMergeEstimate(col("sk"))).head().getLong(0)
    // direct single-pass estimate over the same values
    val direct = df.agg(hllDistinct(col("v"))).head().getLong(0)
    assert(merged == direct,
      s"merging per-group sketches must reproduce the direct registers: $merged vs $direct")
  }

  test("merged sketches of disjoint sets estimate the union") {
    import spark.implicits._
    import graft.functions.HllSketchAgg.{hllSketch, hllMergeEstimate}
    val a = spark.range(4000).map(i => ("a", s"left-$i")).toDF("g", "v")
    val b = spark.range(4000).map(i => ("b", s"right-$i")).toDF("g", "v")
    val union = a.union(b).groupBy(col("g")).agg(hllSketch(col("v")).as("sk"))
      .agg(hllMergeEstimate(col("sk"))).head().getLong(0)
    assert(math.abs(union - 8000) < 450,
      s"union of two disjoint 4k sets should estimate ~8000: $union")
  }

  test("q173 rollup rows track exact per-source + global distinct tokens") {
    val got = graft.ops.Text.q173HllRollup(spark, TestSpark.sf0001).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val docs = graft.Tables.documents(spark, TestSpark.sf0001)
      .select(col("source"), explode(split(col("text"), " ")).as("token"))
    val exactPer = docs.groupBy(col("source"))
      .agg(countDistinct(col("token")).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val exactAll = docs.select(col("token")).distinct().count()
    assert(got.keySet == exactPer.keySet + "ALL")
    exactPer.foreach { case (src, exact) =>
      assert(math.abs(got(src) - exact).toDouble / exact < 0.05,
        s"$src: ${got(src)} vs exact $exact")
    }
    assert(math.abs(got("ALL") - exactAll).toDouble / exactAll < 0.05,
      s"ALL: ${got("ALL")} vs exact $exactAll")
  }

  test("a non-binary merge child fails at ANALYSIS, not per-row at execution") {
    import spark.implicits._
    import graft.functions.HllSketchAgg.hllMergeEstimate
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      Seq("not-a-sketch").toDF("sk").agg(hllMergeEstimate(col("sk"))).collect()
    }
    assert(e.getMessage.contains("binary register"), e.getMessage)
  }

  test("sketches at different precisions fail fast instead of mis-merging") {
    import spark.implicits._
    import graft.functions.HllSketchAgg.{hllSketch, hllMergeEstimate}
    val df = spark.range(100).map(i => s"v-$i").toDF("v")
    val skLo = df.agg(hllSketch(col("v"), 6).as("sk"))
    val ex = intercept[Exception] {
      skLo.agg(hllMergeEstimate(col("sk"), 12)).head()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Seq.empty else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(ex).exists(_.contains("register width mismatch")),
      s"expected the width-mismatch failure, got: ${msgs(ex)}")
  }
}
