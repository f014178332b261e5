package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.AsOf

class AsOfSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("as-of semantics: latest at-or-before match, equal-ts inclusive, null when none") {
    import spark.implicits._
    val left = Seq(
      (1L, 10L, "a"),   // right rows at 5 and 10 → matches 10 (equal-ts)
      (1L, 7L, "b"),    // → matches 5
      (1L, 3L, "c"),    // before any right row → null
      (2L, 100L, "d"))  // key with no right rows at all → null
      .toDF("k", "t", "tag")
    val right = Seq(
      (1L, 5L, 1.0),
      (1L, 10L, 2.0),
      (1L, 12L, 3.0))   // after every left row → never matched
      .toDF("k", "t", "v")
    val got = AsOf.asOfJoin(left, right, "k", "t")
      .select("k", "t", "tag", "matched_t", "v")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        if (r.isNullAt(3)) -1L else r.getLong(3),
        if (r.isNullAt(4)) -1.0 else r.getDouble(4))).toSet
    assert(got == Set(
      (1L, 10L, "a", 10L, 2.0),
      (1L, 7L, "b", 5L, 1.0),
      (1L, 3L, "c", -1L, -1.0),
      (2L, 100L, "d", -1L, -1.0)))
  }

  test("tolerance masks stale matches without dropping left rows") {
    import spark.implicits._
    val left = Seq((1L, 100L), (1L, 12L)).toDF("k", "t")
    val right = Seq((1L, 10L, 5.0)).toDF("k", "t", "v")
    val got = AsOf.asOfJoin(left, right, "k", "t", tolerance = Some(5L))
      .collect().map(r => (r.getLong(1), r.isNullAt(3))).toMap
    assert(got(12L) == false, "match within tolerance (12-10=2 <= 5) must survive")
    assert(got(100L) == true, "stale match (100-10=90 > 5) must be masked, row kept")
  }

  test("matched right row arrives atomically (no per-column tearing on null payloads)") {
    import spark.implicits._
    val left = Seq((1L, 10L)).toDF("k", "t")
    // latest right row has a NULL payload value; the match must report
    // (t=9, v=null) — not v smuggled in from the older row
    val right = Seq((1L, 5L, Option(7.0)), (1L, 9L, None)).toDF("k", "t", "v")
    val r = AsOf.asOfJoin(left, right, "k", "t").collect().head
    assert(r.getAs[Long]("matched_t") == 9L)
    assert(r.isNullAt(r.fieldIndex("v")))
  }

  test("right-side (key, ts) ties resolve to the lexicographic-max struct, deterministically") {
    import spark.implicits._
    val left = Seq((1L, 10L)).toDF("k", "t")
    // three right rows at the SAME (key, ts): the winner must be the
    // struct-lexicographic max of (t, v) — here v=9.0 — on every run
    // and under any input partitioning
    val rightRows = Seq((1L, 5L, 2.0), (1L, 5L, 9.0), (1L, 5L, 7.0))
    (1 to 4).foreach { nPart =>
      val right = spark.createDataFrame(
        spark.sparkContext.parallelize(rightRows, nPart).map(r => org.apache.spark.sql.Row(r._1, r._2, r._3)),
        Seq((1L, 0L, 0.0)).toDF("k", "t", "v").schema)
      val r = AsOf.asOfJoin(left, right, "k", "t").collect().head
      assert(r.getAs[Double]("v") == 9.0,
        s"tie must resolve to max struct at $nPart partitions, got ${r.getAs[Double]("v")}")
    }
  }

  test("q51 agrees with a brute-force range-join argmax at sf0.001") {
    val got = AsOf.q51AsofJoin(spark, TestSpark.sf0001)
    val ev = Tables.events(spark, TestSpark.sf0001)
      .withColumn("ts_us", unix_micros(col("ts")))
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id").as("pu"), col("ts_us").as("pt"), col("value"))
    val c = ev.filter(col("event_type") === "click")
      .groupBy(col("user_id").as("cu"), col("ts_us").as("ct"))
      .agg(max(col("value")).as("click_value"))
    val brute = p.join(c, col("pu") === col("cu") && col("ct") <= col("pt"), "left")
      .groupBy(col("event_id"), col("pu"), col("pt"), col("value"))
      .agg(max(struct(col("ct"), col("click_value"))).as("m"))
      .select(col("event_id"), col("pu").as("user_id"), col("pt").as("ts_us"),
              col("value"), col("m.ct").as("click_ts_us"), col("m.click_value").as("click_value"))
      .orderBy(col("event_id"))
    val a = got.collect().map(_.toString)
    val b = brute.collect().map(_.toString)
    assert(a.length == b.length && a.length > 0)
    a.zip(b).foreach { case (x, y) => assert(x == y) }
  }

  test("q51 plan: one exchange on the key, no range-join blowup") {
    val plan = AsOf.q51AsofJoin(spark, TestSpark.sf0001)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"as-of must not fall back to a product join:\n$plan")
  }
}
