package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.SpaceSavingAgg

class SpaceSavingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("exact regime: m above the vocabulary makes the sketch equal exact counts") {
    import spark.implicits._
    val tokens = graft.Tables.documents(spark, TestSpark.sf0001)
      .select(col("source"), explode(split(col("text"), " ")).as("token"))
      .cache()
    val exact = tokens.groupBy(col("source"), col("token")).count()
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val sketch = tokens.groupBy(col("source"))
      .agg(SpaceSavingAgg.spaceSavingTopK(col("token"), 64).as("ss"))
      .select(col("source"), explode(col("ss")).as("hit"))
      .collect()
    assert(sketch.nonEmpty)
    sketch.foreach { r =>
      val src = r.getString(0)
      val hit = r.getStruct(1)
      val (tok, cnt, err) = (hit.getString(0), hit.getLong(1), hit.getLong(2))
      assert(err == 0L, s"vocab < m must leave zero error, got $err for $tok")
      assert(cnt == exact((src, tok)), s"$src/$tok: $cnt vs exact ${exact((src, tok))}")
    }
  }

  test("partition independence in the exact regime (1, 4, 16 partitions)") {
    import spark.implicits._
    val docs = graft.Tables.documents(spark, TestSpark.sf0001)
      .select(explode(split(col("text"), " ")).as("token"))
    val results = Seq(1, 4, 16).map { n =>
      docs.repartition(n)
        .agg(SpaceSavingAgg.spaceSavingTopK(col("token"), 64).as("ss"))
        .select(explode(col("ss")))
        .collect().map(_.toString).toSeq
    }
    assert(results(0) == results(1) && results(1) == results(2))
  }

  test("skew regime: planted heavy hitter wins at tiny m; bounds bracket the truth") {
    import spark.implicits._
    // 1000 occurrences of "hot", 50 distinct cold tokens × 10 each
    val stream = (Seq.fill(1000)("hot") ++
      (0 until 50).flatMap(i => Seq.fill(10)(s"cold$i")))
    val df = spark.createDataset(stream).toDF("token").repartition(8)
    val hits = df.agg(SpaceSavingAgg.spaceSavingTopK(col("token"), 8).as("ss"))
      .select(explode(col("ss")).as("hit"))
      .collect().map(_.getStruct(0))
    val top = hits.head
    assert(top.getString(0) == "hot", s"heavy hitter must rank first, got ${top.getString(0)}")
    val (cnt, err) = (top.getLong(1), top.getLong(2))
    assert(cnt >= 1000L, "SpaceSaving never underestimates")
    assert(cnt - err <= 1000L, "est - err is a lower bound on the true count")
  }

  test("integral children are accepted and keyed on canonical rendering") {
    // topk over an int id column was always well-defined (boxed
    // Int.toString is canonical); the r14 StringType-only gate
    // over-rejected it — pin the widened atomic allowlist
    import spark.implicits._
    val df = spark.createDataset(Seq.fill(5)(7) ++ Seq(3, 3, 9)).toDF("id")
    val hits = df.agg(SpaceSavingAgg.spaceSavingTopK(col("id"), 8).as("ss"))
      .select(explode(col("ss")).as("hit"))
      .collect().map(_.getStruct(0))
    assert(hits.head.getString(0) == "7" && hits.head.getLong(1) == 5L)
    assert(hits.map(_.getString(0)).toSet == Set("7", "3", "9"))
  }

  test("non-string children fail ANALYSIS, never count toString garbage") {
    // a struct child would key counters on its unsafe-representation
    // toString — every value a distinct "token", silently
    import spark.implicits._
    val df = Seq((1, "a")).toDF("n", "s").select(struct(col("n"), col("s")).as("st"))
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      df.agg(SpaceSavingAgg.spaceSavingTopK(col("st"), 8)).collect()
    }
    assert(e.getMessage.toLowerCase.contains("space_saving_topk"))
  }
}
