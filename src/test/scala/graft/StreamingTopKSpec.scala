package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamingTopK

class StreamingTopKSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  /** Each batch becomes one parquet file; maxFilesPerTrigger=1 turns
    * them into ordered micro-batches. */
  private def stageBatches(batches: Seq[Seq[(String, Long)]]): String = {
    import spark.implicits._
    val src = Files.createTempDirectory("topk-src")
    batches.zipWithIndex.foreach { case (rows, i) =>
      val tmp = Files.createTempDirectory(s"topk-b$i")
      rows.toDF("event_type", "user_id").coalesce(1)
        .write.parquet(tmp.resolve("p").toString)
      var j = 0
      Files.list(tmp.resolve("p")).forEach { p =>
        if (p.toString.endsWith(".parquet")) {
          Files.copy(p, src.resolve(f"part-$i%03d-$j.parquet")); j += 1
        }
      }
    }
    src.toString
  }

  private def runStream(src: String, m: Int, k: Int, name: String) = {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("event_type", StringType), StructField("user_id", LongType)))
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(src)
    val q = StreamingTopK.topKPerType(stream, m, k)
      .toDF("event_type", "key", "est", "err", "rank")
      .writeStream.outputMode("update").format("memory").queryName(name).start()
    q.processAllAvailable(); q.stop()
    spark.table(name)
  }

  test("exact regime: final stream counts equal batch truth, state carries across batches") {
    // skewed counts per type; user 1 appears in BOTH batches — its final
    // est proves state carry-over, not per-batch recount
    val b1 = Seq.fill(5)(("click", 1L)) ++ Seq.fill(3)(("click", 2L)) ++
      Seq.fill(2)(("view", 7L))
    val b2 = Seq.fill(4)(("click", 1L)) ++ Seq.fill(1)(("click", 3L)) ++
      Seq.fill(6)(("view", 8L)) ++ Seq.fill(1)(("view", 7L))
    val out = runStream(stageBatches(Seq(b1, b2)), m = 50, k = 10, "topk_exact")
    // counts are monotone across emissions → max est per key = final state
    val finalEst = out.groupBy(col("event_type"), col("key"))
      .agg(max(col("est")).as("est"), max(col("err")).as("err"))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    assert(finalEst(("click", "1")) == (9L, 0L), "5 + 4 across batches, exact")
    assert(finalEst(("click", "2")) == (3L, 0L))
    assert(finalEst(("view", "8")) == (6L, 0L))
    assert(finalEst(("view", "7")) == (3L, 0L), "2 + 1 across batches")
    assert(finalEst.values.forall(_._2 == 0L), "below capacity the sketch is exact")
  }

  test("null user_ids are skipped, like the batch aggregate") {
    // SpaceSavingAgg.update drops null inputs (SQL aggregate
    // convention); the stream must not count a "null" key or let it
    // pressure evictions (round-14 review)
    import spark.implicits._
    val src = Files.createTempDirectory("topk-null-src")
    Seq((Some("click"), Some(1L)), (Some("click"), None),
        (Some("click"), Some(1L)), (Some("click"), None))
      .toDF("event_type", "user_id").coalesce(1)
      .write.mode("overwrite").parquet(src.toString)
    val out = runStream(src.toString, m = 10, k = 10, "topk_nulls")
    val keys = out.select("key").collect().map(_.getString(0)).toSet
    assert(keys == Set("1"), s"null user_id must be skipped, got keys $keys")
    assert(out.filter(col("key") === "1").agg(max("est")).head().getLong(0) == 2L)
  }

  test("restart with a smaller m shrinks rehydrated state to the new bound") {
    val state = graft.streaming.TopKState(
      Array("a", "b", "c", "d"), Array(10L, 40L, 20L, 30L), Array(0L, 1L, 2L, 3L))
    val buf = StreamingTopK.toBuf(state, 2)
    assert(buf.size == 2, s"state must shrink to m=2, got ${buf.size}")
    assert(buf.contains("b") && buf.contains("d"),
      "the m highest-count counters survive the truncation")
    assert(buf("b")(0) == 40L && buf("b")(1) == 1L, "count+err survive intact")
  }

  test("exact regime: final emission ranks match the batch space_saving aggregate") {
    val b1 = (1 to 40).flatMap(i => Seq.fill(i % 7 + 1)(("t", i.toLong)))
    val src = stageBatches(Seq(b1))
    val out = runStream(src, m = 64, k = 5, "topk_vs_batch")
    val streamTop = out.filter(col("rank") <= 5)
      .orderBy(col("rank")).collect()
      .map(r => (r.getString(1), r.getLong(2))).toSeq
    import spark.implicits._
    val batchTop = b1.toDF("event_type", "user_id")
      .select(col("user_id").cast("string").as("k"))
      .agg(graft.functions.SpaceSavingAgg.spaceSavingTopK(col("k"), 64).as("s"))
      .select(posexplode(col("s")).as(Seq("pos", "e")))
      .orderBy(col("pos")).limit(5)
      .select(col("e.token"), col("e.count"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(streamTop == batchTop,
      s"stream $streamTop must equal batch aggregate $batchTop in the exact regime")
  }

  test("capped capacity: SpaceSaving bounds hold on the final summary") {
    // 12 distinct keys into m=4 counters; N = total events
    val rows = (1 to 12).flatMap(i => Seq.fill(13 - i)(("t", i.toLong)))
    val truth = rows.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val n = rows.size.toLong
    val out = runStream(stageBatches(Seq(rows)), m = 4, k = 4, "topk_capped")
    val fin = out.groupBy(col("key"))
      .agg(max(col("est")).as("est"), max(col("err")).as("err")).collect()
    assert(fin.length <= 4, "state never exceeds m counters")
    fin.foreach { r =>
      val key = r.getString(0).toLong
      val est = r.getLong(1); val err = r.getLong(2)
      assert(est >= truth(key), s"key $key: est $est below true ${truth(key)}")
      assert(est - err <= truth(key), s"key $key: est-err exceeds true count")
      assert(err <= n / 4, s"key $key: err $err above N/m ${n / 4}")
    }
  }
}
