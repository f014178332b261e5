package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Relational
import graft.streaming.EventStream

class EventStreamSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("streaming windowed agg equals the batch twin on complete data") {
    // file source needs a directory: stage the events file into one
    val dir = java.nio.file.Files.createTempDirectory("events-stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"${TestSpark.sf0001}/events.parquet"),
      dir.resolve("events.parquet"))
    val streamed = EventStream.runToCompletion(
      spark, dir.toString, "events_stream_test")
      .orderBy(col("win_start"), col("event_type"))
      .collect()
    val batch = Relational.q24EventsWindow(spark, TestSpark.sf0001).collect()
    assert(streamed.length == batch.length)
    streamed.zip(batch).foreach { case (sr, br) =>
      assert(sr.getLong(0) == br.getLong(0))
      assert(sr.getString(1) == br.getString(1))
      assert(sr.getLong(2) == br.getLong(2))
      assert(math.abs(sr.getDouble(3) - br.getDouble(3)) < 1e-6)
    }
  }

  test("streaming windowed HDR quantiles: EQUAL to batch, one bucket off exact ranks") {
    val dir = java.nio.file.Files.createTempDirectory("events-hdr-stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"${TestSpark.sf0001}/events.parquet"),
      dir.resolve("events.parquet"))
    val q = EventStream.windowedValueQuantiles(
        EventStream.readEvents(spark, dir.toString))
      .writeStream.outputMode("complete").format("memory")
      .queryName("events_hdr_stream_test").start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("events_hdr_stream_test").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // the histogram merge is lossless: micro-batches through the state
    // store must yield EXACTLY the batch readout, not an approximation
    val events = graft.Tables.events(spark, TestSpark.sf0001)
    val batch = EventStream.windowedValueQuantiles(events)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(streamed == batch,
      "lossless merge: streaming quantiles must equal the batch readout")
    // and the readout sits within one log-bucket below the exact
    // rank-target cent value per window
    val exact = events
      .select(unix_timestamp(window(col("ts"), "10 minutes").getField("start"))
          .as("w"),
        floor(col("value") * 100).cast("long").as("cents"))
      .collect().groupBy(_.getLong(0))
      .map { case (w, rs) => w -> rs.map(_.getLong(1)).sorted }
    assert(streamed.keySet == exact.keySet)
    exact.foreach { case (w, vs) =>
      Seq(0.5 -> streamed(w)._1, 0.99 -> streamed(w)._2).foreach { case (qq, got) =>
        val want = vs(math.max(1, math.ceil(qq * vs.length).toLong).toInt - 1)
        assert(got <= want && want - got <= math.max(1L, want / 64),
          s"window $w q=$qq: sketch $got vs exact $want")
      }
    }
  }

  test("streamed per-window HDR sketches roll up to the all-events quantiles exactly") {
    import graft.functions.HdrQuantileAgg.{hdrMergeQuantiles, hdrQuantiles}
    val dir = java.nio.file.Files.createTempDirectory("events-hdrsk-stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"${TestSpark.sf0001}/events.parquet"),
      dir.resolve("events.parquet"))
    val q = EventStream.windowedQuantileSketches(
        EventStream.readEvents(spark, dir.toString))
      .writeStream.outputMode("complete").format("memory")
      .queryName("events_hdrsk_stream_test").start()
    q.processAllAvailable(); q.stop()
    val sketches = spark.table("events_hdrsk_stream_test")
    // cross-window rollup of the STREAMED sketches == one batch pass
    // over every raw event (lossless merge — q185's identity, fed by
    // the stream instead of a corpus scan)
    val rolled = sketches
      .agg(hdrMergeQuantiles(col("sk"), Seq(0.5, 0.9, 0.99)).as("q"))
      .collect().head.getSeq[Long](0)
    val direct = graft.Tables.events(spark, TestSpark.sf0001)
      .agg(hdrQuantiles(greatest(lit(0L), floor(col("value") * 100).cast("long")),
        Seq(0.5, 0.9, 0.99)).as("q"))
      .collect().head.getSeq[Long](0)
    assert(rolled == direct,
      s"rollup of streamed window sketches $rolled != direct pass $direct")
    // event conservation across windows
    val n = sketches.agg(sum(col("n_events"))).collect().head.getLong(0)
    assert(n == graft.Tables.events(spark, TestSpark.sf0001).count())
  }

  test("streaming windowed HLL distinct users: register-identical to batch, tracks exact") {
    val dir = java.nio.file.Files.createTempDirectory("events-hll-stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"${TestSpark.sf0001}/events.parquet"),
      dir.resolve("events.parquet"))
    val q = EventStream.windowedDistinctUsers(
        EventStream.readEvents(spark, dir.toString))
      .writeStream.outputMode("complete").format("memory")
      .queryName("events_hll_stream_test").start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("events_hll_stream_test").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // batch twin over the SAME rows: slot-wise-max merging makes the
    // estimate independent of how partials arrived — micro-batches
    // through the state store must give the EXACT same number as one
    // batch pass
    val events = graft.Tables.events(spark, TestSpark.sf0001)
    val batch = events
      .groupBy(window(col("ts"), "10 minutes").as("w"))
      .agg(graft.functions.HllSketchAgg.hllDistinct(col("user_id").cast("string"))
        .as("approx_users"))
      .select(unix_timestamp(col("w.start")).as("win_start"), col("approx_users"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(streamed == batch,
      "streaming HLL must be register-identical to the batch sketch")
    // and both track the exact per-window distinct within the p=12
    // envelope (small windows are in the linear-counting exact regime)
    val exact = events
      .groupBy(window(col("ts"), "10 minutes").as("w"))
      .agg(countDistinct(col("user_id")).as("n"))
      .select(unix_timestamp(col("w.start")).as("win_start"), col("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(streamed.keySet == exact.keySet)
    exact.foreach { case (w, n) =>
      assert(math.abs(streamed(w) - n).toDouble / math.max(1L, n) < 0.05,
        s"window $w: approx ${streamed(w)} vs exact $n")
    }
  }

  test("streaming SpaceSaving heavy hitters equals the batch sketch (complete mode)") {
    // the mergeable TypedImperativeAggregate works unchanged as a
    // streaming aggregate: micro-batch partials merge into the state
    // store exactly like map-side partials merge at a batch exchange
    import graft.functions.SpaceSavingAgg
    val dir = java.nio.file.Files.createTempDirectory("docs-stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"${TestSpark.sf0001}/documents.parquet"),
      dir.resolve("documents.parquet"))
    val schema = spark.read.parquet(s"${TestSpark.sf0001}/documents.parquet").schema
    val streamed = spark.readStream.schema(schema).parquet(dir.toString)
      .select(col("source"), explode(split(col("text"), " ")).as("token"))
      .groupBy(col("source"))
      .agg(SpaceSavingAgg.spaceSavingTopK(col("token"), 64).as("ss"))
    val q = streamed.writeStream.outputMode("complete")
      .format("memory").queryName("hh_stream_test").start()
    q.processAllAvailable()
    q.stop()
    val got = spark.table("hh_stream_test")
      .select(col("source"), explode(col("ss")))
      .orderBy(col("source"), col("col.count").desc, col("col.token"))
      .collect().map(_.toString)
    val batch = graft.Tables.documents(spark, TestSpark.sf0001)
      .select(col("source"), explode(split(col("text"), " ")).as("token"))
      .groupBy(col("source"))
      .agg(SpaceSavingAgg.spaceSavingTopK(col("token"), 64).as("ss"))
      .select(col("source"), explode(col("ss")))
      .orderBy(col("source"), col("col.count").desc, col("col.token"))
      .collect().map(_.toString)
    assert(got.length == batch.length && got.nonEmpty)
    got.zip(batch).foreach { case (a, b) => assert(a == b) }
  }

  test("foreachBatch sink: parquet snapshot converges to the batch result") {
    val dir = java.nio.file.Files.createTempDirectory("events-serve")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"${TestSpark.sf0001}/events.parquet"),
      dir.resolve("events.parquet"))
    val out = java.nio.file.Files.createTempDirectory("events-serve-out").toString
    val q = EventStream.serveWindowedCounts(spark, dir.toString, out)
    q.processAllAvailable(); q.stop()
    val served = spark.read.parquet(out).orderBy(col("win_start"), col("event_type"))
    val batch = Relational.q24EventsWindow(spark, TestSpark.sf0001)
    assert(served.count() == batch.count())
    assert(served.exceptAll(batch).count() == 0)
  }

  test("stream-stream join with time bounds equals the batch twin") {
    val dir = java.nio.file.Files.createTempDirectory("events-ssjoin")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"${TestSpark.sf0001}/events.parquet"),
      dir.resolve("events.parquet"))
    val q = EventStream.clickToPurchaseJoin(EventStream.readEvents(spark, dir.toString))
      .writeStream.outputMode("append").format("memory")
      .queryName("ss_join_test").start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("ss_join_test")
    val batch = EventStream.clickToPurchaseJoin(
      Tables.events(spark, TestSpark.sf0001))
    assert(streamed.count() > 0)
    assert(streamed.count() == batch.count())
    assert(streamed.exceptAll(batch).count() == 0)
    assert(batch.exceptAll(streamed).count() == 0)
  }

  test("dropDuplicatesWithinWatermark dedups on the fingerprint with bounded state") {
    // duplicate every event (same props → same fp) across two files;
    // staged with ts as raw nanos-long, the shape readEvents declares
    val dir = java.nio.file.Files.createTempDirectory("events-dedup-src")
    val ev = Tables.events(spark, TestSpark.sf0001).limit(200).cache()
    val raw = ev.select(col("event_id"),
      (unix_micros(col("ts")) * 1000).as("ts"),
      col("user_id"), col("event_type"), col("value"), col("props"))
    raw.write.parquet(dir.resolve("a").toString)
    raw.write.parquet(dir.resolve("b").toString) // identical copy
    val src = java.nio.file.Files.createTempDirectory("events-dedup-in")
    var i = 0
    Seq("a", "b").foreach { sub =>
      java.nio.file.Files.list(dir.resolve(sub)).forEach { p =>
        if (p.toString.endsWith(".parquet")) {
          java.nio.file.Files.copy(p, src.resolve(s"part-$i.parquet")); i += 1
        }
      }
    }
    val q = EventStream.dedupWithinWatermark(EventStream.readEvents(spark, src.toString))
      .writeStream.outputMode("append").format("memory")
      .queryName("dedup_wm_test").start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("dedup_wm_test")
    // the dedup key is the FULL record content: the doubled source must
    // collapse back to exactly the distinct rows of the original table —
    // distinct events sharing a props payload all survive
    val distinctRows = ev.distinct().count()
    assert(got.count() == distinctRows,
      s"expected $distinctRows unique rows, got ${got.count()}")
    assert(got.count() >= ev.select(col("props")).distinct().count(),
      "full-content fingerprint must never collapse below props-distinct")
    ev.unpersist()
    ()
  }

  test("stateful mapGroupsWithState accumulates across micro-batches") {
    // two files → two micro-batches → state must carry across them
    val dir = java.nio.file.Files.createTempDirectory("events-state")
    val ev = Tables.events(spark, TestSpark.sf0001)
    ev.filter(col("event_id") % 2 === 0).write.parquet(dir.resolve("a").toString + "/")
    ev.filter(col("event_id") % 2 =!= 0).write.parquet(dir.resolve("b").toString + "/")
    // stage both dirs' files into one source dir
    val src = java.nio.file.Files.createTempDirectory("events-state-src")
    var i = 0
    Seq("a", "b").foreach { sub =>
      java.nio.file.Files.list(dir.resolve(sub)).forEach { p =>
        if (p.toString.endsWith(".parquet")) {
          java.nio.file.Files.copy(p, src.resolve(s"part-$i.parquet")); i += 1
        }
      }
    }
    // (these files were re-written by Spark, so they carry µs timestamps —
    // read with their own schema rather than the raw-NANOS reader)
    val stream = spark.readStream.schema(ev.schema)
      .option("maxFilesPerTrigger", "1").parquet(src.toString)
    val q = EventStream.runningUserTotals(spark, stream)
      .writeStream.outputMode("update").format("memory").queryName("running_totals")
      .start()
    q.processAllAvailable(); q.stop()
    // latest state per user = max n_events row
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("n_events").desc)
    val last = spark.table("running_totals")
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
    val batch = ev.groupBy("user_id")
      .agg(count(lit(1)).as("b_n"), sum("value").as("b_total"))
    val joined = last.join(batch, "user_id")
    assert(joined.filter(col("n_events") =!= col("b_n")).count() == 0)
    assert(joined.filter(abs(col("total_value") - col("b_total")) > 1e-6).count() == 0)
  }

  test("session windows: batch session_window agrees with the prefix-sum sessionizer") {
    val sw = EventStream.sessionWindows(Tables.events(spark, TestSpark.sf0001))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_sessions"), sum(col("n_events")).as("n_events"))
    val q28 = Relational.q28Sessionize(spark, TestSpark.sf0001)
    val mism = sw.join(q28.withColumnRenamed("n_sessions", "q28_sessions")
                          .withColumnRenamed("n_events", "q28_events"), "user_id")
      .filter(col("n_sessions") =!= col("q28_sessions") ||
              col("n_events") =!= col("q28_events"))
    assert(mism.count() == 0)
    assert(sw.count() > 0)
  }
}
