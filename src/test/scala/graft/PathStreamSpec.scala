package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamingPaths

/** Streaming twin of q149 (event-path trigrams) — the watermark-ordered
  * replay pattern: buffer inside the lateness window, finalize the
  * watermark-proven prefix in (ts, event_id) order. */
class PathStreamSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)

  private def runStream(name: String,
      batches: Seq[Seq[(Long, String, java.sql.Timestamp, Long)]]): Map[(Long, String), Int] = {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val mem = MemoryStream[(Long, String, java.sql.Timestamp, Long)]
    val q = StreamingPaths.pathTrigrams(
        mem.toDF().toDF("user_id", "event_type", "ts", "event_id")
          .withWatermark("ts", "10 seconds"))
      .toDF("user_id", "path")
      .writeStream.outputMode("update").format("memory")
      .queryName(name).start()
    batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
    // two sentinel batches: the first advances the watermark past every
    // real event, the second triggers the micro-batch in which the
    // event-time timeouts actually fire
    mem.addData((999L, "flush", ts(100000), 999001L)); q.processAllAvailable()
    mem.addData((999L, "flush", ts(100001), 999002L)); q.processAllAvailable()
    q.stop()
    spark.table(name).collect()
      .map(r => (r.getLong(0), r.getString(1)))
      .filter(_._1 != 999L)
      .groupBy(identity).map { case (k, xs) => k -> xs.length }
  }

  test("out-of-order within the lateness window finalizes in event-time order") {
    val got = runStream("paths_order_test", Seq(
      // 'b' (ts 101) arrives AFTER 'c' (ts 103) but within 10 s
      Seq((1L, "a", ts(100), 1L), (1L, "c", ts(103), 3L)),
      Seq((1L, "b", ts(101), 2L), (1L, "d", ts(120), 4L))))
    assert(got == Map((1L, "a>b>c") -> 1, (1L, "b>c>d") -> 1),
      s"late-but-in-window 'b' must land between a and c: $got")
  }

  test("equal timestamps break ties on event_id, matching q149's window order") {
    val got = runStream("paths_tie_test", Seq(
      Seq((2L, "y", ts(50), 12L), (2L, "x", ts(50), 11L), (2L, "z", ts(51), 13L))))
    assert(got == Map((2L, "x>y>z") -> 1), s"tie must order by event_id: $got")
  }

  test("disorder beyond the lateness window is dropped, not misordered") {
    val got = runStream("paths_late_test", Seq(
      Seq((3L, "a", ts(100), 1L), (3L, "b", ts(101), 2L), (3L, "c", ts(102), 3L)),
      Seq((3L, "d", ts(300), 4L)),        // watermark jumps to ~290
      Seq((3L, "x", ts(150), 5L)),        // beyond lateness: dropped
      Seq((3L, "e", ts(301), 6L))))
    assert(!got.keySet.exists(_._2.contains("x")),
      s"an event older than the finalized horizon must be dropped: $got")
    assert(got((3L, "a>b>c")) == 1 && got((3L, "c>d>e")) == 1, s"got $got")
  }

  test("pathNgrams generalizes: bigrams ≡ batch lag pairs, same machinery") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val mem = MemoryStream[(Long, String, java.sql.Timestamp, Long)]
    val q = StreamingPaths.pathNgrams(
        mem.toDF().toDF("user_id", "event_type", "ts", "event_id")
          .withWatermark("ts", "10 seconds"), n = 2)
      .toDF("user_id", "path")
      .writeStream.outputMode("update").format("memory")
      .queryName("paths_bigram_test").start()
    mem.addData((1L, "a", ts(10), 1L), (1L, "b", ts(11), 2L), (1L, "c", ts(12), 3L))
    q.processAllAvailable()
    mem.addData((999L, "flush", ts(100000), 9L)); q.processAllAvailable()
    mem.addData((999L, "flush", ts(100001), 10L)); q.processAllAvailable()
    q.stop()
    val got = spark.table("paths_bigram_test").collect()
      .filter(_.getLong(0) != 999L).map(_.getString(1)).sorted.toSeq
    assert(got == Seq("a>b", "b>c"), s"bigrams: $got")
  }

  private def runSessionStream(name: String, gapSec: Long,
      batches: Seq[Seq[(Long, String, java.sql.Timestamp, Long)]]): Map[(Long, String), Int] = {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val mem = MemoryStream[(Long, String, java.sql.Timestamp, Long)]
    val q = StreamingPaths.sessionPathNgrams(
        mem.toDF().toDF("user_id", "event_type", "ts", "event_id")
          .withWatermark("ts", "10 seconds"),
        n = 3, gap = java.time.Duration.ofSeconds(gapSec))
      .toDF("user_id", "path")
      .writeStream.outputMode("update").format("memory")
      .queryName(name).start()
    batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
    mem.addData((999L, "flush", ts(100000), 999001L)); q.processAllAvailable()
    mem.addData((999L, "flush", ts(100001), 999002L)); q.processAllAvailable()
    q.stop()
    spark.table(name).collect()
      .map(r => (r.getLong(0), r.getString(1)))
      .filter(_._1 != 999L)
      .groupBy(identity).map { case (k, xs) => k -> xs.length }
  }

  test("session gap severs the path: a trigram never spans the silence") {
    // a,b,c tightly spaced; then 200 s of silence (gap bound 100 s);
    // then d,e,f — the un-sessionized form would also emit b>c>d and
    // c>d>e across the gap
    val got = runSessionStream("paths_gap_test", gapSec = 100, Seq(
      Seq((1L, "a", ts(100), 1L), (1L, "b", ts(101), 2L), (1L, "c", ts(102), 3L)),
      Seq((1L, "d", ts(302), 4L), (1L, "e", ts(303), 5L), (1L, "f", ts(304), 6L))))
    assert(got == Map((1L, "a>b>c") -> 1, (1L, "d>e>f") -> 1),
      s"paths must reset at the session boundary: $got")
  }

  test("a late-but-in-window arrival that closes a gap heals the session, like batch") {
    // c at ts 150 arrives late: without it, a..b | d..e look like two
    // sessions 100 s apart under a 60 s gap; WITH it every consecutive
    // pair is ≤ 50 s apart — one session, exactly as a batch pass over
    // the complete data would see it (lateness window 10 s, so c must
    // arrive before the watermark passes it: same micro-batch round)
    val got = runSessionStream("paths_heal_test", gapSec = 60, Seq(
      Seq((1L, "a", ts(100), 1L), (1L, "b", ts(101), 2L)),
      Seq((1L, "d", ts(200), 4L), (1L, "c", ts(150), 3L), (1L, "e", ts(201), 5L))))
    assert(got == Map((1L, "a>b>c") -> 1, (1L, "b>c>d") -> 1, (1L, "c>d>e") -> 1),
      s"the healed session must yield the full batch path set: $got")
  }

  test("stream ≡ sessionized batch (q161 shape) on a gapped 300-event feed") {
    import spark.implicits._
    val rnd = new scala.util.Random(11L)
    val types = Vector("view", "click", "purchase", "signup", "error")
    // per-user strictly increasing times with occasional large jumps —
    // every event unique ts so disorder 0; gaps > 30 s split sessions
    var t = 1000L
    val events = (1 to 300).map { i =>
      t += (if (rnd.nextInt(10) == 0) 200L else rnd.nextInt(4) + 1L)
      ((rnd.nextInt(3) + 1).toLong, types(rnd.nextInt(5)), ts(t), i.toLong)
    }
    val got = runSessionStream("paths_sess_equiv_test", gapSec = 30,
      events.grouped(53).toSeq)
    // batch reference: q161's sessionize-then-lead shape over same rows
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val sess = events.toDF("user_id", "event_type", "ts", "event_id")
      .withColumn("gap_us",
        unix_micros(col("ts")) - lag(unix_micros(col("ts")), 1).over(w))
      .withColumn("new_sess",
        when(col("gap_us").isNull || col("gap_us") > 30L * 1000000L, 1L).otherwise(0L))
      .withColumn("sess_id", sum(col("new_sess")).over(wRun))
    val ws = Window.partitionBy(col("user_id"), col("sess_id"))
      .orderBy(col("ts"), col("event_id"))
    val want = sess
      .withColumn("t2", lead(col("event_type"), 1).over(ws))
      .withColumn("t3", lead(col("event_type"), 2).over(ws))
      .filter(col("t2").isNotNull && col("t3").isNotNull)
      .select(col("user_id"),
        concat_ws(">", col("event_type"), col("t2"), col("t3")).as("path"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
      .groupBy(identity).map { case (k, xs) => k -> xs.length }
    assert(want.values.sum >= 10, s"feed too sparse to exercise sessions: $want")
    assert(got == want, s"stream ${got.size} cells != sessionized batch ${want.size} cells")
  }

  test("pre-epoch event times survive: 0 is watermark-unset, not a horizon") {
    // unit-level on stepUser: an e2e feed cannot reach this code with
    // pre-epoch rows (Spark's stateful late-record filter eats
    // pre-watermark input before the operator sees it — verified: a
    // MemoryStream feed of 1969 timestamps emits nothing at all). The
    // regression guarded here: with wmMs==0 treated as a REAL horizon,
    // the first batch raised lastFinalTs from MinValue to 0 and the
    // late-but-in-window 'b' was then dropped by the ingest guard.
    val us = 1000000L
    val (e1, st1) = StreamingPaths.stepUser(StreamingPaths.emptyState,
      Seq((-1000L * us, 1L, "a"), (-997L * us, 3L, "c")), wmMs = 0L, n = 3)
    assert(e1.isEmpty, "nothing may finalize before a real watermark exists")
    assert(st1.lastFinalTs == Long.MinValue,
      "the unset watermark must not become a horizon")
    // 'b' arrives late but within the (eventual) lateness window
    val (e2, st2) = StreamingPaths.stepUser(st1,
      Seq((-999L * us, 2L, "b"), (-800L * us, 4L, "d")), wmMs = 0L, n = 3)
    assert(e2.isEmpty && st2.bufTs.length == 4,
      "pre-epoch rows must keep buffering, not be dropped against horizon 0")
    // a real watermark arrives (first post-epoch event elsewhere moved
    // it): everything finalizes in event-time order, 'b' included
    val (e3, st3) = StreamingPaths.stepUser(st2, Nil, wmMs = 10L, n = 3)
    assert(e3 == Seq("a>b>c", "b>c>d"),
      s"late-but-in-window 'b' must land between a and c: $e3")
    assert(st3.bufTs.isEmpty && st3.lastFinalTs == 10L * 1000L)
  }

  test("stream ≡ batch trigram counts for in-order feeds (200 events, 10 users)") {
    import spark.implicits._
    val rnd = new scala.util.Random(7L)
    val types = Vector("view", "click", "purchase", "signup", "error")
    val events = (1 to 200).map { i =>
      ((rnd.nextInt(10) + 1).toLong, types(rnd.nextInt(5)),
        ts(1000 + i), i.toLong) // strictly increasing ts: disorder 0
    }
    val batches = events.grouped(37).toSeq
    val got = runStream("paths_equiv_test", batches)
    // batch reference: q149's lead-window shape over the same rows
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val want = events.toDF("user_id", "event_type", "ts", "event_id")
      .withColumn("t2", lead(col("event_type"), 1).over(w))
      .withColumn("t3", lead(col("event_type"), 2).over(w))
      .filter(col("t2").isNotNull && col("t3").isNotNull)
      .select(col("user_id"),
        concat_ws(">", col("event_type"), col("t2"), col("t3")).as("path"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
      .groupBy(identity).map { case (k, xs) => k -> xs.length }
    assert(got == want, s"stream ${got.size} cells != batch ${want.size} cells")
  }
}
