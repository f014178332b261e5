package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamingAttribution
import graft.ops.Relational

/** Streaming twin of q163 (last-touch attribution) — the second
  * watermark-ordered-replay operator. Pins stream ≡ batch under
  * controlled disorder, the late-click-changes-the-channel case the
  * order-dependence argument rests on, the watermark-unset sentinel,
  * and checkpointed restart (round-11 advice + verdict ask #7). */
class AttributionStreamSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)

  /** (user_id, event_type, ts, event_id, value) */
  private type Ev = (Long, String, java.sql.Timestamp, Long, Double)

  private def runStream(name: String, batches: Seq[Seq[Ev]],
                        windowUs: Long = Relational.AttributionWindowUs)
      : Seq[(Long, String, Double)] = {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = StreamingAttribution.attributedPurchases(
        mem.toDF().toDF("user_id", "event_type", "ts", "event_id", "value")
          .withWatermark("ts", "10 seconds"), windowUs)
      .toDF("user_id", "channel", "value")
      .writeStream.outputMode("update").format("memory")
      .queryName(name).start()
    batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
    // two sentinel batches: the first advances the watermark past every
    // real event, the second triggers the micro-batch whose event-time
    // timeouts actually flush still-buffered users
    mem.addData((999L, "flush", ts(1000000), 999001L, 0.0)); q.processAllAvailable()
    mem.addData((999L, "flush", ts(1000001), 999002L, 0.0)); q.processAllAvailable()
    q.stop()
    spark.table(name).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
      .filter(_._1 != 999L).toSeq
  }

  private def batchReference(evs: Seq[Ev]): Seq[(Long, String, Double)] = {
    import spark.implicits._
    Relational.attributedPurchases(
        evs.toDF("user_id", "event_type", "ts", "event_id", "value"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq
  }

  test("stream ≡ batch attribution under controlled disorder") {
    // user 1: email@10 → ad@20 → purchase@25 (credit ad, inside the
    // window); purchase@2000 with no touch inside 1800 s → direct.
    // user 2: purchase@5 before any touch → direct; click@30 →
    // purchase@31 (credit click). The ad@20 touch arrives a BATCH
    // AFTER purchase@25, but inside the 10 s lateness window.
    val all: Seq[Ev] = Seq(
      (1L, "email", ts(10), 1L, 0.0), (1L, "ad", ts(20), 2L, 0.0),
      (1L, "purchase", ts(25), 3L, 50.0), (1L, "purchase", ts(2000), 4L, 70.0),
      (2L, "purchase", ts(5), 5L, 10.0), (2L, "click", ts(30), 6L, 0.0),
      (2L, "purchase", ts(31), 7L, 20.0))
    val got = runStream("attr_disorder_test", Seq(
      Seq(all(0), all(2), all(4)),          // email@10, purchase@25, purchase@5
      Seq(all(1), all(5), all(6)),          // ad@20 (late), click@30, purchase@31
      Seq(all(3))))                         // purchase@2000
    val want = batchReference(all)
    assert(got.sorted == want.sorted,
      s"stream must equal q163's batch attribution:\n got $got\nwant $want")
    assert(want.sorted == Seq((1L, "ad", 50.0), (1L, "direct", 70.0),
      (2L, "click", 20.0), (2L, "direct", 10.0)).sorted)
  }

  test("a late click inside the lateness window changes the purchase's channel") {
    // purchase@100 arrives first with only email@50 behind it; the
    // ad@95 click lands one batch later but within 10 s lateness —
    // attribution is order-dependent, so the credit MUST move to ad
    val got = runStream("attr_lateclick_test", Seq(
      Seq((7L, "email", ts(50), 1L, 0.0), (7L, "purchase", ts(100), 2L, 99.0)),
      Seq((7L, "ad", ts(95), 3L, 0.0))))
    assert(got == Seq((7L, "ad", 99.0)),
      s"the late-but-in-window ad@95 must take the credit from email@50: $got")
    // and the same events WITHOUT the late click credit the email
    val base = runStream("attr_lateclick_base", Seq(
      Seq((7L, "email", ts(50), 1L, 0.0), (7L, "purchase", ts(100), 2L, 99.0))))
    assert(base == Seq((7L, "email", 99.0)), s"baseline channel: $base")
  }

  test("purchase outside the attribution window falls back to direct") {
    val windowUs = 30L * 1000000L // 30 s window for the test
    val got = runStream("attr_window_test", Seq(
      Seq((8L, "ad", ts(10), 1L, 0.0), (8L, "purchase", ts(39), 2L, 5.0),
          (8L, "purchase", ts(41), 3L, 6.0))), windowUs)
    assert(got.sorted == Seq((8L, "ad", 5.0), (8L, "direct", 6.0)).sorted,
      s"29 s gap attributes, 31 s gap is direct: $got")
  }

  private def runSessionStream(name: String, batches: Seq[Seq[Ev]],
                               gapUs: Long): Seq[(Long, String, Double)] = {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = StreamingAttribution.sessionAttributedPurchases(
        mem.toDF().toDF("user_id", "event_type", "ts", "event_id", "value")
          .withWatermark("ts", "10 seconds"),
        Relational.AttributionWindowUs, gapUs)
      .toDF("user_id", "channel", "value")
      .writeStream.outputMode("update").format("memory")
      .queryName(name).start()
    batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
    mem.addData((999L, "flush", ts(1000000), 999001L, 0.0)); q.processAllAvailable()
    mem.addData((999L, "flush", ts(1000001), 999002L, 0.0)); q.processAllAvailable()
    q.stop()
    spark.table(name).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
      .filter(_._1 != 999L).toSeq
  }

  test("session-scoped stream ≡ q172 batch: a gap severs an in-window touch") {
    import spark.implicits._
    // user 1: click then 25 min of silence then purchase — inside the
    // 30-min window but severed by the 10-min session gap → direct.
    // user 2: click, keep-alive views every ≤10 min, purchase → the
    // bridged session credits the last view.
    val all: Seq[Ev] = Seq(
      (1L, "click", ts(1000), 1L, 0.0), (1L, "purchase", ts(2500), 2L, 10.0),
      (2L, "click", ts(5000), 3L, 0.0), (2L, "view", ts(5300), 4L, 0.0),
      (2L, "view", ts(5800), 5L, 0.0), (2L, "purchase", ts(6400), 6L, 20.0))
    // event-time order across batches (cross-user watermark advance
    // makes wide-span disorder beyond-lateness by construction; the
    // disorder and drop behaviors are pinned in the tests above) —
    // this test pins the session-sever rule at finalization
    val got = runSessionStream("attr_sess_test", Seq(
      Seq(all(0), all(1)),
      Seq(all(2), all(3), all(4), all(5))),
      Relational.AttributionSessionGapUs)
    val want = Relational.sessionAttributedPurchases(
        all.toDF("user_id", "event_type", "ts", "event_id", "value"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq
    assert(got.sorted == want.sorted,
      s"stream must equal q172's batch rule:\n got $got\nwant $want")
    assert(want.sorted == Seq((1L, "direct", 10.0), (2L, "view", 20.0)).sorted)
    // and the UNSESSIONED stream credits user 1's click (the rules differ)
    val flat = runStream("attr_sess_flat_test", Seq(Seq(all(0), all(1))))
    assert(flat == Seq((1L, "click", 10.0)), s"q163 rule baseline: $flat")
  }

  test("stepUser: the watermark-unset sentinel (0) buffers without finalizing") {
    val rows = Seq((100L, 1L, "email", 0.0), (200L, 2L, "purchase", 9.0))
    val (emitted, st) = StreamingAttribution.stepUser(
      StreamingAttribution.emptyState, rows, wmMs = 0L,
      windowUs = Relational.AttributionWindowUs)
    assert(emitted.isEmpty,
      "wmMs == 0 means 'watermark not yet computed', never 'horizon at epoch'")
    assert(st.bufTs.toSeq == Seq(100L, 200L), "both events must stay buffered")
    // the same rows with a real watermark finalize in order
    val (emitted2, st2) = StreamingAttribution.stepUser(
      st, Seq.empty, wmMs = 1L, windowUs = Relational.AttributionWindowUs)
    assert(emitted2 == Seq(("email", 9.0)) && st2.bufTs.isEmpty)
  }

  test("checkpointed restart resumes state: a purchase buffered before the kill " +
       "is attributed to a click that arrives after the restart") {
    import spark.implicits._
    val inDir = java.nio.file.Files.createTempDirectory("attr_rs_in").toString
    val outDir = java.nio.file.Files.createTempDirectory("attr_rs_out").toString
    val ckDir = java.nio.file.Files.createTempDirectory("attr_rs_ck").toString
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "user_id BIGINT, event_type STRING, ts TIMESTAMP, event_id BIGINT, value DOUBLE")
    def writeFile(name: String, rows: Seq[Ev]): Unit =
      rows.toDF("user_id", "event_type", "ts", "event_id", "value")
        .coalesce(1).write.parquet(s"$inDir/$name")
    def start() = StreamingAttribution.attributedPurchases(
        spark.readStream.schema(schema).option("maxFilesPerTrigger", "1")
          .parquet(s"$inDir/f*")
          .withWatermark("ts", "10 seconds"))
      .toDF("user_id", "channel", "value")
      .writeStream.outputMode("update")
      .option("checkpointLocation", ckDir)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        df.write.mode("append").parquet(s"$outDir/rows")
      }.start()

    // before the kill: a touch and a purchase; the purchase sits ABOVE
    // the watermark (max ts 100 − 10 s lateness) so it lives only in
    // the checkpointed state buffer when the query stops
    writeFile("f1", Seq((5L, "email", ts(50), 1L, 0.0),
                        (5L, "purchase", ts(100), 2L, 42.0)))
    val q1 = start(); q1.processAllAvailable(); q1.stop()

    // while the stream is down a late-but-in-window ad click lands,
    // plus flush sentinels to fire the event-time timeout
    writeFile("f2", Seq((5L, "ad", ts(95), 3L, 0.0)))
    writeFile("f3", Seq((999L, "flush", ts(1000000), 4L, 0.0)))
    writeFile("f4", Seq((999L, "flush", ts(1000001), 5L, 0.0)))
    val q2 = start(); q2.processAllAvailable(); q2.stop()

    val got = spark.read.parquet(s"$outDir/rows")
      .filter(col("user_id") =!= 999L)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq
    // exactly ONE purchase row, credited to the post-restart click:
    // a lost state buffer would drop the purchase (or double-emit it
    // on replay); a lost touch carry would emit 'email'
    assert(got == Seq((5L, "ad", 42.0)),
      s"restart must resume the buffered purchase and attribute the late click: $got")
  }
}
