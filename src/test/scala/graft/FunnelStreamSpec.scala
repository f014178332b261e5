package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Relational
import graft.streaming.{StreamingAnomaly, StreamingFunnel}

/** Streaming twins of the events-analytics family (round-9 verdict ask
  * #5): the q130 funnel via order-independent flatMapGroupsWithState
  * and the q132 daily anomaly via a watermarked daily digest + the
  * batch scorer verbatim. */
class FunnelStreamSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  /** Stage the sf0.001 events into `n` parquet files so the file
    * source (maxFilesPerTrigger=1) delivers them as n micro-batches
    * in arbitrary row order — cross-batch state is exercised for real. */
  private def stagedEventsDir(n: Int): String = {
    val dir = java.nio.file.Files.createTempDirectory("events-funnel")
    Tables.events(spark, TestSpark.sf0001).repartition(n)
      .write.mode("overwrite").parquet(dir.toString)
    dir.toString
  }

  test("streaming funnel stage counts equal batch q130 across 5 micro-batches") {
    val dir = stagedEventsDir(5)
    val q = StreamingFunnel.funnelStages(
        graft.streaming.EventStream.readEvents(spark, dir))
      .toDF("_1", "_2")
      .writeStream.outputMode("update").format("memory")
      .queryName("funnel_stream_test").start()
    q.processAllAvailable(); q.stop()
    val streamed = StreamingFunnel.stageCounts(spark.table("funnel_stream_test"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val batch = Relational.q130ConversionFunnel(spark, TestSpark.sf0001)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(streamed.nonEmpty && streamed.toSeq == batch.toSeq,
      s"stream $streamed != batch $batch")
  }

  test("an unreached stage still emits its zero row (the batch q130 shape)") {
    import spark.implicits._
    // nobody purchases: batch q130 emits ('4_purchased', 0, 0.0) via
    // its global aggs; explode-only counting dropped the row entirely
    // and broke the pinned stream ≡ batch row-shape (round-13 review)
    val updates = Seq((1L, 3), (2L, 2), (3L, 1)).toDF("_1", "_2")
    val got = StreamingFunnel.stageCounts(updates)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq == Seq(
      ("1_all", 3L, 1.0), ("2_viewed", 2L, 0.666667),
      ("3_clicked", 1L, 0.333333), ("4_purchased", 0L, 0.0)),
      s"got ${got.toSeq}")
  }

  test("funnel state is order-independent: pre-view clicks/purchases kept " +
       "until a later-arriving earlier view makes them eligible") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    val mem = MemoryStream[(Long, String, java.sql.Timestamp)]
    val q = StreamingFunnel.funnelStages(
        mem.toDF().toDF("user_id", "event_type", "ts"))
      .toDF("_1", "_2")
      .writeStream.outputMode("update").format("memory")
      .queryName("funnel_order_test").start()
    // user 7: click@100 and purchase@50 arrive BEFORE the view@40 —
    // the click must be retained as a candidate and become the stage-3
    // answer once the view lowers the floor; the purchase@50 < click
    // answer must NOT count (purchase must follow the click)
    // user 8: purchase@200, then click@150, then view@100 → full funnel
    // user 9: view@10 then click@5 (click BEFORE the view, never after)
    mem.addData((7L, "click", ts(100)), (7L, "purchase", ts(50)),
                (8L, "purchase", ts(200)), (9L, "view", ts(10)))
    q.processAllAvailable()
    mem.addData((7L, "view", ts(40)), (8L, "click", ts(150)), (9L, "click", ts(5)))
    q.processAllAvailable()
    mem.addData((8L, "view", ts(100)))
    q.processAllAvailable()
    q.stop()
    val em = spark.table("funnel_order_test").collect()
      .map(r => (r.getLong(0), r.getInt(1)))
    val settled = em.groupBy(_._1).map { case (u, xs) => u -> xs.map(_._2).max }
    assert(settled == Map(7L -> 3, 8L -> 4, 9L -> 2), s"settled=$settled em=${em.toSeq}")
    // monotone emission: per user, stages never decrease in arrival order
    em.groupBy(_._1).values.foreach { xs =>
      assert(xs.map(_._2).sliding(2).forall(p => p.length < 2 || p(0) <= p(1)),
        s"non-monotone stage emission: ${xs.toSeq}")
    }
  }

  test("funnel state survives a checkpointed restart: stages built across the stop") {
    // deterministic split: run on half the files, STOP, add the rest,
    // restart from the same checkpoint — users whose later stages
    // arrive after the restart only settle correctly if the state
    // store recovered (a fresh state would lose their earlier view)
    val allParts = java.nio.file.Files.createTempDirectory("events-funnel-all")
    Tables.events(spark, TestSpark.sf0001).repartition(4)
      .write.mode("overwrite").parquet(allParts.toString)
    val parts = java.nio.file.Files.list(allParts).toArray.map(_.toString)
      .filter(_.endsWith(".parquet")).sorted
    assert(parts.length == 4)
    val src = java.nio.file.Files.createTempDirectory("events-funnel-src")
    val cp = java.nio.file.Files.createTempDirectory("events-funnel-cp").toString
    def copyIn(ps: Seq[String]): Unit = ps.foreach { p =>
      java.nio.file.Files.copy(java.nio.file.Paths.get(p),
        src.resolve(java.nio.file.Paths.get(p).getFileName))
    }
    // memory sink can't recover from a checkpoint — spool update
    // emissions to parquet via foreachBatch (the StreamingDecontam
    // restart pattern: fault-tolerant sink + durable batch ids)
    val out = java.nio.file.Files.createTempDirectory("events-funnel-out").toString
    def run(): Unit = {
      val q = StreamingFunnel.funnelStages(
          graft.streaming.EventStream.readEvents(spark, src.toString))
        .toDF("user_id", "stage")
        .writeStream.outputMode("update")
        .option("checkpointLocation", cp)
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
          batch.write.mode("append").parquet(out)
        }
        .start()
      q.processAllAvailable(); q.stop()
    }
    copyIn(parts.take(2)); run()
    copyIn(parts.drop(2)); run()
    val settled = spark.read.parquet(out).collect()
      .map(r => (r.getLong(0), r.getInt(1)))
      .groupBy(_._1).map { case (u, xs) => u -> xs.map(_._2).max }
    // derive expected stage counts from batch q130 (stage k counts
    // users at stage >= k)
    val batch = Relational.q130ConversionFunnel(spark, TestSpark.sf0001)
      .collect().map(r => r.getString(0) -> r.getAs[Long]("n_users")).toMap
    val got = (1 to 4).map(k => settled.values.count(_ >= k).toLong)
    val want = Seq(batch("1_all"), batch("2_viewed"), batch("3_clicked"),
      batch("4_purchased"))
    assert(got == want, s"restart-settled stage counts $got != batch $want")
  }

  test("funnel fold property: any batch split in any order equals brute force " +
       "(3000 random cases)") {
    // attacks the pruning proof directly on the pure core: stage after
    // batch-by-batch folding must equal the all-at-once answer for
    // EVERY partition of the events into batches, in EVERY order
    val rnd = new scala.util.Random(20260814L)
    def brute(v: Seq[Long], c: Seq[Long], p: Seq[Long]): Int = {
      if (v.isEmpty) return 1
      val tv = v.min
      val ac = c.filter(_ >= tv)
      if (ac.isEmpty) return 2
      if (p.exists(_ >= ac.min)) 4 else 3
    }
    (1 to 3000).foreach { caseN =>
      // small ts domain → dense ties, the adversarial regime for >= logic
      def evs(n: Int) = Seq.fill(rnd.nextInt(n))(rnd.nextInt(8).toLong)
      val (v, c, p) = (evs(4), evs(5), evs(4))
      val tagged = rnd.shuffle(
        v.map(("view", _)) ++ c.map(("click", _)) ++ p.map(("purchase", _)))
      // random partition into 1..5 batches (possibly empty)
      val nb = 1 + rnd.nextInt(5)
      val batches = tagged.groupBy(_ => rnd.nextInt(nb)).values.toSeq
      val folded = batches.foldLeft(
        graft.streaming.FunnelState(StreamingFunnel.NoTs, Array.empty, Array.empty)) {
        (st, b) => StreamingFunnel.fold(st,
          b.collect { case ("view", t) => t },
          b.collect { case ("click", t) => t },
          b.collect { case ("purchase", t) => t })
      }
      val want = brute(v, c, p)
      assert(StreamingFunnel.stageOf(folded) == want,
        s"case $caseN: v=$v c=$c p=$p batches=$batches got " +
          s"${StreamingFunnel.stageOf(folded)} want $want")
    }
  }

  test("streaming daily anomaly equals batch q132 (scorer shared verbatim)") {
    val dir = stagedEventsDir(4)
    val streamed = StreamingAnomaly.runToCompletion(spark, dir, "anomaly_stream_test")
      .collect().map(_.toString)
    val batch = Relational.q132DailyAnomaly(spark, TestSpark.sf0001)
      .collect().map(_.toString)
    assert(streamed.nonEmpty && streamed.toSeq == batch.toSeq)
  }
}
