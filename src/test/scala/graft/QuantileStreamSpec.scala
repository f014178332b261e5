package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.HdrQuantileAgg.{hdrMergeQuantiles, hdrQuantiles, hdrSketch}
import graft.streaming.StreamingQuantiles

/** Streaming quantile-sketch STORE (the persistence half of the
  * windowed-HDR story): the sink lands exactly the watermark-closed
  * windows, each persisted sketch is BYTE-identical to a batch-built
  * sketch over that window's rows, rollups across stored sketches
  * equal a direct pass over the raw events (lossless merge), restart
  * on the durable checkpoint resumes without double-counting, and a
  * replayed micro-batch is a no-op. */
class QuantileStreamSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  // t0 divisible by both the 600 s window and the 1200 s coarse bucket,
  // so window/bucket starts align to the epoch grid Spark uses
  private val t0 = 1700000400L

  private def eventsDf(rows: (Long, Double)*): DataFrame = {
    import spark.implicits._
    rows.toDF("secs", "value")
      .select(timestamp_seconds(col("secs")).as("ts"), col("value"))
  }

  private val schema = StructType(Seq(
    StructField("ts", TimestampType), StructField("value", DoubleType)))

  // wave 1: two full windows + an advancer event whose watermark
  // (max ts − 30 min = t0+2400) closes w0 and w1 but not itself
  private val wave1 = Seq(
    t0 + 10 -> 1.00, t0 + 20 -> 2.00, t0 + 30 -> 3.00, // w0 [t0, t0+600)
    (t0 + 650) -> 1.50, (t0 + 700) -> 2.50,            // w1 [t0+600, t0+1200)
    (t0 + 4200) -> 0.77)                               // w7 [t0+4200, t0+4800)
  // wave 2: one window above the standing watermark + a far-future
  // flusher that closes everything except its own window
  private val wave2 = Seq(
    (t0 + 3100) -> 5.00,   // w5 [t0+3000, t0+3600)
    (t0 + 86400) -> 0.42)  // flusher — its window never finalizes
  private val closedWindows =
    Set(t0, t0 + 600, t0 + 3000, t0 + 4200)
  private val closedEvents = (wave1 ++ wave2).filter { case (s, _) =>
    closedWindows.contains(s - s % 600) }

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def writeWave(dir: String, name: String, order: Int,
                        rows: Seq[(Long, Double)]): Unit = {
    eventsDf(rows: _*).coalesce(1).write.parquet(s"$dir/$name")
    // FileStreamSource orders by modification time — force file order
    val t = System.currentTimeMillis() - 600000 + order * 60000
    new java.io.File(s"$dir/$name").listFiles().foreach(_.setLastModified(t))
  }

  private def runSink(streamDir: String, storeDir: String): Unit = {
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$streamDir/f*")
    val q = StreamingQuantiles.sketchStoreSink(spark, stream, storeDir)
    q.processAllAvailable()
    q.stop()
  }

  private def batchSketches(rows: Seq[(Long, Double)]): Map[Long, (Array[Byte], Long)] =
    eventsDf(rows: _*)
      .groupBy(unix_timestamp(window(col("ts"), "10 minutes").getField("start"))
        .as("win_start"))
      .agg(hdrSketch(greatest(lit(0L), floor(col("value") * 100).cast("long")))
        .as("sk"), count(lit(1)).as("n"))
      .collect()
      .map(r => r.getLong(0) -> (r.getAs[Array[Byte]]("sk"), r.getLong(2))).toMap

  private def batchQuantiles(rows: Seq[(Long, Double)], qs: Seq[Double]): Seq[Long] =
    eventsDf(rows: _*)
      .agg(hdrQuantiles(greatest(lit(0L), floor(col("value") * 100).cast("long")), qs)
        .as("qv"))
      .collect().head.getSeq[Long](0)

  test("store holds exactly the closed windows, sketches byte-identical to batch") {
    val streamDir = tmp("qsk_in")
    val storeDir = tmp("qsk_store")
    writeWave(streamDir, "f0", 0, wave1)
    writeWave(streamDir, "f1", 1, wave2)
    runSink(streamDir, storeDir)

    val stored = StreamingQuantiles.readSketchStore(spark, storeDir).collect()
      .map(r => r.getAs[Long]("win_start") ->
        (r.getAs[Array[Byte]]("sk"), r.getAs[Long]("n_events"))).toMap
    assert(stored.keySet == closedWindows,
      s"the store is the finalized-window ledger, got ${stored.keySet}")
    val want = batchSketches(closedEvents)
    closedWindows.foreach { w =>
      assert(stored(w)._2 == want(w)._2, s"window $w event count")
      assert(java.util.Arrays.equals(stored(w)._1, want(w)._1),
        s"window $w: persisted sketch must be byte-identical to the batch build")
    }
  }

  test("rollups over stored sketches equal a direct pass over the raw events") {
    val streamDir = tmp("qsk_roll_in")
    val storeDir = tmp("qsk_roll_store")
    writeWave(streamDir, "f0", 0, wave1)
    writeWave(streamDir, "f1", 1, wave2)
    runSink(streamDir, storeDir)

    val qs = Seq(0.5, 0.99)
    val total = StreamingQuantiles.rollupTotal(spark, storeDir, qs)
      .collect().head
    val direct = eventsDf(closedEvents: _*)
      .agg(count(lit(1)).as("n"),
        hdrQuantiles(greatest(lit(0L), floor(col("value") * 100).cast("long")), qs)
          .as("qv"))
      .collect().head
    assert(total.getAs[Long]("n_events") == direct.getAs[Long]("n"))
    assert(total.getSeq[Long](1) == direct.getSeq[Long](1),
      "lossless merge: whole-store rollup must equal the direct readout")

    // hourly→daily shape: 1200 s buckets merge pairs of 600 s windows
    val coarse = StreamingQuantiles.rollup(spark, storeDir, 1200L, qs)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getSeq[Long](2))).toMap
    val directCoarse = eventsDf(closedEvents: _*)
      .groupBy((unix_timestamp(col("ts")) -
        pmod(unix_timestamp(col("ts")), lit(1200L))).as("b"))
      .agg(count(lit(1)).as("n"),
        hdrQuantiles(greatest(lit(0L), floor(col("value") * 100).cast("long")), qs)
          .as("qv"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getSeq[Long](2))).toMap
    assert(coarse == directCoarse,
      s"coarse rollup $coarse != direct per-bucket pass $directCoarse")
  }

  test("restart on the durable checkpoint resumes without double-counting") {
    val streamDir = tmp("qsk_rs_in")
    val storeDir = tmp("qsk_rs_store")
    writeWave(streamDir, "f0", 0, wave1)
    runSink(streamDir, storeDir)
    val afterWave1 = StreamingQuantiles.readSketchStore(spark, storeDir)
      .select("win_start").collect().map(_.getLong(0)).toSet
    assert(afterWave1 == Set(t0, t0 + 600),
      s"wave-1 watermark closes w0 and w1 only, got $afterWave1")
    assert(new java.io.File(s"$storeDir/_checkpoint").exists(),
      "checkpoint must default to a durable location under the store")

    writeWave(streamDir, "f1", 1, wave2)
    runSink(streamDir, storeDir) // same checkpoint + store
    val rolled = StreamingQuantiles.rollupTotal(spark, storeDir, Seq(0.5))
      .collect().head
    assert(rolled.getAs[Long]("n_events") == closedEvents.size.toLong,
      "resume must append only the newly-closed windows — no replayed counts")
    val windows = StreamingQuantiles.readSketchStore(spark, storeDir)
      .select("win_start").collect().map(_.getLong(0)).toSet
    assert(windows == closedWindows)
  }

  test("replayed micro-batch overwrites its own directory — a no-op") {
    val storeDir = tmp("qsk_replay")
    val batch = eventsDf(wave1.take(3): _*)
      .groupBy(unix_timestamp(window(col("ts"), "10 minutes").getField("start"))
        .as("win_start"))
      .agg(hdrSketch(greatest(lit(0L), floor(col("value") * 100).cast("long")))
        .as("sk"), count(lit(1)).as("n_events"))
    StreamingQuantiles.persistBatch(batch, 7L, storeDir)
    val once = StreamingQuantiles.rollupTotal(spark, storeDir, Seq(0.5))
      .collect().head
    StreamingQuantiles.persistBatch(batch, 7L, storeDir) // at-least-once replay
    val twice = StreamingQuantiles.rollupTotal(spark, storeDir, Seq(0.5))
      .collect().head
    assert(once.getAs[Long]("n_events") == 3L)
    assert(twice.getAs[Long]("n_events") == once.getAs[Long]("n_events") &&
      twice.getSeq[Long](1) == once.getSeq[Long](1),
      "same batch id must overwrite, never accumulate")
    assert(StreamingQuantiles.readSketchStore(spark, storeDir).count() == 1L)
  }

  test("randomized time-ordered waves: store ≡ batch sketches, any 3-file split") {
    val rnd = new java.util.Random(184L)
    for (round <- 1 to 2) {
      // time-ordered offsets (nothing is ever late, so no watermark
      // drops muddy the ground truth) + a far flusher that closes
      // every data window but its own
      val offs = (1 to 60).map(_ => rnd.nextInt(7200).toLong).sorted
      val data = offs.map(o => (t0 + o) -> (rnd.nextInt(100000) / 100.0))
      val all = data :+ ((t0 + 14400L) -> 0.42)
      val streamDir = tmp(s"qsk_rand_in$round")
      val storeDir = tmp(s"qsk_rand_store$round")
      val (c1, c2) = (all.size / 3, 2 * all.size / 3)
      Seq(all.slice(0, c1), all.slice(c1, c2), all.drop(c2)).zipWithIndex
        .foreach { case (rows, i) => writeWave(streamDir, s"f$i", i, rows) }
      runSink(streamDir, storeDir)

      val closed = data.filter { case (s, _) => (s - s % 600) + 600 <= t0 + 14400 - 1800 }
      val stored = StreamingQuantiles.readSketchStore(spark, storeDir).collect()
        .map(r => r.getAs[Long]("win_start") ->
          (r.getAs[Array[Byte]]("sk"), r.getAs[Long]("n_events"))).toMap
      val want = batchSketches(closed)
      assert(stored.keySet == want.keySet,
        s"round $round: stored ${stored.keySet.toSeq.sorted} != ${want.keySet.toSeq.sorted}")
      want.foreach { case (w, (sk, n)) =>
        assert(stored(w)._2 == n, s"round $round window $w count")
        assert(java.util.Arrays.equals(stored(w)._1, sk), s"round $round window $w sketch")
      }
      val rolled = StreamingQuantiles.rollupTotal(spark, storeDir, Seq(0.5, 0.99))
        .collect().head
      val direct = batchQuantiles(closed, Seq(0.5, 0.99))
      assert(rolled.getAs[Long]("n_events") == closed.size.toLong)
      assert(rolled.getSeq[Long](1) == direct, s"round $round rollup")
    }
  }

  test("producer schema is pinned to the store contract") {
    // names + types only: parquet round-trips every column nullable,
    // so nullability is not part of the store contract
    assert(graft.streaming.EventStream.windowedQuantileSketches(eventsDf())
      .schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      StreamingQuantiles.storeSchema.fields.map(f => (f.name, f.dataType)).toSeq,
      "windowedQuantileSketches and storeSchema must not drift")
  }

  test("a batch dir stranded file-less by a crash reads as zero rows, not an error") {
    val storeDir = tmp("qsk_stranded")
    // crash window: overwrite deleted the old contents, committer never
    // published — the directory exists but holds no data files
    new java.io.File(storeDir, "batch=0/_temporary").mkdirs()
    assert(StreamingQuantiles.readSketchStore(spark, storeDir).count() == 0L)
    // and a populated sibling still reads through the declared schema
    StreamingQuantiles.persistBatch(
      eventsDf(wave1.take(3): _*)
        .groupBy(unix_timestamp(window(col("ts"), "10 minutes").getField("start"))
          .as("win_start"))
        .agg(hdrSketch(greatest(lit(0L), floor(col("value") * 100).cast("long")))
          .as("sk"), count(lit(1)).as("n_events")),
      1L, storeDir)
    assert(StreamingQuantiles.readSketchStore(spark, storeDir).count() == 1L)
  }

  test("an empty or absent store reads as zero rows") {
    assert(StreamingQuantiles.readSketchStore(spark, tmp("qsk_empty")).count() == 0L)
    assert(StreamingQuantiles.readSketchStore(
      spark, tmp("qsk_gone") + "/nope").count() == 0L)
    // and an empty batch persists nothing (absent dir ≡ empty dir)
    val storeDir = tmp("qsk_noop")
    StreamingQuantiles.persistBatch(
      eventsDf().groupBy(lit(0L).as("win_start"))
        .agg(hdrSketch(lit(0L)).as("sk"), count(lit(1)).as("n_events")),
      0L, storeDir)
    assert(!new java.io.File(storeDir).listFiles().exists(
      _.getName.startsWith("batch=")))
  }

  test("checkpoint wipe against an existing store fails loudly — overwrite-by-id is per-lineage") {
    // the r16 lineage guard: a wiped checkpoint restarts batch ids at
    // 0 and would overwrite the prior lineage's low-numbered batch=
    // dirs with different windows
    val streamDir = tmp("hdr_wipe_in")
    val storeDir = tmp("hdr_wipe_store")
    def snapshot(): Seq[(Long, Seq[Byte], Long)] =
      StreamingQuantiles.readSketchStore(spark, storeDir).collect()
        .map(r => (r.getLong(0), r.getAs[Array[Byte]](1).toSeq, r.getLong(2)))
        .toSeq.sortBy(_._1)
    writeWave(streamDir, "f1", 0, wave1)
    runSink(streamDir, storeDir)
    val before = snapshot()
    assert(before.nonEmpty)
    val cp = new java.io.File(s"$storeDir/_checkpoint")
    java.nio.file.Files.walk(cp.toPath)
      .sorted(java.util.Comparator.reverseOrder())
      .forEach(p => java.nio.file.Files.delete(p))
    writeWave(streamDir, "f2", 1, wave2)
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$streamDir/f*")
    val q = StreamingQuantiles.sketchStoreSink(spark, stream, storeDir)
    val ex = intercept[Exception] { q.processAllAvailable() }
    def msgs(t: Throwable): String = Iterator.iterate(t)(_.getCause)
      .takeWhile(_ != null).map(m => Option(m.getMessage).getOrElse("")).mkString("|")
    assert(msgs(ex).contains("lineage"), s"expected the lineage guard, got: ${msgs(ex)}")
    q.stop()
    assert(snapshot() == before, "refusal must leave the store untouched")
  }
}
