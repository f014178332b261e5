package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Relational
import graft.streaming.{StreamingSnapshot, StreamingSurvival}

/** Streaming user-lifetime profile store (q195's streaming twin): the
  * persisted profiles equal the batch per-user aggregate over all
  * events regardless of micro-batch split, a LATE BACKWARD event still
  * extends its user's span (the case every watermarked operator
  * drops), the curve readout equals batch q195 by shared plan, restart
  * resumes on the durable checkpoint, and stale redeliveries never
  * regress a profile. */
class SurvivalStreamSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val day = 86400L

  private def ev(rows: (Long, Long)*): DataFrame = {
    import spark.implicits._
    rows.toDF("user_id", "secs")
      .select(col("user_id"), timestamp_seconds(col("secs")).as("ts"))
  }

  private val schema = StructType(Seq(
    StructField("user_id", LongType), StructField("ts", TimestampType)))

  private def tmp(p: String): String =
    java.nio.file.Files.createTempDirectory(p).toString

  private def writeWave(dir: String, name: String, order: Int,
                        rows: Seq[(Long, Long)]): Unit = {
    ev(rows: _*).coalesce(1).write.parquet(s"$dir/$name")
    val t = System.currentTimeMillis() - 600000 + order * 60000
    new java.io.File(s"$dir/$name").listFiles().foreach(_.setLastModified(t))
  }

  private def runSink(streamDir: String, snapDir: String): Unit = {
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$streamDir/f*")
    val q = StreamingSurvival.lifetimeSink(spark, stream, snapDir, buckets = 4)
    q.processAllAvailable()
    q.stop()
  }

  // u1 one-day user, u2 ten days, u3 thirty days — with u3's FIRST
  // event delivered in the LAST wave (backward late)
  private val allRows = Seq(
    (1L, 10L * day + 100), (2L, 10L * day + 200), (3L, 20L * day),
    (1L, 10L * day + 900), (2L, 20L * day + 200),
    (3L, 40L * day), (3L, 10L * day)) // <- backward: before u3's current first_ts

  private def curve(snapDir: String): Map[Long, (Long, Double)] =
    StreamingSurvival.survivalFromStore(spark, snapDir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap

  private def batchCurve(rows: Seq[(Long, Long)]): Map[Long, (Long, Double)] =
    Relational.retentionSurvival(ev(rows: _*)).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap

  test("producer schema is pinned to the store contract") {
    // names + types only (parquet round-trips every column nullable):
    // userLifetimes writes the store; profileSchema declares the
    // empty-store read — the pair must not drift (round-14 review:
    // the empty branch used to hardcode its own copy)
    assert(StreamingSurvival.userLifetimes(ev((1L, 0L)))
      .schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      StreamingSurvival.profileSchema.fields.map(f => (f.name, f.dataType)).toSeq,
      "userLifetimes and profileSchema must not drift")
  }

  test("stream ≡ batch survival under different batch splits, backward-late included") {
    val expected = batchCurve(allRows)
    // u1 lifetime 0, u2 lifetime 10, u3 lifetime 30 (20→40, extended
    // BACKWARD to day 10 by the late event) — sanity-pin the ground
    // truth so the parity below can't be trivially two empty curves
    assert(expected(0L) == ((3L, 1.0)) && expected(28L) == ((1L, 0.333333)))
    for ((split, i) <- Seq(Seq(3, 5, 7), Seq(5, 7)).zipWithIndex) {
      val streamDir = tmp(s"surv_in$i")
      val snapDir = tmp(s"surv_out$i")
      var prev = 0
      for ((end, j) <- split.zipWithIndex) {
        writeWave(streamDir, s"f$j", j, allRows.slice(prev, end))
        prev = end
      }
      runSink(streamDir, snapDir)
      assert(curve(snapDir) == expected, s"split $split must equal batch q195")
      // and the profile store itself matches the batch aggregate
      val profiles = StreamingSurvival.readProfiles(spark, snapDir).collect()
        .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("n_events"))).toSet
      assert(profiles == Set((1L, 2L), (2L, 2L), (3L, 3L)))
    }
  }

  test("restart on the durable checkpoint resumes and still absorbs backward events") {
    val streamDir = tmp("surv_rs_in")
    val snapDir = tmp("surv_rs_out")
    writeWave(streamDir, "f0", 0, allRows.take(5))
    runSink(streamDir, snapDir)
    assert(curve(snapDir) == batchCurve(allRows.take(5)))
    writeWave(streamDir, "f1", 1, allRows.drop(5)) // u3's backward event
    runSink(streamDir, snapDir) // same checkpoint + store
    assert(curve(snapDir) == batchCurve(allRows),
      "resume must fold the late wave into the surviving profiles")
  }

  test("an empty or absent profile store reads as zero rows and the zero curve") {
    val empty = tmp("surv_empty")
    assert(StreamingSurvival.readProfiles(spark, empty).count() == 0L)
    assert(StreamingSurvival.readProfiles(spark, empty + "/nope").count() == 0L)
    // a store the stream initialized but never upserted into
    new java.io.File(empty, "_checkpoint").mkdirs()
    val rows = StreamingSurvival.survivalFromStore(spark, empty).collect()
    assert(rows.length == 5 && rows.forall(_.getLong(1) == 0L),
      "a not-yet-populated vintage is valid: 5-row zero curve, no throw")
  }

  test("staged crash between bucket swaps: keep-latest replay converges to the uncrashed snapshot") {
    // the ledger sink proves this with an _applied watermark; the
    // snapshot sink underneath q195's stream needs no watermark —
    // keep-latest over the strictly-increasing n_events ordinal is
    // idempotent — but the convergence deserves its own crash proof
    // (round-12 verdict ask #8)
    val snapDir = tmp("surv_crash")
    val w1: Seq[(Long, Long)] =
      (1L to 8L).flatMap(u => Seq((u, u * day), (u, u * day + day)))
    val all: Seq[(Long, Long)] =
      w1 ++ (1L to 8L).map(u => (u, u * day + 40 * day))
    def profilesOf(rows: Seq[(Long, Long)]) =
      StreamingSurvival.userLifetimes(ev(rows: _*))
    def storeProfiles() =
      StreamingSurvival.readProfiles(spark, snapDir).collect()
        .map(_.toSeq).toSet
    StreamingSnapshot.applyBatch(spark, profilesOf(w1),
      "user_id", Seq("n_events"), snapDir, 2)
    def bucket(i: Int) = new java.io.File(snapDir, s"bucket=$i")
    assert(bucket(0).isDirectory && bucket(1).isDirectory,
      "8 users must populate both buckets for the crash window to exist")
    // stash bucket 0's pre-batch-2 state
    val stash = java.nio.file.Files.createTempDirectory("surv_stash")
    bucket(0).listFiles().foreach { f =>
      java.nio.file.Files.copy(f.toPath, stash.resolve(f.getName)) }
    StreamingSnapshot.applyBatch(spark, profilesOf(all),
      "user_id", Seq("n_events"), snapDir, 2)
    val converged = storeProfiles()
    assert(curve(snapDir) == batchCurve(all))
    // crash window: bucket 1 swapped in, bucket 0 rolled back to its
    // pre-batch state — what an unswapped bucket looks like post-crash
    bucket(0).listFiles().foreach(_.delete()); bucket(0).delete()
    bucket(0).mkdirs()
    stash.toFile.listFiles().foreach { f =>
      java.nio.file.Files.copy(f.toPath, bucket(0).toPath.resolve(f.getName)) }
    assert(storeProfiles() != converged, "the staged crash must be observable")
    // replay the SAME batch: bucket 1's redelivered rows tie the
    // keep-latest comparison (no-op), bucket 0 re-applies
    StreamingSnapshot.applyBatch(spark, profilesOf(all),
      "user_id", Seq("n_events"), snapDir, 2)
    assert(storeProfiles() == converged,
      "replay after a partial crash must converge to the uncrashed snapshot")
    assert(curve(snapDir) == batchCurve(all),
      "and the curve readout equals batch q195 on the converged store")
  }

  test("stale profile redelivery never regresses the store") {
    val snapDir = tmp("surv_stale")
    val fresh = StreamingSurvival.userLifetimes(ev(allRows: _*))
    StreamingSnapshot.applyBatch(spark, fresh, "user_id", Seq("n_events"), snapDir, 4)
    val before = curve(snapDir)
    val stale = StreamingSurvival.userLifetimes(ev(allRows.take(3): _*))
    StreamingSnapshot.applyBatch(spark, stale, "user_id", Seq("n_events"), snapDir, 4)
    assert(curve(snapDir) == before,
      "lower-n_events rows must lose the keep-latest comparison")
  }
}
