package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamingSnapshot

/** Streaming upsert snapshot (q166's streaming twin): the persisted
  * snapshot equals the batch keep-latest over all change rows,
  * independent of micro-batch boundaries; replayed batches change
  * nothing; untouched buckets are never rewritten; swap debris
  * recovers. */
class SnapshotStreamSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val schema = StructType(Seq(
    StructField("k", LongType),
    StructField("ver", LongType),
    StructField("payload", StringType)))

  private def changes(rows: (Long, Long, String)*) = {
    import spark.implicits._
    rows.toDF("k", "ver", "payload")
  }

  private def snapRows(dir: String): Set[(Long, Long, String)] =
    StreamingSnapshot.readSnapshot(spark, dir).collect()
      .map(r => (r.getAs[Long]("k"), r.getAs[Long]("ver"),
                 r.getAs[String]("payload"))).toSet

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private val allRows = Seq(
    (1L, 1L, "a1"), (2L, 1L, "b1"), (3L, 1L, "c1"),
    (1L, 2L, "a2"), (4L, 1L, "d1"),
    (2L, 3L, "b3"), (2L, 2L, "b2-late"), (5L, 1L, "e1"))
  private val expected = Set(
    (1L, 2L, "a2"), (2L, 3L, "b3"), (3L, 1L, "c1"),
    (4L, 1L, "d1"), (5L, 1L, "e1"))

  test("stream of change batches collapses to the batch keep-latest, any batch split") {
    for ((split, i) <- Seq(Seq(3, 5, 8), Seq(6, 8)).zipWithIndex) {
      val streamDir = tmp(s"snap_in$i")
      val snapDir = tmp(s"snap_out$i")
      var prev = 0
      for ((end, j) <- split.zipWithIndex) {
        changes(allRows.slice(prev, end): _*)
          .coalesce(1).write.parquet(s"$streamDir/f$j")
        prev = end
      }
      // FileStreamSource orders by modification time — force file order
      val t0 = System.currentTimeMillis() - 600000
      split.indices.foreach { j =>
        new java.io.File(s"$streamDir/f$j").listFiles()
          .foreach(_.setLastModified(t0 + j * 60000))
      }
      val stream = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(s"$streamDir/f*")
      val q = StreamingSnapshot.snapshotSink(
        spark, stream, "k", Seq("ver"), snapDir, buckets = 8)
      q.processAllAvailable()
      q.stop()
      assert(snapRows(snapDir) == expected,
        s"split $split must converge to the batch keep-latest")
    }
  }

  test("replayed batch is a no-op; out-of-order redelivery never regresses a key") {
    val snapDir = tmp("snap_replay")
    val b1 = changes((1L, 1L, "a1"), (2L, 1L, "b1"))
    val b2 = changes((1L, 2L, "a2"), (3L, 1L, "c1"))
    StreamingSnapshot.applyBatch(spark, b1, "k", Seq("ver"), snapDir, 8)
    StreamingSnapshot.applyBatch(spark, b2, "k", Seq("ver"), snapDir, 8)
    val after = snapRows(snapDir)
    StreamingSnapshot.applyBatch(spark, b2, "k", Seq("ver"), snapDir, 8)
    assert(snapRows(snapDir) == after, "exact replay must change nothing")
    StreamingSnapshot.applyBatch(spark, b1, "k", Seq("ver"), snapDir, 8)
    assert(snapRows(snapDir) == after,
      "a STALE redelivery (older versions) must never regress the snapshot")
    assert(after == Set((1L, 2L, "a2"), (2L, 1L, "b1"), (3L, 1L, "c1")))
  }

  test("only touched buckets are rewritten") {
    val snapDir = tmp("snap_prune")
    val keys = (1L to 64L)
    StreamingSnapshot.applyBatch(spark,
      changes(keys.map(k => (k, 1L, s"v$k")): _*), "k", Seq("ver"), snapDir, 8)
    val root = new java.io.File(snapDir)
    def fileSet(b: Int): Set[String] =
      Option(new java.io.File(root, s"bucket=$b").listFiles())
        .map(_.map(f => f.getName + ":" + f.lastModified()).toSet)
        .getOrElse(Set.empty)
    val before = (0 until 8).map(fileSet)
    // one key → one bucket touched
    StreamingSnapshot.applyBatch(spark,
      changes((1L, 2L, "v1b")), "k", Seq("ver"), snapDir, 8)
    val touched = (0 until 8).count(b => fileSet(b) != before(b))
    assert(touched == 1, s"exactly one bucket must be rewritten, got $touched")
    assert(snapRows(snapDir).contains((1L, 2L, "v1b")))
    assert(snapRows(snapDir).size == 64)
  }

  test("restart on the durable checkpoint resumes without replaying or losing keys") {
    val streamDir = tmp("snap_rs_in")
    val snapDir = tmp("snap_rs_out")
    def writeFile(name: String, rows: (Long, Long, String)*): Unit =
      changes(rows: _*).coalesce(1).write.parquet(s"$streamDir/$name")
    def start() = StreamingSnapshot.snapshotSink(spark,
      spark.readStream.schema(schema).option("maxFilesPerTrigger", "1")
        .parquet(s"$streamDir/f*"),
      "k", Seq("ver"), snapDir, buckets = 4)

    writeFile("f1", (1L, 1L, "a1"), (2L, 1L, "b1"))
    val q1 = start(); q1.processAllAvailable(); q1.stop()
    assert(new java.io.File(s"$snapDir/_checkpoint").exists(),
      "checkpoint must default to a durable location under snapDir")
    assert(snapRows(snapDir) == Set((1L, 1L, "a1"), (2L, 1L, "b1")))

    // new changes land while the stream is down; the restarted query
    // must apply ONLY them (a fresh checkpoint would replay f1 — safe
    // but this pins that the durable default actually resumes)
    writeFile("f2", (1L, 2L, "a2"), (3L, 1L, "c1"))
    val q2 = start(); q2.processAllAvailable(); q2.stop()
    assert(snapRows(snapDir) ==
      Set((1L, 2L, "a2"), (2L, 1L, "b1"), (3L, 1L, "c1")),
      "restart must upsert the new batch on top of the surviving snapshot")
  }

  test("keep-latest is order- and split-independent (semilattice property)") {
    val rnd = new java.util.Random(166L)
    for (round <- 1 to 3) {
      val rows = (1 to 40).map { i =>
        (rnd.nextInt(8).toLong + 1, rnd.nextInt(5).toLong, s"p${rnd.nextInt(9)}")
      }
      // ground truth: per key the lexicographically-max (ver, payload)
      // — payload rides as the final tie-break, same as the struct max
      val expected = rows.groupBy(_._1).values
        .map(vs => vs.maxBy(v => (v._2, v._3))).toSet
      // a random shuffle cut into 3 batches must converge identically
      val shuffled = rnd.ints(0, 1000000).limit(rows.size).toArray
        .zip(rows).sortBy(_._1).map(_._2).toSeq
      val (c1, c2) = (rows.size / 3, 2 * rows.size / 3)
      val snapDir = tmp(s"snap_prop$round")
      Seq(shuffled.slice(0, c1), shuffled.slice(c1, c2), shuffled.drop(c2))
        .foreach(b => StreamingSnapshot.applyBatch(
          spark, changes(b: _*), "k", Seq("ver"), snapDir, 4))
      assert(snapRows(snapDir) == expected,
        s"round $round: shuffled 3-batch apply must equal the global keep-latest")
    }
  }

  test("bucket modulus is a creation-time layout: later applies use the stored value") {
    val snapDir = tmp("snap_layout")
    StreamingSnapshot.applyBatch(spark,
      changes((1L to 16L).map(k => (k, 1L, s"v$k")): _*),
      "k", Seq("ver"), snapDir, buckets = 4)
    // a caller passing a DIFFERENT modulus must not corrupt the layout
    // (reviewed failure: merged rows re-bucketed outside the touched
    // set are silently discarded with the staging dir)
    StreamingSnapshot.applyBatch(spark,
      changes((1L to 16L).map(k => (k, 2L, s"w$k")): _*),
      "k", Seq("ver"), snapDir, buckets = 32)
    assert(snapRows(snapDir) ==
      (1L to 16L).map(k => (k, 2L, s"w$k")).toSet,
      "no key may be lost or duplicated across a bucket-param change")
    val dirs = new java.io.File(snapDir).listFiles()
      .map(_.getName).filter(_.startsWith("bucket=")).toSet
    assert(dirs.forall(_.stripPrefix("bucket=").toInt < 4),
      s"layout must stay at the creation-time modulus, got $dirs")
  }

  test("a payload column named bucket is rejected, not silently clobbered") {
    import spark.implicits._
    val bad = Seq((1L, 1L, 7)).toDF("k", "ver", "bucket")
    val e = intercept[IllegalArgumentException] {
      StreamingSnapshot.applyBatch(spark, bad, "k", Seq("ver"),
        tmp("snap_reserved"), 4)
    }
    assert(e.getMessage.contains("reserved"))
  }

  test("crash mid-swap then next apply converges to the uncrashed result") {
    val snapDir = tmp("snap_crash")
    StreamingSnapshot.applyBatch(spark,
      changes((1L, 1L, "a1"), (2L, 1L, "b1")), "k", Seq("ver"), snapDir, 1)
    // crash window: live renamed away, staged replacement never moved in
    val live = new java.io.File(snapDir, "bucket=0")
    assert(live.renameTo(new java.io.File(snapDir, "bucket=0.old")))
    new java.io.File(snapDir, ".staging/bucket=0").mkdirs()
    // the NEXT apply (which runs recovery first) must land on exactly
    // the state an uncrashed sequence would have produced
    StreamingSnapshot.applyBatch(spark,
      changes((1L, 2L, "a2"), (3L, 1L, "c1")), "k", Seq("ver"), snapDir, 1)
    assert(snapRows(snapDir) ==
      Set((1L, 2L, "a2"), (2L, 1L, "b1"), (3L, 1L, "c1")))
  }

  test("readSnapshot never surfaces .old debris rows (crash after second rename)") {
    val snapDir = tmp("snap_read_debris")
    StreamingSnapshot.applyBatch(spark,
      changes((1L, 1L, "a1")), "k", Seq("ver"), snapDir, 1)
    StreamingSnapshot.applyBatch(spark,
      changes((1L, 2L, "a2")), "k", Seq("ver"), snapDir, 1)
    // crash window after rename(staged -> live) but before delete(old):
    // both live (new) and .old (stale pre-swap rows) populated
    val stale = new java.io.File(snapDir, "bucket=0.old")
    changes((1L, 1L, "a1")).coalesce(1).write.parquet(stale.toString)
    assert(snapRows(snapDir) == Set((1L, 2L, "a2")),
      "a read between the crash and the next apply must not see stale versions")
    // the read must NOT clean up: recovery is writer-side only — a
    // reader deleting debris could destroy a concurrently-running
    // writer's mid-swap state (review finding). The next apply cleans.
    assert(stale.exists(), "readSnapshot must never delete (reader/writer split)")
    StreamingSnapshot.applyBatch(spark,
      changes((2L, 1L, "b1")), "k", Seq("ver"), snapDir, 1)
    assert(!stale.exists(), "the writer's next apply owns the cleanup")
    assert(snapRows(snapDir) == Set((1L, 2L, "a2"), (2L, 1L, "b1")))
  }

  test("read mid-crash (live missing) surfaces the authoritative .old rows, deletes nothing") {
    val snapDir = tmp("snap_read_midcrash")
    StreamingSnapshot.applyBatch(spark,
      changes((1L, 1L, "a1")), "k", Seq("ver"), snapDir, 1)
    // crash between the two renames: live moved away, staged present
    val live = new java.io.File(snapDir, "bucket=0")
    val old = new java.io.File(snapDir, "bucket=0.old")
    assert(live.renameTo(old))
    val staged = new java.io.File(snapDir, ".staging/bucket=0")
    staged.mkdirs()
    assert(snapRows(snapDir) == Set((1L, 1L, "a1")),
      "the orphaned .old is the authoritative pre-swap state")
    assert(old.exists() && staged.exists(),
      "a concurrent reader must leave the writer's files untouched")
  }

  test("key column is a creation-time layout: a different key is rejected") {
    val snapDir = tmp("snap_keyguard")
    StreamingSnapshot.applyBatch(spark,
      changes((1L, 1L, "a1")), "k", Seq("ver"), snapDir, 4)
    import spark.implicits._
    // same schema, different bucket-hash column: silently re-hashing
    // would strand existing rows outside the touched set
    val e = intercept[IllegalArgumentException] {
      StreamingSnapshot.applyBatch(spark,
        Seq((1L, 5L, "x")).toDF("k", "ver", "payload"),
        "payload", Seq("ver"), snapDir, 4)
    }
    assert(e.getMessage.contains("key columns"))
  }

  test("swap debris recovers: orphaned .old restores, .staging drops") {
    val snapDir = tmp("snap_debris")
    StreamingSnapshot.applyBatch(spark,
      changes((1L, 1L, "a1")), "k", Seq("ver"), snapDir, 1)
    val live = new java.io.File(snapDir, "bucket=0")
    val old = new java.io.File(snapDir, "bucket=0.old")
    // simulate a crash between the two renames: live moved away,
    // staged never swapped in
    assert(live.renameTo(old))
    val staging = new java.io.File(snapDir, ".staging")
    staging.mkdirs()
    StreamingSnapshot.recoverDebris(spark, snapDir)
    assert(live.exists() && !old.exists() && !staging.exists())
    assert(snapRows(snapDir) == Set((1L, 1L, "a1")))
    // completed-swap debris: .old WITH a live sibling is dropped
    old.mkdirs()
    StreamingSnapshot.recoverDebris(spark, snapDir)
    assert(live.exists() && !old.exists())
    assert(snapRows(snapDir) == Set((1L, 1L, "a1")))
  }
}
