package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.BucketStore
import graft.streaming.StreamingLedger

/** Store integrity audit (fsck): a healthy store reads all-ok; each
  * planted defect class — missing layout sidecar, swap debris,
  * foreign bucket dir, a row sitting in the wrong hash bucket — is
  * flagged with the right status, and warns are distinguished from
  * fails (debris is normal mid-recovery; misplaced rows never are). */
class BucketStoreSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def tmp(p: String): String =
    java.nio.file.Files.createTempDirectory(p).toString

  private def mkLedger(dir: String): Unit = {
    import spark.implicits._
    StreamingLedger.applyBatch(spark,
      Seq(("the", 2L), ("cat", 1L), ("dog", 3L)).toDF("word", "n"),
      Seq("word"), Seq("n"), dir, 2, 0L)
  }

  private def statuses(dir: String): Map[String, (String, String)] =
    BucketStore.fsck(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getString(1), r.getString(2)))).toMap

  test("a healthy store audits all-ok") {
    val dir = tmp("fsck_ok")
    mkLedger(dir)
    val st = statuses(dir)
    assert(st.values.forall(_._1 == "ok"), s"expected all ok, got $st")
    assert(st("layout")._2 == "buckets=2")
    assert(st("layout_keys")._2 == "word")
  }

  test("a snapshot store (no _schema sidecar) audits clean via the inference path") {
    import spark.implicits._
    val dir = tmp("fsck_snap")
    graft.streaming.StreamingSnapshot.applyBatch(spark,
      Seq((1L, 1L, "a"), (2L, 1L, "b"), (3L, 1L, "c")).toDF("k", "ver", "v"),
      "k", Seq("ver"), dir, 2)
    val st = statuses(dir)
    assert(st.values.forall(_._1 == "ok"), s"expected all ok, got $st")
    assert(st("layout_keys")._2 == "k")
  }

  test("a missing store dir and a missing _buckets sidecar fail layout") {
    val missing = statuses("/tmp/fsck_nowhere_" + System.nanoTime())
    assert(missing("layout")._1 == "fail")
    val dir = tmp("fsck_nobuckets")
    mkLedger(dir)
    new java.io.File(dir, "_buckets").delete()
    val st = statuses(dir)
    assert(st("layout")._1 == "fail")
    assert(st("bucket_hash")._1 == "warn",
      "without the modulus the hash check must skip as warn, not guess")
  }

  test("swap debris warns (normal pending recovery), never fails") {
    val dir = tmp("fsck_debris")
    mkLedger(dir)
    new java.io.File(dir, ".staging/bucket=0").mkdirs()
    new java.io.File(dir, "bucket=0.old").mkdirs()
    val st = statuses(dir)
    assert(st("debris_old")._1 == "warn" && st("debris_staging")._1 == "warn")
    assert(!st.values.exists(_._1 == "fail"),
      "debris alone is a warn-state store, not a corrupt one")
  }

  test("a foreign bucket dir fails bucket_range") {
    val dir = tmp("fsck_range")
    mkLedger(dir) // modulus 2 → valid buckets are 0 and 1
    new java.io.File(dir, "bucket=7").mkdirs()
    assert(statuses(dir)("bucket_range")._1 == "fail")
  }

  test("a zero-padded alias dir (bucket=01 beside bucket=1) fails bucket_range") {
    // both dirs parse to index 1, both hash clean — yet liveBucketDirs
    // serves BOTH, double-counting the bucket's rows for every reader
    // (round-14 review): the audit must flag the aliasing itself
    val dir = tmp("fsck_alias")
    mkLedger(dir)
    val src = new java.io.File(dir, "bucket=1")
    val dst = new java.io.File(dir, "bucket=01")
    dst.mkdirs()
    src.listFiles().foreach { f =>
      java.nio.file.Files.copy(f.toPath, dst.toPath.resolve(f.getName))
    }
    val st = statuses(dir)
    assert(st("bucket_range")._1 == "fail", s"got $st")
    assert(st("bucket_range")._2.contains("aliased"))
  }

  test("a corrupt _keys sidecar fails bucket_hash as a row, never an fsck abort") {
    // report-don't-abort: keys that don't resolve against the data
    // (torn sidecar content, schema drift) must surface as a fail row
    // — an AnalysisException here killed the whole vintage report
    val dir = tmp("fsck_badkeys")
    mkLedger(dir)
    // write through the Hadoop FS so the CRC sidecar updates too —
    // a raw java.nio write trips the checksum and lands in the
    // torn-sidecar (layout_keys fail) class instead of this one
    val p = new org.apache.hadoop.fs.Path(dir, "_keys")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    out.write("no_such_column".getBytes("UTF-8")); out.close()
    val st = statuses(dir)
    assert(st("bucket_hash")._1 == "fail", s"got $st")
    assert(st("bucket_hash")._2.contains("recount failed"))
  }

  test("a ledger bucket missing its _applied watermark fails (replay would double-apply)") {
    val dir = tmp("fsck_wm")
    mkLedger(dir)
    assert(statuses(dir)("applied_watermarks")._1 == "ok")
    // plant: lose one bucket's watermark — the replay gate reads
    // None.forall(_ < batchId) = true and re-ADDS the batch there
    new java.io.File(dir, "bucket=0/_applied").delete()
    val st = statuses(dir)
    assert(st("applied_watermarks")._1 == "fail", s"got $st")
    assert(st("applied_watermarks")._2.contains("bucket=0"))
    // an unparseable watermark is the same corruption class (written
    // through the FS API so the checksum stays valid and only the
    // VALUE is bad)
    val dir2 = tmp("fsck_wm2")
    mkLedger(dir2)
    val fs = new org.apache.hadoop.fs.Path(dir2)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    BucketStore.writeSidecar(fs,
      new org.apache.hadoop.fs.Path(dir2, "bucket=0/_applied"),
      "not-a-long", overwrite = true)
    assert(statuses(dir2)("applied_watermarks")._1 == "fail")
    // and a TORN sidecar (raw overwrite invalidates the FS checksum →
    // the read itself throws) must audit as fail, not abort the fsck
    val dir3 = tmp("fsck_wm3")
    mkLedger(dir3)
    java.nio.file.Files.writeString(
      java.nio.file.Path.of(dir3, "bucket=0/_applied"), "torn")
    assert(statuses(dir3)("applied_watermarks")._1 == "fail",
      "a checksum-failing watermark is corruption, not a setup error")
  }

  test("a torn layout sidecar is a FAIL row, never an fsck abort") {
    // raw overwrite invalidates the local FS checksum → the sidecar
    // read THROWS; the audit must report corruption (page, exit 1),
    // not throw into HealthRun's NonFatal handler (exit 2, no page)
    val dir = tmp("fsck_torn")
    mkLedger(dir)
    java.nio.file.Files.writeString(
      java.nio.file.Path.of(dir, "_buckets"), "torn")
    val st = statuses(dir)
    assert(st("layout")._1 == "fail" && st("layout")._2.contains("unreadable"),
      s"got $st")
  }

  test("orphaned .old dirs are audited: readers serve them, so range and watermarks must cover them") {
    // a crash between the publish renames leaves bucket=N.old with no
    // live sibling — liveBucketDirs treats it as authoritative, so a
    // damaged orphan must not evade the audit until recovery goes live
    val dir = tmp("fsck_orphan")
    mkLedger(dir)
    val live = new java.io.File(dir, "bucket=0")
    val orphan = new java.io.File(dir, "bucket=0.old")
    assert(live.renameTo(orphan), "stage the orphan")
    new java.io.File(orphan, "_applied").delete()
    val st = statuses(dir)
    assert(st("applied_watermarks")._1 == "fail" &&
      st("applied_watermarks")._2.contains("bucket=0.old"), s"got $st")
    // and a FOREIGN orphan fails bucket_range like its live twin would
    val dir2 = tmp("fsck_orphan2")
    mkLedger(dir2) // modulus 2
    new java.io.File(dir2, "bucket=9.old").mkdirs()
    assert(statuses(dir2)("bucket_range")._1 == "fail")
  }

  test("a row in the wrong hash bucket fails bucket_hash with the misplaced count") {
    val dir = tmp("fsck_misplaced")
    mkLedger(dir)
    // plant: copy one bucket's parquet files into the OTHER bucket dir
    // — those rows no longer hash to their directory, the exact state
    // a touched-bucket merge can never see or repair
    val src = new java.io.File(dir, "bucket=0")
    val dst = new java.io.File(dir, "bucket=1")
    assert(src.exists() && dst.exists(), "test needs both buckets live")
    src.listFiles().filter(_.getName.endsWith(".parquet")).foreach { f =>
      java.nio.file.Files.copy(f.toPath,
        dst.toPath.resolve("planted_" + f.getName))
    }
    val st = statuses(dir)
    assert(st("bucket_hash")._1 == "fail", s"got $st")
    assert(st("bucket_hash")._2.contains("wrong bucket"))
  }
}
