package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamingLedger

/** Exactly-once additive ledger: stream ≡ batch group-sums under any
  * split, a replayed batch is a whole no-op, a crash BETWEEN bucket
  * swaps converges on replay (the skipped/re-applied split the
  * in-directory `_applied` watermark exists for), restart resumes on
  * the durable checkpoint, negative deltas correct, only touched
  * buckets rewrite, and empty ledgers read as zero rows. */
class LedgerStreamSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val schema = StructType(Seq(
    StructField("word", StringType), StructField("n", LongType),
    StructField("chars", LongType)))

  private def deltas(rows: (String, Long, Long)*): DataFrame = {
    import spark.implicits._
    rows.toDF("word", "n", "chars")
  }

  private def wordDeltas(words: String*): Seq[(String, Long, Long)] =
    words.map(w => (w, 1L, w.length.toLong))

  private def tmp(p: String): String =
    java.nio.file.Files.createTempDirectory(p).toString

  private def ledgerRows(dir: String): Map[String, (Long, Long)] =
    StreamingLedger.readLedger(spark, dir).collect()
      .map(r => r.getAs[String]("word") ->
        ((r.getAs[Long]("n"), r.getAs[Long]("chars")))).toMap

  private def batchSums(rows: Seq[(String, Long, Long)]): Map[String, (Long, Long)] =
    rows.groupBy(_._1).map { case (w, rs) =>
      w -> ((rs.map(_._2).sum, rs.map(_._3).sum)) }

  private def writeWave(dir: String, name: String, order: Int,
                        rows: Seq[(String, Long, Long)]): Unit = {
    deltas(rows: _*).coalesce(1).write.parquet(s"$dir/$name")
    val t = System.currentTimeMillis() - 600000 + order * 60000
    new java.io.File(s"$dir/$name").listFiles().foreach(_.setLastModified(t))
  }

  private def runSink(streamDir: String, ledgerDir: String): Unit = {
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$streamDir/f*")
    val q = StreamingLedger.ledgerSink(spark, stream, Seq("word"),
      Seq("n", "chars"), ledgerDir, buckets = 4)
    q.processAllAvailable()
    q.stop()
  }

  private val allRows = wordDeltas(
    "the", "cat", "the", "dog", "fish", "the", "cat",
    "bird", "dog", "the", "tree", "cat")

  test("stream ≡ batch group-sums under different batch splits") {
    val expected = batchSums(allRows)
    for ((split, i) <- Seq(Seq(4, 8, 12), Seq(7, 12)).zipWithIndex) {
      val streamDir = tmp(s"led_in$i")
      val ledgerDir = tmp(s"led_out$i")
      var prev = 0
      for ((end, j) <- split.zipWithIndex) {
        writeWave(streamDir, s"f$j", j, allRows.slice(prev, end))
        prev = end
      }
      runSink(streamDir, ledgerDir)
      assert(ledgerRows(ledgerDir) == expected, s"split $split")
    }
  }

  test("a replayed batch id is a whole no-op (addition made replay-safe)") {
    val dir = tmp("led_replay")
    val b1 = deltas(wordDeltas("the", "cat", "the"): _*)
    val b2 = deltas(wordDeltas("cat", "dog"): _*)
    StreamingLedger.applyBatch(spark, b1, Seq("word"), Seq("n", "chars"), dir, 4, 0L)
    StreamingLedger.applyBatch(spark, b2, Seq("word"), Seq("n", "chars"), dir, 4, 1L)
    val after = ledgerRows(dir)
    assert(after == batchSums(wordDeltas("the", "cat", "the", "cat", "dog")))
    StreamingLedger.applyBatch(spark, b2, Seq("word"), Seq("n", "chars"), dir, 4, 1L)
    assert(ledgerRows(dir) == after, "an at-least-once redelivery must not double-count")
    StreamingLedger.applyBatch(spark, b1, Seq("word"), Seq("n", "chars"), dir, 4, 0L)
    assert(ledgerRows(dir) == after, "an OLDER replayed id must not re-add either")
  }

  test("crash between bucket swaps: replay re-applies only the unswapped buckets") {
    val dir = tmp("led_crash")
    // enough distinct words that both buckets are touched by each batch
    val b1 = wordDeltas("the", "cat", "dog", "fish", "bird", "tree", "ant", "bee")
    val b2 = b1 ++ wordDeltas("the", "cat", "wasp")
    StreamingLedger.applyBatch(spark, deltas(b1: _*), Seq("word"),
      Seq("n", "chars"), dir, 2, 0L)
    // stash bucket 0's pre-batch-1 state (files are flat in the dir)
    def bucket(i: Int) = new java.io.File(dir, s"bucket=$i")
    val stash = java.nio.file.Files.createTempDirectory("led_stash")
    bucket(0).listFiles().foreach { f =>
      java.nio.file.Files.copy(f.toPath, stash.resolve(f.getName)) }
    StreamingLedger.applyBatch(spark, deltas(b2: _*), Seq("word"),
      Seq("n", "chars"), dir, 2, 1L)
    val converged = ledgerRows(dir)
    assert(converged == batchSums(b1 ++ b2))
    // crash window: bucket 1 swapped in with _applied=1, bucket 0
    // rolled back to its pre-batch state (data + _applied=0 together —
    // exactly what an unswapped bucket looks like after the crash)
    bucket(0).listFiles().foreach(_.delete()); bucket(0).delete()
    bucket(0).mkdirs()
    stash.toFile.listFiles().foreach { f =>
      java.nio.file.Files.copy(f.toPath, bucket(0).toPath.resolve(f.getName)) }
    assert(ledgerRows(dir) != converged, "the staged crash must be observable")
    // the replay foreachBatch fires with the SAME id: bucket 1 skips
    // (watermark 1 ≥ 1), bucket 0 re-applies — exactly once overall
    StreamingLedger.applyBatch(spark, deltas(b2: _*), Seq("word"),
      Seq("n", "chars"), dir, 2, 1L)
    assert(ledgerRows(dir) == converged,
      "replay after a partial crash must converge to the uncrashed ledger")
  }

  test("restart on the durable checkpoint resumes without re-adding") {
    val streamDir = tmp("led_rs_in")
    val ledgerDir = tmp("led_rs_out")
    writeWave(streamDir, "f0", 0, allRows.take(7))
    runSink(streamDir, ledgerDir)
    assert(ledgerRows(ledgerDir) == batchSums(allRows.take(7)))
    writeWave(streamDir, "f1", 1, allRows.drop(7))
    runSink(streamDir, ledgerDir) // same checkpoint + ledger
    assert(ledgerRows(ledgerDir) == batchSums(allRows),
      "resume must add only the new wave")
  }

  test("negative deltas correct the ledger") {
    val dir = tmp("led_neg")
    StreamingLedger.applyBatch(spark, deltas(("the", 5L, 15L)),
      Seq("word"), Seq("n", "chars"), dir, 4, 0L)
    StreamingLedger.applyBatch(spark, deltas(("the", -2L, -6L)),
      Seq("word"), Seq("n", "chars"), dir, 4, 1L)
    assert(ledgerRows(dir) == Map("the" -> ((3L, 9L))))
  }

  test("retract-to-zero purges the row: readouts stay ≡ a re-scan of the corrected corpus") {
    val dir = tmp("led_retract")
    StreamingLedger.applyBatch(spark,
      deltas(("the", 2L, 6L), ("cat", 1L, 3L)),
      Seq("word"), Seq("n", "chars"), dir, 4, 0L)
    // full retraction of "cat": all counters reach zero → no residue
    // (a zero row would inflate a vocab/hapax readout over the ledger)
    StreamingLedger.applyBatch(spark, deltas(("cat", -1L, -3L)),
      Seq("word"), Seq("n", "chars"), dir, 4, 1L)
    assert(ledgerRows(dir) == Map("the" -> ((2L, 6L))),
      "a fully-retracted key must leave no row")
    // partial retraction keeps the row — and a row with ONE zero
    // counter is not purged (only all-zero rows are residue)
    StreamingLedger.applyBatch(spark, deltas(("the", -2L, 0L)),
      Seq("word"), Seq("n", "chars"), dir, 4, 2L)
    assert(ledgerRows(dir) == Map("the" -> ((0L, 6L))))
  }

  test("retracting a bucket's every row still advances its watermark (empty-dir swap)") {
    val dir = tmp("led_retract_all")
    StreamingLedger.applyBatch(spark, deltas(("the", 1L, 3L)),
      Seq("word"), Seq("n", "chars"), dir, 1, 0L)
    StreamingLedger.applyBatch(spark, deltas(("the", -1L, -3L)),
      Seq("word"), Seq("n", "chars"), dir, 1, 1L)
    assert(ledgerRows(dir).isEmpty, "the ledger must read as empty")
    // the empty bucket's _applied must have advanced: a replay of the
    // retraction batch is a no-op, not a double-subtract
    StreamingLedger.applyBatch(spark, deltas(("the", -1L, -3L)),
      Seq("word"), Seq("n", "chars"), dir, 1, 1L)
    assert(ledgerRows(dir).isEmpty,
      "replaying the retraction must not re-apply it")
  }

  test("a new batch into a fully-retracted bucket merges cleanly (declared-schema read)") {
    // the wedge case: after full retraction the live bucket dir holds
    // only the hidden _applied sidecar — the writer's merge read must
    // use the _schema sidecar, or inference over zero visible files
    // throws and foreachBatch crashes identically on every replay
    val dir = tmp("led_retract_then_add")
    StreamingLedger.applyBatch(spark, deltas(("the", 1L, 3L)),
      Seq("word"), Seq("n", "chars"), dir, 1, 0L)
    StreamingLedger.applyBatch(spark, deltas(("the", -1L, -3L)),
      Seq("word"), Seq("n", "chars"), dir, 1, 1L)
    assert(ledgerRows(dir).isEmpty)
    StreamingLedger.applyBatch(spark, deltas(("cat", 2L, 6L)),
      Seq("word"), Seq("n", "chars"), dir, 1, 2L)
    assert(ledgerRows(dir) == Map("cat" -> ((2L, 6L))),
      "the empty live bucket must not wedge the next merge")
  }

  test("null deltas contribute zero — never stored as null, never purge-dropped") {
    val dir = tmp("led_null")
    val rows = java.util.Arrays.asList(
      org.apache.spark.sql.Row("the", null, 3L),
      org.apache.spark.sql.Row("the", 2L, null))
    val batch = spark.createDataFrame(rows, schema)
    StreamingLedger.applyBatch(spark, batch,
      Seq("word"), Seq("n", "chars"), dir, 4, 0L)
    assert(ledgerRows(dir) == Map("the" -> ((2L, 3L))),
      "null deltas are zero contributions")
    // an ALL-null counter column sums to zero, not null: the row with
    // another live counter must survive the purge filter exactly
    val rows2 = java.util.Arrays.asList(
      org.apache.spark.sql.Row("dog", null, 5L))
    StreamingLedger.applyBatch(spark, spark.createDataFrame(rows2, schema),
      Seq("word"), Seq("n", "chars"), dir, 4, 1L)
    assert(ledgerRows(dir)("dog") == ((0L, 5L)),
      "a (0, nonzero) row is live, not residue — the purge must be two-valued")
  }

  test("counter columns are a creation-time layout: a subset apply is rejected, not silently destructive") {
    import spark.implicits._
    val dir = tmp("led_ctr")
    StreamingLedger.applyBatch(spark, deltas(wordDeltas("the", "cat"): _*),
      Seq("word"), Seq("n", "chars"), dir, 2, 0L)
    val before = ledgerRows(dir)
    // a deploy that forgets a counter would have its merge PROJECT the
    // stored column away and swap the destroyed buckets in — the
    // _schema guard must reject it loudly instead
    val e = intercept[IllegalArgumentException] {
      StreamingLedger.applyBatch(spark,
        Seq(("the", 5L)).toDF("word", "n"),
        Seq("word"), Seq("n"), dir, 2, 1L)
    }
    assert(e.getMessage.contains("creation-time layout"))
    assert(ledgerRows(dir) == before, "the rejected apply must not touch data")
    // and a re-TYPED key is the same rejection class (it re-hashes
    // rows into different buckets)
    intercept[IllegalArgumentException] {
      StreamingLedger.applyBatch(spark,
        Seq((7, 1L, 1L)).toDF("word", "n", "chars"),
        Seq("word"), Seq("n", "chars"), dir, 2, 1L)
    }
  }

  test("key-column ORDER is a creation-time layout: a reordered apply is rejected") {
    import spark.implicits._
    val dir = tmp("led_keyorder")
    val two = Seq(("s1", 7L, 1L)).toDF("source", "fp", "n")
    StreamingLedger.applyBatch(spark, two, Seq("source", "fp"),
      Seq("n"), dir, 4, 0L)
    // groupBy is order-insensitive but xxhash64(keys...) is NOT:
    // silently accepting Seq(fp, source) would re-hash existing rows
    // outside the touched set and drop them with the staging dir
    val e = intercept[IllegalArgumentException] {
      StreamingLedger.applyBatch(spark, two, Seq("fp", "source"),
        Seq("n"), dir, 4, 1L)
    }
    assert(e.getMessage.contains("key columns"))
  }

  test("readLedger never deletes: a running writer's staging/.old survive a concurrent read") {
    val dir = tmp("led_read_safe")
    StreamingLedger.applyBatch(spark, deltas(("the", 1L, 3L)),
      Seq("word"), Seq("n", "chars"), dir, 1, 0L)
    // plant a mid-apply state: a writer's staging dir in flight, plus
    // completed-swap .old debris alongside its live sibling
    val staging = new java.io.File(dir, ".staging/bucket=0")
    staging.mkdirs()
    val old = new java.io.File(dir, "bucket=0.old")
    old.mkdirs()
    assert(ledgerRows(dir) == Map("the" -> ((1L, 3L))),
      "live rows win; .old with a live sibling is ignored")
    assert(staging.exists() && old.exists(),
      "the reader must leave the writer's files untouched — recovery is writer-side")
  }

  test("only touched buckets are rewritten") {
    val dir = tmp("led_prune")
    StreamingLedger.applyBatch(spark,
      deltas(wordDeltas((1 to 64).map(i => s"w$i"): _*): _*),
      Seq("word"), Seq("n", "chars"), dir, 8, 0L)
    val root = new java.io.File(dir)
    def fileSet(b: Int): Set[String] =
      Option(new java.io.File(root, s"bucket=$b").listFiles())
        .map(_.map(f => f.getName + ":" + f.lastModified()).toSet)
        .getOrElse(Set.empty)
    val before = (0 until 8).map(fileSet)
    StreamingLedger.applyBatch(spark, deltas(("w1", 1L, 2L)),
      Seq("word"), Seq("n", "chars"), dir, 8, 1L)
    val touched = (0 until 8).count(b => fileSet(b) != before(b))
    assert(touched == 1, s"exactly one bucket must be rewritten, got $touched")
    assert(ledgerRows(dir)("w1") == ((2L, 4L)))
  }

  test("ledger-fed vocab digest reproduces q106's corpus-scan spectrum exactly") {
    // the composition the ledger exists for: a stream of documents
    // keeps the (source, token-fp) count digest current; the spectrum
    // readout over the LEDGER equals the batch corpus scan
    val docs = graft.Tables.documents(spark, TestSpark.sf0001)
    val streamDir = tmp("led_vocab_in")
    val ledgerDir = tmp("led_vocab_out")
    docs.filter(col("doc_id") % 2 === 0).write.parquet(s"$streamDir/f0")
    docs.filter(col("doc_id") % 2 === 1).write.parquet(s"$streamDir/f1")
    val t0 = System.currentTimeMillis() - 600000
    Seq("f0", "f1").zipWithIndex.foreach { case (n, j) =>
      new java.io.File(s"$streamDir/$n").listFiles()
        .foreach(_.setLastModified(t0 + j * 60000)) }
    val stream = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$streamDir/f*")
      .select(col("source"),
        explode(split(col("text"), " ")).as("token"))
      .select(col("source"), xxhash64(col("token")).as("fp"),
        lit(1L).as("n"))
    val q = StreamingLedger.ledgerSink(spark, stream, Seq("source", "fp"),
      Seq("n"), ledgerDir, buckets = 8)
    q.processAllAvailable()
    q.stop()
    val fromLedger = graft.ops.Text.spectrumOfCounts(
      StreamingLedger.readLedger(spark, ledgerDir)).collect().map(_.toSeq).toSeq
    val fromScan = graft.ops.Text.tokenSpectrum(docs).collect().map(_.toSeq).toSeq
    assert(fromLedger == fromScan,
      "the incrementally-maintained digest must be indistinguishable from a re-scan")
  }

  test("ledger-fed BPE merge refresh reproduces the corpus-scan trainer exactly") {
    // the tokenizer-drift loop: a stream keeps the (word, count) vocab
    // ledger current; a merge REFRESH re-runs only the O(vocab)
    // iterations from the ledger — no corpus re-scan — and must learn
    // the identical merge table the full-scan trainer does
    val docs = graft.Tables.documents(spark, TestSpark.sf0001)
    val streamDir = tmp("led_bpe_in")
    val ledgerDir = tmp("led_bpe_out")
    docs.filter(col("doc_id") % 2 === 0).write.parquet(s"$streamDir/f0")
    docs.filter(col("doc_id") % 2 === 1).write.parquet(s"$streamDir/f1")
    val t0 = System.currentTimeMillis() - 600000
    Seq("f0", "f1").zipWithIndex.foreach { case (n, j) =>
      new java.io.File(s"$streamDir/$n").listFiles()
        .foreach(_.setLastModified(t0 + j * 60000)) }
    val stream = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$streamDir/f*")
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .select(col("w"), lit(1L).as("wc"))
    val q = StreamingLedger.ledgerSink(spark, stream, Seq("w"),
      Seq("wc"), ledgerDir, buckets = 8)
    q.processAllAvailable()
    q.stop()
    val fromLedger = graft.ops.Text.bpeTrainFromVocab(
      StreamingLedger.readLedger(spark, ledgerDir),
      graft.ops.Text.BpeMerges, endOfWord = true)
      .collect().map(_.toSeq).toSeq
    val fromScan = graft.ops.Text.bpeTrain(docs,
      graft.ops.Text.BpeMerges, endOfWord = true)
      .collect().map(_.toSeq).toSeq
    assert(fromLedger == fromScan,
      "a ledger-fed merge refresh must learn the identical merge table")
  }

  test("randomized: any batch sequence with corrections equals a driver brute force; random replays are no-ops") {
    // fixed seed — reproducible, and the repo's randomized-
    // characterization pattern: the property, not hand-picked cases
    val rnd = new scala.util.Random(20260815L)
    val words = (1 to 12).map(i => s"w$i")
    for (trial <- 0 until 3) {
      val dir = tmp(s"led_rand$trial")
      val truth = scala.collection.mutable.Map[String, (Long, Long)]()
      val applied = scala.collection.mutable.ArrayBuffer[Seq[(String, Long, Long)]]()
      for (batchId <- 0 until 6) {
        val batch = (0 until (1 + rnd.nextInt(8))).map { _ =>
          val w = words(rnd.nextInt(words.size))
          // corrections included: deltas may drive a key exactly to zero
          val n = (rnd.nextInt(5) - 2).toLong
          val c = (rnd.nextInt(7) - 3).toLong
          (w, n, c)
        }
        applied += batch
        StreamingLedger.applyBatch(spark, deltas(batch: _*),
          Seq("word"), Seq("n", "chars"), dir, 3, batchId.toLong)
        batch.foreach { case (w, n, c) =>
          val (pn, pc) = truth.getOrElse(w, (0L, 0L))
          truth(w) = (pn + n, pc + c)
        }
        // a random already-applied batch replays as a whole no-op
        val rb = rnd.nextInt(applied.size)
        StreamingLedger.applyBatch(spark, deltas(applied(rb): _*),
          Seq("word"), Seq("n", "chars"), dir, 3, rb.toLong)
        val expect = truth.filter { case (_, (n, c)) => n != 0 || c != 0 }.toMap
        assert(ledgerRows(dir) == expect,
          s"trial $trial batch $batchId: ledger must equal the running truth (minus all-zero rows)")
      }
    }
  }

  test("consistent read: quiet store reads equal readLedger; a racing writer forces one retry") {
    val dir = tmp("led_cons")
    val b1 = wordDeltas("the", "cat", "dog", "fish")
    StreamingLedger.applyBatch(spark, deltas(b1: _*), Seq("word"),
      Seq("n", "chars"), dir, 4, 0L)
    // quiet store: one attempt, rows ≡ the plain read
    def rows(df: DataFrame): Map[String, (Long, Long)] =
      df.collect().map(r => r.getAs[String]("word") ->
        ((r.getAs[Long]("n"), r.getAs[Long]("chars")))).toMap
    assert(rows(StreamingLedger.readLedgerConsistent(spark, dir)) ==
      ledgerRows(dir))
    // racing writer via the test seam: a second batch lands BETWEEN
    // materialization and validation — attempt 1 must be rejected
    // (its watermarks moved) and attempt 2 must return the POST-batch
    // ledger, not the torn capture
    val b2 = wordDeltas("the", "wasp")
    var fired = false
    val got = StreamingLedger.readLedgerConsistent(spark, dir,
      beforeValidate = () => if (!fired) {
        fired = true
        StreamingLedger.applyBatch(spark, deltas(b2: _*), Seq("word"),
          Seq("n", "chars"), dir, 4, 1L)
      })
    assert(fired, "the seam must have raced the first attempt")
    assert(rows(got) == batchSums(b1 ++ b2),
      "the accepted read must be the post-batch consistent cut")
  }

  test("consistent read refuses a busy store (debris) and throws after maxAttempts") {
    val dir = tmp("led_cons_busy")
    StreamingLedger.applyBatch(spark, deltas(wordDeltas("the", "cat"): _*),
      Seq("word"), Seq("n", "chars"), dir, 2, 0L)
    // crash-pending debris: the store is legitimately half-applied
    // until the writer's replay converges it — a consistent read must
    // refuse, not return a cut that silently misses a bucket
    new java.io.File(dir, "bucket=0.old").mkdirs()
    val e = intercept[IllegalStateException] {
      StreamingLedger.readLedgerConsistent(spark, dir, maxAttempts = 2)
    }
    assert(e.getMessage.contains("no consistent ledger read"))
    // plain readLedger stays available (never corrupts, may be torn)
    assert(ledgerRows(dir).nonEmpty)
  }

  test("empty and not-yet-written ledgers read as zero rows; bucket column rejected") {
    assert(StreamingLedger.readLedger(spark, tmp("led_empty")).count() == 0L)
    val dir = tmp("led_schema")
    StreamingLedger.applyBatch(spark, deltas(("the", 1L, 3L)),
      Seq("word"), Seq("n", "chars"), dir, 4, 0L)
    // wipe the buckets but keep the sidecars: schema survives
    new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("bucket=")).foreach { d =>
        d.listFiles().foreach(_.delete()); d.delete() }
    val empty = StreamingLedger.readLedger(spark, dir)
    assert(empty.count() == 0L &&
      empty.columns.toSeq == Seq("word", "n", "chars"))
    import spark.implicits._
    val e = intercept[IllegalArgumentException] {
      StreamingLedger.applyBatch(spark, Seq(("x", 1L)).toDF("word", "bucket"),
        Seq("word"), Seq("bucket"), tmp("led_reserved"), 4, 0L)
    }
    assert(e.getMessage.contains("reserved"))
  }

  test("checkpoint wipe against an existing ledger fails loudly — exactly-once is per-lineage") {
    // the _applied watermarks order RAW batch ids: a wiped checkpoint
    // restarting at 0 would have every new batch silently SKIPPED as
    // already-applied (and a lineage-keyed watermark would instead
    // double-apply re-served data) — the guard refuses both silent
    // failure modes before anything is read or written
    val streamDir = tmp("led_wipe_in")
    val ledgerDir = tmp("led_wipe_out")
    writeWave(streamDir, "f0", 0, allRows.take(7))
    runSink(streamDir, ledgerDir)
    val before = ledgerRows(ledgerDir)
    assert(before == batchSums(allRows.take(7)))

    val cp = new java.io.File(s"$ledgerDir/_checkpoint")
    java.nio.file.Files.walk(cp.toPath)
      .sorted(java.util.Comparator.reverseOrder())
      .forEach(p => java.nio.file.Files.delete(p))
    writeWave(streamDir, "f1", 1, allRows.drop(7))
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$streamDir/f*")
    val q = StreamingLedger.ledgerSink(spark, stream, Seq("word"),
      Seq("n", "chars"), ledgerDir, buckets = 4)
    val ex = intercept[Exception] { q.processAllAvailable() }
    def msgs(t: Throwable): String = Iterator.iterate(t)(_.getCause)
      .takeWhile(_ != null).map(m => Option(m.getMessage).getOrElse("")).mkString("|")
    assert(msgs(ex).contains("lineage"), s"expected the lineage guard, got: ${msgs(ex)}")
    q.stop()
    assert(ledgerRows(ledgerDir) == before,
      "refusal must leave the ledger byte-identical — no skip, no double-apply")
  }
}
