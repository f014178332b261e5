package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.IncrementalDedup
import graft.streaming.StreamingDedup

class StreamingDedupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val docSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType)))

  test("micro-batches dedup against the index AND earlier batches; uniques append") {
    spark.sql("DROP TABLE IF EXISTS stream_dedup_index")
    val wh = new java.io.File("/tmp/graft-test-warehouse/stream_dedup_index")
    if (wh.exists()) {
      java.nio.file.Files.walk(wh.toPath)
        .sorted(java.util.Comparator.reverseOrder())
        .forEach(p => java.nio.file.Files.delete(p))
    }
    import spark.implicits._

    // seed corpus (indexed before the stream starts)
    val seed = Seq(
      (0L, "alpha beta gamma delta epsilon zeta"),
      (1L, "one two three four five six seven")).toDF("doc_id", "text")
    IncrementalDedup.buildIndex(seed, "stream_dedup_index")

    // two stream files = two micro-batches (maxFilesPerTrigger=1):
    //  batch A: a fresh doc + an exact dup of seed doc 0
    //  batch B: a fresh doc + an exact dup of batch A's fresh doc
    val streamDir = java.nio.file.Files.createTempDirectory("sdedup_in").toString
    val outDir = java.nio.file.Files.createTempDirectory("sdedup_out").toString + "/uniques"
    Seq((100L, "totally new content about maps and layers"),
        (101L, "alpha beta gamma delta epsilon zeta")) // dup of seed 0
      .toDF("doc_id", "text").coalesce(1).write.parquet(streamDir + "/f1")
    Seq((200L, "another brand new document entirely here"),
        (201L, "totally new content about maps and layers")) // dup of 100
      .toDF("doc_id", "text").coalesce(1).write.parquet(streamDir + "/f2")

    val stream = spark.readStream.schema(docSchema)
      .option("maxFilesPerTrigger", "1")
      .parquet(streamDir + "/f*")
    val q = StreamingDedup.dedupedIngest(spark, stream, "stream_dedup_index", outDir)
    q.processAllAvailable()
    q.stop()

    val got = spark.read.parquet(outDir).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(got == Set(100L, 200L),
      s"expected only the two fresh docs to survive, got $got")
    // the index absorbed exactly the survivors
    val indexed = spark.table("stream_dedup_index")
      .select("doc_id").distinct().collect().map(_.getLong(0)).toSet
    assert(indexed == Set(0L, 1L, 100L, 200L))
  }

  test("replay against an index already holding the batch's own docs converges — no self-match data loss") {
    // the crash window: a batch's appendToIndex lands, the process
    // dies BEFORE the streaming checkpoint commits, and the replay
    // probes an index containing the batch's own signatures. Without
    // probeBatch's self-match exclusion every survivor matches itself
    // at est_jaccard 1.0 and the overwrite-by-batch-id replay rewrites
    // the batch dir EMPTY. Simulated FAITHFULLY (round 16): same
    // checkpoint with its commit log truncated — a real crash keeps
    // the checkpoint (same query id, same epoch tag); a FRESH
    // checkpoint is a new LINEAGE, which is the wipe test below, not
    // a replay.
    spark.sql("DROP TABLE IF EXISTS stream_dedup_index3")
    val wh = new java.io.File("/tmp/graft-test-warehouse/stream_dedup_index3")
    if (wh.exists()) {
      java.nio.file.Files.walk(wh.toPath)
        .sorted(java.util.Comparator.reverseOrder())
        .forEach(p => java.nio.file.Files.delete(p))
    }
    import spark.implicits._
    IncrementalDedup.buildIndex(
      Seq((0L, "seed document with some words")).toDF("doc_id", "text"),
      "stream_dedup_index3")
    val streamDir = java.nio.file.Files.createTempDirectory("sdedup3_in").toString
    val outDir = java.nio.file.Files.createTempDirectory("sdedup3_out").toString + "/uniques"
    Seq((400L, "fresh content the index has never seen"),
        (401L, "other new words entirely distinct again"))
      .toDF("doc_id", "text").coalesce(1).write.parquet(streamDir + "/f1")
    val cp = java.nio.file.Files.createTempDirectory("sdedup3_cp").toString
    def run(): Unit = {
      val stream = spark.readStream.schema(docSchema)
        .option("maxFilesPerTrigger", "1").parquet(streamDir + "/f*")
      val q = StreamingDedup.dedupedIngest(spark, stream,
        "stream_dedup_index3", outDir, checkpointDir = Some(cp))
      q.processAllAvailable()
      q.stop()
    }
    run()
    def corpus(): Set[Long] = spark.read.parquet(outDir)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(corpus() == Set(400L, 401L))
    // crash-before-commit: the offset WAL survives, the commit record
    // does not — the restarted query re-runs batch 0 against an index
    // already holding the batch's own signatures
    val commit0 = new java.io.File(s"$cp/commits/0")
    assert(commit0.exists(), "test setup: batch 0 commit record expected")
    assert(commit0.delete())
    // the local-FS checksum sibling too, or the replay's commit write
    // fails its rename with FileAlreadyExists
    new java.io.File(s"$cp/commits/.0.crc").delete()
    run() // the replay
    assert(corpus() == Set(400L, 401L),
      "a replayed batch must not be deleted by its own index entries")
    // doubled index rows are allowed; the distinct doc set is not
    val indexed = spark.table("stream_dedup_index3")
      .select("doc_id").distinct().collect().map(_.getLong(0)).toSet
    assert(indexed == Set(0L, 400L, 401L))
  }

  test("checkpoint WIPE is a new lineage: outDir re-use fails loudly, fresh-outDir redelivery dedups") {
    // the round-15 verdict sweep target: after a checkpoint wipe the
    // batch id sequence restarts, so a NEW batch 0 claims the same id
    // as the long-gone batch 0 whose rows the index still holds. With
    // the raw-id exclusion a redelivered doc skipped its own
    // historical entries ("my replay's rows") and landed duplicated;
    // the epoch tag scopes exclusion to the checkpoint lineage.
    spark.sql("DROP TABLE IF EXISTS stream_dedup_index5")
    val wh = new java.io.File("/tmp/graft-test-warehouse/stream_dedup_index5")
    if (wh.exists()) {
      java.nio.file.Files.walk(wh.toPath)
        .sorted(java.util.Comparator.reverseOrder())
        .forEach(p => java.nio.file.Files.delete(p))
    }
    import spark.implicits._
    IncrementalDedup.buildIndex(
      Seq((0L, "seed document with some words")).toDF("doc_id", "text"),
      "stream_dedup_index5")
    val streamDir = java.nio.file.Files.createTempDirectory("sdedup5_in").toString
    val outDirA = java.nio.file.Files.createTempDirectory("sdedup5_outA").toString + "/uniques"
    Seq((600L, "lineage test fresh content never seen"),
        (601L, "second fresh document of the first lineage"))
      .toDF("doc_id", "text").coalesce(1).write.parquet(streamDir + "/f1")
    def stream() = spark.readStream.schema(docSchema)
      .option("maxFilesPerTrigger", "1").parquet(streamDir + "/f*")
    val q1 = StreamingDedup.dedupedIngest(spark, stream(), "stream_dedup_index5", outDirA)
    q1.processAllAvailable(); q1.stop()
    def docsIn(dir: String): Set[Long] = spark.read.parquet(dir)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(docsIn(outDirA) == Set(600L, 601L))

    // wipe the checkpoint; re-using the SAME outDir must fail loudly
    // (the new lineage's restarted ids would stomp batch_id=0)
    val cpA = new java.io.File(s"$outDirA/_checkpoint")
    java.nio.file.Files.walk(cpA.toPath)
      .sorted(java.util.Comparator.reverseOrder())
      .forEach(p => java.nio.file.Files.delete(p))
    val q2 = StreamingDedup.dedupedIngest(spark, stream(), "stream_dedup_index5", outDirA)
    val ex = intercept[Exception] { q2.processAllAvailable() }
    def msgs(t: Throwable): String = Iterator.iterate(t)(_.getCause)
      .takeWhile(_ != null).map(m => Option(m.getMessage).getOrElse("")).mkString("|")
    assert(msgs(ex).contains("lineage"), s"expected the lineage guard, got: ${msgs(ex)}")
    q2.stop()
    assert(docsIn(outDirA) == Set(600L, 601L),
      "the guard must fire BEFORE anything of the old lineage's output is touched")

    // a fresh outDir under the new lineage: the re-served docs match
    // their own first-lineage index entries and drop as duplicates
    val outDirB = java.nio.file.Files.createTempDirectory("sdedup5_outB").toString + "/uniques"
    val q3 = StreamingDedup.dedupedIngest(spark, stream(), "stream_dedup_index5", outDirB)
    q3.processAllAvailable(); q3.stop()
    assert(docsIn(outDirB) == Set.empty,
      "cross-lineage redelivery must dedup against the retained index")
    assert(docsIn(outDirA) == Set(600L, 601L), "first lineage's corpus stays intact")
  }

  test("same doc_id redelivered in a LATER batch dedups against its own index entry") {
    // the OTHER redelivery mode (round-13 advice): an at-least-once
    // source re-sends a doc_id in a later batch — OUTSIDE checkpoint
    // replay, so the batch id differs. A blanket same-id self-match
    // filter (the round-13 fix's first form) made that doc invisible
    // to its own index entry and it landed duplicated across two
    // batch_id dirs; the batch-scoped exclusion must let it match.
    spark.sql("DROP TABLE IF EXISTS stream_dedup_index4")
    val wh = new java.io.File("/tmp/graft-test-warehouse/stream_dedup_index4")
    if (wh.exists()) {
      java.nio.file.Files.walk(wh.toPath)
        .sorted(java.util.Comparator.reverseOrder())
        .forEach(p => java.nio.file.Files.delete(p))
    }
    import spark.implicits._
    IncrementalDedup.buildIndex(
      Seq((0L, "seed document with some words")).toDF("doc_id", "text"),
      "stream_dedup_index4")
    val streamDir = java.nio.file.Files.createTempDirectory("sdedup4_in").toString
    val outDir = java.nio.file.Files.createTempDirectory("sdedup4_out").toString + "/uniques"
    Seq((500L, "content that will be redelivered later on"))
      .toDF("doc_id", "text").coalesce(1).write.parquet(streamDir + "/f1")
    Seq((500L, "content that will be redelivered later on"), // redelivery
        (501L, "a genuinely new second batch document"))
      .toDF("doc_id", "text").coalesce(1).write.parquet(streamDir + "/f2")
    val stream = spark.readStream.schema(docSchema)
      .option("maxFilesPerTrigger", "1").parquet(streamDir + "/f*")
    val q = StreamingDedup.dedupedIngest(spark, stream, "stream_dedup_index4", outDir)
    q.processAllAvailable()
    q.stop()
    val rows = spark.read.parquet(outDir).select("doc_id")
      .collect().map(_.getLong(0)).toSeq
    assert(rows.sorted == Seq(500L, 501L),
      s"redelivered doc_id must land exactly once across batch dirs, got $rows")
  }

  test("batch-internal dup (same micro-batch) is also dropped") {
    spark.sql("DROP TABLE IF EXISTS stream_dedup_index2")
    val wh = new java.io.File("/tmp/graft-test-warehouse/stream_dedup_index2")
    if (wh.exists()) {
      java.nio.file.Files.walk(wh.toPath)
        .sorted(java.util.Comparator.reverseOrder())
        .forEach(p => java.nio.file.Files.delete(p))
    }
    import spark.implicits._
    IncrementalDedup.buildIndex(
      Seq((0L, "seed document with some words")).toDF("doc_id", "text"),
      "stream_dedup_index2")

    val streamDir = java.nio.file.Files.createTempDirectory("sdedup2_in").toString
    val outDir = java.nio.file.Files.createTempDirectory("sdedup2_out").toString + "/uniques"
    Seq((300L, "identical twins inside one single batch"),
        (301L, "identical twins inside one single batch"))
      .toDF("doc_id", "text").coalesce(1).write.parquet(streamDir + "/f1")

    val stream = spark.readStream.schema(docSchema)
      .option("maxFilesPerTrigger", "1").parquet(streamDir + "/f*")
    val q = StreamingDedup.dedupedIngest(spark, stream, "stream_dedup_index2", outDir)
    q.processAllAvailable()
    q.stop()

    val got = spark.read.parquet(outDir).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(got == Set(300L), s"lowest id should win within a batch, got $got")
  }
}
