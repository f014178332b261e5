package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.IncrementalNovelty
import graft.streaming.StreamingNovelty

/** Streaming novelty ingest: micro-batch scores equal the manual
  * screen-then-append replay, and the self-attribution rule makes a
  * replayed screen-after-append (the at-least-once crash window)
  * return identical scores against the mutated index. */
class StreamingNoveltySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val docSchema = StructType(Seq(
    StructField("source", StringType),
    StructField("doc_id", LongType),
    StructField("text", StringType)))

  private def resetTable(name: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $name")
    val wh = new java.io.File(s"/tmp/graft-test-warehouse/$name")
    if (wh.exists()) {
      java.nio.file.Files.walk(wh.toPath)
        .sorted(java.util.Comparator.reverseOrder())
        .forEach(p => java.nio.file.Files.delete(p))
    }
  }

  private def docsDF(rows: (String, Long, String)*) = {
    import spark.implicits._
    rows.toDF("source", "doc_id", "text")
  }

  private val freshA = (1 to 10).map(i => s"x$i").mkString(" ")
  private val freshB = (1 to 10).map(i => s"y$i").mkString(" ")
  private val baseText = (1 to 10).map(i => s"w$i").mkString(" ")

  test("scored ingest: per-batch novelty verdicts against everything ingested before") {
    resetTable("novelty_stream_idx")
    val base = docsDF(("a", 0L, baseText))
    IncrementalNovelty.buildIndex(base, "novelty_stream_idx")

    val streamDir = java.nio.file.Files.createTempDirectory("snov_in").toString
    val outDir = java.nio.file.Files.createTempDirectory("snov_out").toString
    docsDF(("a", 10L, freshA), ("a", 11L, baseText))
      .coalesce(1).write.parquet(streamDir + "/f1")
    docsDF(("a", 20L, freshA), ("a", 21L, freshB))
      .coalesce(1).write.parquet(streamDir + "/f2")
    // FileStreamSource orders by modification time — force f1 strictly
    // before f2 (same-ms writes otherwise make batch order racy)
    def stamp(dir: String, t: Long): Unit =
      new java.io.File(dir).listFiles().foreach(_.setLastModified(t))
    val t0 = System.currentTimeMillis() - 120000
    stamp(streamDir + "/f1", t0); stamp(streamDir + "/f2", t0 + 60000)

    val stream = spark.readStream.schema(docSchema)
      .option("maxFilesPerTrigger", "1")
      .parquet(streamDir + "/f*")
    val q = StreamingNovelty.scoredIngest(
      spark, stream, "novelty_stream_idx", outDir)
    q.processAllAvailable()
    q.stop()

    val scores = spark.read.parquet(s"$outDir/scores")
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("novelty"))
      .toMap
    assert(scores.keySet == Set(10L, 11L, 20L, 21L))
    assert(scores(10L) == 1.0, "fresh content in batch 1 is fully novel")
    assert(scores(11L) == 0.0, "a restatement of the indexed corpus scores zero")
    assert(scores(20L) == 0.0, "a restatement of BATCH 1's content scores zero: " +
      "the append between micro-batches is what the static-index decontam twin lacks")
    assert(scores(21L) == 1.0, "fresh content in batch 2 is fully novel")

    // stream ≡ manual replay: the same batches through the batch API
    resetTable("novelty_replay_twin_idx")
    IncrementalNovelty.buildIndex(base, "novelty_replay_twin_idx")
    val manual = Seq(
      docsDF(("a", 10L, freshA), ("a", 11L, baseText)),
      docsDF(("a", 20L, freshA), ("a", 21L, freshB))
    ).flatMap { b =>
      val s = IncrementalNovelty
        .screenBatch(spark, b, "novelty_replay_twin_idx")
        .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("novelty"))
      IncrementalNovelty.appendToIndex(b, "novelty_replay_twin_idx")
      s
    }.toMap
    assert(manual == scores, "stream and manual replay must agree exactly")
    resetTable("novelty_stream_idx"); resetTable("novelty_replay_twin_idx")
  }

  test("replay window: screen-after-append returns identical scores; re-append adds nothing") {
    resetTable("novelty_idem_idx")
    IncrementalNovelty.buildIndex(docsDF(("a", 0L, baseText)), "novelty_idem_idx")
    val batch = docsDF(("a", 5L, freshA), ("a", 6L, baseText), ("a", 7L, freshA))
    def screen() = IncrementalNovelty.screenBatch(spark, batch, "novelty_idem_idx")
      .collect().map(r => (r.getAs[Long]("doc_id"),
        r.getAs[Long]("total"), r.getAs[Long]("novel"))).sortBy(_._1).toSeq
    val before = screen()
    IncrementalNovelty.appendToIndex(batch, "novelty_idem_idx")
    val n1 = spark.table("novelty_idem_idx").count()
    val after = screen()
    assert(after == before,
      "self-attribution must make the post-append re-screen (crash replay) identical")
    // and doc 5 (batch-first) kept its novelty through its own append
    assert(before.find(_._1 == 5L).get._3 > 0L)
    assert(before.find(_._1 == 7L).get._3 == 0L, "batch-second copy is never novel")
    IncrementalNovelty.appendToIndex(batch, "novelty_idem_idx")
    assert(spark.table("novelty_idem_idx").count() == n1,
      "replayed append must add nothing (anti-join dedup)")
    resetTable("novelty_idem_idx")
  }

  test("checkpoint wipe: re-using the scores outDir fails loudly; the index itself is wipe-safe") {
    // the r16 lineage guard extended to the scores sink: a wiped
    // checkpoint restarts batch ids, which would stomp the prior
    // lineage's scores/batch_id= dirs. (The INDEX needs no epoch tag
    // here — self-attribution is doc_id-keyed, so redelivered docs
    // reproduce their original verdicts in any lineage.)
    resetTable("novelty_wipe_idx")
    IncrementalNovelty.buildIndex(docsDF(("a", 0L, baseText)), "novelty_wipe_idx")
    val streamDir = java.nio.file.Files.createTempDirectory("snov_w_in").toString
    val outDir = java.nio.file.Files.createTempDirectory("snov_w_out").toString
    docsDF(("a", 10L, freshA)).coalesce(1).write.parquet(streamDir + "/f1")
    def start() = StreamingNovelty.scoredIngest(spark,
      spark.readStream.schema(docSchema).option("maxFilesPerTrigger", "1")
        .parquet(streamDir + "/f*"),
      "novelty_wipe_idx", outDir)
    val q1 = start(); q1.processAllAvailable(); q1.stop()
    val before = spark.read.parquet(s"$outDir/scores")
      .collect().map(_.toString).sorted.toSeq
    assert(before.nonEmpty)

    val cp = new java.io.File(s"$outDir/_checkpoint")
    java.nio.file.Files.walk(cp.toPath)
      .sorted(java.util.Comparator.reverseOrder())
      .forEach(p => java.nio.file.Files.delete(p))
    val q2 = start()
    val ex = intercept[Exception] { q2.processAllAvailable() }
    def msgs(t: Throwable): String = Iterator.iterate(t)(_.getCause)
      .takeWhile(_ != null).map(m => Option(m.getMessage).getOrElse("")).mkString("|")
    assert(msgs(ex).contains("lineage"), s"expected the lineage guard, got: ${msgs(ex)}")
    q2.stop()
    assert(spark.read.parquet(s"$outDir/scores")
      .collect().map(_.toString).sorted.toSeq == before,
      "refusal must leave the prior lineage's scores untouched")
    resetTable("novelty_wipe_idx")
  }
}
