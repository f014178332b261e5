package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Curation, IncrementalDecontam}
import graft.streaming.StreamingDecontam

class StreamingDecontamSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val docSchema = StructType(Seq(
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
    new java.io.File(s"/tmp/graft-test-warehouse/${name}_bloom.bin").delete()
  }

  // a 5-gram planted verbatim in leaked docs below
  private val evalSpan = "the quick brown fox jumps"

  test("screenBatch counts distinct contaminated shingles per doc") {
    resetTable("decontam_index_unit")
    import spark.implicits._
    val test = Seq(
      (0L, s"$evalSpan over the lazy dog"),
      (1L, "completely unrelated benchmark question here indeed")
    ).toDF("doc_id", "text")
    IncrementalDecontam.buildTestIndex(test, "decontam_index_unit")

    val batch = Seq(
      // shares exactly the 4 distinct 5-grams of "the quick brown fox
      // jumps over the lazy" with test doc 0 (a 8-token overlap span)
      (10L, "prefix words the quick brown fox jumps over the lazy suffix"),
      (11L, "nothing in common with any eval document at all"),
      (12L, "short doc")  // under 5 tokens: zero shingles, never flagged
    ).toDF("doc_id", "text")

    val got = IncrementalDecontam.screenBatch(spark, batch, "decontam_index_unit")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.keySet == Set(10L), s"only the leaked doc flags, got $got")
    assert(got(10L) == 4L,
      s"8-token shared span = 4 distinct 5-grams, got ${got(10L)}")
  }

  test("bloom sidecar: written at build, pre-screen invisible, loss degrades gracefully") {
    resetTable("decontam_index_bloom")
    import spark.implicits._
    val test = Seq((0L, s"alpha beta $evalSpan gamma delta")).toDF("doc_id", "text")
    val batch = Seq(
      (30L, s"leading $evalSpan trailing words to pad this out"),
      (31L, "an entirely clean document sharing nothing with the benchmark"))
      .toDF("doc_id", "text")
    IncrementalDecontam.buildTestIndex(test, "decontam_index_bloom")
    val sidecar = new java.io.File("/tmp/graft-test-warehouse/decontam_index_bloom_bloom.bin")
    assert(sidecar.isFile && sidecar.length() > 0, "build must write the bloom sidecar")
    val screened = IncrementalDecontam
      .screenBatch(spark, batch, "decontam_index_bloom")
      .collect().map(_.toString).sorted.toSeq
    assert(sidecar.delete())
    val unscreened = IncrementalDecontam
      .screenBatch(spark, batch, "decontam_index_bloom")
      .collect().map(_.toString).sorted.toSeq
    assert(screened == unscreened,
      s"bloom pre-screen must not change probe results:\n$screened\nvs\n$unscreened")
  }

  test("screenBatch agrees with the batch decontaminate path") {
    resetTable("decontam_index_agree")
    import spark.implicits._
    val test = Seq((0L, s"alpha beta $evalSpan gamma delta"))
      .toDF("doc_id", "text")
    val train = Seq(
      (20L, s"intro $evalSpan outro words making this long enough"),
      (21L, "a clean training document with no overlap whatsoever today"))
      .toDF("doc_id", "text").withColumn("source", lit("s1"))

    IncrementalDecontam.buildTestIndex(test, "decontam_index_agree")
    val inc = IncrementalDecontam.screenBatch(spark, train, "decontam_index_agree")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val batchPath = Curation.decontaminate(train, test.withColumn("source", lit("t")))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // batch path: 2 train docs in source s1, 1 contaminated, max_hits =
    // the incremental path's n_hits for the leaked doc
    assert(batchPath.toSeq == Seq(("s1", 2L, 1L, inc(20L))))
    assert(inc.keySet == Set(20L))
  }

  test("planted cross-batch leakage is quarantined; clean docs pass") {
    resetTable("decontam_index_stream")
    import spark.implicits._
    val test = Seq(
      (0L, s"$evalSpan over the lazy dog"),
      (1L, "benchmark answer text that must stay out of training"))
      .toDF("doc_id", "text")
    IncrementalDecontam.buildTestIndex(test, "decontam_index_stream")

    // two stream files = two micro-batches, each with one leak
    val streamDir = java.nio.file.Files.createTempDirectory("sdecon_in").toString
    val outDir = java.nio.file.Files.createTempDirectory("sdecon_out").toString
    Seq((100L, "a perfectly clean first document about map layers"),
        (101L, s"leaked paragraph containing $evalSpan in the middle"))
      .toDF("doc_id", "text").coalesce(1).write.parquet(streamDir + "/f1")
    Seq((200L, "second batch clean content goes straight through"),
        (201L, "benchmark answer text that must stay out of training"))
      .toDF("doc_id", "text").coalesce(1).write.parquet(streamDir + "/f2")

    val stream = spark.readStream.schema(docSchema)
      .option("maxFilesPerTrigger", "1")
      .parquet(streamDir + "/f*")
    val q = StreamingDecontam.screenedIngest(
      spark, stream, "decontam_index_stream", outDir)
    q.processAllAvailable()
    q.stop()

    val clean = spark.read.parquet(s"$outDir/clean")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(clean == Set(100L, 200L), s"clean docs only, got $clean")
    val quarantined = spark.read.parquet(s"$outDir/quarantine")
      .select("doc_id", "n_hits")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(quarantined.keySet == Set(101L, 201L),
      s"both planted leaks caught, got $quarantined")
    assert(quarantined.values.forall(_ >= 1L))
  }

  test("restart on the durable checkpoint continues batch ids instead of replaying") {
    resetTable("decontam_index_restart")
    import spark.implicits._
    val test = Seq((0L, s"$evalSpan over the lazy dog")).toDF("doc_id", "text")
    IncrementalDecontam.buildTestIndex(test, "decontam_index_restart")
    val streamDir = java.nio.file.Files.createTempDirectory("sdecon_rs_in").toString
    val outDir = java.nio.file.Files.createTempDirectory("sdecon_rs_out").toString
    def writeFile(name: String, id: Long): Unit =
      Seq((id, s"clean document number $id about nothing relevant"))
        .toDF("doc_id", "text").coalesce(1).write.parquet(s"$streamDir/$name")
    def cleanBatchDirs(): Set[String] =
      Option(new java.io.File(s"$outDir/clean").listFiles()).getOrElse(Array.empty)
        .map(_.getName).filter(_.startsWith("batch_id=")).toSet
    def start() = StreamingDecontam.screenedIngest(spark,
      spark.readStream.schema(docSchema).option("maxFilesPerTrigger", "1")
        .parquet(s"$streamDir/f*"),
      "decontam_index_restart", outDir)

    writeFile("f1", 300L); writeFile("f2", 301L)
    val q1 = start(); q1.processAllAvailable(); q1.stop()
    assert(new java.io.File(s"$outDir/_checkpoint").exists(),
      "checkpoint must default to a durable location under outDir")
    assert(cleanBatchDirs() == Set("batch_id=0", "batch_id=1"))

    // a third file lands while the stream is down; the RESTARTED query
    // must number it after the processed batches — on a fresh temp
    // checkpoint it would restart at batch 0 and stomp the first sink dir
    writeFile("f3", 302L)
    val q2 = start(); q2.processAllAvailable(); q2.stop()
    assert(cleanBatchDirs() == Set("batch_id=0", "batch_id=1", "batch_id=2"),
      "restart must continue numbering, not replay from zero")
    val docs = spark.read.parquet(s"$outDir/clean").select("doc_id")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(docs == Seq(300L, 301L, 302L), s"no duplicates or losses, got $docs")
  }
}
