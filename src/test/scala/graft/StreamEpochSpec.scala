package graft.streaming

import org.scalatest.funsuite.AnyFunSuite

/** Unit pins for the checkpoint-lineage tag mechanics — the e2e wipe
  * behavior lives in the sink specs (spans/dedup/novelty/quantile/
  * ledger); this pins the invariants those rely on. (Lives in the
  * streaming package: StreamEpoch is private[streaming].) */
class StreamEpochSpec extends AnyFunSuite {
  lazy val spark = graft.TestSpark.spark

  test("tag is non-negative — can never collide with the batch API's NoBatch sentinel") {
    // sign bit cleared by construction; sweep a spread of ids
    val ids = Seq("a", "b", "00000000-0000-0000-0000-000000000000",
      java.util.UUID.randomUUID().toString)
    for (qid <- ids; b <- Seq(0L, 1L, 7L, Long.MaxValue)) {
      val t = StreamEpoch.tag(qid, b)
      assert(t >= 0L, s"tag($qid, $b) = $t")
      assert(t != graft.ops.IncrementalSpans.NoBatch)
      assert(t != graft.ops.IncrementalDedup.NoBatch)
    }
    // distinct (qid, batch) pairs tag distinctly (the property the
    // whole exclusion scoping rests on); same pair is stable
    assert(StreamEpoch.tag("q", 0L) != StreamEpoch.tag("q", 1L))
    assert(StreamEpoch.tag("q1", 0L) != StreamEpoch.tag("q2", 0L))
    assert(StreamEpoch.tag("q", 5L) == StreamEpoch.tag("q", 5L))
  }

  test("queryId reads the id Spark actually writes to checkpoint metadata") {
    // drive a real stream to materialize a genuine metadata file, then
    // check the parser returns that query's id verbatim
    import spark.implicits._
    val streamDir = java.nio.file.Files.createTempDirectory("sepoch_in").toString
    val cpDir = java.nio.file.Files.createTempDirectory("sepoch_cp").toString
    val outDir = java.nio.file.Files.createTempDirectory("sepoch_out").toString
    Seq((1L, "x")).toDF("doc_id", "text").coalesce(1).write.parquet(s"$streamDir/f1")
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text", org.apache.spark.sql.types.StringType)))
    val q = spark.readStream.schema(schema).parquet(s"$streamDir/f*")
      .writeStream.format("parquet")
      .option("checkpointLocation", cpDir)
      .option("path", outDir)
      .start()
    q.processAllAvailable()
    val sparkId = q.id.toString
    q.stop()
    assert(StreamEpoch.queryId(spark, cpDir) == sparkId,
      "parsed id must equal the StreamingQuery's own id")
    // and a metadata-less dir fails loudly, never silently mis-tags
    val empty = java.nio.file.Files.createTempDirectory("sepoch_none").toString
    intercept[Exception] { StreamEpoch.queryId(spark, empty) }
  }
}
