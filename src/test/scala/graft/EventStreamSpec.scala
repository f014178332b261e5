package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Relational
import graft.streaming.EventStream

class EventStreamSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("streaming windowed agg equals the batch twin on complete data") {
    // file source needs a directory: stage the events file into one
    val dir = java.nio.file.Files.createTempDirectory("events-stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"${TestSpark.sf0001}/events.parquet"),
      dir.resolve("events.parquet"))
    val streamed = EventStream.runToCompletion(
      spark, dir.toString, "events_stream_test")
      .orderBy(col("win_start"), col("event_type"))
      .collect()
    val batch = Relational.q24EventsWindow(spark, TestSpark.sf0001).collect()
    assert(streamed.length == batch.length)
    streamed.zip(batch).foreach { case (sr, br) =>
      assert(sr.getLong(0) == br.getLong(0))
      assert(sr.getString(1) == br.getString(1))
      assert(sr.getLong(2) == br.getLong(2))
      assert(math.abs(sr.getDouble(3) - br.getDouble(3)) < 1e-6)
    }
  }
}
