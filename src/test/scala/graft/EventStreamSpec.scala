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

  test("session windows: batch session_window agrees with the prefix-sum sessionizer") {
    val sw = EventStream.sessionWindows(Tables.events(spark, TestSpark.sf0001))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_sessions"), sum(col("n_events")).as("n_events"))
    val q28 = Relational.q28Sessionize(spark, TestSpark.sf0001)
    val mism = sw.join(q28.withColumnRenamed("n_sessions", "q28_sessions")
                          .withColumnRenamed("n_events", "q28_events"), "user_id")
      .filter(col("n_sessions") =!= col("q28_sessions") ||
              col("n_events") =!= col("q28_events"))
    assert(mism.count() == 0)
    assert(sw.count() > 0)
  }
}
