package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming DAILY VOLUME ANOMALY — the streaming twin of the batch
  * q132 (Relational.q132DailyAnomaly): a watermarked 1-day tumbling
  * window maintains the per-day event-count digest in the state store,
  * and the z-scoring half runs through Relational.dailyAnomalyScore
  * VERBATIM over the settled digest — stream ≡ batch agreement on the
  * scoring holds by construction (the SpaceSavingKernel pattern), and
  * EventStreamSpec pins the end-to-end equality.
  *
  * Why the split: the z-score compares every day against the mean/sd
  * of ALL days, so it is a digest-level report, not a per-event
  * streaming computation — the streaming job's work is maintaining
  * the (day, n_events) digest incrementally (state: one counter per
  * open day, closed by the watermark; the corpus never re-scans), and
  * any consumer (here foreachBatch / the memory sink) scores the
  * digest on read. Scoring INSIDE the stream would re-rank history on
  * every batch for no extra information. */
object StreamingAnomaly {

  /** Watermarked per-day counts over a streaming events frame
    * (UTC days — identical binning to the batch twin's
    * cast-to-date under the session's UTC zone). */
  def dailyCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 day")
      .groupBy(window(col("ts"), "1 day").as("w"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("w.start").cast("date").as("day"), col("n_events"))

  /** Runs the daily digest to completion against a static dir via the
    * memory sink, then scores it through the batch scorer verbatim. */
  def runToCompletion(spark: SparkSession, dir: String, queryName: String): DataFrame = {
    val q = dailyCounts(EventStream.readEvents(spark, dir))
      .writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(queryName)
      .start()
    q.processAllAvailable()
    q.stop()
    graft.ops.Relational.dailyAnomalyScore(spark.table(queryName))
  }
}
