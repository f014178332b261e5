package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Output row of EventStream.runningUserTotals. */
case class UserRunningTotal(user_id: Long, n_events: Long, total_value: Double)

/** Structured Streaming over the events table (SURVEY §2.9 optional
  * extension): watermarked tumbling-window aggregation whose batch twin
  * is Relational.q24EventsWindow — the two must agree on complete data,
  * which EventStreamSpec asserts via the memory sink.
  *
  * Scale notes: event-time windowing + watermark bounds state; the
  * aggregation state is per (window, event_type) — a few thousand keys,
  * not per-event. At production scale the source would be Kafka/files
  * discovered incrementally; the parquet file source here exercises the
  * identical logical plan.
  */
object EventStream {

  /** Declared stream-source schema, parametrized on how the generated
    * parquet stores ts: TIMESTAMP(NANOS) vintages arrive as raw-nanos
    * LongType (legacy conf, see Tables.events), TIMESTAMP(MICROS)
    * vintages as TIMESTAMP_NTZ. */
  def eventSchema(tsType: DataType): StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", tsType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Streaming source: the sf dir's events parquet read incrementally.
    * readStream needs a declared schema, so sniff the ts physical type
    * from the parquet footers with a one-off batch read (footer-only —
    * no data scan), then normalize to session-zone TimestampType the
    * same way Tables.events does for the batch twin. */
  def readEvents(spark: SparkSession, dir: String): DataFrame = {
    // vintage handling is single-sourced in Tables (round-13 advice:
    // the twins had drifted once already): the sniff manages the
    // nanosAsLong conf — set to read the footer, restored on throw and
    // for non-nanos vintages, kept set for a nanos vintage because the
    // stream's scans consult it for its whole life
    val tsType = graft.Tables.sniffEventsTs(spark, dir)
    val raw = spark.readStream
      .schema(eventSchema(tsType))
      .option("maxFilesPerTrigger", "1")
      .parquet(dir)
    graft.Tables.normalizeEventsTs(raw, tsType)
  }

  /** 10-minute tumbling windows per event_type with a 30-minute
    * watermark; identical grouping to the batch q24_events_window. */
  def windowedCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "30 minutes")
      .groupBy(window(col("ts"), "10 minutes").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total"))
      .select(unix_timestamp(col("w.start")).as("win_start"),
              col("event_type"), col("n"), col("total"))

  /** Windowed APPROXIMATE DISTINCT USERS — streaming DAU/WAU
    * sketching: exact distinct aggregation is unsupported over a
    * stream (its state would be the unbounded user SET), and the
    * standard production answer is a mergeable cardinality sketch as
    * the aggregation state. Uses this engine's HLL aggregate
    * (fixed 4 KiB registers per open window, partial-merged through
    * the state store exactly like any streaming aggregation), so the
    * stream's estimate is REGISTER-IDENTICAL to the batch hllDistinct
    * over the same rows — EventStreamSpec pins that equality plus the
    * usual error envelope against exact batch distinct. Same tumbling
    * window + watermark as [[windowedCounts]]. */
  def windowedDistinctUsers(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "30 minutes")
      .groupBy(window(col("ts"), "10 minutes").as("w"))
      .agg(graft.functions.HllSketchAgg.hllDistinct(col("user_id").cast("string"))
        .as("approx_users"))
      .select(unix_timestamp(col("w.start")).as("win_start"), col("approx_users"))

  /** Windowed streaming VALUE QUANTILES — p50/p99 of the event value
    * per tumbling window via the mergeable HDR sketch (q184's
    * aggregate). Exact quantiles are unsupported over a stream (state
    * would be every value seen); the histogram's fixed counters
    * partial-merge through the state store like any streaming
    * aggregation — and because that merge is LOSSLESS, the stream's
    * readout EQUALS the batch readout over the same rows (not merely
    * tracks it; the HLL twin above can only promise register
    * identity). EventStreamSpec pins the equality plus the one-bucket
    * envelope against exact batch ranks. Values are fixed-pointed to
    * cents so the long-domain sketch applies to the DOUBLE column. */
  def windowedValueQuantiles(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "30 minutes")
      .groupBy(window(col("ts"), "10 minutes").as("w"))
      .agg(graft.functions.HdrQuantileAgg.hdrQuantiles(
        // explicit non-negative clamp: the sketch's domain is [0, 2^40)
        greatest(lit(0L), floor(col("value") * 100).cast("long")),
        Seq(0.5, 0.99)).as("qv"))
      .select(unix_timestamp(col("w.start")).as("win_start"),
        col("qv")(0).as("p50_cents"), col("qv")(1).as("p99_cents"))

  /** Windowed QUANTILE-SKETCH EMISSION — the persistable form of
    * [[windowedValueQuantiles]]: each window's aggregate value is the
    * HDR sketch ITSELF (binary), the column a pipeline lands per
    * window so any later rollup — hourly → daily, per-window → SLA
    * report — merges kilobyte sketches with `hdr_merge` instead of
    * retaining raw events (q185's stored-rollup pattern fed by a
    * stream; the rolled-up readout is EXACTLY a direct pass's, since
    * the histogram merge is lossless — EventStreamSpec pins it). */
  def windowedQuantileSketches(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "30 minutes")
      .groupBy(window(col("ts"), "10 minutes").as("w"))
      .agg(graft.functions.HdrQuantileAgg.hdrSketch(
          greatest(lit(0L), floor(col("value") * 100).cast("long"))).as("sk"),
        count(lit(1)).as("n_events"))
      .select(unix_timestamp(col("w.start")).as("win_start"),
        col("sk"), col("n_events"))

  /** Event-time session windows (30-minute gap), Spark's native
    * session_window operator — works identically over a batch frame or
    * a stream; the batch twin of Relational.q28Sessionize. State per
    * (user, open session), closed by the watermark, which is applied
    * HERE like every sibling helper (a no-op on batch frames; without
    * it a streaming caller fails at start() with the
    * watermark-required AnalysisException). */
  def sessionWindows(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "30 minutes")
      .groupBy(session_window(col("ts"), "30 minutes").as("sw"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 2).as("total"))
      .select(col("user_id"), unix_timestamp(col("sw.start")).as("sess_start"),
              col("n_events"), col("total"))

  /** Arbitrary stateful processing: running per-user totals via
    * mapGroupsWithState — the custom-state API for logic windowed
    * aggregation can't express. State is one (count, sum) pair per
    * user; each micro-batch folds its rows into the state and emits
    * the updated total (Update output mode). */
  def runningUserTotals(spark: SparkSession, events: DataFrame)
      : org.apache.spark.sql.Dataset[UserRunningTotal] = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.GroupStateTimeout
    events.selectExpr("user_id", "value").as[(Long, Double)]
      .groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[(Long, Double)],
         state: org.apache.spark.sql.streaming.GroupState[(Long, Double)]) =>
          var (n, t) = state.getOption.getOrElse((0L, 0.0))
          rows.foreach { r => n += 1; t += r._2 }
          state.update((n, t))
          UserRunningTotal(uid, n, t)
      }
  }

  /** foreachBatch serving sink: each micro-batch refreshes a parquet
    * snapshot of the windowed aggregates — the generic "stream into a
    * non-streaming store" integration point (swap the write body for a
    * JDBC/Delta/key-value upsert in production; foreachBatch gives the
    * batch DataFrame + a batch id for idempotent writes). */
  def serveWindowedCounts(spark: SparkSession, dir: String,
                          outDir: String): org.apache.spark.sql.streaming.StreamingQuery =
    windowedCounts(readEvents(spark, dir))
      .writeStream
      .outputMode("complete")
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        batch.write.mode("overwrite").parquet(outDir)
      }
      .start()

  /** Stream-stream inner join with event-time bounds: each purchase
    * joined to the same user's clicks in the preceding hour. Both
    * sides carry watermarks and the range condition bounds the join
    * STATE — Spark retains only one watermark+range window of each
    * side per key, so state is O(rate × window), independent of
    * stream length. The batch twin (same join over the static frame)
    * must agree on complete data — EventStreamSpec asserts it. */
  def clickToPurchaseJoin(events: DataFrame): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"),
              col("value").as("click_value"))
      .withWatermark("c_ts", "1 hour")
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id").as("p_user"),
              col("ts").as("p_ts"), col("value"))
      .withWatermark("p_ts", "1 hour")
    purchases.join(clicks,
      expr("""p_user = c_user AND
             |c_ts <= p_ts AND c_ts >= p_ts - INTERVAL 1 HOUR""".stripMargin))
      .select(col("event_id"), col("p_user").as("user_id"),
              unix_micros(col("p_ts")).as("p_ts_us"),
              unix_micros(col("c_ts")).as("c_ts_us"),
              col("value"), col("click_value"))
  }

  /** Streaming exact dedup: dropDuplicatesWithinWatermark keeps one
    * row per key with BOUNDED state — keys older than the watermark
    * are evicted, so (unlike plain dropDuplicates on a stream) this
    * runs forever. The dedup key is a fingerprint of the FULL record
    * content (every column, via to_json over the row struct), never
    * the payload itself (q30's discipline, streaming form): a
    * props-only key would collapse genuinely different events that
    * happen to share a payload — and hash all null-props rows to one
    * survivor. Only exact replays (same event, redelivered) dedup. */
  def dedupWithinWatermark(events: DataFrame): DataFrame =
    events
      .withColumn("fp",
        md5(to_json(struct(events.columns.map(col).toIndexedSeq: _*)).cast("binary")))
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("fp")
      .drop("fp") // internal key — output keeps the events schema

  /** Runs the streaming query to completion against a static dir via the
    * memory sink (complete mode), returning the settled result. */
  def runToCompletion(spark: SparkSession, dir: String, queryName: String): DataFrame = {
    val q = windowedCounts(readEvents(spark, dir))
      .writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(queryName)
      .start()
    q.processAllAvailable()
    q.stop()
    spark.table(queryName)
  }
}
