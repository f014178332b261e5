package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming USER-LIFETIME PROFILE STORE — q195's streaming twin: a
  * persisted one-row-per-user (first_ts, last_ts, n_events) table kept
  * current by the stream, read out through the batch survival curve
  * ([[graft.ops.Relational.survivalCurve]], shared verbatim — stream ≡
  * batch on the scoring by construction).
  *
  * Shape: a WINDOWLESS stateful aggregation (update output mode) —
  * deliberately unwatermarked, because a lifetime has no event-time
  * horizon: an event arriving arbitrarily late must still extend its
  * user's span backward or forward (SurvivalStreamSpec pins the
  * backward case, the one every watermarked operator drops).
  * Aggregation state is two timestamps + a count per user — bounded by
  * the POPULATION, not the traffic, the same trade
  * [[EventStream.runningUserTotals]] documents.
  *
  * Persistence reuses the snapshot sink's machinery
  * ([[StreamingSnapshot.applyBatch]]): update mode re-emits a user's
  * whole cumulative row whenever it changes, and `n_events` is
  * strictly increasing across a user's updates, so keep-latest ordered
  * by it is exactly "newest cumulative aggregate wins" — replays
  * re-merge an identical row (no-op) and a STALE redelivery loses the
  * ordinal comparison (never regresses the profile), the snapshot
  * sink's standing contract.
  */
object StreamingSurvival {

  /** The cumulative per-user profile — works identically over a batch
    * frame or an unwatermarked stream. */
  def userLifetimes(events: DataFrame): DataFrame =
    events.groupBy(col("user_id"))
      .agg(min(col("ts")).as("first_ts"), max(col("ts")).as("last_ts"),
        count(lit(1)).as("n_events"))

  /** The streaming hook: changed profiles upsert into the snapshot at
    * `snapDir` each micro-batch. */
  def lifetimeSink(spark: SparkSession, events: DataFrame, snapDir: String,
                   buckets: Int = 32,
                   checkpointDir: Option[String] = None): StreamingQuery =
    userLifetimes(events)
      .writeStream
      .outputMode("update")
      .option("checkpointLocation",
        checkpointDir.getOrElse(s"$snapDir/_checkpoint"))
      .foreachBatch { (batch: DataFrame, _: Long) =>
        StreamingSnapshot.applyBatch(
          spark, batch, "user_id", Seq("n_events"), snapDir, buckets)
      }
      .start()

  /** The store's row shape — what [[userLifetimes]] writes and the
    * empty-store branch of [[readProfiles]] declares. A named constant
    * (the StreamingQuantiles.storeSchema discipline) so the producer
    * and the empty-read path cannot drift apart silently;
    * SurvivalStreamSpec pins it against userLifetimes' actual output. */
  val profileSchema: org.apache.spark.sql.types.StructType = {
    import org.apache.spark.sql.types._
    StructType(Seq(StructField("user_id", LongType),
      StructField("first_ts", TimestampType),
      StructField("last_ts", TimestampType),
      StructField("n_events", LongType)))
  }

  /** The persisted profiles (one current row per user). A store whose
    * stream has not yet upserted anything (only `_checkpoint`/
    * `_buckets` present, or nothing at all) reads as zero rows — the
    * readSketchStore discipline; the snapshot reader would otherwise
    * throw on schema inference over the bucket-less directory. */
  def readProfiles(spark: SparkSession, snapDir: String): DataFrame = {
    val root = new org.apache.hadoop.fs.Path(snapDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val hasBuckets = fs.exists(root) &&
      fs.listStatus(root).exists(_.getPath.getName.startsWith("bucket="))
    if (!hasBuckets)
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], profileSchema)
    else StreamingSnapshot.readSnapshot(spark, snapDir)
  }

  /** The survival curve over the STORE — q195's exact readout plan fed
    * by persisted profiles instead of a raw-event scan. */
  def survivalFromStore(spark: SparkSession, snapDir: String): DataFrame =
    graft.ops.Relational.survivalCurve(
      readProfiles(spark, snapDir).select(
        datediff(col("last_ts").cast("date"), col("first_ts").cast("date"))
          .as("lifetime")))
}
