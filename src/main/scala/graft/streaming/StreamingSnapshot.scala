package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming UPSERT SNAPSHOT sink — q166's streaming twin: collapse a
  * keyed change-log STREAM into a persisted one-current-row-per-key
  * table, without a table format (the Delta-less upsert every
  * warehouse-adjacent pipeline reinvents).
  *
  * Layout: the snapshot is hash-partitioned into fixed `bucket=N`
  * directories (bucket = xxhash64(key) mod B). Per micro-batch:
  *
  *   1. reduce the batch to its latest row per key ([[latestPerKey]]);
  *   2. read ONLY the touched buckets of the live snapshot (a
  *      driver-side list of at most B directory names — never data);
  *   3. merge keep-latest and write the result to a STAGING dir;
  *   4. swap each touched bucket in with the recoverable rename
  *      sequence (live → .old, staged → live, drop .old) that the IVF
  *      compaction uses — a crash at any instant strands at worst a
  *      .old/.staging sibling that [[recoverDebris]] (run at the top
  *      of every apply) restores; a bucket is never half-written.
  *
  * Replay contract: keep-latest is a semilattice max (associative,
  * commutative, idempotent over the ordering struct), so (a) the final
  * snapshot is INDEPENDENT of micro-batch boundaries — stream ≡ one
  * big batch, pinned by SnapshotStreamSpec under two different
  * splits — and (b) an at-least-once redelivery merges rows the
  * snapshot already holds and changes nothing. Determinism needs the
  * `ord` tuple (plus the remaining payload columns, which ride as
  * final tie-breaks) to order versions totally, the same requirement
  * q166's `row_number` twin puts on its ORDER BY.
  *
  * Scale shape: per batch the work is O(batch + touched buckets), not
  * O(snapshot) — an incremental pipeline's hot keys touch few
  * buckets, and B is sized so one bucket ≈ one task's worth of
  * snapshot. Like the IVF lifecycle, the swap's crash-safety rests on
  * atomic directory rename, so the sink is gated to those filesystem
  * schemes (HDFS/local); on object stores a table format with a real
  * commit log is the right tool, not this sink. Bucketed-store
  * mechanics are single-sourced in [[graft.ops.BucketStore]]:
  * [[applyBatch]] is the ONLY writer (foreachBatch runs it serially)
  * and runs destructive crash recovery; [[readSnapshot]] never
  * deletes, so it cannot corrupt a concurrently-running sink — though
  * a read racing a swap can transiently fail or see a torn
  * cross-bucket view (see the BucketStore doc).
  */
object StreamingSnapshot {

  /** Latest version per key: max over the `(ord ++ remaining payload)`
    * struct — aggregation-only (map-side combined, no window), and the
    * idempotent/associative merge the replay contract rests on. All
    * payload columns must be ORDERABLE types (they ride as final
    * tie-breaks inside the struct max; a map-typed payload column is
    * rejected at analysis). */
  def latestPerKey(df: DataFrame, key: String, ord: Seq[String]): DataFrame = {
    val payload = df.columns.filterNot(_ == key).toSeq
    val fields = ord ++ payload.filterNot(ord.contains)
    df.groupBy(col(key))
      .agg(max(struct(fields.map(col): _*)).as("v"))
      .select(col(key) +: payload.map(c => col("v." + c).as(c)): _*)
  }

  /** Applies one change batch to the snapshot at `snapDir`. Exposed
    * (not just the stream hook) so batch backfills and the replay
    * tests drive the exact code the stream runs. `buckets` only takes
    * effect on the FIRST apply
    * ([[graft.ops.BucketStore.layoutBuckets]]); the key column is
    * likewise pinned at creation. The column name `bucket` is
    * reserved by the snapshot layout. */
  def applyBatch(spark: SparkSession, batch: DataFrame, key: String,
                 ord: Seq[String], snapDir: String, buckets: Int): Unit = {
    require(!batch.columns.contains("bucket"),
      "\"bucket\" is reserved by the snapshot layout — rename the payload column")
    val root = new Path(snapDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(graft.ops.Ivf.atomicRenameScheme(fs),
      s"snapshot sink requires atomic directory rename; scheme of $snapDir lacks it")
    graft.ops.BucketStore.recoverDebris(fs, root)
    val b = graft.ops.BucketStore.layoutBuckets(fs, root, buckets)
    // the key column feeds the bucket hash — pin it like the modulus
    graft.ops.BucketStore.layoutKeys(fs, root, Seq(key))

    val bl = latestPerKey(batch, key, ord)
      .withColumn("bucket", pmod(xxhash64(col(key)), lit(b)).cast("int"))
      .persist()
    try {
      val touched = bl.select("bucket").distinct()
        .collect().map(_.getInt(0)).sorted // ≤ B ints — dir names, not data
      val liveDirs = touched.map(b => new Path(root, s"bucket=$b"))
        .filter(fs.exists).map(_.toString)
      val existing =
        if (liveDirs.isEmpty) bl.limit(0)
        else spark.read.option("basePath", snapDir)
          .parquet(liveDirs: _*)
          .withColumn("bucket", col("bucket").cast("int"))
      val staging = new Path(root, ".staging")
      fs.delete(staging, true)
      latestPerKey(existing.unionByName(bl), key, ord)
        .withColumn("bucket", pmod(xxhash64(col(key)), lit(b)).cast("int"))
        .write.partitionBy("bucket").parquet(staging.toString)
      graft.ops.BucketStore.swapIn(fs, root, staging, touched)
    } finally bl.unpersist()
    ()
  }

  /** Restores a crashed [[applyBatch]]'s swap debris: `.old`
    * restore/drop is the shared recoverable-rename protocol
    * ([[graft.ops.SwapRecovery]], single-sourced with the IVF
    * compaction); `.staging` never swapped in — drop it. WRITER-side
    * only — a reader running this concurrently with a live sink would
    * delete the writer's staged data mid-swap. */
  def recoverDebris(spark: SparkSession, snapDir: String): Unit = {
    val root = new Path(snapDir)
    graft.ops.BucketStore.recoverDebris(
      root.getFileSystem(spark.sparkContext.hadoopConfiguration), root)
  }

  /** Reads the current snapshot (all buckets) via the crash-consistent
    * listing ([[graft.ops.BucketStore.liveBucketDirs]]): live buckets
    * win, an orphaned `bucket=N.old` from a mid-swap crash stands in
    * for its missing live sibling, and NOTHING is deleted — so the
    * read is safe while the sink is running (debris cleanup belongs to
    * the writer's next apply). Leaf-dir reads carry no partition
    * column; an empty store falls back to the root read so its
    * behavior (schema-inference error, as [[StreamingSurvival]]
    * documents) is unchanged. */
  def readSnapshot(spark: SparkSession, snapDir: String): DataFrame = {
    val root = new Path(snapDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dirs = graft.ops.BucketStore.liveBucketDirs(fs, root)
    if (dirs.nonEmpty) spark.read.parquet(dirs.map(_.toString): _*)
    else spark.read.parquet(snapDir).drop("bucket")
  }

  /** The streaming hook: each micro-batch of `changes` upserts into
    * the snapshot via [[applyBatch]]. foreachBatch because the merge
    * is a batch join + partitioned rewrite no streaming operator
    * expresses; the durable checkpoint (same lifecycle as the
    * snapshot it feeds) plus keep-latest idempotence close the
    * at-least-once window. `buckets` fixes the layout only when the
    * snapshot is first created
    * ([[graft.ops.BucketStore.layoutBuckets]]). */
  def snapshotSink(spark: SparkSession, changes: DataFrame, key: String,
                   ord: Seq[String], snapDir: String, buckets: Int = 32,
                   checkpointDir: Option[String] = None): StreamingQuery =
    changes.writeStream
      .outputMode("append")
      .option("checkpointLocation",
        checkpointDir.getOrElse(s"$snapDir/_checkpoint"))
      .foreachBatch { (batch: DataFrame, _: Long) =>
        applyBatch(spark, batch, key, ord, snapDir, buckets)
      }
      .start()
}
