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
  * commit log is the right tool, not this sink.
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

  /** The bucket modulus is a LAYOUT property fixed when the snapshot
    * is created: merging with a different modulus than the live dirs
    * were hashed with silently drops keys (the merged row re-buckets
    * outside the touched set and is discarded with the staging dir)
    * and duplicates others across dirs. First use persists `buckets`
    * to a `_buckets` sidecar; every later apply uses the stored
    * value and IGNORES its parameter. */
  private def layoutBuckets(fs: org.apache.hadoop.fs.FileSystem,
                            root: Path, buckets: Int): Int = {
    val f = new Path(root, "_buckets")
    if (fs.exists(f)) {
      val in = fs.open(f)
      try scala.io.Source.fromInputStream(in).mkString.trim.toInt
      finally in.close()
    } else {
      val out = fs.create(f, false)
      try out.write(buckets.toString.getBytes("UTF-8")) finally out.close()
      buckets
    }
  }

  /** Applies one change batch to the snapshot at `snapDir`. Exposed
    * (not just the stream hook) so batch backfills and the replay
    * tests drive the exact code the stream runs. `buckets` only takes
    * effect on the FIRST apply ([[layoutBuckets]]). The column name
    * `bucket` is reserved by the snapshot layout. */
  def applyBatch(spark: SparkSession, batch: DataFrame, key: String,
                 ord: Seq[String], snapDir: String, buckets: Int): Unit = {
    require(!batch.columns.contains("bucket"),
      "\"bucket\" is reserved by the snapshot layout — rename the payload column")
    val root = new Path(snapDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(graft.ops.Ivf.atomicRenameScheme(fs),
      s"snapshot sink requires atomic directory rename; scheme of $snapDir lacks it")
    recoverDebris(spark, snapDir)
    val b = layoutBuckets(fs, root, buckets)

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
      touched.foreach { b =>
        val live = new Path(root, s"bucket=$b")
        val old = new Path(root, s"bucket=$b.old")
        val staged = new Path(staging, s"bucket=$b")
        if (fs.exists(live))
          require(fs.rename(live, old), s"swap failed: $live -> $old")
        require(fs.rename(staged, live), s"swap failed: $staged -> $live")
        fs.delete(old, true)
      }
      fs.delete(staging, true)
    } finally bl.unpersist()
    ()
  }

  /** Restores a crashed [[applyBatch]]'s swap debris: `.old`
    * restore/drop is the shared recoverable-rename protocol
    * ([[graft.ops.SwapRecovery]], single-sourced with the IVF
    * compaction); `.staging` never swapped in — drop it. */
  def recoverDebris(spark: SparkSession, snapDir: String): Unit = {
    val root = new Path(snapDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return
    graft.ops.SwapRecovery.restoreOldSiblings(fs, root)
    fs.listStatus(root)
      .filter(_.getPath.getName == ".staging")
      .foreach(st => fs.delete(st.getPath, true))
  }

  /** Reads the current snapshot (all buckets). Runs debris recovery
    * first: `bucket=N.old` from a mid-swap crash is NOT hidden from
    * partition discovery (only dot/underscore prefixes are), so an
    * unrecovered read would surface the stale pre-swap rows alongside
    * the live ones and break one-current-row-per-key. */
  def readSnapshot(spark: SparkSession, snapDir: String): DataFrame = {
    recoverDebris(spark, snapDir)
    spark.read.parquet(snapDir).drop("bucket")
  }

  /** The streaming hook: each micro-batch of `changes` upserts into
    * the snapshot via [[applyBatch]]. foreachBatch because the merge
    * is a batch join + partitioned rewrite no streaming operator
    * expresses; the durable checkpoint (same lifecycle as the
    * snapshot it feeds) plus keep-latest idempotence close the
    * at-least-once window. `buckets` fixes the layout only when the
    * snapshot is first created ([[layoutBuckets]]). */
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
