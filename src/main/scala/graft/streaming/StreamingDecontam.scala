package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery

import graft.ops.IncrementalDecontam

/** Streaming ingest-with-decontamination: ties the persisted test-set
  * fingerprint index ([[graft.ops.IncrementalDecontam]]) into a
  * Structured Streaming loop — new training batches are screened
  * against the benchmark/eval sets as they arrive, so contaminated
  * documents never reach the training sink:
  *
  *   for each micro-batch of documents:
  *     1. probe the bucketed fingerprint index (index side stays
  *        unshuffled — only the batch moves);
  *     2. route: clean docs → the training sink; hit docs → a
  *        quarantine sink with their hit counts, for audit.
  *
  * foreachBatch is the right tool: the probe is a batch join against a
  * non-streaming table, which pure streaming operators can't express.
  * Unlike [[StreamingDedup]] the index is STATIC — screening a batch
  * never mutates it — so replays are trivially idempotent on the index
  * and the per-batch overwrite makes the sinks replay-safe too.
  */
object StreamingDecontam {

  /** Starts the screened-ingest stream: `streamingDocs` must carry the
    * documents schema (doc_id, text, ...). Clean docs land in
    * `outDir/clean/batch_id=<id>/`; contaminated docs (joined with
    * their distinct-shingle hit counts) in
    * `outDir/quarantine/batch_id=<id>/`.
    *
    * Restart semantics: both sinks are per-batch OVERWRITE into their
    * own `batch_id=<id>/` directory, so a replayed micro-batch
    * rewrites its directories instead of appending duplicates — but
    * that only holds if batch ids and micro-batch BOUNDARIES replay
    * identically, which requires a durable checkpoint: a restart on a
    * fresh temp checkpoint restarts ids at 0 and can regroup rows,
    * leaving the prior run's higher-numbered batch_id dirs as silent
    * duplicates in the sink. The checkpoint therefore defaults to
    * `outDir/_checkpoint` (same lifecycle as the sinks it protects);
    * pass `checkpointDir` to relocate it. An outDir re-used under a
    * NEW/wiped checkpoint fails loudly instead of stomping the prior
    * lineage's batch dirs ([[StreamEpoch.ensureLineage]]). */
  def screenedIngest(spark: SparkSession, streamingDocs: DataFrame,
                     indexTable: String, outDir: String,
                     checkpointDir: Option[String] = None): StreamingQuery = {
    val cp = checkpointDir.getOrElse(s"$outDir/_checkpoint")
    streamingDocs.writeStream
      .outputMode("append")
      .option("checkpointLocation", cp)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        StreamEpoch.ensureLineage(spark, outDir, StreamEpoch.queryId(spark, cp))
        val b = batch.persist()
        try {
          val hits = IncrementalDecontam.screenBatch(spark, b, indexTable)
            .persist()
          // hits' cache gets its own finally (the StreamingDedup
          // discipline): a failed quarantine write must not pin it —
          // the stream retries the batch and would stack a fresh
          // persist per attempt
          try {
            b.join(hits, Seq("doc_id"), "left_anti")
              .write.mode("overwrite").parquet(s"$outDir/clean/batch_id=$batchId")
            b.join(hits, Seq("doc_id"))
              .write.mode("overwrite").parquet(s"$outDir/quarantine/batch_id=$batchId")
          } finally hits.unpersist()
        } finally b.unpersist()
        ()
      }
      .start()
  }
}
