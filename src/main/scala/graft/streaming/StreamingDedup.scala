package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.ops.IncrementalDedup

/** Streaming ingest-with-dedup (ROADMAP #3): ties the persisted
  * signature index ([[graft.ops.IncrementalDedup]]) into a Structured
  * Streaming loop — the shape of a production training-data ingest:
  *
  *   for each micro-batch of documents:
  *     1. probe the bucketed index for near-duplicates (index side
  *        stays unshuffled — only the batch moves);
  *     2. batch-internal dedup: keep the lowest doc_id per duplicate
  *        group within the batch;
  *     3. append surviving uniques to the corpus sink AND the index,
  *        so later batches dedup against them.
  *
  * foreachBatch is the right tool: the probe is a batch join against a
  * non-streaming table, which pure streaming operators can't express.
  * State lives in the index table, not executor memory — restartable
  * and unbounded-corpus-safe.
  */
object StreamingDedup {

  /** Batch-internal near-dup removal: among docs whose estimated
    * Jaccard reaches `threshold`, keep the lowest doc_id of each
    * connected pair (one hop — the planted-dup granularity). */
  private def dropInternalDups(spark: SparkSession, batch: DataFrame,
                               threshold: Double): DataFrame = {
    val sigs = graft.ops.Dedup.withMinhash(batch)
      .select(col("doc_id"), col("sig"), explode(col("bands")).as("bucket"))
    val dupIds = sigs.as("a").join(sigs.as("b"), Seq("bucket"))
      .filter(col("a.doc_id") < col("b.doc_id"))
      .select(col("b.doc_id").as("dup_id"), col("a.sig").as("sa"), col("b.sig").as("sb"))
      .filter(graft.functions.NativeExprs.sigMatches(col("sa"), col("sb"))
        .cast("double") / graft.ops.Dedup.SigLen >= threshold)
      .select(col("dup_id")).distinct()
    batch.join(dupIds, batch("doc_id") === dupIds("dup_id"), "left_anti")
  }

  /** Starts the deduped-ingest stream: `streamingDocs` must carry the
    * documents schema (doc_id, text, ...). Uniques land in `outDir`
    * (one overwritten subdirectory per micro-batch) and are folded
    * into the index table.
    *
    * Restart semantics: the checkpoint is DURABLE by default
    * (`outDir/_checkpoint`, the StreamingDecontam/StreamingNovelty
    * convention — a temp checkpoint would restart batch ids at 0
    * after a crash and leave the old batch_id dirs behind as silent
    * corpus duplicates), and the corpus write is per-batch OVERWRITE
    * into `batch_id=<id>/`, so a replayed micro-batch rewrites its
    * own directory instead of appending duplicates. The index append
    * is not transactional with the corpus write, but a replay
    * converges: index rows carry the batch id that wrote them and
    * probeBatch excludes exactly the SAME-batch self-matches (a batch
    * replayed after its own appendToIndex landed would otherwise
    * self-match at 1.0 and rewrite its dir EMPTY) and takes distinct
    * (new_id, match_id) candidates, so doubled index rows change no
    * dedup decision — they only waste the replayed rows' space. The
    * batch-scoped exclusion (round-13 advice) keeps the OTHER
    * redelivery mode covered too: an at-least-once source re-sending
    * a doc_id in a LATER batch still matches its own earlier index
    * entry and is dropped instead of landing in two batch dirs.
    * The exclusion is scoped to the CHECKPOINT LINEAGE via
    * [[StreamEpoch.tag]]: a wiped checkpoint restarts the batch
    * id sequence, and a raw-id exclusion would let a NEW batch N
    * claim the index rows the old lineage's batch N wrote — a doc
    * redelivered in a same-numbered batch would skip its own earlier
    * entries and land duplicated; the epoch tag makes it match them
    * and be dropped, the documented redelivery semantics. */
  /** `lineageUpgrade` is the TRANSITION knob for upgrading a live
    * stream from pre-lineage-tag binaries (raw batch ids in
    * `src_batch`): enabled, the replay self-match exclusion also
    * covers the raw id, so a batch that crashed after appendToIndex
    * under the OLD binary and replays under this one still
    * self-excludes instead of rewriting its dir empty. Enable it for
    * the one deploy that crosses the boundary (env
    * SPARK_GRAFT_LINEAGE_UPGRADE=1 or the parameter), then turn it
    * OFF: pre-upgrade rows carry no lineage at all, so the raw
    * exclusion cannot tell "this lineage's crashed batch N" from "a
    * dead lineage's committed batch N" — left on permanently, a
    * wiped-checkpoint restart (fresh outDir, SAME index — the blessed
    * remedy) would let its raw batch N wrongly skip a redelivered
    * doc's pre-upgrade entry (round-17 review). The no-knob
    * alternative is the quiesce rule: drain all in-flight batches
    * (checkpoint fully committed) before upgrading, and the window
    * never opens.
    *
    * The human failure modes of that contract are mechanically closed
    * (round-18): the env knob parses STRICTLY (`=0`/`=false` disable —
    * bare presence does not enable, [[StreamEpoch.upgradeKnob]]);
    * every knob-on batch logs a loud WARN naming the window; and a
    * `_upgrade_crossing` marker at the index table pins the window to
    * the ONE lineage that crossed — a second distinct lineage probing
    * under a still-set knob refuses loudly instead of silently
    * mis-skipping ([[StreamEpoch.upgradeWindow]]). Unsetting the knob
    * after the crossing restores strict tag-only exclusion; the
    * marker stays behind as inert history. */
  def dedupedIngest(spark: SparkSession, streamingDocs: DataFrame,
                    indexTable: String, outDir: String,
                    threshold: Double = 0.8,
                    checkpointDir: Option[String] = None,
                    lineageUpgrade: Boolean =
                      StreamEpoch.upgradeKnobFromEnv): StreamingQuery = {
    val cp = checkpointDir.getOrElse(s"$outDir/_checkpoint")
    streamingDocs.writeStream
      .outputMode("append")
      .option("checkpointLocation", cp)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val qid = StreamEpoch.queryId(spark, cp)
        StreamEpoch.ensureLineage(spark, outDir, qid)
        if (lineageUpgrade)
          StreamEpoch.upgradeWindow(spark, indexTable, qid, "StreamingDedup")
        val tag = StreamEpoch.tag(qid, batchId)
        val b = batch.persist()
        try {
          val crossBatchDups = IncrementalDedup
            // the raw-id disjunct ONLY during the declared upgrade
            // window — see the lineageUpgrade scaladoc for why it
            // must not stay on
            .probeBatch(spark, b, indexTable, threshold, batchId = tag,
                        rawBatchId =
                          if (lineageUpgrade) batchId else IncrementalDedup.NoBatch)
            .select(col("new_id")).distinct()
          val survivors = dropInternalDups(spark,
            b.join(crossBatchDups, b("doc_id") === crossBatchDups("new_id"), "left_anti"),
            threshold).persist()
          // survivors' cache has its own finally: a failed corpus
          // write or index append must not pin it for the session
          try {
            survivors.write.mode("overwrite").parquet(s"$outDir/batch_id=$batchId")
            IncrementalDedup.appendToIndex(survivors, indexTable, srcBatch = tag)
            // the StreamingNovelty discipline: foreachBatch binds the
            // batch to a CLONED session, and the append's insertInto
            // refresh there is not guaranteed to reach the OUTER
            // session probeBatch reads the table through — a stale
            // file listing would silently miss everything appended by
            // earlier batches (a cross-batch dedup miss, the quiet
            // failure mode). The refresh is idempotent; Novelty's spec
            // caught this class empirically.
            spark.catalog.refreshTable(indexTable)
          } finally survivors.unpersist()
        } finally b.unpersist()
        ()
      }
      .start()
  }
}
