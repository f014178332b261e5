package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental DECONTAMINATION against a persisted test-set fingerprint
  * index — [[Curation.decontaminate]]'s streaming twin, the shape a
  * continuously-ingesting training pipeline runs: the benchmark/eval
  * fingerprint set is materialized ONCE, and each new training batch is
  * screened against it without ever rescanning the corpus or the test
  * sets.
  *
  * Index layout: one BIGINT column (xxhash64 of each distinct word
  * n-gram — same fingerprint family as the batch q72 path), written
  * hash-bucketed + sorted on `fp` (Bucketing.writeBucketed). A batch
  * probe joins on the bucket key, so the index side never shuffles —
  * only the (small) incoming batch moves. Eval sets are tiny relative
  * to a 100 TB corpus, so in practice the probe also qualifies for a
  * broadcast; the bucketed layout is what keeps it cheap even when the
  * union of all screened benchmarks grows large.
  */
object IncrementalDecontam {

  import Curation.DecontamN

  /** Per-doc distinct n-gram fingerprints: (doc_id, fp BIGINT), via the
    * native window-hash kernel (no shingle strings materialized). */
  private def docFps(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      explode(array_distinct(graft.functions.NativeExprs.shingleHashes(
        split(col("text"), " "), DecontamN))).as("fp"))

  /** (Re)builds the persisted test-set index: the DISTINCT fingerprint
    * set of every document in `test`, bucketed+sorted on fp. Static
    * thereafter — screening never appends to it (unlike the dedup
    * index); re-run only when the eval suite itself changes. */
  def buildTestIndex(test: DataFrame, table: String, buckets: Int = 32): Unit =
    Bucketing.writeBucketed(docFps(test).select(col("fp")).distinct(),
      table, "fp", buckets)

  /** Screens a batch against the index: (doc_id, n_hits) for batch
    * docs sharing ≥ 1 distinct n-gram with any indexed test doc.
    * n_hits counts the doc's DISTINCT contaminated shingles — the same
    * statistic as the batch path's per-doc hit count. */
  def screenBatch(spark: SparkSession, batch: DataFrame, table: String): DataFrame =
    docFps(batch)
      .join(spark.table(table).hint("MERGE"), Seq("fp"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_hits"))
}
