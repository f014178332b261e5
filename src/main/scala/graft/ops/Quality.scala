package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables._
import graft.functions.NativeExprs

/** Corpus-quality / distribution-health operators over the documents
  * table (SURVEY §2.9 — training-data pipeline family, round-9 batch):
  *
  *  - q109 chunk-level exact dedup (RefinedWeb-style paragraph dedup,
  *    re-expressed over fixed 16-token chunks since the synthetic
  *    corpus has no paragraph delimiters)
  *  - q110 per-source quantile calibration of a quality score
  *    (percent_rank normalization — thresholds transfer across
  *    sources with wildly different score distributions)
  *  - q111 winsorized robust per-source stats (clip at p05/p95)
  *  - q112 per-source token-distribution KL divergence vs the corpus
  *    mixture (data-mixing diagnostic)
  *  - q113 DEFLATE compressibility scoring (Gopher/Dolma-style
  *    redundancy signal) via the codegen'd [[NativeExprs.deflateLen]]
  *  - q114 per-source Kolmogorov–Smirnov drift of the length
  *    distribution vs the rest of the corpus
  *
  * Scale discipline shared by all six: reduce to a bounded digest
  * (fingerprints, (source, value) histograms, per-source scalars)
  * before anything shuffles; document text never crosses an exchange.
  */
object Quality {

  private def toks(c: Column): Column = split(c, " ")

  // --------------------------------------------------------------- q109

  /** q109: CHUNK-LEVEL exact dedup — the paragraph-dedup pass of a
    * RefinedWeb-style pipeline. Documents are cut into non-overlapping
    * 16-token chunks; a chunk occurrence is a duplicate when the same
    * chunk text appeared earlier in the corpus (earlier = smaller
    * (doc_id, chunk_idx)). Reports per-doc chunk totals and duplicate
    * counts — the "remove duplicated spans, keep first occurrence"
    * primitive, complementing q30 (whole-doc) and q87 (span
    * decontamination against an external test set).
    *
    * 100 TB shape: chunk text is fingerprinted map-side (md5 here to
    * stay oracle-comparable; the production key would be xxhash64 —
    * 8 B vs 32 B hex); the only exchange carries (fp, doc_id,
    * chunk_idx) — never text. First-occurrence is one row_number
    * window partitioned by fp (each partition is a duplicate group,
    * overwhelmingly size 1), then a map-side-combined re-aggregation
    * by doc_id. */
  def chunkDedup(docs: DataFrame, chunkTokens: Int): DataFrame = {
    val t = toks(col("text"))
    val nChunks = ((size(t) - 1) / lit(chunkTokens)).cast("int")
    val chunk = docs.select(
        col("doc_id"),
        posexplode(transform(
          sequence(lit(0), nChunks),
          i => array_join(slice(t, i * chunkTokens + 1, lit(chunkTokens)), " "))))
      .select(col("doc_id"), col("pos").as("chunk_idx"),
              md5(col("col").cast("binary")).as("fp"))
    val rn = row_number().over(
      Window.partitionBy(col("fp")).orderBy(col("doc_id"), col("chunk_idx")))
    chunk.withColumn("rn", rn)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_chunks"),
           sum(when(col("rn") > 1, 1L).otherwise(0L)).as("n_dup_chunks"))
      .orderBy(col("doc_id"))
  }

  def q109ChunkDedup(s: SparkSession, d: String): DataFrame =
    chunkDedup(documents(s, d), 16)

  val q109Sql: String =
    """WITH d AS (SELECT doc_id, str_split(text, ' ') AS t FROM documents),
      |e AS (
      | SELECT doc_id, t, unnest(range(0, (len(t)-1)//16 + 1)) AS chunk_idx FROM d
      |),
      |c AS (
      | SELECT doc_id, chunk_idx,
      |   md5(array_to_string(t[(chunk_idx*16+1):(chunk_idx*16+16)], ' ')) AS fp
      | FROM e
      |),
      |r AS (
      | SELECT doc_id, chunk_idx,
      |   row_number() OVER (PARTITION BY fp ORDER BY doc_id, chunk_idx) AS rn
      | FROM c
      |)
      |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_chunks,
      |  CAST(sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_chunks
      |FROM r GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // --------------------------------------------------------------- q110

  /** q110: per-source QUANTILE CALIBRATION of a quality score. The raw
    * score here is the type-token ratio (distinct/total tokens — a
    * repetition-sensitive quality proxy); the calibrated score is its
    * percent_rank WITHIN the source. Absolute score thresholds do not
    * transfer across sources (a web crawl and a books corpus have
    * different score ranges); "drop the bottom quintile of each
    * source" does — the keep flag is exactly that.
    *
    * 100 TB shape: the score is row-local (one map pass); the only
    * shuffle is the rank window's partition-by-source exchange of
    * (doc_id, score) scalars. Sources are the natural calibration unit
    * and are bounded (dozens); a pathologically dominant source would
    * swap in a two-pass histogram-CDF rank (q114's digest shape)
    * rather than a sort — noted, not needed for balanced sources. */
  def quantileNorm(docs: DataFrame, keepAbove: Double): DataFrame = {
    val t = toks(col("text"))
    val scored = docs.select(
      col("doc_id"), col("source"),
      (size(array_distinct(t)).cast("double") / size(t)).as("ttr"))
    val pct = percent_rank().over(
      Window.partitionBy(col("source")).orderBy(col("ttr")))
    scored.withColumn("pct", pct)
      .select(col("doc_id"), col("source"),
              round(col("ttr"), 6).as("ttr"),
              round(col("pct"), 6).as("pct"),
              when(col("pct") >= keepAbove, 1).otherwise(0).as("keep"))
      .orderBy(col("doc_id"))
  }

  def q110QuantileNorm(s: SparkSession, d: String): DataFrame =
    quantileNorm(documents(s, d), 0.2)

  val q110Sql: String =
    """WITH s AS (
      | SELECT doc_id, source,
      |   len(list_distinct(str_split(text, ' '))) / len(str_split(text, ' ')) AS ttr
      | FROM documents
      |), r AS (
      | SELECT doc_id, source, ttr,
      |   percent_rank() OVER (PARTITION BY source ORDER BY ttr) AS pct
      | FROM s
      |)
      |SELECT doc_id, source, round(ttr, 6) AS ttr, round(pct, 6) AS pct,
      |  CASE WHEN pct >= 0.2 THEN 1 ELSE 0 END AS keep
      |FROM r ORDER BY doc_id""".stripMargin

  // --------------------------------------------------------------- q111

  /** q111: WINSORIZED per-source length statistics — clip n_chars at
    * the source's own p05/p95 before averaging, the standard
    * robust-mean that keeps a few pathological documents (truncated
    * fetches, concatenation accidents) from dominating per-source
    * health dashboards.
    *
    * 100 TB shape: the percentile pass reduces to one row per source;
    * that digest broadcasts back onto the scan (no shuffle of the fact
    * table — the join side is dozens of rows), and the winsorized
    * mean is one map-side-combined aggregation. Exact interpolated
    * percentiles buffer per-group values (q37's caveat) — at real
    * scale the p05/p95 inputs swap to approx_percentile (q93's
    * discipline) without touching the rest of the plan. */
  def winsorize(docs: DataFrame): DataFrame = {
    val pct = docs.groupBy(col("source")).agg(
      percentile(col("n_chars"), lit(0.05)).as("p05"),
      percentile(col("n_chars"), lit(0.95)).as("p95"))
    val w = least(greatest(col("n_chars").cast("double"), col("p05")), col("p95"))
    docs.join(broadcast(pct), Seq("source"))
      .select(col("source"), col("n_chars"), col("p05"), col("p95"), w.as("w"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
           round(min(col("p05")), 4).as("p05"),
           round(min(col("p95")), 4).as("p95"),
           round(avg(col("n_chars")), 4).as("mean_raw"),
           round(avg(col("w")), 4).as("mean_winsor"))
      .orderBy(col("source"))
  }

  def q111Winsorize(s: SparkSession, d: String): DataFrame =
    winsorize(documents(s, d))

  val q111Sql: String =
    """WITH p AS (
      | SELECT source, quantile_cont(n_chars, 0.05) AS p05,
      |        quantile_cont(n_chars, 0.95) AS p95
      | FROM documents GROUP BY source
      |)
      |SELECT d.source, CAST(count(*) AS BIGINT) AS n_docs,
      |  round(min(p.p05), 4) AS p05, round(min(p.p95), 4) AS p95,
      |  round(avg(d.n_chars), 4) AS mean_raw,
      |  round(avg(least(greatest(CAST(d.n_chars AS DOUBLE), p.p05), p.p95)), 4)
      |    AS mean_winsor
      |FROM documents d JOIN p ON d.source = p.source
      |GROUP BY d.source ORDER BY d.source""".stripMargin

  // --------------------------------------------------------------- q112

  /** q112: per-source token-distribution KL DIVERGENCE vs the corpus
    * mixture — KL(source ‖ corpus) in bits. The data-mixing
    * diagnostic: sources far from the mixture dominate or fight the
    * training distribution; a near-zero KL source is redundant with
    * the mix. No smoothing needed — every source token is by
    * definition in the corpus distribution (q ≥ p-support).
    *
    * 100 TB shape: one corpus scan reduces to the (source, token)
    * wordcount digest (map-side combined; at real scale the key would
    * be the 8-byte xxhash64 fp, q106's discipline). Everything after
    * operates on that vocab-sized digest: corpus totals re-aggregate
    * it, the BOUNDED frames (#sources rows, one total row) broadcast
    * back by explicit hint, and the KL sum is one more map-side-
    * combined aggregation. The vocab-sized corpus frame is left to
    * the planner on purpose: a forced broadcast() bypasses
    * autoBroadcastJoinThreshold, and a billion-token vocabulary would
    * OOM the driver instead of falling back to the (token-keyed,
    * digest-vs-digest) shuffle join that is the correct shape at that
    * scale — AQE still broadcasts it whenever it is actually small. */
  def klDivergence(docs: DataFrame): DataFrame = {
    val tf = docs
      .select(col("source"), explode(toks(col("text"))).as("token"))
      .groupBy(col("source"), col("token"))
      .agg(count(lit(1)).as("c_st"))
    val corpus = tf.groupBy(col("token")).agg(sum(col("c_st")).as("c_t"))
    val perSource = tf.groupBy(col("source")).agg(sum(col("c_st")).as("n_s"))
    val total = corpus.agg(sum(col("c_t")).as("n_total"))
    val p = col("c_st").cast("double") / col("n_s")
    val q = col("c_t").cast("double") / col("n_total")
    tf.join(corpus, Seq("token"))
      .join(broadcast(perSource), Seq("source"))
      .crossJoin(broadcast(total))
      .select(col("source"), col("n_s"), (p * log2(p / q)).as("term"))
      .groupBy(col("source"))
      .agg(min(col("n_s")).as("n_tokens"), round(sum(col("term")), 6).as("kl_bits"))
      .orderBy(col("source"))
  }

  def q112KlDivergence(s: SparkSession, d: String): DataFrame =
    klDivergence(documents(s, d))

  val q112Sql: String =
    """WITH tf AS (
      | SELECT source, token, CAST(count(*) AS BIGINT) AS c_st
      | FROM (SELECT source, unnest(str_split(text, ' ')) AS token FROM documents)
      | GROUP BY source, token
      |), corpus AS (
      | SELECT token, CAST(sum(c_st) AS BIGINT) AS c_t FROM tf GROUP BY token
      |), per_source AS (
      | SELECT source, CAST(sum(c_st) AS BIGINT) AS n_s FROM tf GROUP BY source
      |), total AS (
      | SELECT CAST(sum(c_t) AS BIGINT) AS n_total FROM corpus
      |)
      |SELECT tf.source, min(n_s) AS n_tokens,
      |  round(sum((c_st / CAST(n_s AS DOUBLE))
      |    * log2((c_st / CAST(n_s AS DOUBLE)) / (c_t / CAST(n_total AS DOUBLE)))), 6)
      |    AS kl_bits
      |FROM tf JOIN corpus USING (token) JOIN per_source USING (source), total
      |GROUP BY tf.source ORDER BY tf.source""".stripMargin

  // --------------------------------------------------------------- q113

  /** q113: DEFLATE COMPRESSIBILITY scoring — deflate(text).length /
    * raw bytes, the Gopher/Dolma-style redundancy signal: templated or
    * repetitive text compresses far below natural prose, so a low
    * ratio flags boilerplate that token-level heuristics (q73/q96)
    * can miss. Scored per doc, reported per source with a flagged
    * count (ratio < 0.3).
    *
    * 100 TB shape: [[graft.functions.DeflateLen]] is a codegen'd
    * native expression (per-thread Deflater reuse, only the LENGTH
    * escapes the kernel), so scoring is a map-only pass fused into the
    * scan's whole-stage-codegen span; the sole exchange is the
    * per-source aggregation of scalar partials. Rows-only: DuckDB has
    * no deflate — QualitySpec pins determinism, the
    * repetitive-vs-diverse ordering, and bounds instead. */
  def compressRatio(docs: DataFrame, flagBelow: Double): DataFrame =
    docs
      .select(col("source"),
        // empty text has no redundancy signal (0/0): ratio stays NULL,
        // the stats aggregate over scored docs only, and n_empty
        // reports the population gap explicitly instead of silently
        // mixing denominators
        (NativeExprs.deflateLen(col("text")).cast("double") /
          when(octet_length(col("text")) === 0, lit(null))
            .otherwise(octet_length(col("text")))).as("ratio"))
      .groupBy(col("source"))
      // n_scored, not n_docs: everywhere else in the suite n_docs is
      // the full group population; this count excludes empty docs, and
      // a dashboard joining it against q111/q119 would silently compare
      // different denominators under the same name (r9 ADVICE)
      .agg(count(col("ratio")).as("n_scored"),
           sum(when(col("ratio").isNull, 1L).otherwise(0L)).as("n_empty"),
           round(avg(col("ratio")), 4).as("mean_ratio"),
           round(min(col("ratio")), 4).as("min_ratio"),
           round(max(col("ratio")), 4).as("max_ratio"),
           sum(when(col("ratio") < flagBelow, 1L).otherwise(0L)).as("n_flagged"))
      .orderBy(col("source"))

  def q113CompressRatio(s: SparkSession, d: String): DataFrame =
    compressRatio(documents(s, d), 0.3)

  // --------------------------------------------------------------- q114

  /** q114: per-source KOLMOGOROV–SMIRNOV drift of the document-length
    * distribution vs the rest of the corpus — D_s = max_x |F_s(x) −
    * F_rest(x)|. The distribution-drift audit: a source whose length
    * CDF diverges from everyone else's (truncation bugs, a scraper
    * change, a new document type) surfaces with a large D even when
    * its mean looks normal (q111's blind spot).
    *
    * 100 TB shape: the corpus reduces to the (source, n_chars)
    * histogram digest in one map-side-combined pass — the only
    * full-scan shuffle, carrying two ints and a count per distinct
    * cell. The value grid × sources frame is digest-sized (distinct
    * lengths × dozens of sources); its windows and the final max are
    * noise. The one unpartitioned window (global running count) runs
    * over the distinct-value frame, bounded by the value domain, not
    * the corpus — same justification as q83's stats frame. */
  def ksDrift(docs: DataFrame): DataFrame = {
    val hist = docs.groupBy(col("source"), col("n_chars").as("v"))
      .agg(count(lit(1)).as("c_sv"))
    val vals = hist.select(col("v")).distinct()
    val srcs = hist.groupBy(col("source")).agg(sum(col("c_sv")).as("n_s"))
    val nTotal = srcs.agg(sum(col("n_s")).as("n_total"))
    val grid = vals.crossJoin(broadcast(srcs))
      .join(hist, Seq("source", "v"), "left")
      .na.fill(0L, Seq("c_sv"))
    val bySrc = Window.partitionBy(col("source")).orderBy(col("v"))
    val globalRun = sum(col("c_v")).over(Window.orderBy(col("v")))
    val gv = hist.groupBy(col("v")).agg(sum(col("c_sv")).as("c_v"))
      .withColumn("r_v", globalRun)
    grid
      .withColumn("r_sv", sum(col("c_sv")).over(bySrc))
      .join(broadcast(gv), Seq("v"))
      .crossJoin(broadcast(nTotal))
      .select(col("source"), col("n_s"),
        // single-source frame: the "rest" is empty (n_total = n_s) and
        // 0/0 would be NaN in Spark vs NULL in DuckDB — there is
        // nothing to drift from, so define D = 0 identically
        when(col("n_total") === col("n_s"), lit(0.0)).otherwise(
          abs(col("r_sv").cast("double") / col("n_s") -
            (col("r_v") - col("r_sv")).cast("double") / (col("n_total") - col("n_s"))))
          .as("diff"))
      .groupBy(col("source"))
      .agg(min(col("n_s")).as("n_docs"), round(max(col("diff")), 6).as("ks"))
      .orderBy(col("source"))
  }

  def q114KsDrift(s: SparkSession, d: String): DataFrame =
    ksDrift(documents(s, d))

  val q114Sql: String =
    """WITH hist AS (
      | SELECT source, n_chars AS v, CAST(count(*) AS BIGINT) AS c_sv
      | FROM documents GROUP BY source, n_chars
      |), vals AS (SELECT DISTINCT v FROM hist),
      |srcs AS (SELECT source, CAST(sum(c_sv) AS BIGINT) AS n_s FROM hist GROUP BY source),
      |total AS (SELECT CAST(sum(n_s) AS BIGINT) AS n_total FROM srcs),
      |grid AS (
      | SELECT s.source, s.n_s, vals.v, coalesce(h.c_sv, 0) AS c_sv
      | FROM vals CROSS JOIN srcs s
      | LEFT JOIN hist h ON h.source = s.source AND h.v = vals.v
      |), run AS (
      | SELECT source, n_s, v,
      |   sum(c_sv) OVER (PARTITION BY source ORDER BY v) AS r_sv
      | FROM grid
      |), gv AS (
      | SELECT v, sum(c_v) OVER (ORDER BY v) AS r_v FROM
      |   (SELECT v, CAST(sum(c_sv) AS BIGINT) AS c_v FROM hist GROUP BY v)
      |)
      |SELECT run.source, min(run.n_s) AS n_docs,
      |  round(max(CASE WHEN n_total = n_s THEN 0.0
      |    ELSE abs(CAST(r_sv AS DOUBLE) / n_s
      |      - CAST(r_v - r_sv AS DOUBLE) / (n_total - n_s)) END), 6) AS ks
      |FROM run JOIN gv USING (v), total
      |GROUP BY run.source ORDER BY run.source""".stripMargin

  // --------------------------------------------------------------- q117

  /** Poisson(1) inverse-CDF thresholds: u < cdf(k) ⇒ count k (k ≤ 7,
    * else 8). Computed once here and INTERPOLATED into the oracle SQL
    * via Double.toString (shortest round-trippable repr), so both
    * engines branch on bit-identical constants. */
  private val poissonCdf: Array[Double] = {
    val probs = (0 until 7).scanLeft(math.exp(-1.0)) { (p, k) => p / (k + 1) }
    probs.scanLeft(0.0)(_ + _).tail.toArray // cumulative of P(0)..P(7)
  }

  /** q117: POISSON-BOOTSTRAP confidence interval for a per-source
    * corpus metric (mean n_chars) — the distributed bootstrap: instead
    * of resampling rows (impossible without a global shuffle per
    * replica), every row draws an independent Poisson(1) weight per
    * replica, which converges to multinomial resampling at corpus
    * scale (Chamandy et al., "Estimating Uncertainty for Massive Data
    * Streams", Google 2012). A corpus metric without an error bar is
    * the q29/q93 discipline violated at the dashboard layer — this is
    * the generic fix.
    *
    * Deterministic and engine-portable: the weight derives from
    * md5(doc_id:boot:replica) → uniform → inverse-CDF lookup against
    * shared literal thresholds (q103's portable-randomness recipe).
    *
    * 100 TB shape: the replica fan-out is a map-side Generate (×R rows
    * inside the stage, never materialized); the per-(source, replica)
    * sums partial-aggregate map-side, so the exchange carries at most
    * tasks × sources × R scalar partials — independent of corpus
    * size. Replica means are exact int/int divisions (bit-identical
    * across engines); only the final digest (sources × R rows) feeds
    * the percentile. */
  def bootstrapCi(docs: DataFrame, replicas: Int): DataFrame = {
    val u = (conv(substring(md5(concat(col("doc_id").cast("string"),
        lit(":boot:"), col("r").cast("string"))), 1, 8), 16, 10)
      .cast("double") + lit(0.5)) / lit(4294967296.0)
    val k = poissonCdf.zipWithIndex.foldRight(lit(8): Column) {
      case ((cdf, i), rest) => when(col("u") < cdf, i).otherwise(rest)
    }
    val repMeans = docs
      .select(col("source"), col("doc_id"), col("n_chars"),
        explode(sequence(lit(0), lit(replicas - 1))).as("r"))
      .withColumn("u", u)
      .select(col("source"), col("r"), col("n_chars"), k.cast("long").as("w"))
      .groupBy(col("source"), col("r"))
      .agg(sum(col("w") * col("n_chars")).as("sx"), sum(col("w")).as("sw"))
      .select(col("source"), (col("sx").cast("double") / col("sw")).as("m"))
    val obs = docs.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), round(avg(col("n_chars")), 4).as("mean_obs"))
    repMeans.groupBy(col("source"))
      .agg(round(percentile(col("m"), lit(0.025)), 4).as("ci_lo"),
           round(percentile(col("m"), lit(0.975)), 4).as("ci_hi"))
      .join(broadcast(obs), Seq("source"))
      .select(col("source"), col("n_docs"), col("mean_obs"),
              col("ci_lo"), col("ci_hi"))
      .orderBy(col("source"))
  }

  /** Replica count shared by the Spark query and the generated oracle
    * SQL — interpolated into both so they cannot drift. */
  val BootstrapReplicas = 100

  def q117BootstrapCi(s: SparkSession, d: String): DataFrame =
    bootstrapCi(documents(s, d), BootstrapReplicas)

  val q117Sql: String = {
    val cases = poissonCdf.zipWithIndex
      .map { case (c, i) => s"WHEN u < $c THEN $i" }
      .mkString("\n|   CASE ", " ", " ELSE 8 END AS w")
    s"""WITH e AS (
       | SELECT source, doc_id, n_chars, unnest(range(0, $BootstrapReplicas)) AS r FROM documents
       |), uu AS (
       | SELECT source, n_chars,
       |  (list_sum(list_transform(range(1, 9),
       |     i -> (strpos('0123456789abcdef',
       |            substr(substr(md5(CAST(doc_id AS VARCHAR) || ':boot:' || CAST(r AS VARCHAR)), 1, 8),
       |                   CAST(i AS INT), 1)) - 1) * power(16, 8 - i)))
       |   + 0.5) / 4294967296.0 AS u,
       |  r
       | FROM e
       |), w AS (
       | SELECT source, r, n_chars,$cases
       | FROM uu
       |), rep AS (
       | SELECT source, r,
       |   CAST(sum(w * n_chars) AS DOUBLE) / CAST(sum(w) AS DOUBLE) AS m
       | FROM w GROUP BY source, r
       |), ci AS (
       | SELECT source, round(quantile_cont(m, 0.025), 4) AS ci_lo,
       |        round(quantile_cont(m, 0.975), 4) AS ci_hi
       | FROM rep GROUP BY source
       |), obs AS (
       | SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
       |   round(avg(n_chars), 4) AS mean_obs
       | FROM documents GROUP BY source
       |)
       |SELECT source, n_docs, mean_obs, ci_lo, ci_hi
       |FROM ci JOIN obs USING (source) ORDER BY source""".stripMargin
  }

  // --------------------------------------------------------------- q119

  /** q119: MEDIAN ABSOLUTE DEVIATION per source — the robust scale
    * estimate that pairs with q111's robust location (winsorized
    * mean): MAD = median(|x − median(x)|), 50% breakdown point, the
    * right yardstick for "how spread out is this source really" when
    * a few monster documents would wreck a stddev. Also reports the
    * classic robust-σ estimate 1.4826·MAD for direct comparison with
    * the (outlier-sensitive) sample stddev.
    *
    * 100 TB shape: two aggregation passes over the scan (median, then
    * median of deviations), each reducing to one row per source; the
    * median digest broadcasts back, the fact table never shuffles.
    * Exact percentile buffers per-group values — at real scale both
    * passes swap to approx_percentile (q93 discipline). */
  def mad(docs: DataFrame): DataFrame = {
    val med = docs.groupBy(col("source"))
      .agg(percentile(col("n_chars"), lit(0.5)).as("median"))
    docs.join(broadcast(med), Seq("source"))
      .select(col("source"), col("median"),
        abs(col("n_chars") - col("median")).as("dev"), col("n_chars"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
           round(min(col("median")), 4).as("median"),
           round(percentile(col("dev"), lit(0.5)), 4).as("mad"),
           round(percentile(col("dev"), lit(0.5)) * 1.4826, 4).as("robust_sigma"),
           round(stddev_samp(col("n_chars")), 4).as("stddev"))
      .orderBy(col("source"))
  }

  def q119Mad(s: SparkSession, d: String): DataFrame = mad(documents(s, d))

  val q119Sql: String =
    """WITH m AS (
      | SELECT source, quantile_cont(n_chars, 0.5) AS median
      | FROM documents GROUP BY source
      |)
      |SELECT d.source, CAST(count(*) AS BIGINT) AS n_docs,
      |  round(min(m.median), 4) AS median,
      |  round(quantile_cont(abs(d.n_chars - m.median), 0.5), 4) AS mad,
      |  round(quantile_cont(abs(d.n_chars - m.median), 0.5) * 1.4826, 4)
      |    AS robust_sigma,
      |  round(stddev_samp(d.n_chars), 4) AS stddev
      |FROM documents d JOIN m ON d.source = m.source
      |GROUP BY d.source ORDER BY d.source""".stripMargin

  // --------------------------------------------------------------- q120

  /** q120: per-source CORRELATION diagnostics — Pearson corr and
    * sample covariance between document length and token count, plus
    * the marginal stddevs. A broken tokenizer or a source whose
    * "tokens" are not whitespace-separated shows up as a corr far
    * from the corpus norm (for this corpus, near 1). Single
    * map-side-combined aggregation pass: corr/covar are algebraic
    * aggregates (sum, sum², sum-of-products partials), so the
    * exchange is a handful of scalars per source per mapper. */
  def lengthTokenCorr(docs: DataFrame): DataFrame = {
    val t = toks(col("text"))
    // degenerate groups break Spark's Corr where DuckDB returns NULL —
    // under ANSI a zero-variance group even throws DIVIDE_BY_ZERO from
    // inside the aggregate. Build corr from the stable piecewise
    // aggregates with an explicit zero/NULL-variance guard instead:
    // cv/(sd·sd) is Corr's own final division, just guarded, and the
    // pathological sources this diagnostic exists to surface come out
    // as NULL in both engines.
    val cv = covar_samp(col("x"), col("y"))
    val sx = stddev_samp(col("x"))
    val sy = stddev_samp(col("y"))
    val corrSafe = when(sx.isNull || sy.isNull || sx === 0 || sy === 0, lit(null))
      .otherwise(cv / (sx * sy))
    docs
      .select(col("source"), col("n_chars").cast("double").as("x"),
        size(t).cast("double").as("y"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
           round(corrSafe, 6).as("corr_len_tok"),
           round(cv, 4).as("covar"),
           round(sx, 4).as("sd_chars"),
           round(sy, 4).as("sd_tokens"))
      .orderBy(col("source"))
  }

  def q120LengthTokenCorr(s: SparkSession, d: String): DataFrame =
    lengthTokenCorr(documents(s, d))

  val q120Sql: String =
    """SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
      |  round(corr(CAST(n_chars AS DOUBLE),
      |             CAST(len(str_split(text, ' ')) AS DOUBLE)), 6) AS corr_len_tok,
      |  round(covar_samp(CAST(n_chars AS DOUBLE),
      |             CAST(len(str_split(text, ' ')) AS DOUBLE)), 4) AS covar,
      |  round(stddev_samp(CAST(n_chars AS DOUBLE)), 4) AS sd_chars,
      |  round(stddev_samp(CAST(len(str_split(text, ' ')) AS DOUBLE)), 4) AS sd_tokens
      |FROM documents GROUP BY source ORDER BY source""".stripMargin

  // --------------------------------------------------------------- q121

  /** q121: equi-width HISTOGRAM of document length per source over a
    * GLOBAL bucket grid — per-source length profiles on a shared axis
    * (the per-source drill-down of q114's single-number KS drift).
    * The bucket rule is plain arithmetic (least(floor((x−lo)/w),
    * nb−1)) rather than an engine-specific width_bucket, so both
    * engines bucket bit-identically.
    *
    * 100 TB shape: the global [lo, hi] digest is one min/max
    * aggregation (3 scalars) broadcast back as a literal-free cross
    * join; bucketing is map-side arithmetic; the histogram itself is
    * one map-side-combined count per (source, bucket) — at most
    * sources × 16 rows out. */
  def lengthHistogram(docs: DataFrame, buckets: Int): DataFrame = {
    val bounds = docs.agg(
      min(col("n_chars")).as("lo"), max(col("n_chars")).as("hi"))
    docs.crossJoin(broadcast(bounds))
      .select(col("source"),
        least(
          floor((col("n_chars") - col("lo")).cast("double") * buckets /
            (col("hi") - col("lo") + 1).cast("double")).cast("int"),
          lit(buckets - 1)).as("bucket"))
      .groupBy(col("source"), col("bucket"))
      .agg(count(lit(1)).as("n_docs"))
      .orderBy(col("source"), col("bucket"))
  }

  def q121LengthHistogram(s: SparkSession, d: String): DataFrame =
    lengthHistogram(documents(s, d), 16)

  val q121Sql: String =
    """WITH b AS (
      | SELECT min(n_chars) AS lo, max(n_chars) AS hi FROM documents
      |)
      |SELECT source,
      |  least(CAST(floor(CAST(n_chars - lo AS DOUBLE) * 16
      |          / CAST(hi - lo + 1 AS DOUBLE)) AS INT), 15) AS bucket,
      |  CAST(count(*) AS BIGINT) AS n_docs
      |FROM documents, b
      |GROUP BY 1, 2 ORDER BY source, bucket""".stripMargin

  // --------------------------------------------------------------- q128

  /** q128: CHARACTER-CLASS PROFILE per source — fractions of
    * alphabetic / digit / whitespace / other bytes, the C4-style
    * cleaning signal: encoding junk, markup residue, and table dumps
    * all shift mass into `other`/`digit` long before token-level
    * heuristics notice. Counts come from regexp_replace length
    * arithmetic (no per-char explode — the same count-by-deletion
    * trick as q35), so the whole profile is one map-side projection
    * plus a scalar-only aggregation per source. */
  def charClassProfile(docs: DataFrame): DataFrame = {
    def nOf(pattern: String): Column =
      (length(col("text")) -
        length(regexp_replace(col("text"), pattern, ""))).cast("bigint")
    docs
      // explicit whitespace class, NOT \s: Java's \s matches vertical
      // tab where RE2's (DuckDB's) does not — the one divergence in
      // exactly the control-character junk this profile exists to find
      .select(col("source"), length(col("text")).cast("bigint").as("n"),
        nOf("[a-zA-Z]").as("alpha"), nOf("[0-9]").as("digit"),
        nOf("[ \\t\\n\\r\\f]").as("space"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
           round(sum(col("alpha")).cast("double") / sum(col("n")), 6).as("alpha_frac"),
           round(sum(col("digit")).cast("double") / sum(col("n")), 6).as("digit_frac"),
           round(sum(col("space")).cast("double") / sum(col("n")), 6).as("space_frac"),
           round((sum(col("n")) - sum(col("alpha")) - sum(col("digit"))
             - sum(col("space"))).cast("double") / sum(col("n")), 6).as("other_frac"))
      .orderBy(col("source"))
  }

  def q128CharClassProfile(s: SparkSession, d: String): DataFrame =
    charClassProfile(documents(s, d))

  val q128Sql: String =
    """WITH c AS (
      | SELECT source, CAST(length(text) AS BIGINT) AS n,
      |   CAST(length(text) - length(regexp_replace(text, '[a-zA-Z]', '', 'g')) AS BIGINT) AS alpha,
      |   CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS BIGINT) AS digit,
      |   CAST(length(text) - length(regexp_replace(text, '[ \t\n\r\f]', '', 'g')) AS BIGINT) AS space
      | FROM documents
      |)
      |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
      |  round(CAST(sum(alpha) AS DOUBLE) / sum(n), 6) AS alpha_frac,
      |  round(CAST(sum(digit) AS DOUBLE) / sum(n), 6) AS digit_frac,
      |  round(CAST(sum(space) AS DOUBLE) / sum(n), 6) AS space_frac,
      |  round(CAST(sum(n) - sum(alpha) - sum(digit) - sum(space) AS DOUBLE)
      |        / sum(n), 6) AS other_frac
      |FROM c GROUP BY source ORDER BY source""".stripMargin

  // --------------------------------------------------------------- q151

  /** q151: LANGUAGE-MIX audit per source — language count, dominant-
    * language share, and the Shannon entropy (bits) of the language
    * distribution. The corpus-mixing report behind multilingual data
    * budgets: a "multilingual" source with entropy ≈ 0 is monolingual
    * in practice; a crawler bucket whose dominant share suddenly drops
    * changed its upstream. Degenerate single-lang sources score
    * entropy 0 exactly in both engines (p=1 → p·log2(p)=0, no log(0)
    * path is evaluated).
    *
    * 100 TB shape: the corpus collapses to the (source, lang) count
    * digest in one map-side-combined pass; shares and entropy are
    * digest-level arithmetic (≤ sources × langs rows). */
  def q151LangMix(s: SparkSession, d: String): DataFrame =
    langMix(documents(s, d))

  def langMix(docs: DataFrame): DataFrame = {
    val cnt = docs
      .groupBy(col("source"), col("lang"))
      .agg(count(lit(1)).as("n"))
    cnt
      .groupBy(col("source"))
      .agg(sum(col("n")).as("n_docs"), count(lit(1)).as("n_langs"),
           max(col("n")).as("n_dom"),
           sum(col("n") * log2(col("n"))).as("sum_nlogn"))
      .select(col("source"), col("n_docs"), col("n_langs"),
        round(col("n_dom").cast("double") / col("n_docs"), 6).as("dom_share"),
        // H = log2(N) - (1/N)·Σ n·log2(n): one pass, no per-row p
        // column, exact 0 for the single-lang source
        round(log2(col("n_docs")) - col("sum_nlogn") / col("n_docs"), 6)
          .as("lang_entropy_bits"))
      .orderBy(col("source"))
  }

  val q151Sql: String =
    """WITH c AS (
      | SELECT source, lang, CAST(count(*) AS BIGINT) AS n
      | FROM documents GROUP BY 1, 2
      |)
      |SELECT source, CAST(sum(n) AS BIGINT) AS n_docs,
      |  CAST(count(*) AS BIGINT) AS n_langs,
      |  round(CAST(max(n) AS DOUBLE) / sum(n), 6) AS dom_share,
      |  round(log2(CAST(sum(n) AS DOUBLE))
      |        - sum(n * log2(CAST(n AS DOUBLE))) / sum(n), 6) AS lang_entropy_bits
      |FROM c GROUP BY source ORDER BY source""".stripMargin

  // ---------------------------------------------------------------

  /** q169: BYTE-WEIGHTED LENGTH MEDIAN per source — the smallest doc
    * length L such that docs of length ≤ L hold at least half the
    * source's BYTES, next to the plain doc-count median. The curation
    * metric the doc-median hides: a source can have a modest median
    * document while a few huge documents carry most of its training
    * mass — token budgets, packing, and dedup priorities follow bytes,
    * not document counts (byte_median ≥ doc_median always; the GAP is
    * the tail-heaviness signal).
    *
    * Scale shape: one scan projecting (source, doc_id, n_chars); the
    * running byte sum is a per-source window (never global — the q100
    * discipline), and the profile is a 4-row aggregation with the
    * qualifying-length min folded in as a conditional aggregate, so
    * there is no second scan and no rejoin.
    *
    * The doc-count median is emitted as `doc_median_x2` — the SUM of
    * the two middle-rank lengths, a BIGINT (= 2× the median; equal
    * middle ranks when the count is odd). Round-11 verdict ask #1:
    * the original `percentile(...)` DOUBLE was the suite's one column
    * where Spark and the DuckDB oracle each computed a float through
    * their OWN interpolation code paths, and it hash-mismatched in
    * the driver's gate while matching locally. Both engines now
    * derive the column from identical integer rank arithmetic
    * (row_number over (n_chars, doc_id), middle ranks by integer
    * division) — the q103/q117/q121 portable-arithmetic discipline.
    *
    * Round-12 verdict root cause (the rank fix alone did not cure the
    * gate): DuckDB types a windowed `sum(BIGINT)` as HUGEINT, and
    * `max(tot)` carries it through — `total_chars` was the ONE
    * decimal128 Arrow column in all 154 oracle SQLs; values matched
    * row-for-row, only the type differed, and the driver's hasher is
    * Arrow-typed. Hence the `CAST(max(tot) AS BIGINT)` in q169Sql and
    * the suite-wide oracle-type guard (tools/oracle_type_guard.py,
    * run by OracleTypeGuardSpec) that fails any oracle emitting
    * decimal/hugeint output columns. */
  def q169ByteWeightedMedian(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("source"))
      .orderBy(col("n_chars"), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = Window.partitionBy(col("source"))
    val rnW = Window.partitionBy(col("source"))
      .orderBy(col("n_chars"), col("doc_id"))
    documents(s, d)
      .select(col("source"), col("doc_id"), col("n_chars").cast("long").as("n_chars"))
      .withColumn("cum", sum(col("n_chars")).over(w))
      .withColumn("tot", sum(col("n_chars")).over(tot))
      .withColumn("rn", row_number().over(rnW).cast("long"))
      .withColumn("cnt", count(lit(1)).over(tot))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
           max(col("tot")).as("total_chars"),
           min(when(col("cum") * 2 >= col("tot"), col("n_chars")))
             .as("byte_median"),
           (max(when(col("rn") === expr("(cnt + 1) DIV 2"), col("n_chars"))) +
             max(when(col("rn") === expr("(cnt + 2) DIV 2"), col("n_chars"))))
             .as("doc_median_x2"))
      .orderBy(col("source"))
  }

  val q169Sql: String =
    """WITH c AS (
      | SELECT source, CAST(n_chars AS BIGINT) AS n_chars,
      |  sum(CAST(n_chars AS BIGINT)) OVER (PARTITION BY source
      |    ORDER BY n_chars, doc_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
      |  sum(CAST(n_chars AS BIGINT)) OVER (PARTITION BY source) AS tot,
      |  CAST(row_number() OVER (PARTITION BY source
      |    ORDER BY n_chars, doc_id) AS BIGINT) AS rn,
      |  count(*) OVER (PARTITION BY source) AS cnt
      | FROM documents
      |)
      |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
      |  CAST(max(tot) AS BIGINT) AS total_chars,
      |  min(CASE WHEN cum * 2 >= tot THEN n_chars END) AS byte_median,
      |  max(CASE WHEN rn = (cnt + 1) // 2 THEN n_chars END)
      |    + max(CASE WHEN rn = (cnt + 2) // 2 THEN n_chars END) AS doc_median_x2
      |FROM c GROUP BY source ORDER BY source""".stripMargin

  // --------------------------------------------------------------- q183

  /** Boundary rule for content-defined chunking: a token closes a
    * chunk when the first hex digit of its md5 is this value → p =
    * 1/16 → geometric chunk lengths with mean 16 tokens (q109's fixed
    * width, made content-keyed). md5 keeps the boundary decision
    * byte-identical in DuckDB; a production run that doesn't need
    * oracle parity would use xxhash64 & 15 for the same rule. */
  val CdcBoundaryHex = "0"

  /** q183: CONTENT-DEFINED CHUNK DEDUP — the shift-resistant
    * production form of q109. q109 chunks at FIXED 16-token offsets,
    * so one inserted token shifts every later chunk boundary and
    * destroys all downstream fingerprint matches (an editor adding a
    * byline defeats the dedup). Here a boundary is a property of the
    * TOKEN ITSELF — the storage-dedup / CDC trick (LBFS, SOSP'01):
    * after any local edit, boundaries — hence fingerprints — re-align
    * from the next boundary token on, so near-identical docs still
    * share almost all chunks. QualitySpec plants exactly that editor
    * scenario against both chunkers.
    *
    * Output per source: chunk volume, distinct chunks, and the dup
    * ratio (the redundancy a chunk-level dedup pass would reclaim).
    *
    * Scale shape: boundaries, spans and fingerprints are computed
    * INSIDE the scan with codegen'd higher-order functions (filter/
    * transform/slice over the token array — no explode of raw
    * tokens); only (source, 32-char chunk fp) pairs reach the
    * exchange, and the verdict is one fp-level aggregation. */
  def q183CdcDedup(s: SparkSession, d: String): DataFrame =
    cdcChunkDedup(documents(s, d))

  /** Per-doc CDC chunk fingerprints as an array column (exposed for
    * the spec's shift-resistance test).
    *
    * Implemented as ONE `aggregate` fold over the token array — one
    * boundary md5 per token plus one fingerprint md5 per chunk. (A
    * boundary-positions-then-slice formulation reads more naturally
    * but re-embeds the O(tokens) boundary scan inside the per-chunk
    * lambda — Spark inlines, not CSEs, a captured array expression —
    * and measured O(tokens²) on sf0.1: 35 s vs ~2 s for this fold.) */
  def cdcChunkFps(text: Column): Column = {
    val t = split(text, " ")
    // `started` tracks emptiness EXPLICITLY: `cur == ""` conflates an
    // empty accumulator with having accumulated an empty token
    // (consecutive/leading/trailing spaces split to "" tokens), which
    // silently dropped those tokens from chunk fingerprints while the
    // DuckDB oracle's positional slices keep them as join separators
    val zero = struct(
      array().cast("array<string>").as("chunks"),
      lit("").as("cur"), lit(false).as("started"))
    aggregate(t, zero,
      (acc, tok) => {
        val cur2 = when(not(acc("started")), tok)
          .otherwise(concat(acc("cur"), lit(" "), tok))
        val isBoundary = substring(md5(tok), 1, 1) === CdcBoundaryHex
        struct(
          when(isBoundary, concat(acc("chunks"), array(md5(cur2))))
            .otherwise(acc("chunks")).as("chunks"),
          when(isBoundary, lit("")).otherwise(cur2).as("cur"),
          when(isBoundary, lit(false)).otherwise(lit(true)).as("started"))
      },
      // finish: an unterminated tail is the final chunk (acc is bound
      // once here, unlike an outer reference which Spark would inline
      // — and so re-fold — per occurrence)
      acc => when(not(acc("started")), acc("chunks"))
        .otherwise(concat(acc("chunks"), array(md5(acc("cur"))))))
  }

  def cdcChunkDedup(docs: DataFrame): DataFrame =
    docs
      .filter(length(col("text")) > 0)
      .select(col("source"), explode(cdcChunkFps(col("text"))).as("fp"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_chunks"),
        countDistinct(col("fp")).as("n_uniq_chunks"),
        round(lit(1d) - countDistinct(col("fp")).cast("double") / count(lit(1)), 4)
          .as("dup_ratio"))
      .orderBy(col("source"))

  val q183Sql: String =
    s"""WITH d AS (
      | SELECT source, str_split(text, ' ') AS t FROM documents WHERE len(text) > 0
      |), e AS (
      | SELECT source, t,
      |   [i for i in range(1, len(t)+1)
      |    if substr(md5(t[i]),1,1) = '$CdcBoundaryHex' or i = len(t)] AS ends
      | FROM d
      |), c AS (
      | SELECT source,
      |   unnest([md5(array_to_string(
      |     t[(CASE WHEN j = 1 THEN 1 ELSE ends[j-1] + 1 END):ends[j]], ' '))
      |     for j in range(1, len(ends)+1)]) AS fp
      | FROM e
      |)
      |SELECT source, CAST(count(*) AS BIGINT) AS n_chunks,
      |  CAST(count(DISTINCT fp) AS BIGINT) AS n_uniq_chunks,
      |  round(1 - CAST(count(DISTINCT fp) AS DOUBLE) / count(*), 4) AS dup_ratio
      |FROM c GROUP BY source ORDER BY source""".stripMargin

  // --------------------------------------------------------- q184/q185

  /** The quantiles both HDR queries read out. */
  val HdrQs = Seq(0.5, 0.9, 0.99)

  /** q184: MERGEABLE QUANTILE SKETCH — per-source p50/p90/p99 of
    * n_chars via [[graft.functions.HdrQuantileAgg]], the quantile
    * member of the sketch family (q53 HLL / q104 CMS / q74
    * SpaceSaving / q178 reservoir). Unlike q93's percentile_approx
    * this sketch is a PERSISTABLE column with lossless element-wise
    * merge, so it plays q173's stored-rollup game (q185). The readout
    * is the DETERMINISTIC lower bound of the log-bucket holding the
    * rank-⌈q·n⌉ value (relative rounding ≤ 2^-6) — which is why a
    * DuckDB oracle can reproduce it bit-exactly: bucket arithmetic is
    * integer shifts on the exact rank-target value, no estimation gap
    * to paper over. Scale shape: one aggregation, fixed ≤ 18 KiB
    * state per group, map-side partials; no window, no sort. */
  def q184HdrQuantiles(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        graft.functions.HdrQuantileAgg.hdrQuantiles(col("n_chars"), HdrQs).as("qv"))
      .select(col("source"), col("n_docs"),
        col("qv")(0).as("p50"), col("qv")(1).as("p90"), col("qv")(2).as("p99"))
      .orderBy(col("source"))

  /** The oracle's copy of the bucket-lower-bound readout: pure integer
    * arithmetic (binary length + shifts) on an exact rank-target
    * value, shared by the q184/q185 SQL. */
  private def lbSql(v: String): String =
    s"CASE WHEN $v < 64 THEN $v ELSE (1::BIGINT << (length(bin($v))-1)) " +
      s"+ ((($v >> (length(bin($v))-1-6)) & 63)::BIGINT << (length(bin($v))-1-6)) END"

  private def rankSql(q: Double, v: String = "n_chars"): String =
    s"max(CASE WHEN rn = GREATEST(1, CAST(ceil($q*n) AS BIGINT)) THEN $v END)"

  val q184Sql: String =
    s"""WITH r AS (
      | SELECT source, n_chars,
      |   row_number() OVER (PARTITION BY source ORDER BY n_chars) AS rn,
      |   count(*) OVER (PARTITION BY source) AS n
      | FROM documents
      |), t AS (
      | SELECT source, n,
      |   ${rankSql(0.5)} AS v50, ${rankSql(0.9)} AS v90, ${rankSql(0.99)} AS v99
      | FROM r GROUP BY source, n
      |)
      |SELECT source, CAST(n AS BIGINT) AS n_docs,
      |  ${lbSql("v50")} AS p50, ${lbSql("v90")} AS p90, ${lbSql("v99")} AS p99
      |FROM t ORDER BY source""".stripMargin

  /** q185: PERSISTED-QUANTILE-SKETCH ROLLUP — q173's pattern for
    * quantiles: ONE corpus pass builds a tiny (source, lang) →
    * HDR-sketch-bytes table (what a pipeline persists per vintage),
    * then the per-lang readout and the ALL row aggregate ONLY those
    * sketches. Because the histogram merge is lossless, the rolled-up
    * quantiles are exactly a direct pass's — so even this two-stage
    * form stays hash-verifiable against a plain SQL oracle. The plan
    * pin mirrors q173's: stage 2 reads no parquet. */
  def q185HdrRollup(s: SparkSession, d: String): DataFrame = {
    import graft.functions.HdrQuantileAgg.{hdrMergeQuantiles, hdrSketch}
    val built = documents(s, d)
      .groupBy(col("source"), col("lang"))
      .agg(hdrSketch(col("n_chars")).as("sk"), count(lit(1)).as("n_docs"))
    val sketches = s.createDataFrame(
      s.sparkContext.parallelize(built.collect().toSeq, 1), built.schema)
    def readout(g: DataFrame): DataFrame = g
      .select(col("lang"), col("n_docs"),
        col("qv")(0).as("p50"), col("qv")(1).as("p90"), col("qv")(2).as("p99"))
    val perLang = readout(sketches.groupBy(col("lang"))
      .agg(sum(col("n_docs")).as("n_docs"),
        hdrMergeQuantiles(col("sk"), HdrQs).as("qv")))
    val all = readout(sketches
      .agg(sum(col("n_docs")).as("n_docs"),
        hdrMergeQuantiles(col("sk"), HdrQs).as("qv"))
      .select(lit("ALL").as("lang"), col("n_docs"), col("qv")))
    perLang.unionByName(all).orderBy(col("lang"))
  }

  val q185Sql: String =
    s"""WITH src AS (
      | SELECT lang, n_chars FROM documents
      | UNION ALL
      | SELECT 'ALL' AS lang, n_chars FROM documents
      |), r AS (
      | SELECT lang, n_chars,
      |   row_number() OVER (PARTITION BY lang ORDER BY n_chars) AS rn,
      |   count(*) OVER (PARTITION BY lang) AS n
      | FROM src
      |), t AS (
      | SELECT lang, n,
      |   ${rankSql(0.5)} AS v50, ${rankSql(0.9)} AS v90, ${rankSql(0.99)} AS v99
      | FROM r GROUP BY lang, n
      |)
      |SELECT lang, CAST(n AS BIGINT) AS n_docs,
      |  ${lbSql("v50")} AS p50, ${lbSql("v90")} AS p90, ${lbSql("v99")} AS p99
      |FROM t ORDER BY lang""".stripMargin

  val queries: Seq[(String, (SparkSession, String) => DataFrame, Option[String])] = Seq(
    ("q109_chunk_dedup", q109ChunkDedup _, Some(q109Sql)),
    ("q110_quantile_norm", q110QuantileNorm _, Some(q110Sql)),
    ("q111_winsorize", q111Winsorize _, Some(q111Sql)),
    ("q112_kl_divergence", q112KlDivergence _, Some(q112Sql)),
    ("q113_compress_ratio", q113CompressRatio _, None),
    ("q114_ks_drift", q114KsDrift _, Some(q114Sql)),
    ("q117_bootstrap_ci", q117BootstrapCi _, Some(q117Sql)),
    ("q119_mad", q119Mad _, Some(q119Sql)),
    ("q120_length_token_corr", q120LengthTokenCorr _, Some(q120Sql)),
    ("q121_length_histogram", q121LengthHistogram _, Some(q121Sql)),
    ("q128_charclass_profile", q128CharClassProfile _, Some(q128Sql)),
    ("q151_lang_mix", q151LangMix _, Some(q151Sql)),
    ("q169_byte_weighted_median", q169ByteWeightedMedian _, Some(q169Sql)),
    ("q183_cdc_chunk_dedup", q183CdcDedup _, Some(q183Sql)),
    ("q184_hdr_quantiles", q184HdrQuantiles _, Some(q184Sql)),
    ("q185_hdr_rollup", q185HdrRollup _, Some(q185Sql)))
}
