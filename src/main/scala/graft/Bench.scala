package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): runs every declared query against
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line
  * {"metric":"total","value":N,"unit":"sec","queries":{...},"sf":...}.
  * Queries run in sorted-name order; a failed query contributes its
  * elapsed time and is reported on stderr (never corrupts the JSON).
  *
  * The full JSON (including per-query spread) is ALSO written to
  * BENCH_FULL.json (override: SPARK_GRAFT_BENCH_OUT) because the
  * driver's stdout capture keeps only the tail of very long lines —
  * rounds 1-5 lost q01-q15 to that truncation. */
object Bench {

  /** A query's accepted estimate is the min over its samples, but only
    * once two samples agree within this factor — one sample alone (or
    * two that disagree wildly) may both sit inside a noisy-neighbor
    * burst. */
  val AgreeFactor = 2.0

  /** Two samples within this many seconds of each other always agree:
    * scheduling jitter makes sub-second queries violate the ratio test
    * routinely, and re-timing them buys no information — the burst
    * this estimator defends against inflates by tens of seconds. */
  val AgreeFloorSec = 0.5

  /** Extra re-time rounds after the two base sweeps. */
  val MaxRetryRounds = 3

  /** Pause before each retry round. The box's bursts are multi-minute,
    * so a retry fired immediately after a disagreement often lands in
    * the same burst; a solid gap (plus the other retried queries'
    * runtime) buys temporal separation without unbounded bench cost. */
  val RetryPauseMs = 45000L

  /** Slow queries keep sampling even when their samples agree: a burst
    * longer than both sweeps makes inflated samples agree with EACH
    * OTHER (observed: a 1.5s query recorded as [70s, 106s] "agreed",
    * and a 2.7s one as [36s, 42s] across THREE samples inside one
    * burst). Any query whose best sample still exceeds this threshold
    * gets re-timed, up to [[SlowMaxSamples]] total, hunting for a
    * clean window; one sub-threshold sample ends the hunt (the ratio
    * test then anchors on it). Genuinely slow queries pay a bounded
    * extra cost and come out with five consistent samples — strong
    * evidence either way. */
  val SlowThresholdSec = 5.0
  val SlowMaxSamples = 5

  def agreed(samples: Seq[Double]): Boolean = {
    val s = samples.sorted
    s.length >= 2 &&
      (s(1) - s(0) < AgreeFloorSec || s(1) <= s(0) * AgreeFactor)
  }

  def needsMoreSamples(samples: Seq[Double]): Boolean =
    !agreed(samples) ||
      (samples.min > SlowThresholdSec && samples.length < SlowMaxSamples)

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val outFile = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH_FULL.json")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // session warmup: exercise codegen, shuffle, and the parquet reader
    // once so the first timed query measures the query, not JVM warmup
    spark.range(1 << 20).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$sfDir/region.parquet").groupBy("r_name").count().count()
    def timeOnce(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      // noop-format write: materializes EVERY output column through the
      // full plan (a count() would let Catalyst prune unreferenced
      // projections, flattering map-only queries) without sink IO cost
      try { fn(spark, sfDir).write.mode("overwrite").format("noop").save() }
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
      }
      val dt = (System.nanoTime() - t0) / 1e9
      // queries that cache intermediates (sketch/signature frames) must
      // not leak executor memory into the next measurement
      spark.catalog.clearCache()
      dt
    }
    // This box has noisy neighbors: a roaming multi-minute burst can
    // inflate a CONTIGUOUS window of queries 20-50× (observed q20
    // 0.6s → 80s, and r5's q72 9.4s → 408s, with identical plans).
    // Estimator: two full sweeps (the second runs AFTER the whole
    // first, ≈ one suite length of temporal separation), then ADAPTIVE
    // re-times for any query whose two samples disagree by more than
    // AgreeFactor — a burst longer than one sweep defeats min-of-two,
    // so disagreement is retried (with a pause) until two samples
    // agree or the retry cap is hit. The reported value is the min;
    // the per-query spread is emitted so residual noise is visible in
    // the artifact instead of requiring forensics.
    val ordered = SparkEntry.queries.toSeq.sortBy(_._1)
    val samples = scala.collection.mutable.Map[String, Vector[Double]]()
    for (sweep <- 1 to 2; (name, fn) <- ordered)
      samples(name) = samples.getOrElse(name, Vector.empty) :+ timeOnce(name, fn)
    var retry = 0
    while (retry < MaxRetryRounds &&
           ordered.exists { case (n, _) => needsMoreSamples(samples(n)) }) {
      val disagreeing = ordered.filter { case (n, _) => needsMoreSamples(samples(n)) }
      System.err.println(s"[bench] retry round ${retry + 1}: " +
        disagreeing.map(_._1).mkString(", "))
      Thread.sleep(RetryPauseMs)
      for ((name, fn) <- disagreeing)
        samples(name) = samples(name) :+ timeOnce(name, fn)
      retry += 1
    }
    def fmt(v: Double) = BigDecimal(v).setScale(4, BigDecimal.RoundingMode.HALF_UP).toString
    val results = ordered.map { case (name, _) => name -> samples(name).min }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + fmt(v) }
      .mkString("{", ",", "}")
    val spread = ordered.map { case (name, _) =>
      val s = samples(name)
      "\"" + name + "\":[" + fmt(s.min) + "," + fmt(s.max) + "," + s.length +
        "," + (if (agreed(s)) "true" else "false") + "]"
    }.mkString("{", ",", "}")
    val total = results.map(_._2).sum
    // spread BEFORE queries: the driver's stdout capture keeps the
    // line's tail, so the contract-critical queries map goes last
    val json = s"""{"metric":"total","value":${fmt(total)},"unit":"sec",""" +
      s""""spread_format":"[min,max,n_samples,agreed]","spread":$spread,""" +
      s""""queries":$qs,"sf":"$sfDir"}"""
    // file first (survives stdout truncation), then the contract line
    try {
      val w = new java.io.PrintWriter(outFile, "UTF-8")
      try w.println(json) finally w.close()
    } catch { case e: Throwable =>
      System.err.println(s"[bench] could not write $outFile: ${e.getMessage}")
    }
    println(json)
    spark.stop()
  }
}
