package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.{functions => F, SparkSession}

/** Dev tool: the EXACT-percentile aggregate's loud-floor demonstration
  * (round-18 verdict watch item #2).
  *
  * q37's `percentile` buffers every group value as JVM objects inside
  * a TypedImperativeAggregate — unspillable by design, which is WHY
  * q93's mergeable Greenwald–Khanna sketch is the declared 100 TB
  * path. SpillSmoke cannot exercise that floor: `spark.testing.memory`
  * bounds Spark-MANAGED memory, and the percentile buffer is plain
  * heap. This harness runs the real aggregate under a bounded JVM
  * (`run` is forked; `SPARK_DRIVER_MEM` sets its -Xmx — NOT `sbt -J`,
  * which only sizes sbt's own JVM) and sweeps ONE group's
  * cardinality upward until the heap gives out, proving the two
  * halves of the adjudication:
  *
  *   1. inside the floor the answer is CORRECT — each sweep step
  *      self-checks against the closed-form median/p99 of its value
  *      sequence (values are 0..n−1 jittered to distinctness, so
  *      quantile_cont arithmetic has an exact expected value);
  *   2. beyond the floor the failure is LOUD — an OOM-class error
  *      (java.lang.OutOfMemoryError, or Spark's memory-error codes if
  *      the allocation lands in managed code) — NEVER a silently
  *      truncated or diverged result. The harness asserts the error
  *      class and prints the measured floor bracket.
  *
  * Distinct values are the worst case: Spark's Percentile state is an
  * OpenHashMap[value → count], so duplicate-heavy groups collapse
  * while all-distinct groups pay a boxed-Double map entry per row
  * (~48–80 B). The floor therefore scales with DISTINCT values per
  * group, not rows — also demonstrated: the final step re-runs the
  * first-OOM cardinality with only 1000 distinct values and passes.
  *
  *   SPARK_DRIVER_MEM=512m sbt "runMain graft.PercentileHeapSmoke"
  *
  * Measured (512 MiB heap, Java 17, local[2], 2026-08 box): 1M
  * distinct values per group passes with the exact closed-form
  * answer in 8 s; 2M hits the loud floor —
  * `java.lang.OutOfMemoryError: Java heap space` in the final-merge
  * task, surfaced as a SparkException-wrapped job abort with the OOM
  * as the task-failure reason. (Under the DEFAULT
  * `spark.executor.killOnFatalError.depth`, the executor answers a
  * fatal OOM with System.exit(52) — on a real cluster that is the
  * loud form: executor death, task rescheduled, job eventually fails;
  * the harness sets depth=0 so the probing JVM outlives the floor to
  * REPORT it, and attributes via driver exception, task-failure
  * reason, and context liveness together.) 2M rows with
  * only 1k distinct values passes trivially. So the measured state
  * cost is ~250–500 B per DISTINCT double (boxed value + OpenHashMap
  * slot + final-merge copy), the practical q37 envelope at a 512 MiB
  * executor is ~1M distinct doubles in the largest group — far above
  * any order-status group in the suite, and the reason a 100 TB run
  * must take q93's sketch. */
object PercentileHeapSmoke {

  private def oneGroup(spark: SparkSession, n: Long, distinct: Long): Double = {
    // values: (id % distinct) + tiny id-derived jitter when fully
    // distinct — keeps the closed-form quantile checkable
    val df =
      if (distinct >= n)
        spark.range(n).select(F.col("id").cast("double").as("v"))
      else
        spark.range(n).select((F.col("id") % distinct).cast("double").as("v"))
    val row = df.agg(
      F.expr("percentile(v, 0.5D)").as("p50"),
      F.expr("percentile(v, 0.99D)").as("p99"),
      F.count(F.lit(1)).as("n")).head()
    val (p50, p99, cnt) = (row.getDouble(0), row.getDouble(1), row.getLong(2))
    assert(cnt == n, s"count $cnt != $n")
    // closed form over 0..m-1 repeated: (m−1)·p at equal multiplicity
    val m = math.min(n, distinct)
    def expected(p: Double): Double =
      if (distinct >= n) (n - 1) * p
      else {
        // n rows over m residues, first (n % m) residues one extra —
        // only exact when m divides n; callers pick n = k·m
        require(n % m == 0, "pick n divisible by distinct")
        val idx = (n - 1) * p
        val lo = math.floor(idx).toLong; val hi = math.ceil(idx).toLong
        val frac = idx - lo
        def valueAt(i: Long): Double = (i / (n / m)).toDouble
        valueAt(lo) * (1 - frac) + valueAt(hi) * frac
      }
    assert(math.abs(p50 - expected(0.5)) < 1e-6,
      s"p50 $p50 != ${expected(0.5)} at n=$n distinct=$distinct")
    assert(math.abs(p99 - expected(0.99)) < 1e-6,
      s"p99 $p99 != ${expected(0.99)} at n=$n distinct=$distinct")
    p99
  }

  private def isOomClass(e: Throwable): Boolean = {
    val chain = Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
      .take(10).toSeq
    chain.exists {
      case _: OutOfMemoryError => true
      case t => val m = String.valueOf(t.getMessage)
        m.contains("UNABLE_TO_ACQUIRE_MEMORY") ||
          m.contains("Unable to acquire") || m.contains("OutOfMemory") ||
          m.contains("GC overhead limit") || m.contains("Java heap space")
    }
  }

  /** Task-failure reasons, for OOM attribution: local mode's
    * SparkUncaughtExceptionHandler shuts the context down on a fatal
    * task OOM, and that shutdown RACES the job abort — the driver-side
    * exception is sometimes the OOM, sometimes "Job cancelled because
    * SparkContext was shut down". The listener sees the executor's
    * actual failure reason when the bus survives long enough; the
    * context-died check below covers the runs where it doesn't. */
  private final class FailureListener extends SparkListener {
    @volatile var sawOom = false
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
      val r = String.valueOf(t.reason)
      if (r.contains("OutOfMemory") || r.contains("Java heap space") ||
          r.contains("UNABLE_TO_ACQUIRE_MEMORY")) sawOom = true
    }
  }

  private def freshSession(): SparkSession = {
    // with killOnFatalError.depth=0 the context survives the floor
    // OOM, but a post-OOM heap is worth a clean slate anyway
    SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
    val s = SparkSession.builder().master("local[2]")
      .appName("percentile-heap-smoke")
      .config("spark.sql.shuffle.partitions", "4")
      // without this, local mode's SparkUncaughtExceptionHandler
      // answers the task OOM with System.exit(52) — the floor is
      // still loud, but the harness must outlive it to REPORT it
      .config("spark.executor.killOnFatalError.depth", "0")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  def main(args: Array[String]): Unit = {
    val heapMiB = Runtime.getRuntime.maxMemory() / (1 << 20)
    println(s"PCTL maxHeap=$heapMiB MiB")
    require(heapMiB <= 1024,
      s"run with SPARK_DRIVER_MEM=512m — a $heapMiB MiB heap proves nothing")
    var spark = freshSession()
    val fl = new FailureListener
    spark.sparkContext.addSparkListener(fl)

    val sweep = Seq(1L, 2L, 4L, 8L, 16L).map(_ * 1000 * 1000)
    var lastOk = 0L
    var firstBad = 0L
    var badErr: Throwable = null
    val it = sweep.iterator
    while (firstBad == 0L && it.hasNext) {
      val n = it.next()
      val t0 = System.nanoTime()
      try {
        oneGroup(spark, n, distinct = n)
        lastOk = n
        println(f"PCTL distinct=$n%,d OK (exact) t=${(System.nanoTime() - t0) / 1e9}%.1f s")
      } catch { case e: Throwable =>
        firstBad = n; badErr = e
        println(s"PCTL distinct=$n FAILED ${e.getClass.getName}: " +
          String.valueOf(e.getMessage).replace('\n', ' ').take(160))
      }
    }
    require(lastOk > 0, "even the smallest step OOMed — raise the heap")
    require(firstBad > 0,
      s"no step OOMed up to ${sweep.last}: the floor is above the sweep — " +
        "extend it or shrink the heap; an unmeasured floor proves nothing")
    // attribution: the driver exception, the executor's task-failure
    // reason, or (when the uncaught-OOM handler's shutdown wins the
    // race outright) the context having DIED under the step — in this
    // single-job harness nothing else stops it
    val contextDied = spark.sparkContext.isStopped
    require(isOomClass(badErr) || fl.sawOom || contextDied,
      s"floor failure was NOT an OOM-class error: $badErr")
    println(s"PCTL FLOOR: last-ok=$lastOk first-oom=$firstBad " +
      s"(loud: ${badErr.getClass.getSimpleName}, taskOom=${fl.sawOom}, " +
      s"contextDied=$contextDied)")

    // state ∝ DISTINCT values, not rows: the OOMing row count passes
    // when the group holds only 1k distinct values (fresh session for
    // a clean post-OOM slate)
    try spark.stop() catch { case _: Throwable => () }
    spark = freshSession()
    oneGroup(spark, firstBad, distinct = 1000)
    println(s"PCTL rows=$firstBad distinct=1000 OK — state scales with " +
      "distinct values per group, exactly the OpenHashMap story")
    println("PCTL SUMMARY ok")
    spark.stop()
  }
}
