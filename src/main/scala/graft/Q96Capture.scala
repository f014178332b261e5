package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: q96's sticky slow-JVM-mode capture rig (round-18 verdict
  * watch item #3).
  *
  * Observed in r18's 100× sessions: q96_boilerplate usually runs the
  * ×100 replica in 31–36 s, but three early sessions read a STICKY
  * ~162–172 s (≈ ×5) — both runs within each JVM, gone in every later
  * session including a byte-identical program copy. Two hypotheses
  * survived the r18 data: a C2 bailout/deopt loop leaving the biggest
  * generated method interpreted, or VM CPU-steal windows. This rig
  * exists to pick one the next time the mode appears:
  *
  *   - runs q96 twice on the staged ×100 replica (same conf shape as
  *     ScaleSmoke: local[8], shuffle=8, AQE on, noop write), printing
  *     per-run wall plus the in-band JVM counters that separate the
  *     hypotheses — JIT total compilation time, per-CodeHeap
  *     occupancy (a full 'non-profiled nmethods' heap disables C2 →
  *     sticky interpreted/C1 execution), process CPU time vs wall
  *     (CPU-steal shows wall ≫ cpu/cores; a deopt loop burns cpu ≈
  *     wall × cores);
  *   - meant to be launched with JFR + LogCompilation via
  *     SPARK_GRAFT_EXTRA_JVM_OPTS (see README runbook) so a slow
  *     session leaves `jfr print`-able evidence of interpreted frames
  *     vs missing CPU;
  *   - supports MECHANISM CONTROLS run by the caller via
  *     SPARK_GRAFT_EXTRA_JVM_OPTS (the arg only labels the output):
  *     `-XX:CompileCommand=exclude,...GeneratedClass*::*` runs every
  *     whole-stage-codegen'd class interpreted;
  *     `-XX:TieredStopAtLevel=1` simulates total C2 loss (full code
  *     cache / dead compiler threads).
  *
  * r19 findings (recorded in ROADMAP.md): the controls BOUND the
  * compilation-state hypothesis — all-generated-code-interpreted
  * reads ×2.5 (84–89 s) and C1-only ×2.2 (74–76 s), both fully
  * CPU-bound, so NO steady compilation state reaches the observed ×5.
  * What could: an active deopt LOOP (recompile churn burns cpu beyond
  * the interpreted steady state — would show an outsized jit=+ value
  * here), GC thrash (gc=+), or CPU steal (cpu/wall ≪ cores). The
  * instrumented sessions all read FAST (the mode did not recur on
  * this box-state), every one cpu/wall ≈ 7.3–8.0 of 8 with jit ≤
  * 24 s and gc ≤ a few s — so the rig's counters now separate all
  * three candidates the moment the mode next appears. */
object Q96Capture {
  def main(args: Array[String]): Unit = {
    val label = args.headOption.getOrElse("session")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SCALE_DIR", "target/scale100x")
    require(new java.io.File(s"$dir/documents.parquet").exists(),
      s"no staged replica at $dir — run ScaleSmoke first")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val mx = java.lang.management.ManagementFactory.getRuntimeMXBean
    println("Q96CAP jvm=" + mx.getInputArguments.toArray.toSeq
      .map(String.valueOf).filter(a => a.contains("XX") || a.contains("Xmx"))
      .mkString(" "))

    val spark = SparkSession.builder().master(s"local[$cpus]")
      .appName(s"q96-capture-$label")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def cpuNanos: Long =
      java.lang.management.ManagementFactory.getOperatingSystemMXBean match {
        case os: com.sun.management.OperatingSystemMXBean => os.getProcessCpuTime
        case _ => -1L
      }
    def jitMillis: Long =
      java.lang.management.ManagementFactory.getCompilationMXBean
        .getTotalCompilationTime
    def gcMillis: Long = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
        .asScala.map(_.getCollectionTime).sum
    }
    def codeHeaps: String = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getMemoryPoolMXBeans.asScala
        .filter(_.getName.startsWith("CodeHeap"))
        .map(p => f"${p.getName}=${p.getUsage.getUsed / 1e6}%.0f/" +
          f"${p.getUsage.getMax / 1e6}%.0fMB")
        .mkString(" ")
    }

    val times = (1 to 2).map { i =>
      val (c0, j0, g0, t0) = (cpuNanos, jitMillis, gcMillis, System.nanoTime())
      SparkEntry.queries("q96_boilerplate")(spark, dir)
        .write.mode("overwrite").format("noop").save()
      spark.catalog.clearCache()
      val wall = (System.nanoTime() - t0) / 1e9
      val cpu = (cpuNanos - c0) / 1e9
      val jit = (jitMillis - j0) / 1e3
      val gc = (gcMillis - g0) / 1e3
      println(f"Q96CAP $label run$i wall=$wall%.1f s cpu=$cpu%.1f s " +
        f"(cpu/wall=${cpu / wall}%.1f of $cpus cores) jit=+$jit%.1f s " +
        f"gc=+$gc%.1f s")
      wall
    }
    println(s"Q96CAP $label codeheaps: $codeHeaps")
    val verdict = if (times.min > 70) "SLOW" else "FAST"
    println(f"Q96CAP $label VERDICT=$verdict min=${times.min}%.1f s " +
      "(fast mode reads 31-36 s, the sticky slow mode 162-172 s)")
    spark.stop()
  }
}
