package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Dev tool: SPILL-PATH correctness smoke (round-17 verdict Next #2).
  *
  * Every scale claim so far was measured on a 128 GiB box where no
  * operator ever spills; at 100 TB the hash aggs, sort-merge joins,
  * and sorts WILL run at their executor memory budgets and take the
  * ExternalAppendOnlyMap / UnsafeExternalSorter spill paths. Spilling
  * changes combine/merge ORDER (partial aggregates are merged in
  * spill-file order, sorts merge k spilled runs), so "works unspilled"
  * does not imply "same answer spilled" — this harness proves it for
  * the heaviest declared shapes, on the ×10 salted scale replica
  * ([[ScaleSmoke.generate]]) so the per-partition volumes are real.
  *
  * Two sequential sessions over the SAME queries, data, and confs,
  * differing ONLY in memory budget:
  *
  *   phase A (reference): default Spark-managed memory — nothing
  *     spills; canonical result hash recorded per query;
  *   phase B (constrained): `spark.testing.memory` (the knob
  *     UnifiedMemoryManager reads in place of Runtime.maxMemory —
  *     exactly what a small `spark.executor.memory` does to the
  *     unified region on a real executor, without forking a JVM) plus
  *     a low `spark.memory.fraction`: ~45 MB of unified memory for 8
  *     threads → single-digit-MB per-task budgets against the tens-of-
  *     MB per-partition sort/agg state of the ×10 facts at 4 shuffle
  *     partitions. Spill bytes are summed from task metrics
  *     (`memoryBytesSpilled`/`diskBytesSpilled`) via a listener — a
  *     run that silently didn't spill proves nothing and is REPORTED.
  *
  * PASS = phase-B canonical hash equals phase-A for every query, and
  * the designated spill shapes actually spilled. Any OOM or hash
  * divergence here is a real engine bug (order-sensitive combine,
  * under-declared rounding), not a harness artifact.
  *
  * Shape notes, measured:
  *   - q147 (fact-fact SMJ, both sides ×10) and q96 (high-cardinality
  *     text-line agg) are the designated spillers;
  *   - q01 is spill-IMMUNE by design: map-side combine collapses to 6
  *     groups, so its agg state never grows with data — included to
  *     document exactly that;
  *   - q115's agg state is bounded by CUSTOMER count while its input
  *     deepens ×10 (groups deepen, state doesn't) — the agg-state ∝
  *     groups-not-rows scale story, also documented by a 0;
  *   - q197 reads pre-sorted buckets (no sort at read — the point of
  *     bucketing), but each phase REBUILDS its bucketed tables in its
  *     own warehouse, so phase B exercises the bucketed-write sort
  *     under pressure;
  *   - q67's single-task union-find holds plain JVM objects —
  *     `spark.testing.memory` can't constrain it (its budget is heap,
  *     gated at 16M pairs with the memory math in Dedup.scala); what
  *     q67 exercises here is the banded shuffle + agg upstream.
  *   - exact percentiles (q37) buffer ALL group values as JVM objects
  *     inside a TypedImperativeAggregate — unspillable by design,
  *     which is WHY q93's mergeable sketch is the declared scale path;
  *     deliberately not in this list. Its floor is measured by its own
  *     harness ([[PercentileHeapSmoke]], r19): ~1M distinct doubles
  *     per group per 512 MiB heap, loud task-level OOM beyond — this
  *     smoke's `spark.testing.memory` knob cannot reach plain-heap
  *     aggregate state.
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 runMain graft.SpillSmoke
  */
object SpillSmoke {

  /** Task-metrics spill accumulator (listener bus is async; callers
    * settle it with a short drain sleep before reading). Per-query
    * counters reset between queries; the GRAND totals never reset, so
    * task-end events that straggle in after a drain read land in the
    * totals rather than being zeroed away with the reset — per-query
    * attribution is approximate in the short-drain suite sweep, the
    * summed totals are exact (round-18 advice: the old summary summed
    * the resettable counters and undercounted). `spark.stop()` drains
    * the listener bus, so grand totals read after stop are complete. */
  private final class SpillListener extends SparkListener {
    val mem = new java.util.concurrent.atomic.AtomicLong
    val disk = new java.util.concurrent.atomic.AtomicLong
    val grandMem = new java.util.concurrent.atomic.AtomicLong
    val grandDisk = new java.util.concurrent.atomic.AtomicLong
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
      val m = t.taskMetrics
      if (m != null) {
        mem.addAndGet(m.memoryBytesSpilled); disk.addAndGet(m.diskBytesSpilled)
        grandMem.addAndGet(m.memoryBytesSpilled)
        grandDisk.addAndGet(m.diskBytesSpilled)
      }
    }
    def reset(): Unit = { mem.set(0); disk.set(0) }
  }

  private def session(constrained: Boolean, cpus: String): SparkSession = {
    val tag = if (constrained) "constrained" else "reference"
    val b = SparkSession.builder().master(s"local[$cpus]")
      .appName(s"spill-smoke-$tag")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "false")
      // phase-private warehouse: each phase rebuilds its bucketed
      // tables (the in-memory catalog dies with the session anyway,
      // and a shared dir would trip the managed-table guard)
      .config("spark.sql.warehouse.dir", s"/tmp/graft-spill-warehouse-$tag")
      .config("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
      .config("spark.ui.enabled", "false")
    val b2 = if (constrained)
      // (600 MB − 300 MB reserved) × 0.15 ≈ 45 MB unified region.
      // storageFraction drops to 0.05: cached blocks (the iterative
      // queries' eager localCheckpoints, MEMORY_AND_DISK_SER via
      // Graph.ckpt) evict to disk for free — while execution
      // consumers have a
      // HARD first-page floor (BytesToBytesMap's initial allocation
      // cannot spill what it hasn't built; below the floor Spark
      // fails LOUDLY with UNABLE_TO_ACQUIRE_MEMORY, measured on q187
      // at the default 0.5). The smoke tests spill CORRECTNESS, so
      // the protected region goes to the side that can yield.
      b.config("spark.testing.memory", (600L * 1024 * 1024).toString)
        .config("spark.memory.fraction", "0.15")
        .config("spark.memory.storageFraction", "0.05")
    else b
    val s = b2.getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  def main(args: Array[String]): Unit = {
    // `all` = the SUITE-WIDE sweep: every declared query at the BASE
    // sf (no replica — staging ×10 for every family would take hours;
    // at a 45 MB budget the base sf0.1 volumes already spill the fat
    // shapes) with hash-identity asserted for all 198 and spill
    // totals reported. The default mode stays the designated-spiller
    // list on the ×10 replica, where the per-partition volumes are
    // realistic enough that "it actually spilled" can be REQUIRED.
    val allMode = args.headOption.contains("all")
    val qs = if (allMode) SparkEntry.queries.keys.toSeq.sorted
      else if (args.nonEmpty) args.toSeq
      else Seq(
        "q01_pricing_summary", "q96_boilerplate", "q147_waiting_orders",
        "q115_join_full", "q197_bucketed_join", "q67_dedup_clusters")
    val base = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val k = 10
    val dir = if (allMode) base
      else sys.env.getOrElse("SPARK_GRAFT_SPILL_DIR", s"target/spill${k}x")
    val mustSpill: Set[String] = if (allMode) Set()
      else Set("q96_boilerplate", "q147_waiting_orders")
    // Queries whose WORKING-SET FLOOR exceeds the 45 MB budget and
    // that therefore must fail LOUDLY (an OOM-class error), never
    // diverge: q187 eagerly localCheckpoints its loop-invariant edge
    // frames (deliberate — re-deriving them per PageRank round cost
    // 1.5× wall, see Graph.scala), and a pinned cache block being
    // READ by the same pipelined stage that aggregates downstream
    // cannot evict — execution starves below its first-page floor and
    // Spark aborts with UNABLE_TO_ACQUIRE_MEMORY /
    // AGGREGATE_OUT_OF_MEMORY. Floor measured at sf0.1: 140–225 MB
    // unified with deserialized checkpoint storage; this sweep's
    // finding drove the Graph.ckpt MEMORY_AND_DISK_SER change, which
    // cut it to 60–75 MB — still above the deliberately-brutal 45 MB
    // budget, trivially cleared by any real executor; what matters is
    // the failure is LOUD. Two-sided: if a listed query stops
    // erroring the entry is stale and the run fails, the allowlist
    // discipline everywhere else in this repo.
    val floorAllowed: Set[String] = if (allMode) Set("q187_pagerank") else Set()

    // stage the ×10 replica once (separate unconstrained session),
    // marker-validated: a different SPARK_GRAFT_SF_DIR against the
    // same replica dir fails loudly, query args whose families the
    // first run didn't stage trigger a restage of the union (shared
    // ScaleSmoke machinery; round-18 advice — the old existence-only
    // probe silently reused stale/incomplete replicas).
    if (!allMode) {
      val needStage = ScaleSmoke.readReplicaMarker(dir) match {
        case Some((hdr, _)) if hdr != s"$base x$k" => true // fails below
        case Some((_, staged)) => !ScaleSmoke.familiesFor(qs).subsetOf(staged)
        case None => true
      }
      if (needStage) {
        val sess = session(constrained = false, cpus)
        try ScaleSmoke.ensureStaged(sess, base, dir, k, qs)
        finally {
          sess.stop()
          SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
        }
      }
    }

    def phase(constrained: Boolean)
        : (Map[String, (String, Long, Long, Double)], (Long, Long)) = {
      val spark = session(constrained, cpus)
      val l = new SpillListener
      spark.sparkContext.addSparkListener(l)
      // per-query attribution needs a drained listener bus; the suite
      // sweep trades exact attribution for wall time. The grand total
      // stays exact because the listener's never-reset counters catch
      // events that straggle past a drain read, and spark.stop()
      // drains the bus before we read them.
      val drainMs = if (allMode) 150L else 1500L
      val out = qs.map { q =>
        l.reset()
        val t0 = System.nanoTime()
        val h = try DetAudit.canonicalHash(SparkEntry.queries(q)(spark, dir))
          catch { case e: Throwable => s"ERR:${e.getClass.getSimpleName}" }
        val sec = (System.nanoTime() - t0) / 1e9
        Thread.sleep(drainMs)
        println(f"SPILL ${if (constrained) "constrained" else "reference  "} $q h=$h " +
          f"mem=${l.mem.get()}%d disk=${l.disk.get()}%d t=$sec%.1f s")
        q -> (h, l.mem.get(), l.disk.get(), sec)
      }.toMap
      spark.stop()
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      (out, (l.grandMem.get(), l.grandDisk.get()))
    }

    val (ref, _) = phase(constrained = false)
    val (con, (totMem, totDisk)) = phase(constrained = true)
    var bad = 0
    var spillers = 0
    qs.foreach { q =>
      val (hr, _, _, tr) = ref(q)
      val (hc, mem, disk, tc) = con(q)
      val spilled = mem + disk > 0
      if (spilled) spillers += 1
      // the invariant: hash-identical OR a LOUD memory error on a
      // declared-floor query — never silently different data
      val verdict =
        if (floorAllowed(q) && hc.startsWith("ERR:")) "FLOOR(loud, allowed)"
        else if (floorAllowed(q)) { bad += 1; s"STALE floor allowlist entry — it passed ($hc)" }
        else if (hr == hc && !hr.startsWith("ERR:")) "OK"
        else { bad += 1; s"DIVERGED $hr!=$hc" }
      if (mustSpill(q) && !spilled) bad += 1
      println(f"SPILL RESULT $q hash=$verdict " +
        f"spilledMB=${(mem + disk) / 1e6}%.1f (mem=${mem / 1e6}%.1f disk=${disk / 1e6}%.1f) " +
        f"ref=$tr%.1f s constrained=$tc%.1f s" +
        (if (mustSpill(q) && !spilled) " [EXPECTED SPILL, GOT NONE — resize harness]" else ""))
    }
    println(f"SPILL SUMMARY ${qs.size} queries, $bad failures, $spillers spilled " +
      f"(total mem=${totMem / 1e9}%.2f GB disk=${totDisk / 1e9}%.2f GB)")
    if (bad > 0) sys.exit(1)
  }
}
