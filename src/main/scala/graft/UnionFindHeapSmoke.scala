package graft

/** Dev tool: empirical validation of the single-task union-find
  * memory bound behind [[graft.ops.Dedup.SinglePassMaxPairs]] (the
  * round-17 gate raise argued "≤ 2 LongMap entries per pair ≈ 1 GiB
  * worst-case at 16M pairs, inside a standard 4 GiB executor" from
  * the data-structure math alone — this runs the REAL
  * `unionFindLabels` at exactly the gate, at its worst shapes, under
  * a constrained heap, so the claim is measured, not derived).
  *
  * Two adversarial 16M-pair graphs, generated lazily (the production
  * path also streams pairs from cached partitions — the ITERATOR is
  * never materialized):
  *
  *   - `disjoint`: every pair its own component → 32M distinct nodes,
  *     the exact 2-entries-per-pair worst case of the bound
  *     (LongMap resizes to 64M open-addressed slots → two long[64M]
  *     arrays = 1.0 GiB);
  *   - `chain`: one 16M-node path → maximum find/path-compression
  *     depth pressure, near-minimum entries.
  *
  * Run it with the heap the claim names minus headroom:
  *
  *   java -Xmx2g ... graft.UnionFindHeapSmoke
  *
  * PASS = both shapes complete inside the budget with correct labels
  * (disjoint: every even node labels itself, its odd partner follows;
  * chain: everything labels 0). An OOM here means the scaladoc's
  * memory math understates reality and the gate must come down. */
object UnionFindHeapSmoke {
  def main(args: Array[String]): Unit = {
    val pairs = args.headOption.map(_.toLong)
      .getOrElse(graft.ops.Dedup.SinglePassMaxPairs)
    println(s"UF pairs=$pairs maxHeap=${Runtime.getRuntime.maxMemory() / (1 << 20)} MiB")

    def peakAfter(label: String)(run: => (Long, Long)): Unit = {
      System.gc()
      val t0 = System.nanoTime()
      val (nodes, violations) = run
      val sec = (System.nanoTime() - t0) / 1e9
      // labels iterator fully drained inside run; parent map still
      // reachable there, so measure before return where it matters —
      // here used heap after the drain approximates the plateau
      val used = (Runtime.getRuntime.totalMemory() - Runtime.getRuntime.freeMemory()) / (1 << 20)
      println(f"UF $label nodes=$nodes violations=$violations t=$sec%.1f s usedAfter=$used MiB")
      assert(violations == 0L, s"$label produced wrong labels")
    }

    // worst case of the memory bound: 2 fresh nodes per pair
    peakAfter("disjoint") {
      val it = (0L until pairs).iterator.map(i => (2 * i, 2 * i + 1))
      var nodes = 0L; var bad = 0L
      graft.ops.Dedup.unionFindLabels(it).foreach { case (n, l) =>
        nodes += 1
        if (l != (n / 2) * 2) bad += 1 // component min = the even node
      }
      (nodes, bad)
    }

    // depth pressure: one long path, labels must all collapse to 0
    peakAfter("chain") {
      val it = (0L until pairs).iterator.map(i => (i, i + 1))
      var nodes = 0L; var bad = 0L
      graft.ops.Dedup.unionFindLabels(it).foreach { case (n, l) =>
        nodes += 1
        if (l != 0L) bad += 1
      }
      (nodes, bad)
    }
    println("UF SUMMARY ok")
  }
}
