package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.scalatest.funsuite.AnyFunSuite

/** Regression tests for the SCALE properties of representative plans —
  * the things that keep queries viable at 100 TB: top-k never sorts
  * globally, dedup shuffles fingerprints instead of payloads,
  * dimension joins broadcast, aggregations combine map-side, scans
  * prune columns. A refactor that silently loses one of these should
  * fail here, not in a cluster.
  */
class PlanShapeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def plan(df: DataFrame): String = df.queryExecution.executedPlan.toString

  private def sparkPlan(df: DataFrame): SparkPlan =
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.initialPlan
      case p => p
    }

  private def q(name: String): DataFrame =
    SparkEntry.queries(name)(spark, TestSpark.sf0001)

  /** One QueryExecution per declared query, built once: both
    * suite-wide sweeps (unpartitioned windows, forced broadcasts)
    * read from here so each query's construction — which for the
    * fit-style queries eagerly runs driver-bounded jobs — happens
    * once, not once per sweep. */
  private lazy val allQueryExecs: Seq[(String, org.apache.spark.sql.execution.QueryExecution)] =
    SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      name -> fn(spark, TestSpark.sf0001).queryExecution
    }

  private def unwrapAdaptive(p: SparkPlan): SparkPlan = p match {
    case a: AdaptiveSparkPlanExec => a.initialPlan
    case other => other
  }

  test("q15 top-k is TakeOrderedAndProject — never a global sort") {
    val p = plan(q("q15_topk"))
    assert(p.contains("TakeOrderedAndProject"), s"top-k must not total-sort:\n$p")
  }

  test("q40 cosine top-k never shuffles the corpus") {
    val shuffles = sparkPlan(q("q40_cosine_topk")).collect {
      case e: ShuffleExchangeExec => e
    }
    assert(shuffles.isEmpty,
      s"brute-force top-k must be map-only + TakeOrdered, found ${shuffles.length} shuffles")
  }

  test("q48 IVF probe never shuffles the corpus") {
    val shuffles = sparkPlan(q("q48_ivf_topk")).collect {
      case e: ShuffleExchangeExec => e
    }
    assert(shuffles.isEmpty,
      s"IVF probe must be filter + project + TakeOrdered, found ${shuffles.length} shuffles")
  }

  test("q30 dedup shuffle carries the 16-byte fingerprint, never the text") {
    val shuffles = sparkPlan(q("q30_dedup_exact")).collect {
      case e: ShuffleExchangeExec => e.output.map(_.name)
    }
    assert(shuffles.nonEmpty)
    shuffles.foreach { cols =>
      assert(!cols.contains("text"),
        s"dedup exchange must not move document text, moves: $cols")
    }
  }

  test("q07 dimension chain is broadcast-hash, no shuffle of the fact side") {
    val p = plan(q("q07_join_broadcast"))
    assert(p.contains("BroadcastHashJoin"), s"expected broadcast joins:\n$p")
    assert(!p.contains("SortMergeJoin"), s"dimension joins must not SMJ:\n$p")
  }

  test("q01 aggregation combines map-side (partial + final HashAggregate)") {
    val aggs = sparkPlan(q("q01_pricing_summary")).collect {
      case a if a.nodeName.contains("HashAggregate") => a
    }
    assert(aggs.length >= 2, s"expected partial+final aggregation, got ${aggs.length}")
  }

  test("scans prune to the referenced columns only") {
    val p = plan(q("q01_pricing_summary"))
    // q01 touches flag/status/qty/price/discount/tax — shipdate filter
    // column rides along; the untouched keys must be pruned
    assert(!p.contains("l_partkey") && !p.contains("l_suppkey"),
      s"q01 read schema should prune unreferenced key columns:\n$p")
  }

  test("q71 pipeline: no exchange ever carries the document text") {
    val shuffles = sparkPlan(q("q71_curation_pipeline")).collect {
      case e: ShuffleExchangeExec => e.output.map(_.name)
    }
    assert(shuffles.nonEmpty)
    shuffles.foreach { cols =>
      assert(!cols.contains("text"),
        s"curation pipeline scores map-side; no exchange may move text: $cols")
    }
  }

  test("q65 prefix sum windows over (source, bucket), never source alone") {
    // the two-level scan's data-bearing window must partition by the
    // bucketed key — a bare source partition is the giant-source
    // serialization this design exists to avoid
    val winSpecs = sparkPlan(q("q65_pack_chunks")).collect {
      case w: org.apache.spark.sql.execution.window.WindowExec =>
        w.partitionSpec.map(_.toString)
    }
    assert(winSpecs.nonEmpty)
    val dataWindows = winSpecs.filter(_.exists(_.contains("bucket")))
    assert(dataWindows.nonEmpty,
      s"expected a (source, bucket) window in: $winSpecs")
    winSpecs.foreach { spec =>
      assert(spec.exists(_.contains("bucket")) || spec.exists(_.contains("source")),
        s"unexpected window spec: $spec")
    }
  }

  test("q72 decontamination exchanges carry BIGINT fingerprints, never text or md5 hex") {
    val shuffles = sparkPlan(q("q72_decontaminate")).collect {
      case e: ShuffleExchangeExec => e.output.map(a => a.name -> a.dataType)
    }
    assert(shuffles.nonEmpty)
    shuffles.foreach { cols =>
      assert(!cols.exists(_._1 == "text"),
        s"decontamination must never shuffle document text: $cols")
      cols.filter(_._1 == "fp").foreach { case (_, dt) =>
        assert(dt == org.apache.spark.sql.types.LongType,
          s"fingerprint join key must be the 8-byte xxhash64 LONG, got $dt")
      }
    }
  }

  test("q78 bucketed decontam probe never shuffles the index side") {
    val p = sparkPlan(q("q78_decontam_probe_index"))
    // the batch side legitimately shuffles (its fps must co-locate with
    // the index buckets); the INDEX side must feed its merge join
    // bucket-aligned — no exchange between the join and the index scan.
    // (Downstream exchanges — the per-doc aggregation, the final sort —
    // CONTAIN the index scan in their subtrees; the invariant is about
    // the join's direct input, so walk from the join node itself.)
    // restrict to the fp-keyed probe join — the downstream per-doc
    // left join (on doc_id) also contains the index scan in its
    // subtree, below its own legitimate aggregation exchange
    val joins = p.collect {
      case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec
        if j.leftKeys.exists(_.toString.startsWith("fp#")) => j
    }
    assert(joins.nonEmpty, s"expected a merge join probing the index:\n$p")
    joins.foreach { j =>
      val (indexSides, batchSides) = Seq(j.left, j.right)
        .partition(_.toString.contains("graft_decontam_idx"))
      assert(indexSides.nonEmpty)
      indexSides.foreach { side =>
        val ex = side.collect { case e: ShuffleExchangeExec => e }
        assert(ex.isEmpty,
          s"index side must stay unshuffled (bucketed layout):\n$side")
      }
      // and the batch side must pass the index's bloom sidecar BEFORE
      // its bucket-aligning exchange (map-side pre-screen)
      batchSides.foreach { side =>
        assert(side.toString.contains("bloom_contains_long"),
          s"batch side must be bloom pre-screened below its exchange:\n$side")
      }
    }
    // and the index scan really is the bucketed read
    assert(p.toString.contains("SelectedBucketsCount"),
      s"index scan must be bucket-aligned:\n$p")
  }

  test("q189 bucketed dedup probe never shuffles the index side") {
    val p = sparkPlan(q("q189_dedup_probe_index"))
    val joins = p.collect {
      case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec
        if j.leftKeys.exists(_.toString.startsWith("bucket#")) => j
    }
    assert(joins.nonEmpty, s"expected a merge join probing the index:\n$p")
    joins.foreach { j =>
      val indexSides = Seq(j.left, j.right)
        .filter(_.toString.contains("graft_dedup_idx"))
      assert(indexSides.nonEmpty)
      indexSides.foreach { side =>
        val ex = side.collect { case e: ShuffleExchangeExec => e }
        assert(ex.isEmpty,
          s"index side must stay unshuffled (bucketed layout):\n$side")
      }
    }
    assert(p.toString.contains("SelectedBucketsCount"),
      s"index scan must be bucket-aligned:\n$p")
  }

  /** Plan a query with broadcast joins off: at sf0.001 AQE broadcasts
    * every small side, which hides the shuffle-partitioning invariants
    * these tests pin (at 100 TB the sides are NOT broadcast-able —
    * that regime is exactly what the invariants protect). */
  private def noBroadcast[A](body: => A): A = {
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val old = spark.conf.get(key)
    spark.conf.set(key, "-1")
    try body finally spark.conf.set(key, old)
  }

  test("q79 salted join shuffles on (key, salt) — the hot key spreads across reducers") {
    val exchanges = noBroadcast { sparkPlan(q("q79_salted_join")) }.collect {
      case e: ShuffleExchangeExec => e.outputPartitioning.toString
    }
    val saltPartitioned = exchanges.filter(p =>
      p.contains("l_orderkey") && p.contains("_salt"))
    assert(saltPartitioned.nonEmpty,
      s"join exchange must partition on (l_orderkey, _salt), found:\n${exchanges.mkString("\n")}")
  }

  test("q79 salt replication is conditional — cold keys get one replica, inputs scanned once") {
    val p = noBroadcast { sparkPlan(q("q79_salted_join")) }
    // single-join form: exactly one Generate (the build-side salt
    // explode), and its generator is the CASE over the hot tag — cold
    // rows expand over array(0), i.e. one replica, so an unskewed
    // corpus pays plain-join volume
    val generates = p.collect { case g if g.nodeName.contains("Generate") => g }
    assert(generates.length == 1,
      s"expected exactly one salt-replication Generate, got ${generates.length}:\n$p")
    assert(generates.head.toString.contains("CASE WHEN"),
      s"salt expansion must be conditional on the hot tag:\n${generates.head}")
    // and no hot/cold union: each input is scanned once
    assert(!p.toString.contains("Union"),
      s"single-join form must not split into a hot/cold union:\n$p")
  }

  test("q80 bloom pre-screen runs below the corpus-side exchange, keys stay BIGINT") {
    val p = noBroadcast { sparkPlan(q("q80_bloom_decontaminate")) }
    // every fp-carrying exchange must have the bloom probe INSIDE its
    // subtree on the corpus side: the filter runs map-side, before any
    // data movement — that is the whole point of the pre-screen
    val fpExchanges = p.collect {
      case e: ShuffleExchangeExec
        if e.output.exists(a => a.name == "fp" &&
          a.dataType == org.apache.spark.sql.types.LongType) => e
    }
    assert(fpExchanges.nonEmpty, s"expected fingerprint exchanges:\n$p")
    // the lazy in-plan screen (round-15): BloomFilterMightContain over
    // a bloom-aggregate scalar subquery, planned below the exchange
    val screened = fpExchanges.filter(_.child.toString.contains("might_contain"))
    assert(screened.nonEmpty,
      s"corpus fingerprints must pass might_contain BEFORE their exchange:\n$p")
    // and no exchange ever carries the text
    p.collect { case e: ShuffleExchangeExec => e.output.map(_.name) }
      .foreach(cols => assert(!cols.contains("text"),
        s"decontamination must never shuffle document text: $cols"))
  }

  test("q87 span pre-screen runs below the posexploded corpus exchange") {
    val p = noBroadcast { sparkPlan(q("q87_decontam_spans")) }
    // q87's corpus side is one row per shingle OCCURRENCE (posexplode),
    // the suite's largest exchange input — the bloom probe must sit
    // INSIDE that exchange's subtree so non-members die map-side,
    // before any data movement (round-8 verdict ask #2)
    val fpExchanges = p.collect {
      case e: ShuffleExchangeExec
        if e.output.exists(a => a.name == "fp" &&
          a.dataType == org.apache.spark.sql.types.LongType) => e
    }
    assert(fpExchanges.nonEmpty, s"expected fingerprint exchanges:\n$p")
    val posSide = fpExchanges.filter(_.output.exists(_.name == "pos"))
    assert(posSide.nonEmpty, s"expected the posexploded corpus exchange:\n$p")
    posSide.foreach { e =>
      assert(e.child.toString.contains("might_contain"),
        s"posexploded corpus fps must pass might_contain BEFORE their exchange:\n$e")
    }
    // and no exchange ever carries the text
    p.collect { case e: ShuffleExchangeExec => e.output.map(_.name) }
      .foreach(cols => assert(!cols.contains("text"),
        s"span decontamination must never shuffle document text: $cols"))
  }

  test("q96 boilerplate: BIGINT-fp df count; recovery join AQE-chosen, never forced") {
    // phase 1's groupBy must aggregate 8-byte window fingerprints: a
    // string-keyed df count would shuffle ~corpus-sized span text
    val df = q("q96_boilerplate")
    val p = sparkPlan(df)
    val aggExchanges = p.collect {
      case e: ShuffleExchangeExec if e.output.exists(_.name == "fp") &&
        !e.output.exists(a => a.name == "span" || a.name == "text") => e
    }
    assert(aggExchanges.nonEmpty, s"expected the fp-only df-count exchange:\n$p")
    aggExchanges.foreach { e =>
      val fp = e.output.find(_.name == "fp").get
      assert(fp.dataType == org.apache.spark.sql.types.LongType,
        s"df counting must key on BIGINT fps, got ${fp.dataType}")
    }
    // phase 2's recovery join must NOT force a broadcast (round-13
    // verdict: the df≥minDf survivor set is content-dependent — a
    // templated web crawl makes it unbounded, the one frame here that
    // cannot be hinted safely). AQE decides from the ACTUAL survivor
    // size: run it and pin that the final adaptive plan broadcast the
    // genuinely-tiny frame without the hint.
    df.collect()
    val fin = df.queryExecution.executedPlan.toString
    assert(fin.contains("BroadcastHashJoin"),
      s"AQE should demote the recovery join to broadcast at this scale:\n$fin")
  }

  test("q82 bigram-LM exchanges carry BIGINT hashes, never text or bigram strings") {
    val shuffles = sparkPlan(q("q82_bigram_lm")).collect {
      case e: ShuffleExchangeExec => e.output.map(a => a.name -> a.dataType)
    }
    assert(shuffles.nonEmpty)
    shuffles.foreach { cols =>
      assert(!cols.exists(c => c._1 == "text" || c._1 == "t"),
        s"LM scoring must never shuffle document text/tokens: $cols")
      cols.filter(c => c._1 == "fp12" || c._1 == "fp1").foreach { case (_, dt) =>
        assert(dt == org.apache.spark.sql.types.LongType,
          s"bigram keys must be 8-byte xxhash64 LONGs, got $dt")
      }
    }
  }

  test("rank-filtered top-k queries get the WindowGroupLimit pushdown") {
    // row_number().over(w) <= k must plan as WindowGroupLimit (per-group
    // top-k retention during the sort) — without it every group's FULL
    // row set is sorted and materialized through the window, which is
    // the difference between top-3-per-source and sort-everything at
    // 100 TB
    // q12 included since round 14: a bigint cast wrapped around the
    // rank attribute BEFORE the filter silently blocked the rewrite
    Seq("q12_window_rank", "q84_stratified_sample", "q85_tfidf",
        "q86_centroid_outliers", "q89_hard_negatives",
        "q166_latest_snapshot").foreach { name =>
      val p = sparkPlan(q(name)).toString
      assert(p.contains("WindowGroupLimit"),
        s"$name must keep the rank filter pushdown:\n$p")
    }
    // q90 deliberately has NO window: its keep-best is a max_by hash
    // aggregation (all members feed the count anyway, so a rank
    // window would sort without the group-limit pushdown)
    assert(!sparkPlan(q("q90_dedup_keep_best")).toString.contains("WindowExec"),
      "q90 must stay a pure aggregation, not a window")
  }

  test("q99 overlap exchanges carry shingle fingerprints, never text") {
    // the source-overlap matrix must leave the scan as (source, fp)
    // rows (8-byte xxhash64 shingle fingerprints) — an exchange
    // holding the raw text or shingle strings is the O(corpus-bytes)
    // shuffle this design avoids
    Seq("q99_source_overlap", "q102_novelty").foreach { name =>
      val shuffles = sparkPlan(q(name)).collect {
        case e: ShuffleExchangeExec => e.output.map(_.name)
      }
      assert(shuffles.nonEmpty)
      shuffles.foreach { cols =>
        assert(!cols.contains("text") && !cols.contains("sh"),
          s"$name exchange must move fingerprints only, moves: $cols")
      }
    }
  }

  test("q123/q124/q125 exchanges never carry document text") {
    // the round-9 quality family's shared discipline: text is reduced
    // to fps/scalars map-side before anything shuffles (q123's first
    // revision violated this by ranking the raw docs frame — pinned
    // here so it cannot regress)
    Seq("q123_heaps_law", "q124_curation_funnel",
        "q125_contamination_ratio").foreach { name =>
      val shuffles = sparkPlan(q(name)).collect {
        case e: ShuffleExchangeExec => e.output.map(_.name)
      }
      assert(shuffles.nonEmpty)
      shuffles.foreach { cols =>
        assert(!cols.contains("text"),
          s"$name exchange must not move document text, moves: $cols")
      }
    }
  }

  test("q137 star join: both hinted dimensions broadcast, no cartesian") {
    // the two explicit broadcast() hints (nation, region) must survive
    // planning regardless of autoBroadcastJoinThreshold — customer's
    // strategy is deliberately Catalyst's size-based call (broadcast
    // at test scale, co-partitioned at 100 TB) and is NOT pinned
    val plan = sparkPlan(q("q137_star_join")).toString
    val nBroadcast = "BroadcastHashJoin".r.findAllIn(plan).length
    assert(nBroadcast >= 2,
      s"nation AND region must both broadcast (saw $nBroadcast):\n$plan")
    assert(!plan.contains("CartesianProduct"))
  }

  test("q138 correlated EXISTS decorrelates to semi + anti joins") {
    val plan = sparkPlan(q("q138_exists_subquery")).toString
    assert(plan.contains("LeftSemi"), s"EXISTS must become a semi join:\n$plan")
    assert(plan.contains("LeftAnti"), s"NOT EXISTS must become an anti join:\n$plan")
  }

  test("q144: all three hinted dimensions broadcast, no cartesian") {
    val plan = sparkPlan(q("q144_brand_by_nation")).toString
    val nBroadcast = "BroadcastHashJoin".r.findAllIn(plan).length
    assert(nBroadcast >= 3,
      s"part, supplier AND nation must broadcast (saw $nBroadcast)")
    assert(!plan.contains("CartesianProduct"))
  }

  test("q100 shuffle-shard windows are PARTITIONED — no global-sort window") {
    // pos = row_number over (partition by shard); an empty partition
    // spec would serialize the whole corpus through one task
    val winSpecs = sparkPlan(q("q100_shuffle_shard")).collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w.partitionSpec
    }
    assert(winSpecs.nonEmpty)
    winSpecs.foreach(spec =>
      assert(spec.nonEmpty, "shuffle-shard window must partition by shard"))
  }

  test("q35 is map-only: no exchange except the final order") {
    val shuffles = sparkPlan(q("q35_lang_id")).collect {
      case e: ShuffleExchangeExec => e
    }
    // one range partitioning for the ORDER BY is the only legal shuffle
    assert(shuffles.length <= 1,
      s"lang-id scoring must not shuffle data, found ${shuffles.length}")
  }

  test("q147 derives per-order totals from ONE fact scan (window, not rejoin)") {
    // the groupBy+self-join formulation re-scanned lineitem; the window
    // over the digest must keep it at a single fact scan (+2 dims)
    val p = plan(q("q147_waiting_orders"))
    val scans = "Scan parquet".r.findAllIn(p).length
    assert(scans == 3, s"expected lineitem + supplier + nation = 3 scans, got $scans:\n$p")
    assert(!p.contains("SortMergeJoin"), "dims must broadcast")
  }

  test("q155 skew audit reads the fact once, exploded map-side") {
    val p = plan(q("q155_key_skew_audit"))
    val scans = "Scan parquet".r.findAllIn(p).length
    assert(scans == 1, s"the 3-key profile must come from ONE scan, got $scans:\n$p")
    assert(p.contains("Generate"), "keys explode map-side under the scan")
  }

  test("q152 cross-source matrix: no cartesian product, no text in any exchange") {
    val sp = sparkPlan(q("q152_crosssource_neardup"))
    assert(!plan(q("q152_crosssource_neardup")).contains("CartesianProduct"))
    sp.collect { case e: ShuffleExchangeExec => e.output.map(_.name) }
      .foreach { cols =>
        assert(!cols.contains("text"),
          s"pair stream must be ids/sketches only, moves: $cols")
      }
  }

  test("no unpartitioned window in the suite consumes a fact-sized input") {
    // Suite-wide invariant (round-10 verdict ask #1b): a Window with an
    // EMPTY partition spec serializes its whole input through one task.
    // That is fine on a digest — an aggregation below it bounds the
    // input by the value domain / group count — and a scale-killer on a
    // raw fact. Every unpartitioned WindowExec (and group-limit) in
    // every declared query must therefore have an aggregation somewhere
    // below it, except the explicit allowlist of didactic forms whose
    // production twin exists separately. Adding a new didactic query
    // without its twin now fails here instead of surfacing as a bench
    // warning someone has to notice.
    val allow = Set("q153_equidepth_bands") // production twin: q160
    val aggNames = Seq("HashAggregate", "SortAggregate", "ObjectHashAggregate")
    def hasAggBelow(p: SparkPlan): Boolean =
      p.collect { case n if aggNames.exists(n.nodeName.contains) => n }.nonEmpty
    val offenders = allQueryExecs.flatMap { case (name, qe) =>
      val unbounded = unwrapAdaptive(qe.executedPlan)
        .collect {
          case w: org.apache.spark.sql.execution.window.WindowExec
            if w.partitionSpec.isEmpty && !hasAggBelow(w.child) => w
          case w: org.apache.spark.sql.execution.window.WindowGroupLimitExec
            if w.partitionSpec.isEmpty && !hasAggBelow(w.child) => w
        }
      if (unbounded.nonEmpty) Seq(name) else Nil
    }
    assert(offenders.forall(allow.contains),
      s"unpartitioned windows over un-aggregated input outside the allowlist: " +
        s"${offenders.filterNot(allow.contains)}")
    assert(allow.forall(offenders.contains),
      s"allowlist entry no longer violates — prune it: ${allow.diff(offenders.toSet)}")
  }

  test("no query's plan contains a nondeterministic expression") {
    // The retry-safety adjudication (DetAudit scaladoc, round-17
    // verdict #4) rests on every declared query being a deterministic
    // function of its input partitions: then a retried or speculated
    // task reproduces its output bit-for-bit and retry can only
    // perturb MERGE order — which the three-regime sweep models. A
    // rand()/uuid()/monotonically_increasing_id slipping into a query
    // would void that argument (an attempt's output stops being a
    // function of its input), so the exclusion is swept, not assumed.
    // Expression.deterministic is already recursive over children;
    // subquery plans are walked explicitly.
    def badExprs(plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): Seq[String] = {
      val bad = scala.collection.mutable.Buffer[String]()
      plan.foreach { node =>
        node.expressions.foreach { e =>
          if (!e.deterministic) bad += s"${node.nodeName}: $e"
        }
        node.subqueries.foreach(sq => bad ++= badExprs(sq))
      }
      bad.toSeq
    }
    val offenders = allQueryExecs.flatMap { case (name, qe) =>
      val hits = badExprs(qe.analyzed)
      if (hits.nonEmpty) Seq(s"$name → ${hits.take(3).mkString("; ")}") else Nil
    }
    assert(offenders.isEmpty,
      s"nondeterministic expressions in declared-query plans:\n${offenders.mkString("\n")}")
  }

  test("no query's physical plan contains a CartesianProduct") {
    // Suite-wide twin of the unpartitioned-window sweep: a
    // CartesianProductExec means Spark found a join with no usable
    // key AND no broadcastable side — |L|×|R| row pairs through
    // |L|-partitions × |R|-partitions tasks, the canonical 100 TB
    // scale-killer. Bounded non-equi joins are fine as
    // BroadcastNestedLoopJoin (the bounded side rides a broadcast);
    // this sweep catches the case where a bounded side silently
    // GROWS past broadcastability and the planner degrades to the
    // cartesian — per-query checks (q137/q144/q152/q167) only cover
    // the queries someone thought to pin.
    val offenders = allQueryExecs.flatMap { case (name, qe) =>
      val hits = unwrapAdaptive(qe.executedPlan).collect {
        case c: org.apache.spark.sql.execution.joins.CartesianProductExec => c
      }
      if (hits.nonEmpty) Seq(name) else Nil
    }
    assert(offenders.isEmpty,
      s"CartesianProduct in declared-query plans: $offenders")
  }

  test("no shuffle exchange in the suite carries the document text payload") {
    // Suite-wide twin of the per-query "exchanges carry fps, never
    // text" pins (q30/q71/q72/q99/q123/q183/q188/q196...): the
    // engine-wide design rule is that document BODIES never ride a
    // shuffle — decisions move fingerprints/ids/scores and recover
    // text after the decision, map-side or via a bounded join. A new
    // query that shuffles `text` regresses the rule silently unless
    // something sweeps for it. Allowlist = queries whose CONTRACT is
    // to emit document text through a repartition/sort boundary.
    val allow: Set[String] = Set()
    val offenders = allQueryExecs.flatMap { case (name, qe) =>
      val hits = unwrapAdaptive(qe.executedPlan).collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
          if e.output.exists(_.name == "text") => e
      }
      if (hits.nonEmpty) Seq(name) else Nil
    }
    assert(offenders.forall(allow.contains),
      s"document text rides a shuffle outside the allowlist: " +
        s"${offenders.filterNot(allow.contains)}")
    assert(allow.forall(offenders.contains),
      s"allowlist entry no longer shuffles text — prune it: ${allow.diff(offenders.toSet)}")
  }

  test("embedding vectors ride a shuffle only where the operator's contract requires it") {
    // The embeddings table's vector column is the suite's other fat
    // payload (dim doubles per row). Most of the ANN/cluster family
    // keeps vectors in place by design (map-side scoring against
    // broadcast centroids/queries; per-query "never shuffles the
    // corpus" pins) — but unlike `text`, SOME contracts genuinely
    // move vectors: this sweep exists to make that set EXPLICIT and
    // reviewed, so a new query joining on raw vectors gets flagged
    // and either redesigned or consciously allowlisted with a reason.
    val allow: Set[String] = Set()
    val offenders = allQueryExecs.flatMap { case (name, qe) =>
      val hits = unwrapAdaptive(qe.executedPlan).collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
          if e.output.exists(a => a.name == "embedding" || a.name.endsWith("_vec")
            || a.name == "vec") => e
      }
      if (hits.nonEmpty) Seq(name) else Nil
    }
    assert(offenders.forall(allow.contains),
      s"embedding vectors ride a shuffle outside the allowlist: " +
        s"${offenders.filterNot(allow.contains)}")
    assert(allow.forall(offenders.contains),
      s"allowlist entry no longer shuffles vectors — prune it: ${allow.diff(offenders.toSet)}")
  }

  test("q197 bucketed join: the join subtree has no exchange and no sort") {
    // the bucketed layout (one sorted file per bucket + the session's
    // bucketed-scan ordering conf) must do ALL the join's work — the
    // only legal data movements in the query are the 5-row segment
    // aggregation and the final orderBy, both ABOVE the join
    val sp = sparkPlan(q("q197_bucketed_join"))
    val joins = sp.collect {
      case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j
    }
    assert(joins.nonEmpty, s"expected a SortMergeJoin:\n$sp")
    joins.foreach { j =>
      assert(j.collect { case e: ShuffleExchangeExec => e }.isEmpty,
        s"bucketed join must not shuffle either side:\n$j")
      assert(j.children.forall(_.collect {
        case s: org.apache.spark.sql.execution.SortExec => s
      }.isEmpty),
        s"bucketed join must trust the write-time sort:\n$j")
    }
  }

  test("forced broadcast hints appear only on provably bounded frames (allowlist)") {
    // Suite-wide invariant (round-13 verdict: q96's hinted survivor
    // set was the last content-unbounded forced broadcast): a
    // broadcast() hint bypasses both the planner's size estimate AND
    // AQE's runtime demotion — the hinted frame ships to every
    // executor and lives on the driver no matter how big it actually
    // is. That is only safe when the frame is bounded by
    // CONSTRUCTION: a fixed dimension table, a digest grouped by a
    // bounded key domain (source/event_type/cluster ≤ K), a top-k/
    // limit, or a cap's over-limit key set (≤ corpus/cap keys by
    // definition). Content-dependent frames (survivor sets, match
    // sets, per-value frames over unbounded domains) must stay
    // unhinted and let AQE decide from the actual size. Every
    // declared query carrying a hint must therefore be allowlisted
    // here WITH its boundedness witness; a new forced broadcast
    // fails this sweep until it is consciously justified.
    import org.apache.spark.sql.catalyst.plans.logical.{BROADCAST, ResolvedHint}
    val dim = "star-schema dimension (nation 25 / region 5 / part / supplier — orders smaller than the fact side)"
    val srcDigest = "digest grouped by source — bounded by the source count"
    val oneRow = "single-row corpus total / stat digest (crossJoin broadcast)"
    val overCap = "bucket-cap over-limit key set — ≤ corpus/cap keys by definition"
    val fixedQ = "fixed query/probe set — size set by the caller, not the corpus"
    val kBounded = "≤K-row model digest (centroids / cluster sizes / labels)"
    val allow: Map[String, String] = Map(
      "q03_join_multi" -> dim, "q06_join_anti" -> dim,
      "q07_join_broadcast" -> dim, "q08_join_theta" -> dim,
      "q118_array_agg" -> dim, "q137_star_join" -> dim,
      "q144_brand_by_nation" -> dim, "q145_string_agg" -> dim,
      "q147_waiting_orders" -> dim, "q164_brand_hhi" -> dim,
      "q111_winsorize" -> srcDigest,
      "q112_kl_divergence" -> (srcDigest + " + value-domain grid (round-12 fix keeps the per-VALUE side unhinted)"),
      "q114_ks_drift" -> srcDigest, "q119_mad" -> srcDigest,
      "q121_length_histogram" -> srcDigest,
      "q83_temperature_mix" -> srcDigest,
      "q99_source_overlap" -> "per-source shingle totals — ≤ #sources² pair rows",
      "q124_curation_funnel" -> oneRow, "q158_match_distribution" -> srcDigest,
      "q117_bootstrap_ci" -> oneRow, "q123_heaps_law" -> oneRow,
      "q127_pmi_bigrams" -> (oneRow + " (round-13 fix keeps the per-bigram side unhinted)"),
      "q129_dupgroup_spectrum" -> oneRow,
      "q130_conversion_funnel" -> oneRow,
      "q131_retention_cohorts" -> "per-cohort sizes — bounded by the day/date domain",
      "q132_daily_anomaly" -> oneRow,
      "q133_transition_matrix" -> "per-event-type totals — ≤ |event_type|² pairs",
      "q134_hourly_seasonality" -> "per-event-type totals — ≤ 24·|event_type| rows",
      "q148_power_users" -> oneRow, "q170_revenue_share" -> oneRow,
      "q40_cosine_topk" -> fixedQ, "q41_ann_lsh" -> fixedQ,
      "q85_tfidf" -> (fixedQ + " — df computed over the query-term-filtered tokens"),
      "q154_bm25" -> (fixedQ + " — df computed over the query-term-filtered tokens"),
      "q89_hard_negatives" -> kBounded, "q86_centroid_outliers" -> kBounded,
      "q150_ivf_balance" -> kBounded,
      "q42_embed_neardup" -> overCap, "q43_minhash_pairs" -> overCap,
      "q92_containment_lsh" -> overCap, "q152_crosssource_neardup" -> overCap,
      "q167_simhash_pairs" -> overCap,
      "q79_salted_join" -> "hot-key set — ≤ corpus/skew-threshold keys by definition",
      "q95_vocab_coverage" -> "top-V vocab via limit(topV)",
      "q176_fuzzy_match" -> fixedQ,
      "q179_weighted_reservoir" -> "reservoir sample — ≤ k rows by construction",
      "q199_exact_dup_probe_index" -> ("threshold-1.0 candidate pairs — bounded by " +
        "the corpus dup spectrum (sig equality needs equal-token-set-or-" +
        "near-identical docs), broadcast for the exact-confirm rejoin"),
      "q187_pagerank" -> ("node-domain frames (rank / contrib / out-weights), " +
        "hinted only when the MEASURED node count n — already computed for " +
        "the teleport term — is ≤ Graph.BroadcastNodeLimit; above the limit " +
        "the hint is not applied and the shuffle plan is unchanged (r19)"),
    )
    val offenders = allQueryExecs.flatMap { case (name, qe) =>
      val hinted = qe.analyzed.collect {
        case h: ResolvedHint if h.hints.strategy.contains(BROADCAST) => h
      }
      if (hinted.nonEmpty) Seq(name) else Nil
    }
    assert(offenders.forall(allow.contains),
      s"forced broadcast hints outside the allowlist: " +
        s"${offenders.filterNot(allow.contains)}")
    assert(allow.keySet.forall(offenders.contains),
      s"allowlist entry no longer hints — prune it: ${allow.keySet.diff(offenders.toSet)}")
  }

  test("q160 bucketed bands: no window at all, map-side assignment + one group agg") {
    val sp = sparkPlan(q("q160_equidepth_bucketed"))
    assert(sp.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }.isEmpty, "the production equi-depth form must not sort the fact through a window")
    val shuffles = sp.collect { case e: ShuffleExchangeExec => e }
    // the 10-group aggregation exchange + the final orderBy range
    // partitioning are the only legal data movements
    assert(shuffles.length <= 2,
      s"bucketed bands must shuffle only the 10-row digest, found ${shuffles.length}")
  }

  test("q167 simhash pairs: no cartesian, exchanges carry ids + 8-byte hashes, never text") {
    val sp = sparkPlan(q("q167_simhash_pairs"))
    assert(!sp.toString.contains("CartesianProduct"))
    val shuffles = sp.collect { case e: ShuffleExchangeExec => e.output.map(_.name) }
    assert(shuffles.nonEmpty)
    shuffles.foreach { cols =>
      assert(!cols.contains("text"),
        s"simhash pair stream must be band keys/ids/hashes only, moves: $cols")
    }
  }

  test("q174 truncation ranking: ONE window, ONE shuffle exchange for every level") {
    // r20: the old form ran len(dims)+1 separate row_number windows
    // (one full exchange + sort + window pass per truncation level)
    // over the cached per-pair score frame; the long-form rewrite
    // ranks every level in a single (lvl, qid)-partitioned window.
    // The public entry hides the plan behind a bounded collect, so
    // pin the INTERNAL lazy ranking core.
    import org.apache.spark.sql.functions.col
    val vecs = graft.Tables.embeddingVectors(spark, TestSpark.sf0001)
      .select(col("vec_id"), col("e"))
    val sp = sparkPlan(graft.ops.Similarity.truncationTopK(
      vecs, nQueries = 8, dims = Seq(8, 16, 32, 64), k = 10))
    val windows = sp.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(windows.length == 1,
      s"all truncation levels must rank through ONE window, found ${windows.length}")
    val shuffles = sp.collect { case e: ShuffleExchangeExec => e }
    assert(shuffles.length == 1,
      s"the ranking core needs exactly one exchange (by lvl, qid), found ${shuffles.length}")
  }

  test("q171 sampled silhouette: the scoring plan is join-free (samples ride the plan)") {
    // the public entry materializes the digest (collect-and-release),
    // so pin the INTERNAL lazy scoring plan the builder exposes
    import org.apache.spark.sql.functions.col
    val vecs = graft.Tables.embeddings(spark, TestSpark.sf0001)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
    val (assigned, out) = graft.ops.Cluster.buildSampledSilhouette(
      vecs, k = graft.ops.Cluster.K, sampleN = graft.ops.Cluster.SilhouetteSampleN)
    try {
      val s = sparkPlan(out).toString
      // the K×m sample is expression-static data inside
      // sample_dist_sums — a join (or worse, a pair explosion) in the
      // scoring plan would mean the sample ships as a relation
      assert(!s.contains("Join") && !s.contains("CartesianProduct"),
        s"q171 scoring must not join — the sample is a plan literal:\n$s")
      assert(s.contains("sample_dist_sums"),
        s"scoring must use the native kernel:\n$s")
    } finally assigned.unpersist()
  }

  test("q173 rollup plan reads NO parquet: stage 2 touches only the stored sketches") {
    val sp = sparkPlan(q("q173_hll_rollup"))
    val s = sp.toString
    assert(!s.contains("FileScan"),
      s"the rollup must aggregate the materialized sketch table, not rescan the corpus:\n$s")
    assert(s.contains("hll_merge"), s"rollup must merge stored sketches:\n$s")
  }

  test("q185 rollup plan reads NO parquet: stage 2 touches only the stored HDR sketches") {
    val sp = sparkPlan(q("q185_hdr_rollup"))
    val s = sp.toString
    assert(!s.contains("FileScan"),
      s"the rollup must aggregate the materialized sketch table, not rescan the corpus:\n$s")
    assert(s.contains("hdr_merge"), s"rollup must merge stored sketches:\n$s")
  }

  test("q193 fertility and q195 survival keep their agg-only shapes: no join, no window") {
    // both queries' scaladocs claim pure-aggregation plans (q193: one
    // map-side agg per predicted label; q195: per-user agg → one
    // conditional-aggregate row → map-side explode) — pin the claims
    // so a refactor can't quietly introduce a join or an all-data
    // window
    for (name <- Seq("q193_lang_fertility", "q195_retention_survival")) {
      val s = sparkPlan(q(name)).toString
      assert(!s.contains("Join"), s"$name must stay join-free:\n$s")
      assert(!s.contains("Window"), s"$name must stay window-free:\n$s")
    }
  }

  test("q158 rebalance: per-bucket stats broadcast; docs never shuffle for the join") {
    val p = plan(q("q158_match_distribution"))
    assert(p.contains("BroadcastHashJoin"),
      s"the 5-row rate frame must broadcast onto the doc scan:\n$p")
    assert(!p.contains("SortMergeJoin"))
  }

  test("q183 cdc dedup: chunking happens in-scan; exchanges carry fps, never text") {
    val sp = sparkPlan(q("q183_cdc_chunk_dedup"))
    sp.collect { case e: ShuffleExchangeExec => e.output.map(_.name) }
      .foreach { cols =>
        assert(!cols.contains("text") && !cols.contains("t"),
          s"raw text / token arrays must never move, exchange carries: $cols")
      }
    assert(sp.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }.isEmpty, "the dup verdict is pure aggregation — no window")
  }

  test("q188 duplicate spans: exchanges carry ids + fps, never text; windows partition by doc") {
    val sp = sparkPlan(q("q188_duplicate_spans"))
    sp.collect { case e: ShuffleExchangeExec => e.output.map(_.name) }
      .foreach { cols =>
        assert(!cols.contains("text"),
          s"raw text must never move, exchange carries: $cols")
      }
    val wins = sp.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(wins.nonEmpty, "island merge ranks via window")
    wins.foreach(w => assert(w.partitionSpec.nonEmpty,
      "no unpartitioned window: islands merge per doc over hits only"))
  }

  test("q196 repack packs the materialized digest: no corpus rescan, no text in exchanges") {
    // despanRepack localCheckpoints the (source, doc_id, kept) digest
    // because packChunks consumes its input twice — pin that the
    // packing plan reads ONLY the materialized digest (the span
    // derivation ran once, at construction) and that nothing textual
    // ever moves
    val sp = sparkPlan(q("q196_despan_repack"))
    val s = sp.toString
    assert(!s.contains("FileScan") && !s.contains("Scan parquet"),
      s"packing must read the checkpointed digest, not rescan the corpus:\n$s")
    sp.collect { case e: ShuffleExchangeExec => e.output.map(_.name) }
      .foreach { cols =>
        assert(!cols.exists(c => c == "text" || c == "clean_text"),
          s"rebuilt text must never reach the packing exchanges: $cols")
      }
  }

  test("q182 zipf: every window is partitioned and fed by the tf aggregation") {
    val sp = sparkPlan(q("q182_zipf_fit"))
    val wins = sp.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(wins.nonEmpty, "the exact top-k ranks via window")
    wins.foreach(w => assert(w.partitionSpec.nonEmpty,
      "no unpartitioned window: the salted two-level top-k bounds every partition"))
  }
}
