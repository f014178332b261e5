package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Relational

class RelationalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("approx_count_distinct within 10% of exact per group") {
    Relational.q29ApproxDistinct(spark, TestSpark.sf0001).collect().foreach { r =>
      val approx = r.getAs[Long]("approx_parts").toDouble
      val exact = r.getAs[Long]("exact_parts").toDouble
      assert(math.abs(approx - exact) / exact < 0.10,
        s"${r.getString(0)}: approx $approx vs exact $exact")
    }
  }

  test("q93 approx percentiles: rank error bounded by the sketch accuracy") {
    // the GK sketch guarantees |rank(approx_p) − p·n| ≤ n/accuracy;
    // verify every returned value against the group's true
    // distribution (q29's bound-the-estimator discipline)
    val byStatus = Tables.orders(spark, TestSpark.sf0001)
      .select(col("o_orderstatus"), col("o_totalprice")).collect()
      .groupBy(_.getString(0)).map { case (k, rows) =>
        k -> rows.map(_.getDouble(1)).sorted
      }
    val got = Relational.q93ApproxPercentiles(spark, TestSpark.sf0001).collect()
    assert(got.nonEmpty)
    val tol = 1.0 / Relational.ApproxPercentileAccuracy
    got.foreach { r =>
      val vals = byStatus(r.getString(0))
      val n = vals.length.toDouble
      assert(r.getAs[Long]("n") == vals.length)
      for ((p, field) <- Seq(0.5 -> "ap50", 0.9 -> "ap90", 0.99 -> "ap99")) {
        val v = r.getAs[Double](field)
        // rank band of v in the true distribution: [#(< v), #(≤ v)] / n
        val lo = vals.count(_ < v) / n
        val hi = vals.count(_ <= v) / n
        assert(p >= lo - tol - 1 / n && p <= hi + tol + 1 / n,
          s"${r.getString(0)} $field=$v: rank band [$lo,$hi] misses p=$p beyond ±$tol")
      }
    }
  }

  test("top-k equals full-sort head") {
    val topk = Relational.q15TopK(spark, TestSpark.sf0001).collect().map(_.getLong(0))
    val full = Tables.orders(spark, TestSpark.sf0001)
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(10).collect().map(_.getAs[Long]("o_orderkey"))
    assert(topk.sameElements(full))
  }

  test("sessionize: session counts are positive and bounded by events") {
    Relational.q28Sessionize(spark, TestSpark.sf0001).collect().foreach { r =>
      val s = r.getAs[Long]("n_sessions"); val e = r.getAs[Long]("n_events")
      assert(s >= 1 && s <= e)
    }
  }

  test("q115 full outer: all three side tags populated, unmatched rows survive") {
    val rows = Relational.q115JoinFull(spark, TestSpark.sf0001).collect()
    val sides = rows.groupBy(_.getAs[String]("side")).view.mapValues(_.length).toMap
    assert(sides.keySet == Set("heavy_only", "rich_only", "both"),
      s"expected all three side tags at sf0.001, got $sides")
    rows.foreach { r =>
      val side = r.getAs[String]("side")
      if (side == "heavy_only") assert(r.getAs[Double]("acctbal") == 0.0)
      if (side == "rich_only") assert(r.getAs[Long]("n_orders") == 0L)
      if (side == "both")
        assert(r.getAs[Long]("n_orders") >= 12 && r.getAs[Double]("acctbal") > 9000)
    }
  }

  test("q116 unpivot: three rows per flag, values equal the wide aggregate") {
    val long = Relational.q116Unpivot(spark, TestSpark.sf0001).collect()
    val perFlag = long.groupBy(_.getAs[String]("l_returnflag"))
    perFlag.foreach { case (_, rs) =>
      assert(rs.map(_.getAs[String]("measure")).sorted.toSeq ==
        Seq("sum_disc", "sum_price", "sum_qty"))
    }
    // unpivot(qty) must round-trip the wide aggregation exactly
    val wideQty = graft.Tables.lineitem(spark, TestSpark.sf0001)
      .groupBy(col("l_returnflag"))
      .agg(round(sum(col("l_quantity")), 2).as("v")).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    long.filter(_.getAs[String]("measure") == "sum_qty").foreach { r =>
      assert(r.getAs[Double]("value") == wideQty(r.getAs[String]("l_returnflag")))
    }
  }

  test("q130 funnel semantics: out-of-order purchases don't convert") {
    // reuses the production stage composition on a real sf dir, then
    // pins the ORDER constraint on the testdata invariants
    val rows = Relational.q130ConversionFunnel(spark, TestSpark.sf0001)
      .collect().map(r => r.getString(0) -> r.getAs[Long]("n_users")).toMap
    assert(rows("1_all") >= rows("2_viewed"), "funnel is monotone")
    assert(rows("2_viewed") >= rows("3_clicked"))
    assert(rows("3_clicked") >= rows("4_purchased"))
    assert(rows("1_all") > 0)
  }

  test("q131 cohorts: offset-0 retention is 1.0 and the triangle is bounded") {
    val rows = Relational.q131RetentionCohorts(spark, TestSpark.sf0001).collect()
    assert(rows.nonEmpty)
    rows.filter(_.getAs[Long]("week_offset") == 0L).foreach { r =>
      assert(r.getAs[Double]("retention") == 1.0,
        "every cohort member is by definition active in their first week")
    }
    rows.foreach { r =>
      val ret = r.getAs[Double]("retention")
      assert(ret > 0.0 && ret <= 1.0)
      assert(r.getAs[Long]("week_offset") >= 0L, "no activity before the cohort week")
    }
  }

  test("q132 anomaly: z-scores are centered and flags match the 2-sigma rule") {
    val rows = Relational.q132DailyAnomaly(spark, TestSpark.sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val z = r.getAs[Double]("z")
      assert(r.getAs[Int]("flagged") == (if (math.abs(z) >= 2) 1 else 0))
    }
    // z-scores of the full population sum to ~0 by construction
    val sumZ = rows.map(_.getAs[Double]("z")).sum
    assert(math.abs(sumZ) < 0.05 * rows.length, s"z-scores should center near 0: $sumZ")
  }

  test("q133 transitions: rows of the matrix are probability distributions") {
    val rows = Relational.q133TransitionMatrix(spark, TestSpark.sf0001).collect()
    assert(rows.nonEmpty)
    val byCur = rows.groupBy(_.getString(0))
    byCur.foreach { case (cur, rs) =>
      val total = rs.map(_.getAs[Double]("p")).sum
      assert(math.abs(total - 1.0) < 1e-3, s"P(·|$cur) must sum to 1, got $total")
      rs.foreach(r => assert(r.getAs[Double]("p") > 0.0))
    }
  }

  test("q134 seasonality: chi2 non-negative, peak hour is a real hour") {
    val rows = Relational.q134HourlySeasonality(spark, TestSpark.sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Double]("chi2") >= 0.0)
      val h = r.getAs[Int]("peak_hour")
      assert(h >= 0 && h <= 23)
      assert(r.getAs[Long]("peak_n") >= r.getAs[Long]("n_events") / 24,
        "the peak bin is at least the uniform expectation")
    }
  }

  test("q135 gini: equal masses score 0, a dominant source scores near 1") {
    import spark.implicits._
    val equal = (1 to 4).map(i => (i.toLong, s"s$i", "a b c d"))
      .toDF("doc_id", "source", "text")
    assert(Relational.giniOf(equal).collect().head.getAs[Double]("gini") == 0.0)
    // one source holds ~1000x the mass of each of 9 tiny peers
    val skew = ((1 to 9).map(i => (i.toLong, s"tiny$i", "x")) :+
      ((10L, "giant", Seq.fill(9000)("w").mkString(" "))))
      .toDF("doc_id", "source", "text")
    val g = Relational.giniOf(skew).collect().head.getAs[Double]("gini")
    assert(g > 0.85, s"dominant source must push gini toward 1 (got $g)")
    // and the real corpus sits strictly inside (0, 1)
    val real = Relational.q135SourceGini(spark, TestSpark.sf0001)
      .collect().head.getAs[Double]("gini")
    assert(real >= 0.0 && real < 1.0)
  }

  test("q142 rolling WAU: weekly actives dominate daily actives and are monotone at the ramp") {
    val wau = Relational.q142RollingWau(spark, TestSpark.sf0001).collect()
      .map(r => r.getDate(0).toString -> r.getAs[Long]("wau")).toMap
    val dau = graft.Tables.events(spark, TestSpark.sf0001)
      .select(col("user_id"), col("ts").cast("date").as("day")).distinct()
      .groupBy("day").count().collect()
      .map(r => r.getDate(0).toString -> r.getAs[Long]("count")).toMap
    assert(wau.nonEmpty && wau.keySet == dau.keySet)
    wau.foreach { case (day, w) =>
      assert(w >= dau(day), s"$day: WAU $w must dominate DAU ${dau(day)}")
    }
  }

  test("q143 arrival gaps: non-negative, median <= p90, burst fraction in [0,1]") {
    val rows = Relational.q143ArrivalGaps(spark, TestSpark.sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val med = r.getAs[Double]("median_gap_s"); val p90 = r.getAs[Double]("p90_gap_s")
      assert(med >= 0 && p90 >= med, s"${r.getString(0)}: median $med p90 $p90")
      val bf = r.getAs[Double]("burst_frac")
      assert(bf >= 0.0 && bf <= 1.0)
      assert(r.getAs[Long]("n_gaps") > 0)
    }
  }

  test("q118 array_agg: arrays are descending, at most 5, and start at the group max") {
    val rows = Relational.q118ArrayAgg(spark, TestSpark.sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val bals = r.getSeq[Double](2)
      assert(bals.size <= 5 && bals.nonEmpty)
      assert(bals == bals.sorted.reverse, s"${r.getString(0)}: not descending: $bals")
      assert(bals.size == math.min(5, r.getAs[Long]("n_customers")).toInt)
    }
  }

  test("q145 string_agg: <=5 names in rank order, first is the nation's top balance") {
    val rows = Relational.q145StringAgg(spark, TestSpark.sf0001).collect()
    assert(rows.nonEmpty)
    val topByNation = Tables.customer(spark, TestSpark.sf0001)
      .join(Tables.nation(spark, TestSpark.sf0001),
        col("c_nationkey") === col("n_nationkey"))
      .orderBy(col("c_acctbal").desc, col("c_name"))
      .collect().groupBy(_.getAs[String]("n_name"))
      .map { case (n, rs) => n -> rs.head.getAs[String]("c_name") }
    rows.foreach { r =>
      val names = r.getString(1).split(",")
      assert(names.length <= 5 && names.nonEmpty)
      assert(names.head == topByNation(r.getString(0)),
        s"${r.getString(0)}: first must be the top-balance customer")
    }
  }

  test("q146 regr trend: one row per event type, r2 in [0,1], finite slope") {
    val rows = Relational.q146RegrTrend(spark, TestSpark.sf0001).collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_days") > 1)
      val r2 = r.getAs[Double]("r2")
      assert(r2 >= 0.0 && r2 <= 1.0, s"r2 out of range: $r2")
      assert(!r.getAs[Double]("slope").isNaN && !r.getAs[Double]("intercept").isNaN)
    }
  }

  test("q147 waiting orders: blamed orders are a subset of multi-supplier orders") {
    val rows = Relational.q147WaitingOrders(spark, TestSpark.sf0001).collect()
    assert(rows.nonEmpty)
    val blamed = rows.map(_.getAs[Long]("n_blamed_orders")).sum
    val multiSupp = Tables.lineitem(spark, TestSpark.sf0001)
      .select(col("l_orderkey"), col("l_suppkey")).distinct()
      .groupBy(col("l_orderkey")).count().filter(col("count") >= 2).count()
    assert(blamed > 0 && blamed <= multiSupp,
      s"blamed $blamed must be within the $multiSupp multi-supplier orders")
  }

  test("q148 power users: one row, p99 <= max count, share consistent") {
    val r = Relational.q148PowerUsers(spark, TestSpark.sf0001).collect().head
    val share = r.getAs[Double]("power_share")
    assert(r.getAs[Long]("n_power") >= 1)
    assert(share > 0.0 && share <= 1.0)
    // power users are at most ~1% + ties of the population
    assert(r.getAs[Long]("n_power") <= r.getAs[Long]("n_users"))
    val maxCnt = Tables.events(spark, TestSpark.sf0001)
      .groupBy(col("user_id")).count().agg(max(col("count"))).head().getLong(0)
    assert(r.getAs[Double]("p99_cnt") <= maxCnt)
  }

  test("q149 event paths: trigrams of known types, counts non-increasing") {
    val types = Set("view", "click", "purchase", "signup", "error")
    val rows = Relational.q149EventPaths(spark, TestSpark.sf0001).collect()
    assert(rows.length == 20)
    rows.foreach { r =>
      val segs = r.getString(0).split(">")
      assert(segs.length == 3 && segs.forall(types.contains), r.getString(0))
    }
    val ns = rows.map(_.getAs[Long]("n"))
    assert(ns.zip(ns.tail).forall { case (a, b) => a >= b }, "top-k must be sorted")
  }

  test("q153 equi-depth bands: equal population within 1, contiguous ascending ranges") {
    val rows = Relational.q153EquidepthBands(spark, TestSpark.sf0001).collect()
    assert(rows.length == 10)
    val ns = rows.map(_.getAs[Long]("n"))
    assert(ns.max - ns.min <= 1, s"equi-depth means counts differ by <=1: ${ns.toSeq}")
    rows.foreach(r => assert(r.getAs[Double]("lo") <= r.getAs[Double]("hi")))
    rows.sliding(2).foreach { p =>
      if (p.length == 2)
        assert(p(0).getAs[Double]("hi") <= p(1).getAs[Double]("lo"),
          "bands must not overlap")
    }
  }

  test("q160 bucketed bands agree with the exact ntile within the sketch's rank-error bound") {
    val exact = Relational.q153EquidepthBands(spark, TestSpark.sf0001).collect()
      .map(r => r.getAs[Int]("band") -> r.getAs[Long]("n")).toMap
    val approx = Relational.q160EquidepthBucketed(spark, TestSpark.sf0001).collect()
    val ord = Tables.orders(spark, TestSpark.sf0001)
    val n = ord.count()
    // a value-based bucketer cannot split ties across bands the way the
    // position-based ntile does, so the agreement bound is the sketch's
    // rank error (n/accuracy per boundary) plus the largest tie class
    val maxTie = ord.groupBy(col("o_totalprice")).count()
      .agg(max(col("count"))).head().getLong(0)
    val bound = n.toDouble / Relational.EquidepthAccuracy + maxTie
    assert(approx.map(_.getAs[Long]("n")).sum == n, "bands must conserve the fact")
    assert(approx.length == 10)
    approx.foreach { r =>
      val b = r.getAs[Int]("band")
      assert(b >= 1 && b <= 10)
      assert(math.abs(r.getAs[Long]("n") - exact.getOrElse(b, 0L)) <= bound,
        s"band $b: bucketed ${r.getAs[Long]("n")} vs exact ${exact.get(b)} (bound $bound)")
    }
    // and the same contiguity contract as the exact form
    val sorted = approx.sortBy(_.getAs[Int]("band"))
    sorted.foreach(r => assert(r.getAs[Double]("lo") <= r.getAs[Double]("hi")))
    sorted.sliding(2).foreach { p =>
      if (p.length == 2)
        assert(p(0).getAs[Double]("hi") <= p(1).getAs[Double]("lo"),
          "bucketed bands must not overlap")
    }
  }

  test("q155 skew audit: profile ordering invariants, exact distinct counts, no hot keys here") {
    val rows = Relational.q155KeySkewAudit(spark, TestSpark.sf0001).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(rows.keySet == Set("l_orderkey", "l_partkey", "l_suppkey"))
    val li = Tables.lineitem(spark, TestSpark.sf0001)
    rows.foreach { case (k, r) =>
      assert(r.getAs[Long]("n_keys") == li.select(col(k)).distinct().count())
      val mx = r.getAs[Long]("max_mult")
      assert(mx >= r.getAs[Double]("p99_mult") &&
        r.getAs[Double]("p99_mult") >= 1.0 &&
        r.getAs[Double]("mean_mult") >= 1.0 && mx >= r.getAs[Double]("mean_mult").toLong)
      val share = r.getAs[Double]("top_share")
      assert(share > 0.0 && share <= 1.0)
      assert(r.getAs[Long]("hot_keys") == 0L,
        "TPC-H-ish keys sit far under the 100k hot threshold")
    }
    // the audit's verdict matches q79's observed regime: no salting needed
    assert(rows("l_orderkey").getAs[Long]("max_mult") < graft.ops.Skew.DefaultHotThreshold)
  }

  test("q163 attribution: channels are known touches, purchases conserved") {
    val events = Tables.events(spark, TestSpark.sf0001)
    val purchases = events.filter(col("event_type") === "purchase").count()
    val rows = Relational.q163Attribution(spark, TestSpark.sf0001).collect()
    val known = Set("view", "click", "signup", "error", "direct")
    rows.foreach(r => assert(known.contains(r.getString(0)),
      s"purchase can never attribute to itself: ${r.getString(0)}"))
    assert(rows.map(_.getAs[Long]("n_purchases")).sum == purchases,
      "every purchase lands in exactly one channel")
  }

  test("q172 session scoping: a session gap severs an otherwise in-window touch") {
    import spark.implicits._
    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    // user 1: click, 25 min of SILENCE (> 10-min session gap, < 30-min
    // attribution window), purchase — q163 credits the click, q172
    // says direct. user 2: click then purchase 23 min later with
    // keep-alive views every ≤10 min bridging the session — both
    // rules credit the last view.
    val ev = Seq(
      (1L, "click", ts(1000), 1L, 0.0),
      (1L, "purchase", ts(1000 + 1500), 2L, 10.0),
      (2L, "click", ts(5000), 3L, 0.0),
      (2L, "view", ts(5000 + 300), 4L, 0.0),
      (2L, "view", ts(5000 + 800), 5L, 0.0),
      (2L, "purchase", ts(5000 + 1400), 6L, 20.0))
      .toDF("user_id", "event_type", "ts", "event_id", "value")
    val flat = Relational.attributedPurchases(ev).collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    val scoped = Relational.sessionAttributedPurchases(ev).collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    assert(flat(1L) == "click" && scoped(1L) == "direct",
      s"the 25-min silence must sever user 1's credit: flat $flat scoped $scoped")
    assert(flat(2L) == "view" && scoped(2L) == "view",
      s"user 2's bridged session keeps the credit: flat $flat scoped $scoped")
  }

  test("q164 HHI: bounded by [1/n, 1], top share consistent") {
    Relational.q164BrandHhi(spark, TestSpark.sf0001).collect().foreach { r =>
      val n = r.getAs[Long]("n_suppliers").toDouble
      val hhi = r.getAs[Double]("hhi")
      val top = r.getAs[Double]("top_share")
      assert(hhi >= 1.0 / n - 1e-6 && hhi <= 1.0 + 1e-9,
        s"HHI out of range for n=$n: $hhi")
      assert(top >= 1.0 / n - 1e-6 && top <= 1.0 + 1e-9)
      // a distribution whose max share is t has HHI >= t^2
      assert(hhi >= top * top - 1e-6, s"hhi $hhi < top_share^2 ${top * top}")
    }
  }

  test("q165 fulfillment lag: all five priorities, ordered percentiles") {
    val rows = Relational.q165FulfillmentLag(spark, TestSpark.sf0001).collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      assert(r.getAs[Double]("p50") <= r.getAs[Double]("p90"))
      assert(r.getAs[Long]("n_orders") > 0)
    }
  }

  test("q166 latest snapshot: one row per customer, genuinely the latest") {
    val snap = Relational.q166LatestSnapshot(spark, TestSpark.sf0001)
    val nCust = Tables.orders(spark, TestSpark.sf0001)
      .select(col("o_custkey")).distinct().count()
    assert(snap.count() == nCust, "exactly one current row per key")
    // spot-check: the snapshot date equals the per-customer max date
    val maxDates = Tables.orders(spark, TestSpark.sf0001)
      .groupBy(col("o_custkey")).agg(max(col("o_orderdate")).as("mx"))
    val joined = snap.join(maxDates, Seq("o_custkey"))
      .filter(col("last_orderdate") =!= col("mx")).count()
    assert(joined == 0, "snapshot rows must carry the max order date")
  }

  test("q191 scd2: intervals tile each key's history; exactly one open current row") {
    val scd = Relational.q191Scd2Intervals(spark, TestSpark.sf0001).cache()
    try {
      val orders = Tables.orders(spark, TestSpark.sf0001)
      assert(scd.count() == orders
        .select(col("o_custkey"), col("o_orderdate")).distinct().count(),
        "one interval per (key, date) end-of-date state")
      // the date grain makes zero-width intervals impossible — every
      // version is retrievable by an as-of lookup
      assert(scd.filter(col("valid_to") === col("valid_from")).count() == 0,
        "no zero-width [d, d) interval may exist")
      // per key: exactly one open-ended (NULL valid_to) current version
      val open = scd.filter(col("valid_to").isNull)
        .groupBy(col("o_custkey")).count()
        .filter(col("count") =!= 1L).count()
      assert(open == 0, "exactly one current version per key")
      // contiguity: version k's valid_to equals version k+1's valid_from
      val nxt = scd.select(col("o_custkey"), col("version_idx"),
        col("valid_from").as("nxt_from"))
        .withColumn("version_idx", col("version_idx") - 1)
      val torn = scd.join(nxt, Seq("o_custkey", "version_idx"))
        .filter(col("valid_to") =!= col("nxt_from")).count()
      assert(torn == 0, "closed intervals must tile: valid_to == next valid_from")
      // the open row is q166's latest snapshot, key for key
      val latest = Relational.q166LatestSnapshot(spark, TestSpark.sf0001)
        .select(col("o_custkey"), col("last_orderkey"))
      val mismatch = scd.filter(col("valid_to").isNull)
        .join(latest, Seq("o_custkey"))
        .filter(col("o_orderkey") =!= col("last_orderkey")).count()
      assert(mismatch == 0, "open interval must carry q166's current version")
    } finally scd.unpersist()
  }

  test("q118 string form serializes exactly the array form, %.2f comma-joined") {
    val arr = Relational.q118ArrayAgg(spark, TestSpark.sf0001).collect()
      .map(r => r.getString(0) -> r.getSeq[Double](2)).toMap
    val str = Relational.q118ArrayAggStr(spark, TestSpark.sf0001).collect()
    assert(str.nonEmpty)
    assert(str.head.schema("top_bals").dataType ==
      org.apache.spark.sql.types.StringType)
    str.foreach { r =>
      val want = arr(r.getString(0)).map(b => f"$b%.2f").mkString(",")
      assert(r.getString(2) == want, s"${r.getString(0)}: ${r.getString(2)} != $want")
    }
  }

  test("q195: hand-computed survival curve on planted lifetimes") {
    import spark.implicits._
    // u1 lives 0 days, u2 lives 10, u3 lives 30 (first-to-last event)
    val ev = Seq(
      (1L, "2024-01-01 08:00:00"), (1L, "2024-01-01 20:00:00"),
      (2L, "2024-01-01 08:00:00"), (2L, "2024-01-11 08:00:00"),
      (3L, "2024-01-01 08:00:00"), (3L, "2024-01-31 08:00:00"))
      .toDF("user_id", "s")
      .select(org.apache.spark.sql.functions.col("user_id"),
        org.apache.spark.sql.functions.to_timestamp(
          org.apache.spark.sql.functions.col("s")).as("ts"))
    val rows = Relational.retentionSurvival(ev).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(rows == Map(
      0L -> ((3L, 1.0)),
      7L -> ((2L, 0.666667)),
      14L -> ((1L, 0.333333)),
      21L -> ((1L, 0.333333)),
      28L -> ((1L, 0.333333))))
  }

  test("q195: an empty events frame yields the 5-row zero curve, not nulls") {
    import spark.implicits._
    val empty = Seq.empty[(Long, java.sql.Timestamp)].toDF("user_id", "ts")
    val rows = Relational.retentionSurvival(empty).collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      assert(r.getLong(1) == 0L, "n_alive must be 0, never null")
      assert(r.isNullAt(2), "survival over zero users is undefined (0/0) -> null")
    }
  }

  test("q195: randomized lifetimes equal a driver brute force") {
    import spark.implicits._
    val rnd = new java.util.Random(195L)
    for (round <- 1 to 3) {
      // random users, 1-5 events each, days drawn in [0, 40)
      val evRows = (1 to 30).flatMap { u =>
        (0 until 1 + rnd.nextInt(5)).map { _ =>
          (u.toLong, rnd.nextInt(40)) }
      }
      val expected = {
        val byUser = evRows.groupBy(_._1).values.map { es =>
          es.map(_._2).max - es.map(_._2).min }.toSeq
        Seq(0, 7, 14, 21, 28).map { h =>
          val alive = byUser.count(_ >= h).toLong
          val surv = BigDecimal(alive.toDouble / byUser.size)
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
          h.toLong -> ((alive, surv))
        }.toMap
      }
      val got = Relational.retentionSurvival(
        evRows.toDF("user_id", "day")
          .select(col("user_id"), expr("timestamp_seconds(86400 * day + 3600)").as("ts")))
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
      assert(got == expected, s"round $round: $got != $expected")
    }
  }

  test("q195: survival is monotone non-increasing and anchored at 1.0") {
    val rows = Relational.q195RetentionSurvival(spark, TestSpark.sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(rows.map(_._1).toSeq == Seq(0L, 7L, 14L, 21L, 28L))
    assert(rows.head._3 == 1.0, "every user survives >= 0 days by construction")
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b._2 <= a._2 && b._3 <= a._3,
        s"survival must not increase with horizon: $a -> $b")
    }
  }
}
