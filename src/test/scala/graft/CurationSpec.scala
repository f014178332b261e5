package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Curation

class CurationSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf0001

  test("q63: splits partition the corpus at ~80/10/10 and are deterministic") {
    val total = graft.Tables.documents(spark, sf).count()
    val rows = Curation.q63HashSplit(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.keySet == Set("train", "val", "test"))
    assert(rows.values.sum == total, "splits must partition the corpus exactly")
    // md5 buckets are uniform: train ≈ 79.7%, loose bounds for a small sf
    assert(rows("train").toDouble / total > 0.65 && rows("train").toDouble / total < 0.95)
    val again = Curation.q63HashSplit(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(again == rows, "the split must be identical across runs")
  }

  test("q64: every source's selection respects the token budget") {
    val rows = Curation.q64TokenBudget(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val sel = r.getAs[Long]("sel_tokens")
      assert(sel <= Curation.TokenBudget,
        s"source ${r.getString(0)} selected $sel tokens > budget")
      assert(r.getAs[Long]("n_selected") >= 1)
    }
  }

  test("q65: chunks conserve tokens and start at chunk 0 per source") {
    val docs = graft.Tables.documents(spark, sf)
    import org.apache.spark.sql.functions._
    val totalTokens = docs
      .select(sum(size(split(col("text"), " ")).cast("bigint"))).collect()(0).getLong(0)
    val rows = Curation.q65PackChunks(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("chunk_tokens")).sum == totalTokens,
      "start-offset attribution must conserve every token exactly once")
    val firstChunk = rows.groupBy(_.getString(0)).map { case (_, rs) =>
      rs.map(_.getAs[Long]("chunk_id")).min }
    assert(firstChunk.forall(_ == 0L), "every source's packing starts at chunk 0")
  }

  test("q68: greedy next-fit bins conserve tokens and respect the cap") {
    import org.apache.spark.sql.functions._
    val docs = graft.Tables.documents(spark, sf)
    val totalTokens = docs
      .select(sum(size(split(col("text"), " ")).cast("bigint"))).collect()(0).getLong(0)
    val rows = Curation.q68GreedyPack(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("bin_tokens")).sum == totalTokens,
      "whole-document packing must conserve every token exactly once")
    // a bin over the cap can only be a single oversized document
    rows.foreach { r =>
      val over = r.getAs[Long]("bin_tokens") > Curation.SeqLen
      assert(!over || r.getAs[Long]("n_docs") == 1L,
        s"overfull bin with ${r.getAs[Long]("n_docs")} docs: $r")
    }
    // bins are dense from 0 per source
    rows.groupBy(_.getString(0)).foreach { case (src, rs) =>
      val ids = rs.map(_.getAs[Long]("bin_id")).sorted
      assert(ids.head == 0L && ids.toSeq == (0L until ids.length).toSeq,
        s"source $src bins not dense: ${ids.mkString(",")}")
    }
    // greedy next-fit wastes less than one whole bin per closed bin:
    // each closed bin is > cap/2 full OR was closed by an oversized doc;
    // weaker structural check — average fill of non-final bins > 50%
    val fills = rows.groupBy(_.getString(0)).toSeq.flatMap { case (_, rs) =>
      rs.sortBy(_.getAs[Long]("bin_id")).dropRight(1).map(_.getAs[Long]("bin_tokens")).toSeq
    }
    if (fills.nonEmpty)
      assert(fills.sum.toDouble / fills.size > Curation.SeqLen / 2.0)
  }

  test("bucketedCumSum: exact prefix sum on a planted giant source, split across many buckets") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    // one 20k-doc giant source + two small ones: the single-window form
    // would serialize the giant into one task
    val docs = spark.range(0, 20600).selectExpr(
      "CASE WHEN id < 20000 THEN 'giant' ELSE concat('s', id % 2) END AS source",
      "id AS doc_id",
      "CAST(id % 7 + 1 AS BIGINT) AS n_tokens",
      "CAST((id * 37) % 997 AS INT) AS n_chars")
    // q65 ordering (doc_id)
    val two = docs.withColumn("bucket", expr(s"doc_id DIV ${Curation.CumBucketWidth}"))
    val got = Curation.bucketedCumSum(two, Seq(col("doc_id").asc))
    val wRef = Window.partitionBy(col("source")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ref = docs.withColumn("cum_ref", sum(col("n_tokens")).over(wRef))
    val joined = got.select(col("doc_id"), col("cum_tokens"))
      .join(ref.select(col("doc_id"), col("cum_ref")), "doc_id")
    assert(joined.filter(col("cum_tokens") =!= col("cum_ref")).count() == 0,
      "two-level scan must equal the single-window prefix sum exactly")
    // the giant source really is spread across many window partitions
    val nBuckets = two.filter(col("source") === "giant")
      .select(col("bucket")).distinct().count()
    assert(nBuckets > 100, s"giant source only spans $nBuckets buckets")
    // q64 ordering (n_chars DESC, doc_id) with the negated-chars bucket
    val two64 = docs.withColumn("bucket", expr(s"(0 - n_chars) DIV ${Curation.CumBucketWidth}"))
    val got64 = Curation.bucketedCumSum(two64, Seq(col("n_chars").desc, col("doc_id").asc))
    val wRef64 = Window.partitionBy(col("source"))
      .orderBy(col("n_chars").desc, col("doc_id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ref64 = docs.withColumn("cum_ref", sum(col("n_tokens")).over(wRef64))
    val joined64 = got64.select(col("doc_id"), col("cum_tokens"))
      .join(ref64.select(col("doc_id"), col("cum_ref")), "doc_id")
    assert(joined64.filter(col("cum_tokens") =!= col("cum_ref")).count() == 0,
      "descending-quality order must also match the single window")
  }

  test("bucketedCumSum: sign-safe — NEGATIVE values still match the single window") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    // alternating-sign values: bucket totals derived as max(cum_in)
    // (the pre-fix formulation) would be wrong wherever a bucket's
    // running sum peaks before its end
    val docs = spark.range(0, 5000).selectExpr(
      "concat('s', id % 3) AS source",
      "id AS doc_id",
      "CAST(CASE WHEN id % 2 = 0 THEN id % 11 + 1 ELSE -(id % 5) - 1 END AS BIGINT) AS v")
    val two = docs.withColumn("bucket", expr(s"doc_id DIV ${Curation.CumBucketWidth}"))
    val got = Curation.bucketedCumSum(two, Seq(col("doc_id").asc), col("v"))
    val wRef = Window.partitionBy(col("source")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ref = docs.withColumn("cum_ref", sum(col("v")).over(wRef))
    val joined = got.select(col("doc_id"), col("cum_tokens"))
      .join(ref.select(col("doc_id"), col("cum_ref")), "doc_id")
    assert(joined.filter(col("cum_tokens") =!= col("cum_ref")).count() == 0,
      "negative values must not break the two-level scan's bucket offsets")
  }

  test("q71: end-to-end pipeline composes its stages consistently") {
    import org.apache.spark.sql.functions._
    val rows = Curation.q71CurationPipeline(spark, sf).collect()
    assert(rows.nonEmpty)
    // the pipeline only ever drops documents: its per-source doc count
    // is bounded by the corpus, and its train cut by q63's train count
    val corpus = graft.Tables.documents(spark, sf)
      .groupBy(col("source")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val trainTotal = Curation.q63HashSplit(spark, sf).collect()
      .collectFirst { case r if r.getString(0) == "train" => r.getLong(1) }.get
    rows.foreach { r =>
      assert(r.getAs[Long]("n_docs") <= corpus(r.getString(0)))
      assert(r.getAs[Long]("n_chunks") >= 1 &&
             r.getAs[Long]("n_chunks") <= r.getAs[Long]("n_docs"))
    }
    assert(rows.map(_.getAs[Long]("n_docs")).sum <= trainTotal,
      "quality-filtered train subset cannot exceed the full train split")
    // deterministic across runs (rand-free pipeline)
    val again = Curation.q71CurationPipeline(spark, sf).collect()
    assert(rows.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }

  test("q72: planted benchmark leakage is flagged; clean docs are not") {
    import spark.implicits._
    // doc 1 contains the benchmark's exact 6-word passage (two 5-grams
    // overlap), doc 2 shares nothing
    val train = Seq(
      (1L, "s1", "alpha the quick brown fox jumps over beta gamma"),
      (2L, "s1", "totally different words with no benchmark overlap at all"),
      (3L, "s2", "short doc")).toDF("doc_id", "source", "text")
    val test = Seq(
      (100L, "bench", "the quick brown fox jumps over")).toDF("doc_id", "source", "text")
    val got = Curation.decontaminate(train, test).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got("s1") == ((2L, 1L, 2L)),
      s"s1: 2 train docs, 1 contaminated, 2 overlapping 5-grams — got ${got("s1")}")
    assert(got("s2") == ((1L, 0L, 0L)), "short/clean docs must not be flagged")
  }

  test("q80: bloom pre-screen is invisible — agrees with the exact path on planted leakage") {
    import spark.implicits._
    val train = Seq(
      (1L, "s1", "alpha the quick brown fox jumps over beta gamma"),
      (2L, "s1", "totally different words with no benchmark overlap at all"),
      (3L, "s2", "short doc"),
      (4L, "s2", "yet another perfectly clean training document about nothing shared"),
      (5L, "s3", "the quick brown fox jumps over the lazy dog again and again"))
      .toDF("doc_id", "source", "text")
    val test = Seq(
      (100L, "bench", "the quick brown fox jumps over")).toDF("doc_id", "source", "text")
    val exact = Curation.decontaminate(train, test).collect().map(_.toString).toSeq
    val bloom = Curation.decontaminateBloom(train, test).collect().map(_.toString).toSeq
    assert(bloom == exact,
      s"bloom pre-screened result must be bit-identical to the exact join:\n$bloom\nvs\n$exact")
    // and the planted contamination is actually present in what both agree on
    val got = Curation.decontaminateBloom(train, test).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(got("s1") == 1L && got("s3") == 1L && got("s2") == 0L, s"got $got")
  }

  test("bloom pre-screen construction runs ZERO Spark jobs (lazy seam)") {
    // the former prescreenBloom ran two eager jobs (count + bloom agg)
    // at DataFrame-construction time; the in-plan subquery form must
    // run none until an action consumes the frame (r14 verdict ask #4)
    import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = { jobs.incrementAndGet(); () }
    }
    import org.apache.spark.sql.functions._
    val docs = graft.Tables.documents(spark, sf)
      .select(col("source"), col("doc_id"), col("text"))
    val b = substring(md5(col("doc_id").cast("string")), 1, 2)
    spark.sparkContext.addSparkListener(listener)
    try {
      val frame = Curation.decontaminateBloom(docs.filter(b < "cc"), docs.filter(b >= "e0"))
      val spans = Curation.decontaminateSpans(docs.filter(b < "cc"), docs.filter(b >= "e6"))
      // force full planning too — still no execution
      frame.queryExecution.executedPlan
      spans.queryExecution.executedPlan
      // listener bus is async (and its drain hook is private[spark]);
      // a generous beat lets any queued job-start event land
      Thread.sleep(1500)
      assert(jobs.get() == 0,
        s"plan-only construction of the bloom-screened frames ran ${jobs.get()} job(s)")
      // and the frames still execute correctly after lazy construction
      assert(frame.count() > 0)
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("bloom pre-screen size hint: sized literals, still zero jobs at construction, identical results") {
    // the r15-advice escape hatch for >1M-fp eval suites: expectedFps
    // becomes literal sizing expressions on the BloomFilterAggregate —
    // no eager count job, and the exact join keeps results identical
    import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
    import org.apache.spark.sql.functions._
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = { jobs.incrementAndGet(); () }
    }
    val docs = graft.Tables.documents(spark, sf)
      .select(col("source"), col("doc_id"), col("text"))
    val b = substring(md5(col("doc_id").cast("string")), 1, 2)
    val train = docs.filter(b < "cc"); val test0 = docs.filter(b >= "e0")
    spark.sparkContext.addSparkListener(listener)
    val hinted =
      try {
        val f = Curation.decontaminateBloom(train, test0, expectedFps = Some(50000L))
        f.queryExecution.executedPlan
        Thread.sleep(1500)
        assert(jobs.get() == 0,
          s"sized construction ran ${jobs.get()} job(s) — the hint must stay literal")
        f
      } finally spark.sparkContext.removeSparkListener(listener)
    val unhinted = Curation.decontaminateBloom(train, test0)
    assert(hinted.collect().map(_.toString).toSeq ==
      unhinted.collect().map(_.toString).toSeq,
      "the size hint must never change results (fpp moves shuffle volume only)")
  }

  test("AQE: the lazy bloom subquery executes the test side at most twice (no per-stage re-execution)") {
    // round-15 verdict sweep target #1: under AQE, does the in-plan
    // scalar subquery (the bloom build) re-execute per re-optimized /
    // reused exchange? Pin it empirically: a counting UDF on the test
    // side ticks once per test row per full pass. The plan contains
    // exactly two consumers of the test side — the subquery's bloom
    // aggregation and the exact join's re-derivation — so a healthy
    // run ticks ≤ 2n (n if exchange reuse dedups the shared
    // shingle+distinct subtree); a subquery re-executing per stage
    // would tick 3n+.
    import org.apache.spark.sql.functions._
    assert(spark.conf.get("spark.sql.adaptive.enabled") == "true",
      "this pin is about AQE behavior — the test session must run AQE")
    val docs = graft.Tables.documents(spark, sf)
      .select(col("source"), col("doc_id"), col("text"))
    val b = substring(md5(col("doc_id").cast("string")), 1, 2)
    val train = docs.filter(b < "cc")
    val testPlain = docs.filter(b >= "e0")
    val n = testPlain.count()
    assert(n > 0)
    val acc = spark.sparkContext.longAccumulator("graft-testside-ticks")
    val tick = udf { (s: String) => acc.add(1); s }
    // collect(), not count(): for a count-only consumer Catalyst
    // ELIMINATES the hits left-join outright (distinct join key — row
    // count provably unchanged) and the test side never executes at
    // all (0 ticks — verified; a neat optimizer result, but not the
    // path this pin is about)
    Curation.decontaminateBloom(train,
      testPlain.withColumn("text", tick(col("text")))).collect()
    val ticks = acc.value
    assert(ticks > 0 && ticks <= 2 * n && ticks % n == 0,
      s"test side of $n rows ticked $ticks times — expected n or 2n " +
        "(bloom-build subquery once + exact join once)")
  }

  test("q80: corpus run agrees with decontaminate on the same splits") {
    val q80 = Curation.q80BloomDecontaminate(spark, sf).collect().map(_.toString).toSeq
    import org.apache.spark.sql.functions._
    val b = substring(md5(col("doc_id").cast("string")), 1, 2)
    val docs = graft.Tables.documents(spark, sf)
      .select(col("source"), col("doc_id"), col("text"))
    val exact = Curation.decontaminate(docs.filter(b < "cc"), docs.filter(b >= "e0"))
      .collect().map(_.toString).toSeq
    assert(q80 == exact)
  }

  test("q73: repetition signals detect planted boilerplate") {
    import org.apache.spark.sql.functions._
    val rows = graft.ops.Text.q73Repetition(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val dup = r.getDouble(1)
      assert(dup >= 0.0 && dup < 1.0)
      if (!r.isNullAt(2)) {
        val top = r.getDouble(2)
        assert(top > 0.0 && top <= 1.0)
      }
    }
  }

  test("q77: adaptive filter keeps exactly the top half per source, by rank") {
    val rows = Curation.q77AdaptiveFilter(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, kept) = (r.getAs[Long]("n_docs"), r.getAs[Long]("n_kept"))
      assert(kept == (n + 1) / 2,
        s"${r.getString(0)}: rank cut must keep exactly ceil(n/2), got $kept of $n")
    }
    val again = Curation.q77AdaptiveFilter(spark, sf).collect()
    assert(rows.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }

  test("q66: sampling is a per-source subset with a deterministic keep set") {
    val rows = Curation.q66MixSample(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_sampled") <= r.getAs[Long]("n_docs"))
    }
    // at least one source must be downsampled strictly (rates < 1.0)
    assert(rows.exists(r => r.getAs[Long]("n_sampled") < r.getAs[Long]("n_docs")))
    val again = Curation.q66MixSample(spark, sf).collect()
    assert(rows.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }

  test("temperature mix: alpha < 1 up-weights small sources, budget holds in expectation") {
    import spark.implicits._
    // 10:1 skew — at alpha 0.5 the sampling weights go as sqrt(n), so
    // the small source's PER-DOC rate is sqrt(10) x the big one's
    val docs = (Seq.tabulate(2000)(i => ("big", i.toLong)) ++
                Seq.tabulate(200)(i => ("small", 10000L + i)))
      .toDF("source", "doc_id")
    val m = Curation.temperatureMix(docs, alpha = 0.5, budget = 0.25)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getLong(3)))).toMap
    val (nBig, rBig, kBig) = m("big")
    val (nSmall, rSmall, kSmall) = m("small")
    assert(nBig == 2000 && nSmall == 200)
    assert(math.abs(rSmall / rBig - math.sqrt(10.0)) < 1e-3,
      s"rate ratio ${rSmall / rBig} should be ~sqrt(10)")
    // expected kept = budget * N = 550; hash-uniform within a loose CI
    val kept = kBig + kSmall
    assert(kept > 450 && kept < 650, s"expected ~550 kept, got $kept")
    // per-source keeps track their own expectation n_i * r_i
    assert(math.abs(kBig - nBig * rBig) < 4 * math.sqrt(nBig * rBig * (1 - rBig)) + 10)
    assert(math.abs(kSmall - nSmall * rSmall) < 4 * math.sqrt(nSmall * rSmall * (1 - rSmall)) + 10)
  }

  test("temperature mix: a budget-capped source keeps everything (rate clamps at 1)") {
    import spark.implicits._
    // tiny source + huge budget: its raw rate exceeds 1 and must clamp
    val docs = (Seq.tabulate(1000)(i => ("big", i.toLong)) ++
                Seq.tabulate(5)(i => ("tiny", 20000L + i)))
      .toDF("source", "doc_id")
    val m = Curation.temperatureMix(docs, alpha = 0.3, budget = 0.6)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getLong(3)))).toMap
    assert(m("tiny")._2 == 1.0, s"tiny source rate must clamp: ${m("tiny")._2}")
    assert(m("tiny")._3 == 5L, "clamped source keeps every doc")
  }

  test("stratified sample: exactly k per source, all of a smaller source, deterministic") {
    import spark.implicits._
    val docs = (Seq.tabulate(100)(i => ("big", i.toLong)) ++
                Seq.tabulate(7)(i => ("small", 1000L + i)))
      .toDF("source", "doc_id")
    val sample = Curation.stratifiedSample(docs, 10).collect()
    val bySrc = sample.groupBy(_.getString(0))
    assert(bySrc("big").length == 10, "exactly k from the larger source")
    assert(bySrc("small").length == 7, "every doc of a sub-k source")
    assert(bySrc("big").map(_.getInt(2)).sorted.toSeq == (1 to 10), "ranks are 1..k")
    val again = Curation.stratifiedSample(docs, 10).collect()
    assert(sample.map(_.toString).sorted.toSeq == again.map(_.toString).sorted.toSeq,
      "same corpus, same sample")
  }

  test("q178 reservoir aggregate ≡ q84 window form, partition-independent, no window node") {
    val q84 = graft.ops.Curation.q84StratifiedSample(spark, TestSpark.sf0001)
      .collect().map(_.toString).toSeq
    val q178 = graft.ops.Curation.q178ReservoirSample(spark, TestSpark.sf0001)
      .collect().map(_.toString).toSeq
    assert(q178 == q84, "the mergeable reservoir must reproduce q84 row-for-row")
    // merge is associative+commutative: any partitioning, same rows
    import graft.functions.HashReservoirAgg.hashReservoir
    import org.apache.spark.sql.functions.{col, concat, lit, md5, substring}
    val docs = graft.Tables.documents(spark, TestSpark.sf0001)
      .select(col("source"), col("doc_id"),
        substring(md5(concat(col("doc_id").cast("string"), lit(":strat"))), 1, 16)
          .as("rnk"))
    def ids(parts: Int) = docs.repartition(parts)
      .groupBy(col("source")).agg(hashReservoir(col("rnk"), col("doc_id"), 20).as("ids"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    assert(ids(1) == ids(17), "reservoir merge must be partitioning-independent")
    // and the plan replaces the window with a partial-aggregated agg
    val plan = graft.ops.Curation.q178ReservoirSample(spark, TestSpark.sf0001)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"q178 must not window the fact:\n$plan")
    assert(plan.contains("hash_reservoir"), s"q178 must aggregate:\n$plan")
  }

  test("q179 weighted reservoir ≡ q103 window form, partition-independent") {
    val q103 = graft.ops.Curation.q103WeightedSample(spark, TestSpark.sf0001)
      .collect().map(_.toString).toSeq
    val q179 = graft.ops.Curation.q179WeightedReservoir(spark, TestSpark.sf0001)
      .collect().map(_.toString).toSeq
    assert(q179 == q103, "the A-ES reservoir must reproduce q103 row-for-row")
    import graft.functions.HashReservoirAgg.weightedReservoir
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    // partitioning-independent merge, with a planted dominant weight:
    // priority 1.0 must always survive any partitioning
    val rows = (0L until 500L).map(i => (i, (i % 97).toDouble / 100.0)) :+
      (999L, 1.0)
    val df = rows.toDF("id", "prio")
    def top(parts: Int) = df.repartition(parts)
      .agg(weightedReservoir(col("prio"), col("id"), 5)).head().getSeq[Long](0)
    assert(top(1) == top(13), "weighted merge must be partitioning-independent")
    assert(top(13).head == 999L, "the dominant priority must rank first")
    // a NaN priority must not poison the buffer or break partitioning
    // independence (Double.compare total order sorts it greatest,
    // deterministically)
    val withNaN = (rows :+ (1000L, Double.NaN)).toDF("id", "prio")
    def topN(parts: Int) = withNaN.repartition(parts)
      .agg(weightedReservoir(col("prio"), col("id"), 5)).head().getSeq[Long](0)
    assert(topN(1) == topN(13), "NaN must not make the merge partition-dependent")
    assert(topN(1).contains(999L), "real priorities still survive alongside a NaN")
    // and the claimed plan trade holds, like q178: aggregate, no window
    val plan = graft.ops.Curation.q179WeightedReservoir(spark, TestSpark.sf0001)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"q179 must not window the fact:\n$plan")
    assert(plan.contains("weighted_reservoir"), s"q179 must aggregate:\n$plan")
  }

  test("weighted sample: exactly k per source, a dominant weight always wins, deterministic") {
    import spark.implicits._
    // 50 unit-weight docs plus one doc whose weight dwarfs them: its
    // priority u^(1/w) -> 1 as w grows, so it must rank first
    val docs = ((0 until 50).map(i => ("s", i.toLong, 200L)) :+
        (("s", 999L, 2000000000L)))
      .toDF("source", "doc_id", "n_chars")
    val sample = Curation.weightedSample(docs, 10).collect()
    assert(sample.length == 10, "exactly k from a larger source")
    val first = sample.find(_.getInt(3) == 1).get
    assert(first.getLong(1) == 999L,
      s"the dominant-weight doc must rank first, got ${first.getLong(1)}")
    val again = Curation.weightedSample(docs, 10).collect()
    assert(sample.map(_.toString).sorted.toSeq == again.map(_.toString).sorted.toSeq,
      "same corpus, same sample")
  }

  test("weighted sample: sub-k source keeps every doc; samples nest as k grows") {
    val docs = graft.Tables.documents(spark, sf)
      .select(org.apache.spark.sql.functions.col("source"),
        org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.col("n_chars"))
    def ids(k: Int) = Curation.weightedSample(docs, k).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    val s5 = ids(5)
    val s15 = ids(15)
    assert(s5.subsetOf(s15), "smaller quota must be contained in the larger")
    assert(s5.nonEmpty && s15.size > s5.size)
  }

  test("weighted sample: weighting shifts mass toward long docs vs the uniform sampler") {
    // two length classes; the weighted sample must select long docs at
    // a visibly higher rate than the uniform stratified sampler does
    import spark.implicits._
    val docs = ((0 until 200).map(i => ("s", i.toLong, 10L)) ++
        (200 until 400).map(i => ("s", i.toLong, 4000L)))
      .toDF("source", "doc_id", "n_chars")
    val weighted = Curation.weightedSample(docs, 40).collect()
      .count(_.getLong(2) == 4000L)
    assert(weighted >= 30,
      s"with 400x weights the long class should dominate the sample, got $weighted/40")
  }

  test("stratified samples nest: the k=10 sample is a prefix of the k=20 sample") {
    // growing the quota must only ADD docs (rank order is corpus-stable),
    // so downstream consumers can grow a sample without resampling
    val docs = graft.Tables.documents(spark, sf).select("source", "doc_id")
    def ids(k: Int) = Curation.stratifiedSample(docs, k).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    val s10 = ids(10)
    val s20 = ids(20)
    assert(s10.subsetOf(s20), "smaller quota must be contained in the larger")
    assert(s10.nonEmpty && s20.size > s10.size)
  }

  test("decontam spans locate the planted leaked window exactly") {
    import spark.implicits._
    // 20-token train doc with a 6-token test run planted at positions
    // 8..13 → two leaked 5-gram windows, starting at pos 8 and 9
    val trainToks = (0 until 8).map(i => s"w$i") ++ (0 until 6).map(i => s"s$i") ++
      (14 until 20).map(i => s"w$i")
    val train = Seq(
      ("srcA", 1L, trainToks.mkString(" ")),
      ("srcA", 2L, (0 until 20).map(i => s"clean$i").mkString(" "))
    ).toDF("source", "doc_id", "text")
    val test = Seq(("t", 100L, (0 until 6).map(i => s"s$i").mkString(" ")))
      .toDF("source", "doc_id", "text")
    val rows = Curation.decontaminateSpans(train, test).collect()
    assert(rows.length == 1, s"only the planted doc is contaminated: ${rows.toSeq}")
    val r = rows.head
    assert(r.getString(0) == "srcA" && r.getLong(1) == 1L)
    assert(r.getLong(2) == 2L, "two leaked 5-gram windows")
    assert(r.getInt(3) == 8 && r.getInt(4) == 9, "span starts at the plant site")
    // affected tokens 8..13 = (9 - 8 + 5) / 20
    assert(math.abs(r.getDouble(5) - 0.3) < 1e-9)
  }

  test("sliding windows: coverage is complete, overlap is window minus stride") {
    import spark.implicits._
    // 30 tokens, W=16, S=12 → starts 0,12,24; ends 16,28,30
    val docs = Seq((1L, (0 until 30).map(i => s"t$i").mkString(" ")))
      .toDF("doc_id", "text")
    val w = Curation.slidingWindows(docs, 16, 12).collect()
      .map(r => (r.getInt(1), r.getInt(2), r.getInt(3))).sortBy(_._1)
    assert(w.toSeq == Seq((0, 0, 16), (1, 12, 28), (2, 24, 30)))
    // every token is covered, consecutive windows overlap by W-S
    assert(w.head._2 == 0 && w.last._3 == 30)
    w.sliding(2).foreach { case Array((_, _, e1), (_, s2, _)) =>
      assert(s2 < e1, "consecutive windows must overlap")
      assert(e1 - s2 <= 16 - 12, s"overlap bounded by W-S: $e1 vs $s2")
    }
  }

  test("q125 contamination ratio: clean / partial / contaminated verdicts by planted overlap") {
    import spark.implicits._
    val t = (i: Int) => s"t$i"
    val train = Seq(
      (1L, "a", (1 to 10).map(t).mkString(" ")),   // 6 shingles; 1 hits → 1/6 partial
      (2L, "a", (21 to 30).map(t).mkString(" ")),  // fully copied → contaminated
      (3L, "a", (41 to 50).map(t).mkString(" ")),  // disjoint → clean
      (4L, "a", "too short"))                      // < 5 tokens, 0 shingles → clean
      .toDF("doc_id", "source", "text")
    val test = Seq(
      (90L, "a", (1 to 5).map(t).mkString(" ")),   // exactly train doc 1's first shingle
      (91L, "a", (21 to 30).map(t).mkString(" "))) // train doc 2 verbatim
      .toDF("doc_id", "source", "text")
    val got = Curation.contaminationRatio(train, test).collect()
      .map(r => r.getString(1) -> (r.getAs[Long]("n_docs"), r.getAs[Double]("avg_frac"))).toMap
    // the sub-shingle-width doc counts as CLEAN (round-14 review: a
    // plain explode dropped it from every bucket, so verdict counts
    // didn't reconcile against the split's doc total)
    assert(got("clean") == (2L, 0.0))
    assert(got("partial")._1 == 1L && math.abs(got("partial")._2 - 1.0 / 6) < 1e-4,
      s"one of six shingles hit: $got")
    assert(got("contaminated") == (1L, 1.0), "verbatim copy scores frac 1.0")
  }

  test("q124 funnel: stages are monotone, retentions normalized, planted dup/short docs drop") {
    import spark.implicits._
    val good = (1 to 30).map { i =>
      // ≥20 tokens with stopwords → survives quality
      (i.toLong, "a", ("the of and " + (1 to 20).map(j => s"w${i}_$j").mkString(" ")))
    }
    // md5("201") < 'e6': the dup must sit in the TRAIN split, or its
    // copy of doc 1's text lands doc 1's shingles in the test set and
    // doc 1 is (correctly!) decontaminated away at stage 4
    val dup = Seq((201L, "a", good.head._3))          // exact dup of doc 1 → stage 2 drop
    val short = Seq((101L, "a", "the tiny doc"))      // <20 tokens → stage 3 drop
    // md5("205") >= 'e6' → test split; md5("200") < 'e6' → train.
    // 200 shares 5-shingles with 205 → genuinely contaminated, drops
    // at stage 4; 205 itself must RIDE the funnel (round-14 review:
    // the old full-corpus probe self-flagged every test-split doc,
    // baking a permanent stage-4 drop into the attrition dashboard)
    val shared = (1 to 20).map(j => s"s$j").mkString(" ")
    val testDoc = Seq((205L, "a", s"the of and $shared"))
    val contam = Seq((200L, "a",
      s"the of and ${(1 to 10).map(j => s"s$j").mkString(" ")} " +
        (1 to 10).map(j => s"u$j").mkString(" ")))
    val funnel = Curation.curationFunnel(
        (good ++ dup ++ short ++ testDoc ++ contam).toDF("doc_id", "source", "text"))
      .collect().sortBy(_.getAs[Int]("stage_idx"))
    val docsAt = funnel.map(r => r.getAs[String]("stage") -> r.getAs[Long]("n_docs")).toMap
    assert(docsAt("raw") == 34)
    assert(docsAt("exact_dedup") == 33, "the planted exact dup drops at stage 2")
    assert(docsAt("quality") == 32, "the short doc drops at stage 3")
    assert(docsAt("decontam") == 31,
      "the contaminated TRAIN doc drops; the test-split doc itself survives")
    val counts = funnel.map(_.getAs[Long]("n_docs"))
    assert(counts.zip(counts.tail).forall { case (a, b) => b <= a }, "funnel is monotone")
    assert(funnel.head.getAs[Double]("doc_retention") == 1.0)
    assert(funnel.forall { r =>
      val dr = r.getAs[Double]("doc_retention")
      dr > 0.0 && dr <= 1.0
    })
  }

  test("q158 match distribution: scarcest bucket kept whole, shares land on target") {
    import spark.implicits._
    // 800 'a' / 150 'b' / 50 'c' docs; uniform target 1/3 each →
    // 'c' is scarcest vs target (ratio max) → rate 1; E[kept] ≈ 50 each
    val docs = ((1 to 800).map(i => (i.toLong, "a")) ++
      (801 to 950).map(i => (i.toLong, "b")) ++
      (951 to 1000).map(i => (i.toLong, "c")))
      .toDF("doc_id", "lang")
    val got = Curation.matchDistribution(docs, "lang",
        Map("a" -> 1.0 / 3, "b" -> 1.0 / 3, "c" -> 1.0 / 3))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(got("c").getAs[Double]("rate") == 1.0, "scarcest-vs-target bucket keeps all")
    assert(got("c").getAs[Long]("n_kept") == 50L)
    // sampled buckets: binomial(n, 50/n) → expect ~50 ± 4σ(≈27)
    Seq("a", "b").foreach { b =>
      val kept = got(b).getAs[Long]("n_kept")
      assert(math.abs(kept - 50L) <= 27, s"$b kept $kept, expected ~50")
      val share = got(b).getAs[Double]("share_after")
      assert(share > 0.2 && share < 0.47, s"$b share_after $share far from 1/3")
    }
    // deterministic: same inputs, same decisions
    val again = Curation.matchDistribution(docs, "lang",
        Map("a" -> 1.0 / 3, "b" -> 1.0 / 3, "c" -> 1.0 / 3))
      .collect().map(r => r.getString(0) -> r.getAs[Long]("n_kept")).toMap
    assert(again == got.map { case (k, r) => k -> r.getAs[Long]("n_kept") })
  }

  test("q158 degenerate target (no data bucket named): rates and shares are 0, never NaN/NULL") {
    import spark.implicits._
    // every ratio is 0 → the max-normalization used to be 0/0 = NaN,
    // which the hex sampler turned into NULL n_kept — the documented
    // contract is rate 0 for buckets absent from the target
    val docs = (1 to 50).map(i => (i.toLong, "a")).toDF("doc_id", "lang")
    val got = Curation.matchDistribution(docs, "lang", Map("xx" -> 1.0))
      .collect()
    assert(got.length == 1)
    val r = got.head
    assert(r.getAs[Double]("rate") == 0.0, s"rate must be 0: $r")
    assert(r.getAs[Long]("n_kept") == 0L, s"n_kept must be 0, not NULL: $r")
    assert(r.getAs[Double]("share_after") == 0.0,
      s"an empty rebalance has zero share, not 0/0: $r")
  }

  // ------------------------------------------------------------- q181

  test("q181: cluster-keyed rekey repairs the tear the id-keyed rule exhibits") {
    val rows = Curation.q181ClusterSplit(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("torn_cluster")).sum == 0,
      "cluster-keyed co-location must hold by construction")
    assert(rows.map(_.getAs[Long]("torn_id")).sum >= 1,
      "the anchor corpus must exhibit the id-rule tear the rekey exists to repair")
    assert(rows.map(_.getAs[Long]("n_docs")).sum == 60,
      "splits must partition the doc_id < 60 anchor exactly")
  }

  test("clusterAwareSplit: a synthetic cluster spanning id-splits lands whole") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // find two ids with DIFFERENT id-keyed split labels, then cluster them
    val labels = spark.range(0, 64)
      .select(col("id"), Curation.splitLabel(col("id")).as("s"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val (a, b) = labels.toSeq.combinations(2)
      .collectFirst { case Seq((x, sx), (y, sy)) if sx != sy => (x, y) }.get
    val clusters = Seq((a, a), (b, a), (a + 1000, a + 1000))
      .toDF("doc_id", "cluster_id")
    val out = Curation.clusterAwareSplit(clusters).collect()
    assert(out.map(_.getAs[Long]("torn_id")).sum == 1,
      s"the ($a,$b) cluster spans id-splits")
    assert(out.map(_.getAs[Long]("torn_cluster")).sum == 0)
    // the torn cluster's destination is the label of its cluster id
    val dest = labels(a)
    val row = out.find(_.getAs[String]("split") == dest).get
    assert(row.getAs[Long]("n_docs") >= 2,
      s"both members of the cluster must land in '$dest' together")
  }
}
