package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Health

/** The composed corpus-health report: every constituent family
  * contributes its digest rows under its tag, payloads are valid JSON
  * carrying the constituent's own column names, and the tagged sink
  * routes one directory per check (Mapwarper.writeTagged's shape). */
class HealthSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("healthReport carries every audit family's rows under its tag") {
    val rep = Health.healthReport(spark, TestSpark.sf0001).cache()
    try {
      val byCheck = rep.groupBy(col("check")).count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(byCheck.keySet == Set("key_skew", "ivf_balance", "dim_stats",
        "dup_spectrum", "curation_funnel", "novelty", "cdc_dup",
        "length_quantiles", "span_dup", "lang_fertility"),
        s"all ten families must report: ${byCheck.keySet}")
      // counts match the constituents run standalone
      assert(byCheck("key_skew") == 3L, "q155 profiles the 3 fact key columns")
      assert(byCheck("curation_funnel") == 4L, "q124 reports the 4 stages")
      assert(byCheck("dim_stats") ==
        graft.ops.Similarity.q136DimStats(spark, TestSpark.sf0001).count())
      assert(byCheck("ivf_balance") ==
        graft.ops.Ivf.q150IvfBalance(spark, TestSpark.sf0001).count())
      assert(byCheck("dup_spectrum") ==
        graft.ops.Dedup.q129DupGroupSpectrum(spark, TestSpark.sf0001).count())
      assert(byCheck("novelty") ==
        graft.ops.Text.q180NoveltyAudit(spark, TestSpark.sf0001).count())
      assert(byCheck("cdc_dup") == 20L, "q183 reports each source")
      assert(byCheck("length_quantiles") == 20L, "q184 reports each source")
      assert(byCheck("span_dup") == 20L, "q190 reports each source")
      assert(byCheck("lang_fertility") ==
        graft.ops.Text.q193LangFertility(spark, TestSpark.sf0001).count())

      // payloads are JSON objects with the constituent's column names
      val skew = rep.filter(col("check") === "key_skew")
        .select(from_json(col("payload"),
          org.apache.spark.sql.types.MapType(
            org.apache.spark.sql.types.StringType,
            org.apache.spark.sql.types.StringType)).as("m"))
        .select(map_keys(col("m")).as("ks")).collect()
      skew.foreach { r =>
        val ks = r.getSeq[String](0).toSet
        assert(ks.contains("key_col") && ks.contains("max_mult") &&
          ks.contains("hot_keys"), s"key_skew payload keys: $ks")
      }
    } finally rep.unpersist()
  }

  test("writeHealthReport routes one directory per check") {
    val out = java.nio.file.Files.createTempDirectory("health_out").toString
    Health.writeHealthReport(spark, TestSpark.sf0001, out)
    val dirs = new java.io.File(out).listFiles()
      .filter(_.isDirectory).map(_.getName).toSet
    assert(dirs == Set("check=key_skew", "check=ivf_balance", "check=dim_stats",
      "check=dup_spectrum", "check=curation_funnel", "check=novelty",
      "check=cdc_dup", "check=length_quantiles", "check=span_dup",
      "check=lang_fertility"),
      s"got $dirs")
    // round-trips as NDJSON
    val back = spark.read.json(out)
    assert(back.count() == Health.healthReport(spark, TestSpark.sf0001).count())
  }

  /** Builds a vintage dir by rewriting dir `a` through a payload
    * transform — the controlled "next drop" for diff tests. */
  private def rewriteVintage(aDir: String,
      f: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame): String = {
    val out = java.nio.file.Files.createTempDirectory("health_b").toString
    f(spark.read.json(aDir).select(col("check").cast("string"), col("payload")))
      .write.mode("overwrite").partitionBy("check").json(out)
    out
  }

  test("diffReports: identical vintages are unchanged everywhere, diff is deterministic") {
    val a = java.nio.file.Files.createTempDirectory("health_a").toString
    Health.writeHealthReport(spark, TestSpark.sf0001, a)
    val rows = Health.diffReports(spark, a, a).collect()
    assert(rows.length == 10)
    rows.foreach { r =>
      assert(r.getAs[String]("status") == "unchanged", s"self-diff: $r")
      assert(r.getAs[Long]("n_changed") == 0L && r.getAs[Long]("n_only_a") == 0L
        && r.getAs[Long]("n_only_b") == 0L)
      assert(r.getAs[Double]("max_rel_diff") == 0.0)
    }
  }

  test("diffReports flags changed, added, and removed families with row counts") {
    val a = java.nio.file.Files.createTempDirectory("health_a2").toString
    Health.writeHealthReport(spark, TestSpark.sf0001, a)
    // vintage b: double every ivf_balance n_vecs (changed), drop
    // dup_spectrum (removed), add a new custom check (added)
    val b = rewriteVintage(a, df => {
      val mutated = df
        .filter(col("check") =!= "dup_spectrum")
        .withColumn("payload",
          when(col("check") === "ivf_balance",
            regexp_replace(col("payload"), "\"n_vecs\":(\\d+)", "\"n_vecs\":9$1"))
            .otherwise(col("payload")))
      mutated.unionByName(
        spark.range(1).select(lit("custom_check").as("check"),
          lit("""{"probe":"x","score":1.0}""").as("payload")))
    })
    val got = Health.diffReports(spark, a, b).collect()
      .map(r => r.getAs[String]("check") -> r).toMap
    assert(got("ivf_balance").getAs[String]("status") == "changed")
    assert(got("ivf_balance").getAs[Long]("n_changed") > 0L)
    assert(got("ivf_balance").getAs[Double]("max_rel_diff") > 0.5,
      s"9x-ing n_vecs is a large relative change: ${got("ivf_balance")}")
    assert(got("dup_spectrum").getAs[String]("status") == "removed")
    assert(got("dup_spectrum").getAs[Long]("n_only_a") > 0L)
    assert(got("custom_check").getAs[String]("status") == "added")
    assert(got("custom_check").getAs[Long]("n_only_b") == 1L)
    Seq("key_skew", "dim_stats", "curation_funnel").foreach { c =>
      assert(got(c).getAs[String]("status") == "unchanged", s"$c: ${got(c)}")
    }
  }

  test("store_fsck family: a planted fsck status change pages in the vintage diff; the healthy store stays quiet") {
    import spark.implicits._
    // two persisted ledger stores ride the same vintage loop
    val okStore = java.nio.file.Files.createTempDirectory("fsck_ok").toString
    val badStore = java.nio.file.Files.createTempDirectory("fsck_bad").toString
    Seq(okStore, badStore).foreach { d =>
      graft.streaming.StreamingLedger.applyBatch(spark,
        Seq(("the", 2L), ("cat", 1L)).toDF("word", "n"),
        Seq("word"), Seq("n"), d, 2, 0L)
    }
    val stores = Map("ok_store" -> okStore, "bad_store" -> badStore)
    def writeFsckVintage(): String = {
      val out = java.nio.file.Files.createTempDirectory("fsck_v").toString
      Health.storeFsckReport(spark, stores)
        .write.mode("overwrite").partitionBy("check").json(out)
      out
    }
    val a = writeFsckVintage()
    // identity keys on (store, fsck_check): 2 stores × 7 checks
    assert(spark.read.json(a).count() == 14L)
    // self-diff: quiet
    val self = Health.diffReports(spark, a, a).collect()
    assert(self.length == 1 && self.head.getAs[String]("check") == "store_fsck")
    assert(self.head.getAs[String]("status") == "unchanged")
    // plant debris in ONE store between vintages: debris_old ok→warn
    new java.io.File(badStore, "bucket=0.old").mkdirs()
    val b = writeFsckVintage()
    val row = Health.diffReports(spark, a, b).collect().head
    assert(row.getAs[String]("status") == "changed",
      s"a silent ok→warn transition must page: $row")
    assert(row.getAs[Long]("n_changed") == 1L,
      s"exactly the planted (bad_store, debris_old) row changed: $row")
    assert(row.getAs[Long]("n_unchanged") == 13L,
      s"the healthy store and the other checks stay paired-quiet: $row")
  }

  test("writeHealthReport with stores appends the store_fsck family next to the corpus checks") {
    import spark.implicits._
    val store = java.nio.file.Files.createTempDirectory("fsck_w").toString
    graft.streaming.StreamingLedger.applyBatch(spark,
      Seq(("dog", 3L)).toDF("word", "n"),
      Seq("word"), Seq("n"), store, 2, 0L)
    val out = java.nio.file.Files.createTempDirectory("health_ws").toString
    Health.writeHealthReport(spark, TestSpark.sf0001, out,
      stores = Map("led" -> store))
    val dirs = new java.io.File(out).listFiles()
      .filter(_.isDirectory).map(_.getName).toSet
    assert(dirs.contains("check=store_fsck"), s"got $dirs")
    val fsckRows = spark.read.json(out)
      .filter(col("check") === "store_fsck")
      .select(from_json(col("payload"),
        org.apache.spark.sql.types.MapType(
          org.apache.spark.sql.types.StringType,
          org.apache.spark.sql.types.StringType)).as("m"))
      .select(col("m")("store"), col("m")("fsck_check"), col("m")("status"))
      .collect()
    assert(fsckRows.length == 7, "one row per fsck check")
    assert(fsckRows.forall(_.getString(0) == "led"))
    assert(fsckRows.forall(_.getString(2) == "ok"),
      "a freshly-written store audits all-ok")
  }

  test("diffReports: absFloor dead-band absorbs zero-centered jitter, relative diff keeps unit-scale sensitivity") {
    import spark.implicits._
    def writeReport(dir: String, payload: String): Unit =
      Seq(("dim_stats", payload)).toDF("check", "payload")
        .write.mode("overwrite").partitionBy("check").json(dir)
    val a = java.nio.file.Files.createTempDirectory("health_z_a").toString
    val b = java.nio.file.Files.createTempDirectory("health_z_b").toString
    // a zero-centered metric drifting 1e-5 → −2e-5 on a KNOWN check
    // (dim_stats pairs on "dim"): pure relative reports 1.5 and pages
    // at any tolerance < 1.5; the default absFloor (1e-4 > the 3e-5
    // absolute move) zeroes it
    writeReport(a, """{"dim":0,"mean":0.00001}""")
    writeReport(b, """{"dim":0,"mean":-0.00002}""")
    val dflt = Health.diffReports(spark, a, b, tolerance = 0.0).collect()
    assert(dflt.head.getAs[String]("status") == "unchanged",
      s"float jitter below the floor must not page: ${dflt.head}")
    assert(dflt.head.getAs[Double]("max_rel_diff") == 0.0)
    val noFloor = Health.diffReports(spark, a, b, tolerance = 0.0, absFloor = 0.0)
      .collect()
    assert(noFloor.head.getAs[String]("status") == "changed",
      "with the floor disabled, zero tolerance still detects the drift")
    // and relative sensitivity on unit-scale metrics is intact: a
    // 0.9 → 0.1 collapse is an ~0.89 relative change and MUST page at
    // a 50% tolerance (a magnitude-blended denominator would cap every
    // unit-scale diff at 0.5 and miss it)
    val a2 = java.nio.file.Files.createTempDirectory("health_u_a").toString
    val b2 = java.nio.file.Files.createTempDirectory("health_u_b").toString
    writeReport(a2, """{"dim":1,"mean":0.9}""")
    writeReport(b2, """{"dim":1,"mean":0.1}""")
    val unit = Health.diffReports(spark, a2, b2, tolerance = 0.5).collect()
    assert(unit.head.getAs[String]("status") == "changed",
      s"a 0.9 -> 0.1 collapse must exceed a 50% tolerance: ${unit.head}")
    assert(unit.head.getAs[Double]("max_rel_diff") > 0.8)
    // a one-granularity step (0.0001 -> 0.0002) sits ABOVE the strict
    // 5e-5 floor and must page — the floor absorbs jitter, not the
    // smallest representable change
    val a3 = java.nio.file.Files.createTempDirectory("health_s_a").toString
    val b3 = java.nio.file.Files.createTempDirectory("health_s_b").toString
    writeReport(a3, """{"dim":2,"mean":0.0001}""")
    writeReport(b3, """{"dim":2,"mean":0.0002}""")
    assert(Health.diffReports(spark, a3, b3).collect()
      .head.getAs[String]("status") == "changed",
      "a one-step change at metric granularity must page")
    // identical non-finite values short-circuit to zero instead of a
    // NaN diff that would sort above every tolerance
    val a4 = java.nio.file.Files.createTempDirectory("health_i_a").toString
    val b4 = java.nio.file.Files.createTempDirectory("health_i_b").toString
    writeReport(a4, """{"dim":3,"mean":"Infinity"}""")
    writeReport(b4, """{"dim":3,"mean":"Infinity"}""")
    assert(Health.diffReports(spark, a4, b4).collect()
      .head.getAs[String]("status") == "unchanged",
      "identical Infinity values are not a change")
  }

  test("idx_fsck family e2e: a planted stale-generation transition pages through the CLI write→diff loop") {
    // round-15 verdict ask #4: drive the REAL CLI path (HealthRun.run
    // — arg parsing, exit codes, NDJSON stdout) over a planted
    // warehouse transition, the way the store_fsck loop is exercised
    import graft.ops.IndexTables
    val prefix = "graft_hspec_idx_v1_"
    val dir = TestSpark.sf0001
    IndexTables.gcTables(spark, prefix, dir)
    // healthy LIVE index for the current fingerprint
    val fp = IndexTables.dataFingerprint(spark, dir)
    val current = IndexTables.tableName(prefix, dir, fp)
    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
      .limit(10).select(xxhash64(col("text")).as("fp"), col("doc_id").as("first_doc"))
    graft.ops.Bucketing.writeBucketed(docs, current, "fp", 4)

    val outA = java.nio.file.Files.createTempDirectory("idxfsck_vA").toString
    val outB = java.nio.file.Files.createTempDirectory("idxfsck_vB").toString
    val idxArg = s"idx:$prefix=$dir"
    assert(HealthRun.run(spark, List("write", dir, outA, idxArg)) == 0)
    // the family landed in the report with the audit's own checks
    val rows = spark.read.json(outA).filter(col("check") === "idx_fsck")
      .select(from_json(col("payload"),
        org.apache.spark.sql.types.MapType(
          org.apache.spark.sql.types.StringType,
          org.apache.spark.sql.types.StringType)).as("m"))
      .select(col("m")("family"), col("m")("idx_check"), col("m")("status"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
    assert(rows.forall(_._1 == prefix), s"got ${rows.toSeq}")
    assert(rows.map(_._2).toSet ==
      Set("index_current", "bucket_spec", "stale_generations", "retired_naming"))
    assert(rows.forall(_._3 == "ok"), s"healthy vintage must read all-ok: ${rows.toSeq}")

    // the planted warehouse transition: a stale digested generation
    // appears between vintages (another JVM's superseded build)
    val stale = IndexTables.tableName(prefix, dir, "eeeeeeeeeeeeeeee")
    spark.range(1).write.mode("overwrite").saveAsTable(stale)
    assert(HealthRun.run(spark, List("write", dir, outB, idxArg)) == 0)

    // self-diff stays quiet; A→B pages EXACTLY the idx_fsck family,
    // with the NDJSON page row on stdout for the alerting hook
    assert(HealthRun.run(spark, List("diff", outA, outA)) == 0)
    val captured = new java.io.ByteArrayOutputStream()
    val exit = Console.withOut(new java.io.PrintStream(captured)) {
      HealthRun.run(spark, List("diff", outA, outB))
    }
    assert(exit == 1, "the stale-generation transition must page")
    val paged = captured.toString("UTF-8").linesIterator.toSeq
    assert(paged.exists(l => l.contains("\"idx_fsck\"") && l.contains("\"changed\"")),
      s"paged NDJSON must carry the idx_fsck transition, got: $paged")

    // the standalone idxfsck CLI agrees: warn-grade (stale debris
    // sweeps on next rebuild) — reported, exit 0, not a page
    assert(HealthRun.run(spark, List("idxfsck", prefix, dir)) == 0)

    // CLI arg hygiene: malformed idx arg and duplicate labels exit 2
    assert(HealthRun.run(spark, List("write", dir, outA, "idx:noequals")) == 2)
    assert(HealthRun.run(spark, List("write", dir, outA, idxArg, idxArg)) == 2)
    assert(HealthRun.run(spark,
      List("write", dir, outA, s"idx:$prefix=/no/such/dir")) == 2)

    spark.sql(s"DROP TABLE IF EXISTS $stale")
    spark.sql(s"DROP TABLE IF EXISTS $current")
  }

  test("diffReports tolerance: a drift inside the alert threshold does not page") {
    val a = java.nio.file.Files.createTempDirectory("health_a3").toString
    Health.writeHealthReport(spark, TestSpark.sf0001, a)
    // a REAL drift (n_vecs → n·10+1, relative diff ~0.9): pages at
    // tolerance 0, stays quiet when the threshold is above the drift
    val b = rewriteVintage(a, df => df.withColumn("payload",
      when(col("check") === "ivf_balance",
        regexp_replace(col("payload"), "\"n_vecs\":(\\d+)", "\"n_vecs\":$11"))
        .otherwise(col("payload"))))
    val page = Health.diffReports(spark, a, b, tolerance = 0.0).collect()
      .map(r => r.getAs[String]("check") -> r.getAs[String]("status")).toMap
    assert(page("ivf_balance") == "changed")
    val lax = Health.diffReports(spark, a, b, tolerance = 0.999).collect()
      .map(r => r.getAs[String]("check") -> r.getAs[String]("status")).toMap
    assert(lax("ivf_balance") == "unchanged",
      "a drift inside the alert tolerance must not page")
  }
}
