package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.IncrementalDedup

class IncrementalDedupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("new batch is deduped against the persisted index; planted dup found") {
    spark.sql("DROP TABLE IF EXISTS dedup_index")
    val d = new java.io.File("/tmp/graft-test-warehouse/dedup_index")
    if (d.exists()) {
      java.nio.file.Files.walk(d.toPath)
        .sorted(java.util.Comparator.reverseOrder())
        .forEach(p => java.nio.file.Files.delete(p))
    }
    val docs = Tables.documents(spark, TestSpark.sf0001).select("doc_id", "text")
    val corpus = docs.filter(col("doc_id") < 400)
    IncrementalDedup.buildIndex(corpus, "dedup_index")

    // batch: fresh docs + one exact copy of doc 0 under a new id
    val doc0 = docs.filter(col("doc_id") === 0)
      .select(lit(9999L).as("doc_id"), col("text"))
    val batch = docs.filter(col("doc_id") >= 400).unionByName(doc0)

    val matches = IncrementalDedup.probeBatch(spark, batch, "dedup_index").cache()
    // the copy of doc 0 must match doc 0 at est 1.0. (It may legitimately
    // match more docs — this corpus contains token-set-identical pairs.)
    val planted = matches.filter(col("new_id") === 9999L).collect()
      .map(r => r.getAs[Long]("match_id") -> r.getAs[Double]("est_jaccard")).toMap
    assert(planted.get(0L).contains(1.0), s"planted dup not found: $planted")

    // append the uniques; the index then matches them exactly on
    // re-probe. Self-matches are EXCLUDED by design (the replay
    // data-loss guard), so the verification probes RENAMED copies:
    // each must match its own original at est 1.0
    val uniques = batch.join(matches.select("new_id").distinct(),
      batch("doc_id") === col("new_id"), "left_anti")
    IncrementalDedup.appendToIndex(uniques, "dedup_index")
    val renamed = uniques.select((col("doc_id") + 100000L).as("doc_id"),
      col("text"))
    val reprobe = IncrementalDedup.probeBatch(spark, renamed, "dedup_index")
      .filter(col("new_id") === col("match_id") + 100000L &&
        col("est_jaccard") === 1.0)
    assert(reprobe.count() == uniques.count())
    // and a batch probed against an index containing ITSELF never
    // reports a doc as its own duplicate — the StreamingDedup
    // replay-after-append crash window depends on this
    assert(IncrementalDedup.probeBatch(spark, uniques, "dedup_index")
      .filter(col("new_id") === col("match_id")).count() == 0L)
  }

  test("lineage-tag upgrade boundary: pre-tag raw-id entries still self-exclude via rawBatchId") {
    import spark.implicits._
    spark.sql("DROP TABLE IF EXISTS dedup_upgrade_idx")
    val d = new java.io.File("/tmp/graft-test-warehouse/dedup_upgrade_idx")
    if (d.exists()) {
      java.nio.file.Files.walk(d.toPath)
        .sorted(java.util.Comparator.reverseOrder())
        .forEach(p => java.nio.file.Files.delete(p))
    }
    // index rows appended PRE-upgrade carry the RAW batch id; a batch
    // replayed post-upgrade probes with tag(qid, N) != N and, without
    // the rawBatchId disjunct, self-matches at est 1.0 — dedupedIngest
    // would anti-join every survivor away and rewrite its dir EMPTY
    // (the round-17 advice's silent-loss case). The streaming layer
    // passes the raw id only under dedupedIngest's lineageUpgrade
    // transition knob — permanent use would let a post-wipe lineage's
    // raw batch N wrongly skip a redelivered doc's pre-upgrade entry
    // in a SHARED index table (see the probe's comment).
    val t = (1 to 20).map(i => s"w$i").mkString(" ")
    IncrementalDedup.buildIndex(
      Seq((1L, "totally unrelated seed content here with distinct words entirely"))
        .toDF("doc_id", "text"), "dedup_upgrade_idx")
    val batch = Seq((9L, t)).toDF("doc_id", "text")
    val rawId = 7L
    IncrementalDedup.appendToIndex(batch, "dedup_upgrade_idx", srcBatch = rawId)
    val tag = 4611686018427387909L // stands in for the SHA-derived tag
    val broken = IncrementalDedup
      .probeBatch(spark, batch, "dedup_upgrade_idx", batchId = tag)
      .filter(col("new_id") === col("match_id")).count()
    assert(broken > 0,
      "control: without the raw-id disjunct the replay self-matches its own entry")
    val fixed = IncrementalDedup
      .probeBatch(spark, batch, "dedup_upgrade_idx", batchId = tag,
        rawBatchId = rawId)
      .filter(col("new_id") === col("match_id")).count()
    assert(fixed == 0L,
      "with rawBatchId the pre-upgrade claim is excluded like a same-lineage replay")
    // default rawBatchId = NoBatch must not disturb batch-API
    // semantics: rows appended with the DEFAULT srcBatch stay
    // matchable by a later batch redelivering the same doc_id
    spark.sql("DROP TABLE IF EXISTS dedup_upgrade_idx2")
    val d2 = new java.io.File("/tmp/graft-test-warehouse/dedup_upgrade_idx2")
    if (d2.exists()) {
      java.nio.file.Files.walk(d2.toPath)
        .sorted(java.util.Comparator.reverseOrder())
        .forEach(p => java.nio.file.Files.delete(p))
    }
    IncrementalDedup.buildIndex(batch, "dedup_upgrade_idx2") // default srcBatch
    val redelivered = IncrementalDedup
      .probeBatch(spark, batch, "dedup_upgrade_idx2", batchId = 9L)
      .filter(col("new_id") === col("match_id")).count()
    assert(redelivered > 0,
      "default-append rows must stay matchable by later batches")
    spark.sql("DROP TABLE IF EXISTS dedup_upgrade_idx")
    spark.sql("DROP TABLE IF EXISTS dedup_upgrade_idx2")
  }

  test("degenerate index buckets are skipped at the cap, kept below it") {
    import spark.implicits._
    spark.sql("DROP TABLE IF EXISTS dedup_cap_idx")
    val d = new java.io.File("/tmp/graft-test-warehouse/dedup_cap_idx")
    if (d.exists()) {
      java.nio.file.Files.walk(d.toPath)
        .sorted(java.util.Comparator.reverseOrder())
        .forEach(p => java.nio.file.Files.delete(p))
    }
    // two identical indexed docs: every band bucket has exactly 2 members
    val t = (1 to 20).map(i => s"w$i").mkString(" ")
    IncrementalDedup.buildIndex(
      Seq((1L, t), (2L, t)).toDF("doc_id", "text"), "dedup_cap_idx")
    val batch = Seq((9L, t)).toDF("doc_id", "text")
    val under = IncrementalDedup.probeBatch(spark, batch, "dedup_cap_idx",
      maxBucket = 2).count()
    assert(under == 2, "below the cap both copies must match")
    val over = IncrementalDedup.probeBatch(spark, batch, "dedup_cap_idx",
      maxBucket = 1).count()
    assert(over == 0, "a bucket past the cap is skipped (documented recall trade)")
    spark.sql("DROP TABLE IF EXISTS dedup_cap_idx")
  }

  test("q189 bench form: deterministic slices, rerun hits the same index and rows") {
    val q = SparkEntry.queries("q189_dedup_probe_index")
    val first = q(spark, TestSpark.sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(first.nonEmpty, "the quarter-corpus batch must hit the index " +
      "(this corpus contains cross-slice near-dups)")
    // every reported pair crosses the slice boundary by construction
    first.foreach { case (newId, matchId, est) =>
      assert(est >= 0.8 && newId != matchId)
    }
    val again = q(spark, TestSpark.sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(again == first, "re-probe through the persisted index must be identical")
  }

  test("q199 probe-then-confirm: exactly the equal-token-set pairs; candidates are a strict superset") {
    val d = TestSpark.sf0001
    val confirmed = SparkEntry.queries("q199_exact_dup_probe_index")(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(confirmed.nonEmpty, "this corpus has cross-slice exact dups")
    // ground truth re-derived independently: sorted distinct token
    // sets equal across the md5-slice boundary
    val tset = sort_array(array_distinct(split(col("text"), " ")))
    val b = substring(md5(col("doc_id").cast("string")), 1, 2)
    val docs = Tables.documents(spark, d)
      .select(col("doc_id"), b.as("b"), tset.as("t"))
    val truth = docs.filter(col("b") >= "c0").select(col("doc_id").as("new_id"), col("t"))
      .join(docs.filter(col("b") < "c0").select(col("doc_id").as("match_id"), col("t")), Seq("t"))
      .select("new_id", "match_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    assert(confirmed.sorted == truth,
      s"confirmed pairs must be exactly the equal-token-set pairs " +
        s"(${confirmed.length} vs ${truth.length})")
    // and the confirm stage is LOAD-BEARING: threshold-1.0 candidates
    // include near-dup pairs whose differing tokens never win a min
    val q189 = SparkEntry.queries("q189_dedup_probe_index")(spark, d)
      .filter(col("est_jaccard") >= 1.0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert((q189.toSet -- confirmed.toSet).nonEmpty,
      "est-1.0 candidates should strictly exceed the exact pairs on this corpus " +
        "(if this ever fails, the corpus lost its near-dup structure, not the code)")
  }

  test("single-band witness: at threshold 1.0, bandsUsed=1 finds the same pairs as all bands") {
    // sig equality implies EVERY band collides, so one band suffices
    // as a witness at threshold 1.0 — 1/Bands the candidate fan-out
    // (measured: q199's 10x scale factor drops x4.3 -> x1.8)
    val d = TestSpark.sf0001
    val b = substring(md5(col("doc_id").cast("string")), 1, 2)
    val docs = Tables.documents(spark, d).select(col("doc_id"), col("text"))
    spark.sql("DROP TABLE IF EXISTS bandwit_idx")
    val wh = new java.io.File("/tmp/graft-test-warehouse/bandwit_idx")
    if (wh.exists()) {
      java.nio.file.Files.walk(wh.toPath)
        .sorted(java.util.Comparator.reverseOrder())
        .forEach(p => java.nio.file.Files.delete(p))
    }
    IncrementalDedup.buildIndex(docs.filter(b < "c0"), "bandwit_idx")
    val batch = docs.filter(b >= "c0")
    def pairs(nBands: Int) = IncrementalDedup
      .probeBatch(spark, batch, "bandwit_idx", threshold = 1.0,
        maxBucket = Int.MaxValue, bandsUsed = nBands)
      .select("new_id", "match_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val one = pairs(1); val all = pairs(graft.ops.Dedup.Bands)
    assert(one == all && one.nonEmpty,
      s"single-band probe must find every est-1.0 pair: ${one.size} vs ${all.size}")
    intercept[IllegalArgumentException] {
      IncrementalDedup.probeBatch(spark, batch, "bandwit_idx", bandsUsed = 0)
    }
    spark.sql("DROP TABLE IF EXISTS bandwit_idx")
  }
}
