package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{IncrementalNovelty, Text}

/** Incremental first-occurrence novelty (q186): batch-wise replay
  * reproduces q180's corpus-wide scores exactly, the probe never
  * shuffles the persisted index side, and the one-shot q186 verdicts
  * agree with the whole-corpus pass on its batch slice. */
class IncrementalNoveltySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf0001

  private def dropIdx(table: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val d = new java.io.File(s"/tmp/graft-test-warehouse/$table")
    if (d.exists()) { d.listFiles().foreach(_.delete()); d.delete() }
  }

  test("doc_id-ordered batch replay ≡ q180's corpus-wide per-doc novelty") {
    val docs = Tables.documents(spark, sf).select("source", "doc_id", "text")
    val table = "novelty_replay_idx"
    dropIdx(table)
    // batch 1 bootstraps the index via build; batches 2..3 screen-then-append
    val cuts = Seq(0L -> 150L, 150L -> 320L, 320L -> Long.MaxValue)
    val b1 = docs.filter(col("doc_id") < cuts.head._2)
    IncrementalNovelty.buildIndex(b1, table)
    // batch 1's own scores come from the corpus-wide rule on itself
    // (bootstrapping an empty bucketed table is a degenerate write;
    // the replay contract starts from "an existing corpus")
    val rest = cuts.tail.map { case (lo, hi) =>
      val b = docs.filter(col("doc_id") >= lo && col("doc_id") < hi)
      val scored = IncrementalNovelty.screenBatch(spark, b, table)
        .select("source", "doc_id", "total", "novel").collect()
        .map(r => (r.getLong(1), (r.getLong(2), r.getLong(3))))
      IncrementalNovelty.appendToIndex(b, table)
      scored
    }.flatten.toMap
    val whole = Text.noveltyPerDoc(docs).collect()
      .map(r => (r.getLong(1), (r.getLong(2), r.getLong(3)))).toMap
    val batchIds = rest.keySet
    assert(batchIds.nonEmpty && batchIds.forall(_ >= 150L))
    batchIds.foreach { id =>
      assert(rest(id) == whole(id),
        s"doc $id: incremental ${rest(id)} != corpus-wide ${whole(id)}")
    }
    dropIdx(table)
  }

  test("screen is sensitive to what the index has seen") {
    import spark.implicits._
    val table = "novelty_seen_idx"
    dropIdx(table)
    val base = Seq((1L, "a", (1 to 30).map(i => s"w$i").mkString(" ")))
      .toDF("doc_id", "source", "text").select(col("source"), col("doc_id"), col("text"))
    IncrementalNovelty.buildIndex(base, table)
    // doc 10 restates doc 1; doc 11 is fresh text
    val batch = Seq(
      (10L, "a", (1 to 30).map(i => s"w$i").mkString(" ")),
      (11L, "a", (1 to 30).map(i => s"z$i").mkString(" ")))
      .toDF("doc_id", "source", "text").select(col("source"), col("doc_id"), col("text"))
    val got = IncrementalNovelty.screenBatch(spark, batch, table).collect()
      .map(r => r.getLong(1) -> r.getAs[Double]("novelty")).toMap
    assert(got(10L) == 0.0, "a restatement of indexed content has zero novelty")
    assert(got(11L) == 1.0, "fresh content is fully novel")
    dropIdx(table)
  }

  test("q186 probe plan never shuffles the index side; verdicts agree with q180's rule") {
    val q = SparkEntry.queries("q186_novelty_probe_index")(spark, sf)
    // index side arrives through the bucketed table scan with no
    // Exchange above it: every shuffle in the plan must carry batch
    // columns (doc ids / fps with source), never a bare index row set
    val sp = q.queryExecution.executedPlan
    val scanStr = sp.toString
    assert(scanStr.contains("SortMergeJoin"),
      "the anti-join must be the bucket-aligned merge join")
    val exchanges = sp.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    exchanges.foreach { e =>
      val cols = e.output.map(_.name)
      assert(cols.contains("doc_id") || cols.contains("source") || cols.contains("novel"),
        s"only batch-side rows may move, exchange carries: $cols")
    }
    // semantics vs the corpus-wide rule: an incrementally-novel
    // shingle is unseen by ANY index doc and batch-first, so its
    // corpus-wide first occurrence is the same batch doc — incremental
    // novel is a per-doc LOWER bound on q180's (the md5 slices are not
    // doc_id-ordered, so an indexed doc with a HIGHER id can claim a
    // shingle q180 would attribute to the batch doc; equality is the
    // ordered-replay contract of the first test). Totals share the
    // shingle rule exactly.
    val rows = q.collect()
    assert(rows.nonEmpty)
    val whole = Text.noveltyPerDoc(
        Tables.documents(spark, sf).select("source", "doc_id", "text"))
      .collect().map(r => r.getLong(1) -> (r.getLong(2), r.getLong(3))).toMap
    rows.foreach { r =>
      val (total, novel) = whole(r.getLong(1))
      assert(r.getLong(2) == total)
      assert(r.getLong(3) <= novel,
        s"doc ${r.getLong(1)}: probe ${r.getLong(3)} must lower-bound corpus-rule $novel")
    }
  }

  test("index GC matches only fingerprint-shaped generations of ITS OWN source dir") {
    import graft.ops.IndexTables
    val self = IndexTables.tableName("graft_x_idx_v1_", "/data/sf0", "")
    val isGen = IndexTables.generationOf(self)(_)
    val fp = "deadbeefdeadbeef"
    assert(isGen(IndexTables.tableName("graft_x_idx_v1_", "/data/sf0", fp)))
    assert(isGen(self + fp + "_bloom.bin"), "sidecars are generations")
    // nested source dirs must never match (review finding: a sibling
    // whose sanitized tail is itself 16 hex chars + fp would have
    // matched a 'hex then non-alnum' shape test)
    assert(!isGen(IndexTables.tableName("graft_x_idx_v1_", "/data/sf0_v2", fp)))
    assert(!isGen(IndexTables.tableName("graft_x_idx_v1_", s"/data/sf0_$fp", fp)),
      "a hash-suffixed sibling data dir is NOT a generation of /data/sf0")
    assert(!isGen(self + fp + "_extra"), "unknown suffixes are not sidecars")
    assert(!isGen(self + "deadbeefdeadbee"), "15 hex chars is not a fingerprint")
  }

  test("sanitization-colliding source dirs key DISTINCT index families") {
    // '/data/sf0-1' and '/data/sf0_1' both sanitize to '_data_sf0_1';
    // before the path digest they shared one family stem and gcTables
    // collected each other's LIVE tables on alternating builds (the
    // Ivf indexDirName collision class, round-14 review)
    import graft.ops.IndexTables
    val fp = "deadbeefdeadbeef"
    val a = IndexTables.tableName("graft_x_idx_v1_", "/data/sf0-1", fp)
    val b = IndexTables.tableName("graft_x_idx_v1_", "/data/sf0_1", fp)
    assert(a != b, "lossy sanitization must not merge distinct source dirs")
    val isGenA = IndexTables.generationOf(
      IndexTables.tableName("graft_x_idx_v1_", "/data/sf0-1", ""))(_)
    assert(isGenA(a) && !isGenA(b),
      "one dir's GC must never match the colliding sibling's live table")
  }
}
