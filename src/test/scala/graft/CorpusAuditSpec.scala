package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Curation, Dedup}

/** q99 source-overlap matrix + q100 shuffle-shard invariants. */
class CorpusAuditSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("q99 finds a planted cross-source quote and scores it exactly") {
    import spark.implicits._
    // srcA and srcB share exactly the span "p q r s t" (two 4-shingles);
    // srcC shares nothing
    val docs = Seq(
      ("srcA", "a b c d e p q r s t"),
      ("srcB", "p q r s t x y z w v"),
      ("srcC", "m n o u i j k l h g")).toDF("source", "text")
    val got = Dedup.sourceOverlap(docs).collect()
    assert(got.length == 1)
    val r = got(0)
    assert(r.getString(0) == "srcA" && r.getString(1) == "srcB")
    assert(r.getLong(2) == 2) // "p q r s" and "q r s t"
    // each source has 7 distinct shingles; jaccard = 2 / (7 + 7 - 2)
    assert(math.abs(r.getDouble(3) - 2.0 / 12.0) < 1e-6)
  }

  test("q99 shingle sets are per-source distinct (repeats don't inflate)") {
    import spark.implicits._
    val docs = Seq(
      ("srcA", "p q r s p q r s"), // repeated span, one distinct set
      ("srcA", "p q r s t"),       // second doc, overlapping shingles
      ("srcB", "p q r s")).toDF("source", "text")
    val got = Dedup.sourceOverlap(docs).collect()
    assert(got.length == 1)
    assert(got(0).getLong(2) == 1) // only "p q r s" is shared
  }

  test("q102 novelty: unique doc scores 1, cross-source-quoted doc scores its covered fraction") {
    import spark.implicits._
    val docs = Seq(
      (1L, "srcA", "a b c d e f g"),     // 4 shingles, none elsewhere → 1.0
      (2L, "srcA", "p q r s t u"),       // 3 shingles, "p q r s" also in srcB → 2/3
      (3L, "srcB", "p q r s"),           // its only shingle is shared → 0.0
      (4L, "srcB", "p q r s x y z"))     // shares "p q r s" with srcA → 3/4
      .toDF("doc_id", "source", "text")
    val got = Dedup.noveltyScores(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(got(1L) == ((4L, 4L, 1.0)))
    assert(got(2L) == ((3L, 2L, math.rint(2.0 / 3.0 * 1e6) / 1e6)))
    assert(got(3L) == ((1L, 0L, 0.0)))
    assert(got(4L) == ((4L, 3L, 0.75)))
  }

  test("q102 novelty is within-source-duplication blind (same-source repeats stay novel)") {
    import spark.implicits._
    val docs = Seq(
      (1L, "srcA", "a b c d"),
      (2L, "srcA", "a b c d"), // same shingle, same source → still novel
      (3L, "srcB", "m n o u")).toDF("doc_id", "source", "text")
    val got = Dedup.noveltyScores(docs).collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(got == Map(1L -> 1.0, 2L -> 1.0, 3L -> 1.0))
  }

  test("q100 emits every doc exactly once with dense per-shard positions") {
    val got = Curation.shuffleShard(
      spark.read.parquet(s"${TestSpark.sf0001}/documents.parquet"), 42L)
    val rows = got.collect()
    val n = spark.read.parquet(s"${TestSpark.sf0001}/documents.parquet").count()
    assert(rows.length == n)
    assert(rows.map(_.getLong(0)).distinct.length == n)
    rows.groupBy(_.getInt(1)).foreach { case (shard, rs) =>
      assert(shard >= 0 && shard < 16)
      // positions are exactly 1..|shard| — dense, no gaps, no ties
      assert(rs.map(_.getInt(2)).sorted.toSeq == (1 to rs.length))
    }
  }

  test("q100 order is seed-determined: same seed stable, new seed reshuffles") {
    val docs = spark.read.parquet(s"${TestSpark.sf0001}/documents.parquet")
    val a = Curation.shuffleShard(docs, 42L).collect().map(_.toString).sorted
    val b = Curation.shuffleShard(docs, 42L).collect().map(_.toString).sorted
    assert(a.toSeq == b.toSeq)
    val c = Curation.shuffleShard(docs, 7L).collect().map(_.toString).sorted
    assert(a.toSeq != c.toSeq)
  }
}
