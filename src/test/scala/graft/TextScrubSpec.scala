package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Text

/** q94 PII redaction + q95 vocabulary coverage: planted-frame
  * semantics, driven through the engine's own column expressions. */
class TextScrubSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  def df(rows: Seq[(Long, String)]) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("piiRedact: counts and replaces every planted match, leaves clean text alone") {
    val rows = Text.piiRedact(df(Seq(
        (1L, "write to alice@example.com or bob1@test.org today"),
        (2L, "call 555-1234 then 555-9999 re alice@example.com"),
        (3L, "no contact info here at all"))))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3))).toMap

    assert(rows(1L)._1 == 2 && rows(1L)._2 == 0)
    assert(rows(1L)._3 == "write to <EMAIL> or <EMAIL> today")
    assert(rows(2L)._1 == 1 && rows(2L)._2 == 2)
    assert(rows(2L)._3 == "call <PHONE> then <PHONE> re <EMAIL>")
    assert(rows(3L)._1 == 0 && rows(3L)._2 == 0)
    assert(rows(3L)._3 == "no contact info here at all", "clean text must pass untouched")
    // and nothing matchable survives redaction
    rows.values.foreach { case (_, _, red) =>
      assert(!red.matches(s".*${Text.EmailPattern}.*") &&
             !red.matches(s".*${Text.PhonePattern}.*"))
    }
  }

  test("q94 planted contact block: 1 email and doc_id%3 phones per corpus doc") {
    Text.q94PiiRedact(spark, TestSpark.sf0001).collect().foreach { r =>
      val id = r.getLong(0)
      assert(r.getLong(1) == 1L, s"doc $id: exactly the planted email")
      assert(r.getLong(2) == id % 3, s"doc $id: doc_id%3 planted phones")
      assert(!r.getString(3).contains("@"), s"doc $id: email must be redacted")
    }
  }

  test("vocabCoverage: planted in/out-of-vocab docs score 0 and 0.5") {
    import spark.implicits._
    // vocab (top-2 by count): "aa", "bb"; doc 3 is half rare tokens
    val docs = Seq(
      ("s1", 1L, "aa bb aa bb"),
      ("s1", 2L, "aa aa bb bb"),
      ("s2", 3L, "aa bb zz qq")).toDF("source", "doc_id", "text")
    val got = Text.vocabCoverage(docs, topV = 2).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got("s1") == ((2L, 0.0)), s"all-vocab source scores 0, got ${got("s1")}")
    assert(got("s2") == ((1L, 0.5)), s"half-rare doc scores 0.5, got ${got("s2")}")
  }

  test("boilerplateSpans: planted repeated footer found, unique text ignored") {
    import spark.implicits._
    val footer = (1 to 8).map(i => s"f$i").mkString(" ")
    val docs = Seq(
      ("s", 1L, s"a1 a2 a3 a4 a5 a6 a7 a8 $footer"),
      ("s", 2L, s"b1 b2 b3 b4 b5 b6 b7 b8 $footer"),
      ("s", 3L, s"c1 c2 c3 c4 c5 c6 c7 c8 $footer"),
      ("s", 4L, "d1 d2 d3 d4 d5 d6 d7 d8 d9")).toDF("source", "doc_id", "text")
    val got = Text.boilerplateSpans(docs, n = 8, minDf = 3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got.contains(footer), s"planted footer must surface, got ${got.keySet}")
    assert(got(footer) == 3L)
    // spans bridging unique prefix + footer appear in only one doc each
    assert(got.keys.forall(_.split(" ").forall(_.startsWith("f"))),
      s"only the pure footer window repeats across 3 docs: ${got.keySet}")
  }

  test("q95 over the corpus: rates in (0,1), every source present") {
    val got = Text.q95VocabCoverage(spark, TestSpark.sf0001).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val oov = r.getDouble(2)
      assert(oov >= 0.0 && oov < 1.0, s"${r.getString(0)}: avg_oov $oov out of range")
    }
    // top-16 of a ~31-token vocab must leave a real OOV tail somewhere
    assert(got.exists(_.getDouble(2) > 0.0), "expected a nonzero OOV tail")
  }
}
