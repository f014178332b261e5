package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Text

/** Hand-computed bigram-MLE checks for q82's core (bigramLmScores):
  * the corpus-trained LM must reproduce exact conditional
  * probabilities, not just run. */
class TextLmSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def score(rows: Seq[(Long, String)]): Map[Long, (Long, Double, Double)] = {
    import spark.implicits._
    Text.bigramLmScores(rows.toDF("doc_id", "text"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3))))
      .toMap
  }

  test("uniform branching: P(.|a) = 1/2 everywhere gives avg_logp2 = -1, ppl = 2") {
    // corpus bigrams: (a,b) and (a,c) — c(a,·)=2, each c12=1
    val m = score(Seq((1L, "a b"), (2L, "a c")))
    assert(m(1L) == ((1L, -1.0, 2.0)))
    assert(m(2L) == ((1L, -1.0, 2.0)))
  }

  test("deterministic chains score logp 0, mixed docs average occurrence-wise") {
    // bigrams: doc1 (a,b),(b,a),(a,b); doc2 (a,b); doc3 (a,c)
    // c(a,·)=4: c(a,b)=3 → P=0.75; c(a,c)=1 → P=0.25; c(b,·)=1: P(a|b)=1
    val m = score(Seq((1L, "a b a b"), (2L, "a b"), (3L, "a c")))
    val lg075 = math.log(0.75) / math.log(2.0)
    // doc1: mean of [log2 .75, log2 1, log2 .75]
    val d1 = BigDecimal((2 * lg075) / 3).setScale(3, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(m(1L)._1 == 3L && m(1L)._2 == d1)
    assert(m(2L)._1 == 1L &&
      m(2L)._2 == BigDecimal(lg075).setScale(3, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(m(3L) == ((1L, -2.0, 4.0))) // P(c|a)=0.25 → log2 = -2, ppl 4
  }

  test("single-token and empty docs are excluded (no bigrams to score)") {
    val m = score(Seq((1L, "solo"), (2L, ""), (3L, "a b")))
    assert(m.keySet == Set(3L))
    assert(m(3L)._1 == 1L)
  }
}
