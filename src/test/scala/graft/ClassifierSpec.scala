package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Classifier

/** q105 distributed logistic regression: the aggregation-pass gradient
  * against a driver-computed one, separable recovery, loss descent,
  * determinism, and the corpus run's accuracy floor. */
class ClassifierSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf0001

  /** Separable planted set: y = 1 iff x1 > 0.5, features carry the
    * signal directly in dim 1. */
  private def separable(n: Int) = {
    import spark.implicits._
    (0 until n).map { i =>
      val x1 = (i % 100) / 100.0
      (i.toLong, if (x1 > 0.5) 1.0 else 0.0, Seq(1.0, x1, 0.3, 0.4))
    }.toDF("doc_id", "y", "x")
  }

  test("distributed gradient pass matches a driver-side computation") {
    val feats = separable(64)
    // one iteration with zero weights: p = 0.5 for every row, so
    // grad_j = mean(x_j * (0.5 - y)) and loss = ln 2
    val m = Classifier.logregFit(feats, iters = 1, lr = 1.0)
    val local = feats.collect().map(r => (r.getDouble(1), r.getSeq[Double](2)))
    val n = local.length.toDouble
    val expected = (0 until Classifier.Dim).map { j =>
      -1.0 * local.map { case (y, x) => x(j) * (0.5 - y) }.sum / n
    }
    m.weights.zip(expected).zipWithIndex.foreach { case ((got, want), j) =>
      assert(math.abs(got - want) < 1e-9, s"w$j: got $got want $want")
    }
    assert(math.abs(m.losses.head - math.log(2.0)) < 1e-6)
  }

  test("separable labels are recovered with high accuracy and descending loss") {
    val feats = separable(2000).cache()
    val m = Classifier.logregFit(feats, iters = 40, lr = 2.0)
    assert(m.losses.last < m.losses.head * 0.6,
      s"loss must fall substantially: ${m.losses.head} -> ${m.losses.last}")
    // accuracy of the learned rule
    val w = m.weights
    val hits = feats.collect().count { r =>
      val x = r.getSeq[Double](2)
      val z = w.indices.map(j => w(j) * x(j)).sum
      val pred = if (1.0 / (1.0 + math.exp(-z)) > 0.5) 1.0 else 0.0
      pred == r.getDouble(1)
    }
    feats.unpersist()
    assert(hits >= 1900, s"expected >= 95% training accuracy, got $hits/2000")
  }

  test("loss is non-increasing at a conservative learning rate") {
    val m = Classifier.logregFit(separable(500), iters = 12, lr = 0.3)
    m.losses.sliding(2).foreach { case Seq(a, b) =>
      assert(b <= a + 1e-9, s"loss rose: $a -> $b in ${m.losses}")
    }
  }

  test("training is deterministic: same corpus, same model") {
    val feats = Classifier.features(graft.Tables.documents(spark, sf))
    val m1 = Classifier.logregFit(feats, iters = 4)
    val m2 = Classifier.logregFit(feats, iters = 4)
    assert(m1.weights.toSeq == m2.weights.toSeq)
    assert(m1.losses == m2.losses)
  }

  test("q105 on the corpus: planted labels learned past the noise floor") {
    val rows = Classifier.q105LogregQuality(spark, sf).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(rows.keySet == (0 until Classifier.Dim).map(j => s"w$j").toSet
      + "final_loss" + "accuracy")
    // 5% labels are flipped, so ~95% is the ceiling; the token-count
    // feature alone separates the clean labels
    assert(rows("accuracy") > 0.85, s"accuracy ${rows("accuracy")} too low")
    assert(rows("final_loss") < math.log(2.0), "must beat the uninformed loss")
    assert(rows("w1") > 0.0, "the token-count weight must carry the signal")
  }
}
