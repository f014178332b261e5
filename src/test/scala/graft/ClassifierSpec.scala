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

  test("calibrationCurve: hand-checked bins, edge p=1.0 in the top bin") {
    import spark.implicits._
    val scored = Seq(
      (0.05, 0.0), (0.08, 0.0),        // bin 0: mean_pred .065, frac_pos 0
      (0.62, 1.0), (0.68, 0.0),        // bin 6: mean_pred .65,  frac_pos .5
      (1.0, 1.0)                       // p = 1.0 must land in bin 9, not 10
    ).toDF("p", "y")
    val got = graft.ops.Classifier.calibrationCurve(scored).collect()
      .map(r => r.getInt(0) -> r).toMap
    assert(got.keySet == Set(0, 6, 9))
    assert(got(0).getAs[Long]("n") == 2L &&
      got(0).getAs[Double]("mean_pred") == 0.065 &&
      got(0).getAs[Double]("frac_pos") == 0.0 &&
      got(0).getAs[Double]("gap") == 0.065)
    assert(got(6).getAs[Double]("frac_pos") == 0.5 &&
      got(6).getAs[Double]("gap") == 0.15)
    assert(got(9).getAs[Long]("n") == 1L && got(9).getAs[Double]("gap") == 0.0)
  }

  test("calibrationCurve on a Bernoulli(p)-labeled frame sits near the diagonal") {
    import spark.implicits._
    // labels drawn (deterministically, hash-based) with P(y=1) = p:
    // the curve of a perfectly calibrated scorer — every bin's gap
    // should be within sampling error of 0
    val rnd = new scala.util.Random(3)
    val scored = (0 until 4000).map { i =>
      val p = (i % 100 + 0.5) / 100.0
      (p, if (rnd.nextDouble() < p) 1.0 else 0.0)
    }.toDF("p", "y")
    graft.ops.Classifier.calibrationCurve(scored).collect().foreach { r =>
      // 400 samples/bin → se of frac_pos ≤ 0.5/√400 = 0.025; 4 se gate
      assert(r.getAs[Double]("gap") < 0.10,
        s"bin ${r.getInt(0)} gap ${r.getAs[Double]("gap")} breaks the diagonal")
    }
  }

  test("q175 bins conserve the corpus and stay in range") {
    val rows = graft.ops.Classifier.q175CalibrationCurve(spark, TestSpark.sf0001)
      .collect()
    assert(rows.nonEmpty && rows.length <= 10)
    val n = rows.map(_.getAs[Long]("n")).sum
    assert(n == graft.Tables.documents(spark, TestSpark.sf0001).count(),
      "every scored doc lands in exactly one bin")
    rows.foreach { r =>
      val mp = r.getAs[Double]("mean_pred"); val fp = r.getAs[Double]("frac_pos")
      assert(mp >= 0.0 && mp <= 1.0 && fp >= 0.0 && fp <= 1.0)
      assert(r.getInt(0) >= 0 && r.getInt(0) <= 9)
      assert(math.abs(r.getAs[Double]("gap") - math.abs(mp - fp)) < 2e-6)
    }
  }
}
