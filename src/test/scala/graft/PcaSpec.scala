package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Pca

class PcaSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def vecsDF(rows: Seq[Seq[Double]]) = {
    import spark.implicits._
    rows.toDF("e")
  }

  test("planted rank-2 data: exactly two nonzero eigenvalues, full variance in 2 components") {
    // points = a·u + b·w + shift, u ⊥ w in R^5 → covariance rank 2
    val u = Array(1.0, 0.0, 1.0, 0.0, 0.0).map(_ / math.sqrt(2))
    val w = Array(0.0, 1.0, 0.0, -1.0, 0.0).map(_ / math.sqrt(2))
    val coefs = Seq((1.0, 2.0), (-2.0, 1.0), (3.0, -1.0), (0.5, 0.5),
      (-1.5, -2.5), (2.0, 0.0), (0.0, 3.0), (-3.0, 1.5))
    val rows = coefs.map { case (a, b) =>
      u.indices.map(i => a * u(i) + b * w(i) + 10.0).toSeq
    }
    val m = Pca.fit(vecsDF(rows))
    assert(m.eigenvalues(0) > 1e-6 && m.eigenvalues(1) > 1e-6)
    (2 until 5).foreach(i => assert(m.eigenvalues(i) < 1e-9,
      s"rank-2 data must have ~0 eigenvalue $i: ${m.eigenvalues.toSeq}"))
    val total = m.eigenvalues.sum
    assert((m.eigenvalues(0) + m.eigenvalues(1)) / total > 1.0 - 1e-9)
    // top-2 components span {u, w}: projecting u and w onto the span loses nothing
    def spanResidual(x: Array[Double]): Double = {
      val c0 = m.components(0).zip(x).map { case (a, b) => a * b }.sum
      val c1 = m.components(1).zip(x).map { case (a, b) => a * b }.sum
      x.indices.map { i =>
        val r = x(i) - c0 * m.components(0)(i) - c1 * m.components(1)(i)
        r * r
      }.sum
    }
    assert(spanResidual(u) < 1e-18 && spanResidual(w) < 1e-18)
  }

  test("real embeddings: orthonormal components, eigen-residuals, trace identity") {
    val vecs = spark.read.parquet(s"${TestSpark.sf0001}/embeddings.parquet")
      .select(col("embedding").cast("array<double>").as("e"))
    val m = Pca.fit(vecs)
    val d = m.mean.length
    // orthonormality
    for (i <- 0 until d; j <- i until d) {
      val dot = m.components(i).zip(m.components(j)).map { case (a, b) => a * b }.sum
      val expect = if (i == j) 1.0 else 0.0
      assert(math.abs(dot - expect) < 1e-9, s"components ${i}x${j} = $dot")
    }
    // eigenvalues sorted desc, non-negative
    m.eigenvalues.sliding(2).foreach {
      case Array(a, b) => assert(a >= b - 1e-12)
      case _           =>
    }
    assert(m.eigenvalues.forall(_ >= 0.0))
    // trace identity: Σ eigenvalues = Σ per-dim variances
    val stats = vecs
      .select((0 until d).map(i =>
        (avg(pow(col("e")(i), 2)) - pow(avg(col("e")(i)), 2)).as(s"v$i")): _*)
      .head()
    val trace = (0 until d).map(stats.getDouble).sum
    assert(math.abs(m.eigenvalues.sum - trace) < 1e-6 * math.max(1.0, trace))
  }

  test("projection variance per component equals its eigenvalue") {
    val vecs = spark.read.parquet(s"${TestSpark.sf0001}/embeddings.parquet")
      .filter(col("vec_id") < 200)
      .select(col("embedding").cast("array<double>").as("e"))
    val m = Pca.fit(vecs)
    val proj = Pca.project(vecs, m, 3)
    (0 until 3).foreach { i =>
      val v = proj.select((avg(pow(col("p")(i), 2)) - pow(avg(col("p")(i)), 2)).as("v"))
        .head().getDouble(0)
      assert(math.abs(v - m.eigenvalues(i)) < 1e-9 * math.max(1.0, m.eigenvalues(i)),
        s"projected variance $v != eigenvalue ${m.eigenvalues(i)}")
    }
  }

  test("q101 output is deterministic with a monotone cumulative ratio ending at 1") {
    val a = Pca.q101Pca(spark, TestSpark.sf0001).collect()
    val b = Pca.q101Pca(spark, TestSpark.sf0001).collect()
    assert(a.map(_.toString).toSeq == b.map(_.toString).toSeq)
    val ratios = a.map(_.getDouble(2))
    ratios.sliding(2).foreach {
      case Array(x, y) => assert(y >= x - 1e-12)
      case _           =>
    }
    assert(math.abs(ratios.last - 1.0) < 1e-6)
    assert(a.length == 64)
  }

  test("fit survives null and ragged embeddings (the kmeans guard discipline)") {
    // a null embedding NPE'd the per-partition fold; a ragged one
    // AIOOBE'd the moment buffers — one bad corpus row killed every
    // PCA consumer (round-14 review)
    import spark.implicits._
    val base = Seq.tabulate(20)(i => Seq(i.toDouble, 2.0 * i, 1.0))
    val dirty = (base :+ null :+ Seq(1.0)).toDF("e")
    val m = Pca.fit(dirty)
    assert(m.mean.length == 3, "dominant dimension must win")
    val cleanM = Pca.fit(base.toDF("e"))
    assert(m.eigenvalues.toSeq == cleanM.eigenvalues.toSeq,
      "malformed rows must not perturb the fit")
  }
}
