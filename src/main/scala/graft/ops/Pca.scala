package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables._

/** Distributed PCA over the embeddings table (SURVEY §2.9 — the
  * dimensionality-reduction step in front of ANN indexing / semantic
  * triage: decorrelate + truncate vectors before IVF/PQ, or audit how
  * much of the corpus variance an index's reduced dimension keeps).
  *
  * 100 TB shape — the classic Gramian split:
  *  1. ACCUMULATE (distributed, one pass): every partition folds its
  *     vectors into one local (count, sum[d], gram[d·(d+1)/2]) triple —
  *     iterator-to-iterator, no per-row allocation beyond the shared
  *     buffers. ONE row per partition leaves the executors (~17 KB at
  *     d=64), so driver traffic is O(partitions · d²), independent of
  *     row count. No shuffle at all — mapPartitions straight to a
  *     driver-side reduce.
  *  2. SOLVE (driver, O(d³) on a d×d matrix): covariance from the
  *     moments, then cyclic Jacobi eigendecomposition — exact for
  *     symmetric matrices, deterministic, no library dependency. d is
  *     the EMBEDDING dimension (64–4096 in practice), so the cubic
  *     driver solve is microseconds-to-seconds regardless of corpus
  *     size.
  *  3. PROJECT (distributed, map-only): x → Vᵀ(x − μ) against the
  *     broadcast-literal component matrix; vectors never shuffle.
  *
  * The q101 query reports the spectrum (per-component variance +
  * cumulative explained ratio) — the artifact a pipeline actually
  * consults to pick the truncation rank. Rows-only: the iterative
  * eigensolve is not SQL-expressible; PcaSpec pins planted-rank
  * recovery, orthonormality, eigen-residuals, trace identity, and
  * projected-variance agreement.
  */
object Pca {

  final case class PcaModel(mean: Array[Double], eigenvalues: Array[Double],
                            components: Array[Array[Double]]) // components(i) = i-th eigenvector

  /** One-pass moment accumulation: (n, sum, upper-triangular gram) per
    * partition, combined on the driver. */
  private[ops] def moments(vecs: DataFrame): (Long, Array[Double], Array[Array[Double]]) = {
    val spark = vecs.sparkSession
    import spark.implicits._
    val parts = vecs.select(col("e")).as[Seq[Double]].mapPartitions { it =>
      if (!it.hasNext) Iterator.empty
      else {
        val first = it.next().toArray
        val d = first.length
        var n = 1L
        val s = first.clone()
        val g = new Array[Double](d * (d + 1) / 2)
        def fold(x: Array[Double]): Unit = {
          var k = 0; var i = 0
          while (i < d) {
            var j = i
            val xi = x(i)
            while (j < d) { g(k) += xi * x(j); j += 1; k += 1 }
            i += 1
          }
        }
        fold(first)
        while (it.hasNext) {
          val x = it.next().toArray
          n += 1
          var i = 0
          while (i < d) { s(i) += x(i); i += 1 }
          fold(x)
        }
        Iterator.single((n, s.toSeq, g.toSeq))
      }
    }.collect()
    require(parts.nonEmpty, "PCA needs a non-empty corpus")
    val d = parts(0)._2.length
    var n = 0L
    val s = new Array[Double](d)
    val g = new Array[Double](d * (d + 1) / 2)
    parts.foreach { case (pn, ps, pg) =>
      n += pn
      var i = 0
      while (i < d) { s(i) += ps(i); i += 1 }
      var k = 0
      while (k < g.length) { g(k) += pg(k); k += 1 }
    }
    val gram = Array.ofDim[Double](d, d)
    var k = 0; var i = 0
    while (i < d) {
      var j = i
      while (j < d) { gram(i)(j) = g(k); gram(j)(i) = g(k); j += 1; k += 1 }
      i += 1
    }
    (n, s, gram)
  }

  /** Cyclic Jacobi eigendecomposition of a symmetric matrix — returns
    * (eigenvalues, eigenvectors as rows), sorted by eigenvalue desc
    * with a deterministic sign convention (largest-|component| entry
    * positive). */
  private[ops] def jacobiEigen(a0: Array[Array[Double]]): (Array[Double], Array[Array[Double]]) = {
    val d = a0.length
    val a = a0.map(_.clone())
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    var off = offDiag(a)
    val tol = 1e-14 * math.max(1.0, a.map(r => r.map(math.abs).max).max) * d
    while (off > tol && sweep < 60) {
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          val apq = a(p)(q)
          if (math.abs(apq) > 1e-300) {
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * apq)
            val t =
              if (theta == 0.0) 1.0
              else math.signum(theta) / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val s = t * c
            rotate(a, v, p, q, c, s)
          }
          q += 1
        }
        p += 1
      }
      off = offDiag(a)
      sweep += 1
    }
    val pairs = (0 until d).map(i => (a(i)(i), v.map(_(i)))).sortBy(-_._1)
    val vals = pairs.map(_._1).toArray
    val vecs = pairs.map { case (_, ev) =>
      val m = ev.indices.maxBy(i => math.abs(ev(i)))
      if (ev(m) < 0) ev.map(-_) else ev
    }.toArray
    (vals, vecs)
  }

  private def offDiag(a: Array[Array[Double]]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) {
      var j = i + 1
      while (j < a.length) { s += math.abs(a(i)(j)); j += 1 }
      i += 1
    }
    s
  }

  private def rotate(a: Array[Array[Double]], v: Array[Array[Double]],
                     p: Int, q: Int, c: Double, s: Double): Unit = {
    val d = a.length
    var i = 0
    while (i < d) {
      val aip = a(i)(p); val aiq = a(i)(q)
      a(i)(p) = c * aip - s * aiq
      a(i)(q) = s * aip + c * aiq
      i += 1
    }
    i = 0
    while (i < d) {
      val api = a(p)(i); val aqi = a(q)(i)
      a(p)(i) = c * api - s * aqi
      a(q)(i) = s * api + c * aqi
      i += 1
    }
    i = 0
    while (i < d) {
      val vip = v(i)(p); val viq = v(i)(q)
      v(i)(p) = c * vip - s * viq
      v(i)(q) = s * vip + c * viq
      i += 1
    }
  }

  /** Fit: one distributed pass + a driver-side d×d eigensolve.
    * Covariance is the POPULATION form (÷n) — the convention the
    * explained-variance ratios don't depend on.
    *
    * Malformed-embedding guard (the kmeansDistributed discipline,
    * r13 — mirrored here round-14): a null embedding NPE'd the
    * per-partition fold and a ragged one AIOOBE'd the moment
    * accumulation — one bad corpus row killed every PCA consumer.
    * The fit's dimension is the corpus's DOMINANT embedding length
    * (one tiny agg job, necessarily BEFORE the moment pass — the
    * fold's buffers are sized by it). */
  def fit(vecs: DataFrame): PcaModel = {
    val top = vecs.filter(col("e").isNotNull)
      .groupBy(size(col("e")).as("d")).count()
      .orderBy(col("count").desc, col("d").asc).head(1)
    require(top.nonEmpty, "PCA needs a non-empty corpus of non-null embeddings")
    val dim = top(0).getInt(0)
    val clean = vecs.filter(col("e").isNotNull && size(col("e")) === dim)
    val (n, s, gram) = moments(clean)
    val d = s.length
    val mean = s.map(_ / n)
    val cov = Array.tabulate(d, d)((i, j) => gram(i)(j) / n - mean(i) * mean(j))
    val (vals, comps) = jacobiEigen(cov)
    // numerical noise can leave tiny negative eigenvalues on
    // rank-deficient inputs — clamp so downstream ratios stay sane
    PcaModel(mean, vals.map(v => if (v > 0) v else 0.0), comps)
  }

  /** Map-only projection onto the top `m` components: x → Vᵀ(x − μ)
    * against broadcast-literal component rows; no shuffle. */
  def project(vecs: DataFrame, model: PcaModel, m: Int): DataFrame = {
    val meanLit = typedLit(model.mean.toSeq)
    val centered = zip_with(col("e"), meanLit, (x, mu) => x - mu)
    val proj = array(model.components.take(m).map { comp =>
      aggregate(zip_with(centered, typedLit(comp.toSeq), (x, c) => x * c),
        lit(0.0), (acc, x) => acc + x)
    }: _*)
    vecs.withColumn("p", proj)
  }

  private def emb(s: SparkSession, d: String): DataFrame =
    graft.Tables.embeddingVectors(s, d)

  /** q101: the corpus spectrum — per-component variance and cumulative
    * explained ratio, the table a pipeline reads to choose an index's
    * truncation rank. */
  def q101Pca(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val model = fit(emb(s, d).select(col("e")))
    val total = model.eigenvalues.sum
    var cum = 0.0
    val rows = model.eigenvalues.zipWithIndex.map { case (ev, i) =>
      cum += ev
      // zero-variance corpus (all embeddings identical): total = 0 and
      // cum/total = NaN, which BigDecimal REJECTS — the explained
      // ratio of a spectrum with no variance is 0 by convention
      val ratio = if (total == 0.0) 0.0 else cum / total
      (i, BigDecimal(ev).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble,
        BigDecimal(ratio).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    rows.toSeq.toDF("component", "variance", "cum_var_ratio")
  }

  def queries: Seq[(String, (SparkSession, String) => DataFrame, Option[String])] = Seq(
    ("q101_pca", q101Pca _, None))
}
