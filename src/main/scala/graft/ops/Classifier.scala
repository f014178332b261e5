package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.Tables._

/** Distributed logistic-regression quality classifier (SURVEY §2.9 —
  * the trained-filter step of a curation pipeline: heuristics label a
  * seed set, a linear model generalizes the decision, the corpus is
  * scored map-side).
  *
  * The published curation recipes (fastText-style quality classifiers)
  * train a linear model over cheap per-doc features and keep docs the
  * model scores "reference-like". This is that training loop run
  * Spark-native, the same iterate-via-aggregation shape as q97's
  * k-means:
  *
  *  - FEATURES are row-local codegen'd expressions (token count,
  *    stopword ratio, mean word length) — computed once, persisted as
  *    a slim (id, label, 4-double) frame; the text is read exactly
  *    once and never again.
  *  - Each GD iteration is ONE aggregation pass: the current weight
  *    vector enters as literals, p = σ(w·x) evaluates map-side, and
  *    the gradient Σ x·(p−y) comes back as dim+1 partial-aggregated
  *    scalars — O(dim) driver traffic per iteration, independent of
  *    corpus size. Loss rides dim 0 of the same shuffle (the q97
  *    cost-bookkeeping trick).
  *  - SCORING the corpus afterwards is a pure map: σ(w·x) > 0.5
  *    inside whole-stage codegen, composable in front of any filter.
  *
  * Labels here are planted (n_tokens > median, 5% deterministic
  * hash-flip noise) because the synthetic corpus carries no natural
  * quality signal — the machinery under test is the distributed
  * training loop, which ClassifierSpec pins against a driver-computed
  * gradient, separable-recovery accuracy, loss descent, and
  * determinism.
  */
object Classifier {

  val Dim = 4          // [bias, n_tokens/100, stopword_ratio, avg_word_len/10]
  val Iters = 24
  val LearningRate = 1.5
  val LabelTokenThreshold = 56   // corpus median
  val NoiseFrac = 13             // flip labels where first md5 byte < 13/256 ≈ 5%

  private val stopwords = Seq("the", "of", "and", "a", "to", "in")

  /** Feature frame over any (doc_id, text) input: (doc_id, y, x) with
    * x a Dim-length array<double>. Map-only; persisted by the caller
    * if iterated over. */
  def features(docs: DataFrame): DataFrame = {
    val t = split(col("text"), " ")
    val nTok = size(t).cast("double")
    val stopList = stopwords.map(w => s"'$w'").mkString("(", ", ", ")")
    val stopRatio = size(expr(s"filter(split(text, ' '), t -> t IN $stopList)"))
      .cast("double") / nTok
    // non-space char count = length − separator count (split with the
    // default -1 limit keeps trailing empties, so separators are
    // exactly size(t) − 1): drops a full regex pass over every char
    // (r19; value identical to the old regexp_replace strip)
    val awl = (length(col("text")) - (size(t) - lit(1))).cast("double") / nTok
    val noise = conv(substring(md5(concat(col("doc_id").cast("string"), lit(":lbl"))), 1, 2),
      16, 10).cast("int")
    val cleanY = (nTok > LabelTokenThreshold).cast("int")
    val y = when(noise < NoiseFrac, lit(1) - cleanY).otherwise(cleanY).cast("double")
    docs.select(
      col("doc_id"), y.as("y"),
      array(lit(1.0), nTok / 100.0, stopRatio, awl / 10.0).as("x"))
  }

  /** w·x via the codegen'd [[graft.functions.DotW]] kernel (r19: was
    * an interpreted aggregate/zip_with HOF chain per row per
    * iteration). Two wins: the fused loop itself, and — the measured
    * one — the weights ride addReferenceObj instead of being inlined
    * as scalar literals, so all `iters` per-iteration plans share ONE
    * generated class instead of recompiling codegen every iteration.
    * Fold order matches the HOF form; the fit trajectory is
    * bit-identical (ClassifierSpec pins it against a driver-computed
    * gradient). */
  private def dot(x: Column, w: Array[Double]): Column =
    graft.functions.NativeExprs.dotW(x, w)

  private def sigmoid(z: Column): Column = lit(1.0) / (lit(1.0) + exp(-z))

  final case class LogregModel(weights: Array[Double], losses: Seq[Double])

  /** Batch gradient descent: `iters` passes, each one distributed
    * aggregation. Gradient and mean log-loss are computed under the
    * weights ENTERING the iteration, so `losses` tracks descent
    * (monotone for a small-enough lr on this convex objective —
    * pinned loosely by ClassifierSpec). The input must be a features
    * frame from [[features]]; callers iterating at scale should
    * persist it (q105 does). */
  def logregFit(feats: DataFrame, iters: Int = Iters,
                lr: Double = LearningRate): LogregModel = {
    // per-iteration digest jobs run on the AQE-off clone (IterFit
    // scaladoc); the caller's persisted cache resolves there too
    val featsFit = IterFit.rebindNoAqe(feats)
    var w = new Array[Double](Dim)
    val losses = scala.collection.mutable.ArrayBuffer[Double]()
    val eps = 1e-12
    var it = 0
    while (it < iters) {
      val p = sigmoid(dot(col("x"), w))
      // ONE flat global aggregation per iteration (r19: was posexplode
      // ×Dim + groupBy(dim) — a ×Dim row blowup through an exploded
      // hash-agg exchange every iteration). Dim is statically known,
      // so the gradient components are Dim scalar sums riding one
      // single-row partial-agg shuffle; per-row terms, their order,
      // and the loss expression are unchanged, so the sums match the
      // old form bit-for-bit on any fixed partitioning.
      val gradCols = (0 until Dim).map(j =>
        sum(element_at(col("x"), j + 1) * (col("p") - col("y"))).as(s"g$j"))
      val lossCol = sum(
        -col("y") * log(col("p") + eps)
          - (lit(1.0) - col("y")) * log(lit(1.0) - col("p") + eps)).as("l0")
      val aggCols = gradCols ++ Seq(lossCol, count(lit(1)).as("n"))
      val rows = featsFit
        .select(col("y"), p.as("p"), col("x"))
        .agg(aggCols.head, aggCols.tail: _*)
        .collect()
      // named precondition (the Pca.moments/Pq.trainCodebooks
      // discipline) instead of an opaque 'next on empty iterator'
      val n = rows.head.getLong(Dim + 1).toDouble
      require(n > 0, "logregFit needs a non-empty features frame")
      val grad = new Array[Double](Dim)
      var j0 = 0
      while (j0 < Dim) { grad(j0) = rows.head.getDouble(j0) / n; j0 += 1 }
      val loss = rows.head.getDouble(Dim) / n
      losses += loss
      var j = 0
      while (j < Dim) { w(j) -= lr * grad(j); j += 1 }
      it += 1
    }
    LogregModel(w, losses.toSeq)
  }

  /** q105: train the classifier on the corpus's planted labels, then
    * report the learned weights, the final training loss, and the
    * training accuracy of the σ(w·x) > 0.5 decision — the numbers a
    * pipeline records before applying the filter. Rows-only
    * (iterative refinement is not SQL-expressible). */
  def q105LogregQuality(s: SparkSession, d: String): DataFrame = {
    val feats = features(documents(s, d)).persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val m = logregFit(feats)
      val acc = feats
        .select(((sigmoid(dot(col("x"), m.weights)) > 0.5).cast("int") ===
          col("y").cast("int")).cast("double").as("hit"))
        .agg(avg(col("hit"))).collect()(0).getDouble(0)
      val rows =
        m.weights.zipWithIndex.map { case (v, j) => (s"w$j", v) } ++
          Seq(("final_loss", m.losses.last), ("accuracy", acc))
      import s.implicits._
      rows.toSeq.toDF("metric", "value")
        .select(col("metric"), round(col("value"), 6).as("value"))
        .orderBy(col("metric"))
    } finally feats.unpersist()
  }

  /** Per-bin reliability rows over a (p, y) scored frame: equal-width
    * probability bins, each reporting its count, mean predicted
    * probability, observed positive rate, and the |gap| between them —
    * the reliability diagram a classifier deployment reads before
    * trusting σ(w·x) as a probability (weighted-mean gap = ECE).
    * p = 1.0 lands in the top bin. One map + one ≤bins-row
    * aggregation; the scored frame is whatever the caller has — at
    * scale, the same cached features the fit used. */
  def calibrationCurve(scored: DataFrame, bins: Int = 10): DataFrame =
    scored
      .select(least(floor(col("p") * bins).cast("int"), lit(bins - 1)).as("bin"),
        col("p"), col("y"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"),
           round(avg(col("p")), 6).as("mean_pred"),
           round(avg(col("y")), 6).as("frac_pos"),
           round(abs(avg(col("p")) - avg(col("y"))), 6).as("gap"))
      .orderBy(col("bin"))

  /** q175: CALIBRATION CURVE of the q105 quality classifier — trains
    * the same model, then audits whether its scores are trustworthy AS
    * PROBABILITIES (a curation pipeline thresholding at 0.9 implicitly
    * assumes they are). Rows-only (iterative fit); ClassifierSpec pins
    * the bin arithmetic against hand values and corpus conservation. */
  def q175CalibrationCurve(s: SparkSession, d: String): DataFrame = {
    val feats = features(documents(s, d)).persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val m = logregFit(feats)
      val out = calibrationCurve(
        feats.select(sigmoid(dot(col("x"), m.weights)).as("p"), col("y")))
      // bounded digest (≤ bins rows): materialize before the finally
      // releases the cached features the lazy plan references
      val rows = out.collect().toSeq
      s.createDataFrame(s.sparkContext.parallelize(rows, 1), out.schema)
    } finally feats.unpersist()
  }

  def queries: Seq[(String, (SparkSession, String) => DataFrame, Option[String])] = Seq(
    ("q105_logreg_quality", q105LogregQuality _, None),
    ("q175_calibration_curve", q175CalibrationCurve _, None))
}
