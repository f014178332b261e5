package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables._

/** Product quantization (PQ) ANN — the codebook upgrade of q56's
  * scalar quantization (Jégou et al., TPAMI 2011):
  *
  *  - TRAIN: per-subspace k-means on a DRIVER-BUDGETED sample (reuses
  *    Ivf.kmeansFit; m independent fits over dsub-dim slices). The
  *    codebook is m×k×dsub doubles (~100 KB) — plan-static data.
  *  - ENCODE: every vector → m bytes (64× smaller than the double
  *    array, 8× smaller than int8) via the codegen'd PqEncode.
  *  - QUERY: the query precomputes an m×k lookup table ONCE on the
  *    driver; scan-time scoring is m table lookups per row (PqAdc) —
  *    no floating-point vector arithmetic in the candidate pass at
  *    all. Exact cosine re-ranks the top candidates.
  *
  * Vectors are L2-normalized inside the encode, so the ADC inner
  * product approximates cosine directly. At 100 TB: the candidate
  * scan reads 8 bytes/vector — the PQ codes for a trillion vectors
  * fit where the raw doubles never could.
  */
object Pq {

  val M = 8          // subspaces
  val K = 64         // centroids per subspace (6-bit codes, byte-stored)
  val SampleN = 4096 // driver training budget
  val Candidates = 100

  private[ops] def normalize(v: Array[Double]): Array[Double] = {
    var n = 0.0
    var i = 0
    while (i < v.length) { n += v(i) * v(i); i += 1 }
    n = math.sqrt(n)
    if (n == 0.0) v else v.map(_ / n)
  }

  /** Per-subspace codebooks from a bounded sample — deterministic and
    * layout-unbiased (hash-ordered top-N; see Ivf.sampleVectors). */
  def trainCodebooks(df: DataFrame, m: Int = M, k: Int = K): Array[Array[Array[Double]]] = {
    val sample = Ivf.sampleVectors(df, SampleN).map(normalize)
    require(sample.nonEmpty, "PQ training needs a non-empty sample")
    require(sample(0).length % m == 0,
      s"embedding dim ${sample(0).length} must be divisible by M=$m — " +
        "integer division would silently drop the trailing dimensions " +
        "from training, encoding, AND the ADC LUT")
    val dsub = sample(0).length / m
    Array.tabulate(m) { s =>
      val sub = sample.map(v => java.util.Arrays.copyOfRange(v, s * dsub, (s + 1) * dsub))
      graft.ops.Ivf.kmeansFit(sub, k, iters = 8, seed = 42L + s)
    }
  }

  /** Query-side ADC lookup table: lut(s)(c) = ⟨query_sub_s, centroid_c⟩. */
  private[ops] def buildLut(q: Array[Double],
                            codebooks: Array[Array[Array[Double]]]): Array[Array[Double]] = {
    val m = codebooks.length
    val dsub = q.length / m
    Array.tabulate(m) { s =>
      codebooks(s).map { cent =>
        var d = 0.0
        var j = 0
        while (j < dsub) { d += q(s * dsub + j) * cent(j); j += 1 }
        d
      }
    }
  }

  private def emb(s: SparkSession, d: String): DataFrame =
    graft.Tables.embeddingVectors(s, d)

  /** q57: PQ top-k — 8-byte-code candidate scan (map-only +
    * TakeOrdered, zero shuffles like q40/q56), exact re-rank of the
    * top candidates. Rows-only; PqSpec pins recall vs brute force. */
  def q57PqTopK(s: SparkSession, d: String, k: Int = 10): DataFrame = {
    val corpus = emb(s, d)
    val codebooks = trainCodebooks(corpus)
    val qVec = corpus.filter(col("vec_id") === 0).select(col("e"))
      .head().getSeq[Double](0).toArray
    val lut = buildLut(normalize(qVec), codebooks)
    val qe = typedLit(qVec.toSeq)
    corpus.filter(col("vec_id") =!= 0)
      .select(col("vec_id"), col("e"),
        graft.functions.NativeExprs.pqAdc(
          graft.functions.NativeExprs.pqEncode(col("e"), codebooks), lut).as("adc"))
      .orderBy(col("adc").desc, col("vec_id").asc)
      .limit(Candidates)
      .select(col("vec_id"), round(Similarity.cosine(col("e"), qe), 6).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col("vec_id").asc)
      .limit(k)
  }

  /** q156: PQ DISTORTION eval — for a bounded query set, how well the
    * 8-byte ADC estimate tracks the true cosine over the whole corpus:
    * per query, mean/max absolute error and the Pearson correlation
    * between estimate and truth. Completes the ANN eval-harness trio
    * (q126 IVF recall sweep, q139 MinHash calibration) — recall@k says
    * whether the top-k survives quantization; THIS says how much
    * headroom the candidate margin has (a corr ≈ 1, mae ≈ 0.02 code
    * can cut candidates aggressively; a noisy code needs q57's wide
    * re-rank buffer).
    *
    * 100 TB shape: the corpus is scanned ONCE — every row encodes to
    * its m-byte code once and evaluates all queries' ADC LUTs +
    * cosines map-side (queries and LUTs are driver-bounded plan
    * literals, the q126 discipline); the exchange carries the
    * per-(query, row) scalar pairs' partial aggregates only. Rows-only
    * (k-means codebooks are not SQL-expressible); PqSpec pins the
    * corr/mae envelope and self-consistency. */
  def pqDistortion(s: SparkSession, d: String, nQueries: Int = 8): DataFrame = {
    val corpus = emb(s, d)
    val codebooks = trainCodebooks(corpus)
    val qRows = corpus.filter(col("vec_id") < nQueries)
      .select(col("vec_id"), col("e")).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    val code = graft.functions.NativeExprs.pqEncode(col("e"), codebooks)
    val perQ = qRows.map { case (qid, qVec) =>
      val lut = buildLut(normalize(qVec), codebooks)
      struct(lit(qid).as("qid"),
        graft.functions.NativeExprs.pqAdc(col("code"), lut).as("adc"),
        Similarity.cosine(col("e"), typedLit(qVec.toSeq)).as("cos"))
    }
    corpus.filter(col("vec_id") >= nQueries)
      .withColumn("code", code)
      .select(explode(array(perQ.toIndexedSeq: _*)).as("x"))
      .select(col("x.qid").as("qid"), col("x.adc").as("adc"), col("x.cos").as("cos"))
      .groupBy(col("qid"))
      .agg(count(lit(1)).as("n"),
           round(avg(abs(col("adc") - col("cos"))), 4).as("mae"),
           round(max(abs(col("adc") - col("cos"))), 4).as("max_err"),
           round(corr(col("adc"), col("cos")), 4).as("corr"))
      .orderBy(col("qid"))
  }

  def q156PqDistortion(s: SparkSession, d: String): DataFrame =
    pqDistortion(s, d)

  val queries: Seq[(String, (SparkSession, String) => DataFrame, Option[String])] = Seq(
    ("q57_pq_topk", (s: SparkSession, d: String) => q57PqTopK(s, d), None),
    ("q156_pq_distortion", q156PqDistortion _, None),
  )
}
