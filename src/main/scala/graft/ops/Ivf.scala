package graft.ops

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.linalg.Vectors
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions._

import graft.Tables._

/** IVF (inverted-file) approximate nearest neighbor — the coarse-
  * quantization scale path complementing the LSH variant in Similarity:
  *
  *  1. TRAIN: k-means centroids (seeded, deterministic). At 100 TB this
  *     trains on a driver-budgeted sample; the model is k×dim doubles —
  *     kilobytes — shipped to executors in the task closure.
  *  2. INDEX: every vector assigned to its nearest centroid (map-only).
  *     In production the corpus is then written partitioned/bucketed by
  *     cluster id, so a probe reads only matching partitions
  *     (partition pruning does the candidate cut).
  *  3. QUERY: rank centroids by distance to the query (driver, k rows),
  *     scan only the nprobe nearest clusters, exact cosine re-rank.
  *
  * nprobe = k degrades gracefully to exact brute force — SimilaritySpec
  * asserts that equivalence, which pins the whole path's correctness.
  */
object Ivf {

  val K = 16
  val NProbe = 4

  /** Deterministic k-means centroids over the embedding corpus. */
  def trainCentroids(df: DataFrame, k: Int = K): Array[Array[Double]] = {
    val toVec = udf((e: Seq[Double]) => Vectors.dense(e.toArray))
    val feats = df.select(toVec(col("e")).as("features"))
    new KMeans().setK(k).setSeed(42L).setMaxIter(10)
      .fit(feats).clusterCenters.map(_.toArray)
  }

  private def sqDist(a: Array[Double], b: Seq[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
    s
  }

  /** Nearest-centroid assignment (map-only; centroids ride the closure). */
  def assignUdf(centroids: Array[Array[Double]]): UserDefinedFunction =
    udf((e: Seq[Double]) => {
      var best = 0; var bestD = Double.MaxValue; var c = 0
      while (c < centroids.length) {
        val d = sqDist(centroids(c), e)
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      best
    })

  private def emb(s: SparkSession, d: String): DataFrame =
    embeddings(s, d).withColumn("e", col("embedding").cast("array<double>"))

  /** IVF top-k for the query vector (vec_id 0) probing nprobe clusters. */
  def ivfTopK(s: SparkSession, d: String, nprobe: Int, k: Int = 10): DataFrame = {
    val corpus = emb(s, d).cache()
    val cents = trainCentroids(corpus)
    val assign = assignUdf(cents)
    val indexed = corpus.withColumn("cluster", assign(col("e")))
    // driver-side: rank centroids against the tiny query vector
    val qVec = corpus.filter(col("vec_id") === 0).select(col("e"))
      .head().getSeq[Double](0)
    val probes = cents.zipWithIndex
      .sortBy { case (c, _) => sqDist(c, qVec) }
      .take(nprobe).map(_._2)
    val q = corpus.filter(col("vec_id") === 0).select(col("e").as("qe"))
    indexed
      .filter(col("vec_id") =!= 0 && col("cluster").isin(probes.toSeq: _*))
      .crossJoin(broadcast(q))
      .select(col("vec_id"), col("cluster"),
              round(Similarity.cosine(col("e"), col("qe")), 6).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col("vec_id").asc)
      .limit(k)
  }

  /** Rows-only query entry (IVF with default probes). */
  def q48IvfTopK(s: SparkSession, d: String): DataFrame =
    ivfTopK(s, d, NProbe)

  val queries: Seq[(String, (SparkSession, String) => DataFrame, Option[String])] = Seq(
    ("q48_ivf_topk", q48IvfTopK _, None),
  )
}
