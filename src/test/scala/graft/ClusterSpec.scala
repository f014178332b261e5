package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Cluster

class ClusterSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def vecsDF(rows: Seq[(Long, Seq[Double])]) = {
    import spark.implicits._
    rows.toDF("vec_id", "e")
  }

  // two well-separated 3-d blobs around (0,0,0) and (10,10,10)
  private val blobs = vecsDF(Seq(
    (0L, Seq(0.1, 0.0, -0.1)), (1L, Seq(-0.2, 0.1, 0.0)),
    (2L, Seq(0.0, -0.1, 0.2)), (3L, Seq(0.15, 0.05, 0.0)),
    (4L, Seq(10.1, 9.9, 10.0)), (5L, Seq(9.8, 10.2, 10.0)),
    (6L, Seq(10.0, 10.0, 9.9)), (7L, Seq(9.9, 9.95, 10.1))))

  test("kmeans recovers planted blobs: partition + centroid means") {
    val m = Cluster.kmeansDistributed(blobs, k = 2, iters = 4)
    assert(m.centroids.length == 2)
    // each centroid sits on one blob mean (order unspecified)
    val sorted = m.centroids.sortBy(_.sum)
    val lowMean = Array(0.1 - 0.2 + 0.0 + 0.15, 0.0 + 0.1 - 0.1 + 0.05,
      -0.1 + 0.0 + 0.2 + 0.0).map(_ / 4)
    val hiMean = Array(10.1 + 9.8 + 10.0 + 9.9, 9.9 + 10.2 + 10.0 + 9.95,
      10.0 + 10.0 + 9.9 + 10.1).map(_ / 4)
    sorted(0).zip(lowMean).foreach { case (a, b) => assert(math.abs(a - b) < 1e-9) }
    sorted(1).zip(hiMean).foreach { case (a, b) => assert(math.abs(a - b) < 1e-9) }
    // assignment splits the ids exactly by blob
    val asg = blobs.select(col("vec_id"),
      graft.functions.NativeExprs.nearestCentroid(col("e"), m.centroids).as("c"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(Set(0L, 1L, 2L, 3L).map(asg) != Set(4L, 5L, 6L, 7L).map(asg))
    assert(Set(0L, 1L, 2L, 3L).map(asg).size == 1)
    assert(Set(4L, 5L, 6L, 7L).map(asg).size == 1)
  }

  test("kmeans tolerates malformed embeddings: wrong-dim and empty rows are excluded from the fit") {
    // one wrong-dimension row and one empty row ride along; pre-fix a
    // wrong-dim row made nearestCentroid return null and NPE'd the
    // driver fold (and could even poison the model dimension by
    // becoming seed 1 via the min-hash order)
    val dirty = vecsDF(Seq(
      (100L, Seq(1.0)), (101L, Seq.empty[Double])))
      .unionByName(blobs)
    val m = Cluster.kmeansDistributed(dirty, k = 2, iters = 4)
    val clean = Cluster.kmeansDistributed(blobs, k = 2, iters = 4)
    assert(m.centroids.map(_.toSeq).sortBy(_.sum).toSeq ==
      clean.centroids.map(_.toSeq).sortBy(_.sum).toSeq,
      "malformed rows must not perturb the fitted model")
  }

  test("kmeans cost sequence is non-increasing (Lloyd's invariant)") {
    val vecs = vecsDF((0L until 40L).map(i =>
      (i, Seq((i % 7).toDouble, (i % 5).toDouble, (i % 3).toDouble))))
    val m = Cluster.kmeansDistributed(vecs, k = 4, iters = 5)
    m.costs.sliding(2).foreach {
      case Seq(a, b) => assert(b <= a + 1e-9, s"cost increased: ${m.costs}")
      case _         =>
    }
  }

  test("kmeans is deterministic and sizes sum to the corpus") {
    val d = TestSpark.sf0001
    val a = Cluster.q97Kmeans(spark, d).collect()
    val b = Cluster.q97Kmeans(spark, d).collect()
    assert(a.map(_.toString).toSeq == b.map(_.toString).toSeq)
    val total = a.map(_.getLong(1)).sum
    val n = spark.read.parquet(s"$d/embeddings.parquet").count()
    assert(total == n)
    // every cluster id within range, mean_sq_dist finite and >= 0
    a.foreach { r =>
      assert(r.getInt(0) >= 0 && r.getInt(0) < Cluster.K)
      assert(r.getDouble(2) >= 0.0)
    }
  }

  test("kmeans tolerates fewer distinct vectors than k") {
    val vecs = vecsDF(Seq((0L, Seq(1.0, 0.0)), (1L, Seq(1.0, 0.0)), (2L, Seq(0.0, 1.0))))
    val m = Cluster.kmeansDistributed(vecs, k = 5, iters = 2)
    assert(m.centroids.length == 2) // farthest-point stops at 0-distance
  }

  test("q168 simplified silhouette: separated blobs ≈ 1, force-split blob ≈ 0") {
    val sep = Cluster.silhouetteApprox(blobs, k = 2).collect()
    assert(sep.length == 2)
    sep.foreach { r =>
      assert(r.getAs[Long]("n_vecs") == 4L)
      assert(r.getAs[Double]("mean_silhouette") > 0.9,
        s"tight separated blobs must score near 1: ${r.getAs[Double]("mean_silhouette")}")
    }
    // ONE blob forced into k=2: every point is nearly as close to the
    // other half's centroid — silhouette collapses
    val one = vecsDF((0L until 12L).map(i =>
      (i, Seq((i % 4).toDouble / 10, (i % 3).toDouble / 10, 0.0))))
    val split = Cluster.silhouetteApprox(one, k = 2).collect()
    split.foreach { r =>
      assert(r.getAs[Double]("mean_silhouette") < 0.6,
        s"a force-split blob cannot look well-clustered: " +
          s"${r.getAs[Double]("mean_silhouette")}")
    }
  }

  test("q171 sampled silhouette tracks the exact score where q168 overestimates") {
    // planted geometry where the centroid shortcut's bias is visible:
    // a WIDE cluster (48 points spread along y ∈ [-10, 10] at x = 0)
    // and a tight one (32 points at x = 15). Centroid distance
    // underestimates mean member distance most for the wide cluster,
    // so q168 overestimates its cohesion; the sampled estimator
    // measures member distances and must track the exact value.
    val wide = (0 until 48).map(i =>
      (i.toLong, Seq(0.0, -10.0 + i * (20.0 / 47.0), 0.0)))
    val tight = (0 until 32).map(i =>
      (100L + i, Seq(15.0, (i % 7) * 0.03, (i % 5) * 0.03)))
    val pts = wide ++ tight
    def dist(a: Seq[Double], b: Seq[Double]): Double =
      math.sqrt(a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum)
    // exact silhouette of the planted wide group, brute force
    def exactMean(own: Seq[Seq[Double]], other: Seq[Seq[Double]]): Double = {
      val ss = own.map { p =>
        val a = own.filter(_ != p).map(dist(p, _)).sum / (own.length - 1)
        val b = other.map(dist(p, _)).sum / other.length
        (b - a) / math.max(a, b)
      }
      ss.sum / ss.length
    }
    val exactWide = exactMean(wide.map(_._2), tight.map(_._2))
    val df = vecsDF(pts)
    def wideRow(rows: Array[org.apache.spark.sql.Row]): Double = {
      val r = rows.filter(_.getAs[Long]("n_vecs") == 48L)
      assert(r.length == 1, s"kmeans must keep the planted 48/32 split: ${rows.toSeq}")
      r.head.getAs[Double]("mean_silhouette")
    }
    val sampled = wideRow(Cluster.silhouetteSampled(df, k = 2).collect())
    val centroid = wideRow(Cluster.silhouetteApprox(df, k = 2).collect())
    assert(centroid >= exactWide + 0.05,
      s"the centroid shortcut must visibly overestimate the wide cluster: " +
        s"centroid $centroid vs exact $exactWide")
    assert(math.abs(sampled - exactWide) <= 0.08,
      s"the sampled estimator must track the exact score: " +
        s"sampled $sampled vs exact $exactWide")
    assert(math.abs(sampled - exactWide) < centroid - exactWide,
      s"the middle rung must beat the centroid shortcut: sampled $sampled, " +
        s"centroid $centroid, exact $exactWide")
  }

  test("q171 sampled silhouette: separated blobs ≈ 1, deterministic") {
    val a = Cluster.silhouetteSampled(blobs, k = 2).collect()
    val b = Cluster.silhouetteSampled(blobs, k = 2).collect()
    assert(a.map(_.toString).toSeq == b.map(_.toString).toSeq,
      "md5-gated sampling must be rerunnable")
    assert(a.length == 2)
    a.foreach { r =>
      assert(r.getAs[Long]("n_vecs") == 4L)
      // the whole 4-point blob fits in the sample → the estimate IS
      // the exact silhouette here, and separation is extreme
      assert(r.getAs[Double]("mean_silhouette") > 0.9,
        s"tight separated blobs must score near 1: ${r.getAs[Double]("mean_silhouette")}")
    }
  }

  test("semantic dedup drops planted duplicates, keeps the min id") {
    // 10 is a scaled copy of 2 (cosine exactly 1), 11 is near-copy of 5
    val base = (0L until 10L).map { i =>
      val ang = i.toDouble / 3.0
      (i, Seq(math.cos(ang), math.sin(ang), 0.1 * i))
    }
    val planted = base ++ Seq(
      (10L, base(2)._2.map(_ * 3.0)),
      (11L, base(5)._2.map(_ * 0.999)))
    val got = Cluster.semanticDedupBrute(vecsDF(planted), 0.999)
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(!got(10L) && !got(11L), "planted dups must be dropped")
    assert(got(2L) && got(5L), "smaller-id originals kept")
  }

  test("clustered semantic dedup with one cluster equals brute force") {
    val d = TestSpark.sf0001
    val vecs = spark.read.parquet(s"$d/embeddings.parquet")
      .filter(col("vec_id") < 80)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
    val brute = Cluster.semanticDedupBrute(vecs, Cluster.SemDedupTau).collect()
    // a single centroid puts every vector in the same cluster → same pairs
    val oneCent = Array(Array.fill(64)(0.0))
    val clustered = Cluster.semanticDedupClustered(vecs, oneCent, Cluster.SemDedupTau).collect()
    assert(brute.map(_.toString).toSeq == clustered.map(_.toString).toSeq)
  }

  test("clustered semantic dedup only misses cross-cluster pairs (recall audit)") {
    val d = TestSpark.sf0001
    val vecs = spark.read.parquet(s"$d/embeddings.parquet")
      .filter(col("vec_id") < 200)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
    val m = Cluster.kmeansDistributed(vecs, k = 4, iters = 2)
    val brute = Cluster.semanticDedupBrute(vecs, Cluster.SemDedupTau)
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    val clus = Cluster.semanticDedupClustered(vecs, m.centroids, Cluster.SemDedupTau)
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    // clustered is a SUBSET of brute's drops: anything clustered drops,
    // brute drops too (same rule over fewer candidate pairs)
    clus.foreach { case (id, kept) => if (!kept) assert(!brute(id)) }
    // and τ above every cosine keeps everything
    val all = Cluster.semanticDedupBrute(vecs, 1.01).collect()
    assert(all.forall(_.getBoolean(1)))
  }
}
