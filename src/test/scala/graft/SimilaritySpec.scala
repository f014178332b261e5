package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Similarity

class SimilaritySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("cosine: hand-computed values") {
    import spark.implicits._
    val df = Seq(
      (Seq(1.0, 0.0, 0.0), Seq(1.0, 0.0, 0.0)),   // identical → 1
      (Seq(1.0, 0.0, 0.0), Seq(0.0, 1.0, 0.0)),   // orthogonal → 0
      (Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0)))   // 32/(√14·√77)
      .toDF("a", "b")
    val got = df.select(Similarity.cosine(col("a"), col("b")).as("c"))
      .collect().map(_.getDouble(0))
    assert(math.abs(got(0) - 1.0) < 1e-12)
    assert(math.abs(got(1)) < 1e-12)
    assert(math.abs(got(2) - 32.0 / (math.sqrt(14) * math.sqrt(77))) < 1e-12)
  }

  test("brute-force topk is ordered and self-consistent") {
    val r = Similarity.q40CosineTopK(spark, TestSpark.sf0001).collect()
    assert(r.length == 20)
    val sims = r.map(_.getDouble(1))
    assert(sims.zip(sims.tail).forall { case (a, b) => a >= b })
    assert(!r.map(_.getLong(0)).contains(0L)) // query vec excluded
  }

  test("ANN candidates report exact cosine values (subset of brute force)") {
    val brute = Similarity.q40CosineTopK(spark, TestSpark.sf0001)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val full = {
      // brute force over ALL vecs for lookup (top-20 may not cover ANN hits)
      val e = graft.Tables.embeddings(spark, TestSpark.sf0001)
        .withColumn("e", col("embedding").cast("array<double>"))
      val q = e.filter(col("vec_id") === 0).select(col("e").as("qe"))
      e.filter(col("vec_id") =!= 0).crossJoin(broadcast(q))
        .select(col("vec_id"), round(Similarity.cosine(col("e"), col("qe")), 6).as("c"))
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    }
    val ann = Similarity.q41AnnLsh(spark, TestSpark.sf0001).collect()
    assert(ann.nonEmpty, "LSH should yield candidates at sf0.001")
    ann.foreach { r =>
      assert(math.abs(full(r.getLong(0)) - r.getDouble(1)) < 1e-9,
        s"ANN cosine for vec ${r.getLong(0)} differs from brute force")
    }
  }

  test("near-dup pairs are distinct ordered pairs with valid cosines") {
    val pairs = Similarity.q42EmbedNearDup(spark, TestSpark.sf0001).collect()
    assert(pairs.nonEmpty)
    assert(pairs.forall(r => r.getLong(0) < r.getLong(1)))
    assert(pairs.forall(r => math.abs(r.getDouble(2)) <= 1.0 + 1e-9))
    val keys = pairs.map(r => (r.getLong(0), r.getLong(1)))
    assert(keys.distinct.length == keys.length)
  }
}
