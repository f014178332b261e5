package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Pq, Similarity}

class PqSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("codebooks are deterministic and shaped m x k x dsub") {
    val e = Tables.embeddings(spark, TestSpark.sf0001)
      .withColumn("e", col("embedding").cast("array<double>"))
    val c1 = Pq.trainCodebooks(e)
    val c2 = Pq.trainCodebooks(e)
    assert(c1.length == Pq.M)
    assert(c1.forall(_.length == Pq.K))
    assert(c1.forall(_.forall(_.length == 64 / Pq.M)))
    c1.zip(c2).foreach { case (a, b) =>
      a.zip(b).foreach { case (x, y) => assert(x.toSeq == y.toSeq) }
    }
  }

  test("pqAdc NULLs on foreign codes (wrong m, byte >= k) instead of crashing") {
    import spark.implicits._
    // a 2x4 LUT: valid codes are 2 bytes with values < 4
    val lut = Array(Array(1.0, 2.0, 3.0, 4.0), Array(5.0, 6.0, 7.0, 8.0))
    val rows = Seq(
      (1L, Array[Byte](1, 2)),        // valid → 2.0 + 7.0
      (2L, Array[Byte](1, 2, 3)),     // wrong m → null
      (3L, Array[Byte](1, 9)),        // byte >= k (foreign k) → null
      (4L, null.asInstanceOf[Array[Byte]])) // null in → null out
      .toDF("id", "code")
    val got = rows.select(col("id"),
        graft.functions.NativeExprs.pqAdc(col("code"), lut).as("adc"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(got(1L).contains(9.0))
    assert(got(2L).isEmpty && got(3L).isEmpty && got(4L).isEmpty,
      s"foreign/mismatched codes must null, got $got")
  }

  test("PQ codes are m bytes of valid centroid indices") {
    import spark.implicits._
    val e = Tables.embeddings(spark, TestSpark.sf0001)
      .withColumn("e", col("embedding").cast("array<double>"))
    val codebooks = Pq.trainCodebooks(e)
    val v = e.filter(col("vec_id") === 1).select("e").head().getSeq[Double](0).toArray
    val df = Seq((1L, v.toSeq)).toDF("vec_id", "e")
    val code = df.select(graft.functions.NativeExprs.pqEncode(col("e"), codebooks).as("c"))
      .head().getAs[Array[Byte]](0)
    assert(code.length == Pq.M)
    assert(code.forall(b => (b & 0xFF) < Pq.K))
  }

  test("pq_encode nulls dimension-mismatched embeddings instead of killing the scan") {
    import spark.implicits._
    val e = Tables.embeddings(spark, TestSpark.sf0001)
      .withColumn("e", col("embedding").cast("array<double>"))
    val codebooks = Pq.trainCodebooks(e)
    val good = e.filter(col("vec_id") === 1).select("e").head().getSeq[Double](0)
    // longer-than-trained, shorter-than-trained, and exact-dim rows in
    // one frame: only the exact-dim row encodes; the rest are null
    val df = Seq(
      (1L, good),
      (2L, good ++ Seq(0.5, 0.5)),   // dim+2 → would index past the codebooks
      (3L, good.take(10)))           // dim-10
      .toDF("vec_id", "e")
    val got = df.select(col("vec_id"),
        graft.functions.NativeExprs.pqEncode(col("e"), codebooks).as("c"))
      .collect().map(r => r.getLong(0) -> r.isNullAt(1)).toMap
    assert(got(1L) == false)
    assert(got(2L) == true, "over-length embedding must encode to null")
    assert(got(3L) == true, "under-length embedding must encode to null")
  }

  test("PQ top-k recall vs brute force with exact re-rank") {
    val brute = Similarity.q40CosineTopK(spark, TestSpark.sf0001)
      .limit(10).collect().map(_.getLong(0)).toSet
    val pq = Pq.q57PqTopK(spark, TestSpark.sf0001)
      .collect().map(_.getLong(0)).toSet
    val recall = (brute intersect pq).size / 10.0
    info(f"PQ recall@10 (m=${Pq.M}, k=${Pq.K}, cands=${Pq.Candidates}): $recall%.2f")
    assert(recall >= 0.7, s"PQ recall@10 $recall below 0.7")
    // scores of returned candidates are EXACT (re-ranked) cosines
    val full = Similarity.q40CosineTopK(spark, TestSpark.sf0001)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    Pq.q57PqTopK(spark, TestSpark.sf0001).collect().foreach { r =>
      full.get(r.getLong(0)).foreach { exact =>
        assert(math.abs(exact - r.getDouble(1)) < 1e-9)
      }
    }
  }

  test("q156 distortion: ADC tracks true cosine (corr, mae, full corpus covered)") {
    val corpus = Tables.embeddings(spark, TestSpark.sf0001).count()
    val rows = Pq.pqDistortion(spark, TestSpark.sf0001).collect()
    assert(rows.length == 8)
    rows.foreach { r =>
      assert(r.getAs[Long]("n") == corpus - 8, "every non-query vector scored")
      val (mae, mx, c) = (r.getAs[Double]("mae"), r.getAs[Double]("max_err"),
        r.getAs[Double]("corr"))
      assert(mae >= 0.0 && mae < 0.15, s"qid ${r.getLong(0)}: mae $mae")
      assert(mx >= mae && mx < 0.6, s"qid ${r.getLong(0)}: max_err $mx")
      assert(c > 0.5 && c <= 1.0, s"qid ${r.getLong(0)}: corr $c")
    }
  }
}
