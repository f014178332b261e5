package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.HdrQuantileAgg.{hdrMergeQuantiles, hdrQuantiles, hdrSketch}
import graft.ops.Quality

/** Mergeable HDR-histogram quantile sketch (q184/q185): bucket-edge
  * readout properties, partition/merge-order independence, the
  * persisted-rollup identity, and the error bound vs exact ranks. */
class HdrSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf0001

  test("readout of a single value is its bucket lower bound: exact below 64, ≤ 1/64 off above") {
    import spark.implicits._
    val sweep = (0L to 70L) ++ Seq(127L, 128L, 129L, 1000L, 4095L, 4096L,
      65535L, 1000000L, (1L << 39) + 12345L)
    val got = sweep.toDF("v")
      .groupBy(col("v")).agg(hdrQuantiles(col("v"), Seq(1.0)).as("q"))
      .select(col("v"), col("q")(0).as("lb")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    sweep.foreach { v =>
      val lb = got(v)
      assert(lb <= v, s"$v: lower bound $lb must not exceed the value")
      if (v < 64) assert(lb == v, s"$v: unit range is exact")
      else assert(v - lb <= math.max(1L, v / 64),
        s"$v: bucket width exceeded (lb=$lb)")
    }
  }

  test("values beyond the tracked range saturate into the top octave, not crash") {
    import spark.implicits._
    val big = Seq(3L << 41, Long.MaxValue / 2).toDF("v")
    val lb = big.agg(hdrQuantiles(col("v"), Seq(1.0)).as("q"))
      .select(col("q")(0)).collect().head.getLong(0)
    assert(lb >= (1L << 39) && lb <= (1L << 40),
      s"saturated readout must sit in the top tracked octave, got $lb")
  }

  test("estimate is independent of partitioning") {
    val docs = Tables.documents(spark, sf)
    val direct = docs.repartition(1).groupBy(col("source"))
      .agg(hdrQuantiles(col("n_chars"), Quality.HdrQs).as("q"))
      .orderBy(col("source")).collect().map(_.getSeq[Long](1)).toSeq
    val shuffled = docs.repartition(13).groupBy(col("source"))
      .agg(hdrQuantiles(col("n_chars"), Quality.HdrQs).as("q"))
      .orderBy(col("source")).collect().map(_.getSeq[Long](1)).toSeq
    assert(direct == shuffled, "merge order must not change any readout")
  }

  test("persisted rollup ≡ direct pass (lossless histogram merge)") {
    val docs = Tables.documents(spark, sf)
    val rolled = Quality.q185HdrRollup(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val direct = docs.groupBy(col("lang"))
      .agg(hdrQuantiles(col("n_chars"), Quality.HdrQs).as("q"))
      .collect().map(r => r.getString(0) ->
        (r.getSeq[Long](1)(0), r.getSeq[Long](1)(1), r.getSeq[Long](1)(2))).toMap
    val all = docs.agg(hdrQuantiles(col("n_chars"), Quality.HdrQs).as("q"))
      .collect().map(r =>
        (r.getSeq[Long](0)(0), r.getSeq[Long](0)(1), r.getSeq[Long](0)(2))).head
    direct.foreach { case (lang, v) =>
      assert(rolled(lang) == v, s"$lang: rollup ${rolled(lang)} != direct $v")
    }
    assert(rolled("ALL") == all, s"ALL row: ${rolled("ALL")} != direct $all")
  }

  test("two persisted sketch groups merge to the union's sketch") {
    import spark.implicits._
    val xs = (1L to 500L).map(v => (if (v % 2 == 0) "a" else "b", v * 7 % 1000))
    val parts = xs.toDF("g", "v").groupBy(col("g"))
      .agg(hdrSketch(col("v")).as("sk"))
    val merged = parts.agg(hdrMergeQuantiles(col("sk"), Seq(0.5, 0.99)).as("q"))
      .select(col("q")).collect().head.getSeq[Long](0)
    val direct = xs.toDF("g", "v")
      .agg(hdrQuantiles(col("v"), Seq(0.5, 0.99)).as("q"))
      .select(col("q")).collect().head.getSeq[Long](0)
    assert(merged == direct)
  }

  test("q184 matches exact rank targets within one bucket width") {
    val exact = Tables.documents(spark, sf).select(col("source"), col("n_chars"))
      .collect().groupBy(_.getString(0))
      .map { case (s, rs) => s -> rs.map(_.getLong(1)).sorted }
    Quality.q184HdrQuantiles(spark, sf).collect().foreach { r =>
      val vs = exact(r.getString(0))
      Seq("p50" -> 0.5, "p90" -> 0.9, "p99" -> 0.99).foreach { case (cn, q) =>
        val want = vs(math.max(1, math.ceil(q * vs.length).toLong).toInt - 1)
        val got = r.getAs[Long](cn)
        assert(got <= want && want - got <= math.max(1L, want / 64),
          s"${r.getString(0)} $cn: sketch $got vs exact $want")
      }
    }
  }

  test("wrong-typed children fail at ANALYSIS, not per-row at execution") {
    import spark.implicits._
    val doubles = Seq(3.7, 1.2).toDF("v")
    // a double child would silently truncate 3.7→3 and skew quantiles
    val e1 = intercept[org.apache.spark.sql.AnalysisException] {
      doubles.agg(hdrQuantiles(col("v"), Seq(0.5))).collect()
    }
    assert(e1.getMessage.contains("integral"), e1.getMessage)
    val e2 = intercept[org.apache.spark.sql.AnalysisException] {
      doubles.agg(hdrSketch(col("v"))).collect()
    }
    assert(e2.getMessage.contains("integral"), e2.getMessage)
    // merge over a non-binary (not-a-stored-sketch) column
    val e3 = intercept[org.apache.spark.sql.AnalysisException] {
      Seq(1L).toDF("v").agg(hdrMergeQuantiles(col("v"), Seq(0.5))).collect()
    }
    assert(e3.getMessage.contains("binary sketch"), e3.getMessage)
    // the explicit cast is the sanctioned path
    assert(doubles.agg(hdrQuantiles(col("v").cast("long"), Seq(1.0)))
      .collect().head.getSeq[Long](0).head == 3L)
  }

  test("multi-quantile readout equals the per-q readout, in caller order") {
    import graft.functions.Hdr
    val buf = new Array[Long](Hdr.Size)
    Seq(1L, 5L, 5L, 63L, 100L, 5000L, 123456L).foreach(Hdr.update(buf, _))
    // deliberately UNSORTED qs: the one-pass walk must restore caller order
    val qs = Seq(0.99, 0.1, 0.5, 1.0, 0.9)
    assert(Hdr.quantiles(buf, qs).toSeq == qs.map(Hdr.quantile(buf, _)),
      "one-pass readout must match the per-quantile walk positionally")
    assert(Hdr.quantiles(new Array[Long](Hdr.Size), qs).toSeq ==
      Seq.fill(qs.length)(0L), "empty sketch reads zeros, like quantile()")
  }

  test("truncated or index-corrupt stored sketches fail fast with a named error") {
    import graft.functions.Hdr
    val buf = new Array[Long](Hdr.Size)
    Hdr.update(buf, 100L); Hdr.update(buf, 7L)
    val bytes = Hdr.toBytes(buf)
    // cut mid-pairs: valid header, missing payload — must not be a raw
    // BufferUnderflowException after partially mutating the target
    val truncated = java.util.Arrays.copyOf(bytes, bytes.length - 6)
    val e1 = intercept[IllegalArgumentException] { Hdr.fromBytes(truncated) }
    assert(e1.getMessage.contains("truncated"), e1.getMessage)
    // corrupt a pair's bucket index out of range
    val forged = bytes.clone()
    java.nio.ByteBuffer.wrap(forged).putInt(8, Hdr.Size + 3)
    val e2 = intercept[IllegalArgumentException] { Hdr.fromBytes(forged) }
    assert(e2.getMessage.contains("bucket index"), e2.getMessage)
  }

  test("stored sketches from a different precision fail fast, never mis-bucket") {
    import graft.functions.Hdr
    val buf = new Array[Long](Hdr.Size)
    buf(Hdr.indexOf(100L)) = 5L
    val bytes = Hdr.toBytes(buf)
    assert(java.util.Arrays.equals(Hdr.toBytes(Hdr.fromBytes(bytes)), bytes),
      "codec round-trips")
    // forge a sketch written by a build with a different Size header
    val bb = java.nio.ByteBuffer.wrap(bytes.clone())
    bb.putInt(0, Hdr.Size + 64)
    val e = intercept[IllegalArgumentException] { Hdr.fromBytes(bb.array()) }
    assert(e.getMessage.contains("layout mismatch"),
      s"wrong-precision sketch must be rejected, got: ${e.getMessage}")
  }
}
