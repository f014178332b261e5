package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Multimodal

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("packMedia: binary payload + typed metadata struct") {
    val packed = Multimodal.packMedia(
      graft.Tables.documents(spark, TestSpark.sf0001)).cache()
    val schema = packed.schema("media").dataType.asInstanceOf[org.apache.spark.sql.types.StructType]
    assert(schema.fieldNames.toSeq == Seq("payload", "meta"))
    val row = packed.orderBy("doc_id").limit(1).collect().head
    val media = row.getStruct(row.fieldIndex("media"))
    val payload = media.getAs[Array[Byte]]("payload")
    assert(payload.nonEmpty)
    val meta = media.getStruct(media.fieldIndex("meta"))
    assert(meta.getAs[String]("mime") == "application/x-fake-image")
    assert(meta.getAs[Int]("width") >= 0)
  }

  test("feature extraction is deterministic and fixed-dim") {
    val f1 = Multimodal.FakeDecoder.features("hello".getBytes, 8)
    val f2 = Multimodal.FakeDecoder.features("hello".getBytes, 8)
    val f3 = Multimodal.FakeDecoder.features("hellp".getBytes, 8)
    assert(f1.toSeq == f2.toSeq)
    assert(f1.toSeq != f3.toSeq)
    assert(f1.length == 8 && f1.forall(v => v >= -1.0f && v <= 1.0f))
  }

  test("ImageIODecoder decodes real PNG pixels; non-image payloads fall back") {
    import java.awt.image.BufferedImage
    def png(fill: Int => Int): Array[Byte] = {
      val img = new BufferedImage(8, 8, BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 8; x <- 0 until 8) img.setRGB(x, y, fill(y))
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    // solid white: every band's mean luminance is 1.0
    val white = Multimodal.ImageIODecoder.features(png(_ => 0xFFFFFF), 4)
    assert(white.length == 4 && white.forall(v => math.abs(v - 1.0f) < 1e-3))
    // top half black, bottom half white: bands 0-1 ≈ 0, bands 2-3 ≈ 1
    val split = Multimodal.ImageIODecoder.features(
      png(y => if (y < 4) 0x000000 else 0xFFFFFF), 4)
    assert(split(0) < 1e-3 && split(1) < 1e-3, s"top bands ${split.toSeq}")
    assert(math.abs(split(2) - 1.0f) < 1e-3 && math.abs(split(3) - 1.0f) < 1e-3)
    // non-image payload → deterministic fake, bit-identical to FakeDecoder
    val txt = "not an image".getBytes
    assert(Multimodal.ImageIODecoder.features(txt, 8).toSeq ==
      Multimodal.FakeDecoder.features(txt, 8).toSeq)
  }

  test("real-PNG media flows through the mapPartitions extraction plumbing") {
    import java.awt.image.BufferedImage
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val img = new BufferedImage(4, 4, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 4; x <- 0 until 4) img.setRGB(x, y, 0xFFFFFF)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val schema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("media", Multimodal.mediaSchema, nullable = false),
      StructField("source", StringType, nullable = true)))
    val packed = spark.createDataFrame(
      java.util.List.of(
        Row(1L, Row(bos.toByteArray, Row("image/png", 4, 4, null)), "imgs")),
      schema)
    // DEFAULT decoder path — the one q46's declared query runs: real
    // pixels must decode without naming a decoder (round-15: the fake
    // stub is gone from the declared-query surface; one kernel for
    // q46 and q159)
    val feats = Multimodal.extractFeatures(packed).collect()
    assert(feats.length == 1)
    val f = feats.head.getSeq[Float](feats.head.fieldIndex("feature"))
    assert(f.length == Multimodal.FeatureDim)
    assert(f.forall(v => math.abs(v - 1.0f) < 1e-3),
      s"white PNG must decode to all-ones luminance bands, got $f")
    // and q46's feature surface (feat_norm) sees the REAL decode:
    // all-ones bands at dim 8 have L2 norm sqrt(8)
    import org.apache.spark.sql.functions._
    val norm = Multimodal.extractFeatures(packed)
      .select(round(graft.ops.Similarity.norm(col("feature").cast("array<double>")), 5)
        .as("feat_norm"))
      .collect().head.getDouble(0)
    assert(math.abs(norm - math.sqrt(8.0)) < 1e-3,
      s"q46 feat_norm over a white PNG must be sqrt(8), got $norm")
  }

  test("q159 phash dedup: one-pixel retouch is a perceptual-only dup; " +
       "byte copy is exact; inverted image is no dup") {
    import java.awt.image.BufferedImage
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    def png(lum: (Int, Int) => Int): Array[Byte] = {
      val img = new BufferedImage(16, 16, BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 16; x <- 0 until 16) {
        val v = lum(x, y) & 0xFF
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val grad = png((x, y) => (y * 16 + x))                        // base gradient
    val gradCopy = grad.clone()                                   // byte-identical
    val retouch = png((x, y) => if (x == 15 && y == 15) 253 else y * 16 + x)
    val inverted = png((x, y) => 255 - (y * 16 + x))
    assert(!java.util.Arrays.equals(grad, retouch))
    val schema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("media", Multimodal.mediaSchema, nullable = false),
      StructField("source", StringType, nullable = true)))
    def row(id: Long, p: Array[Byte]) =
      Row(id, Row(p, Row("image/png", 16, 16, null)), "imgs")
    val packed = spark.createDataFrame(
      java.util.List.of(row(1L, grad), row(2L, gradCopy),
        row(3L, retouch), row(4L, inverted), row(5L, retouch.clone())), schema)
    val got = Multimodal.mediaPhashDedup(spark, packed, Multimodal.ImageIODecoder)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(2), r.getInt(3), r.getInt(4))).toMap
    assert(got(1L) == ((1L, 0, 0)), s"keeper: ${got(1L)}")
    assert(got(2L) == ((1L, 1, 1)), s"byte copy must be an exact dup: ${got(2L)}")
    assert(got(3L) == ((1L, 1, 0)),
      s"one-pixel retouch: perceptual dup, NOT exact: ${got(3L)}")
    assert(got(4L) == ((4L, 0, 0)), s"inverted image is its own bucket: ${got(4L)}")
    // byte copy of a NON-keeper: exact dup of doc 3's fp group, not a
    // retouch (the round-10 review case)
    assert(got(5L) == ((1L, 1, 1)), s"copy-of-retouch must be exact: ${got(5L)}")
  }

  test("q159 on the real corpus: one decision row per doc, keepers consistent") {
    val rows = Multimodal.q159MediaPhashDedup(spark, TestSpark.sf0001).collect()
    val nDocs = graft.Tables.documents(spark, TestSpark.sf0001).count()
    assert(rows.length == nDocs)
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(0), "keeper is the bucket min")
      if (r.getInt(4) == 1) assert(r.getInt(3) == 1, "exact implies dup")
      if (r.getLong(2) == r.getLong(0)) assert(r.getInt(3) == 0)
    }
  }

  test("frameSample: n frames per doc, in-bounds offsets, binary frames") {
    val packed = Multimodal.packMedia(
      graft.Tables.documents(spark, TestSpark.sf0001))
    val frames = Multimodal.frameSample(packed, 4, 16).cache()
    val nDocs = packed.count()
    assert(frames.count() == nDocs * 4)
    val bad = frames.filter(col("offset") < 1 ||
      length(col("frame")) > 16 || length(col("frame")) < 1)
    assert(bad.count() == 0)
    // frame 0 starts at payload byte 1
    assert(frames.filter(col("frame_idx") === 0 && col("offset") =!= 1).count() == 0)
  }

  test("frameSample: payload shorter than a frame yields n IDENTICAL whole-payload frames") {
    // the old span floor of 1 shifted the LAST frame to offset 2,
    // silently dropping the payload's first byte (round-14 review)
    import spark.implicits._
    val packed = Multimodal.packMedia(
      Seq((1L, "abcd", 4L, "a")).toDF("doc_id", "text", "n_chars", "source"))
    val frames = Multimodal.frameSample(packed, 4, 16)
      .select(col("frame_idx"), col("frame").cast("string").as("f"))
      .collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(frames.size == 4)
    assert(frames.values.forall(_ == "abcd"),
      s"every frame must be the whole payload, got $frames")
    intercept[IllegalArgumentException] { Multimodal.frameSample(packed, 0, 16) }
  }

  test("a null-text document packs as an empty payload and flows through decode + phash") {
    import spark.implicits._
    val packed = Multimodal.packMedia(
      Seq((1L, null.asInstanceOf[String], 0L, "a"),
          (2L, "real text here", 14L, "a")).toDF("doc_id", "text", "n_chars", "source"))
    val feats = Multimodal.extractFeatures(packed).collect()
    assert(feats.length == 2, "the null-text doc must not kill the extraction")
    val ph = Multimodal.extractPhash(packed).collect()
    assert(ph.length == 2 && ph.forall(!_.isNullAt(1)))
  }

  test("resizeMeta: aspect preserved, bounded by maxDim") {
    val packed = Multimodal.packMedia(
      graft.Tables.documents(spark, TestSpark.sf0001))
    val resized = Multimodal.resizeMeta(packed, 64)
    assert(resized.filter(col("out_width") > 64 || col("out_height") > 64).count() == 0)
    // no upscale: dims never exceed the original
    assert(resized.filter(col("out_width") > col("media.meta.width")).count() == 0)
  }

  test("writeTagged sink: per-type partitions, null keys dropped") {
    val out = java.nio.file.Files.createTempDirectory("tagged-out").toString
    val tagged = graft.ops.Mapwarper.pipeline(
      graft.ops.Mapwarper.parseRecords(spark, graft.ops.MapwarperFixture.allLines))
    graft.ops.Mapwarper.writeTagged(tagged, out)
    val dirs = new java.io.File(out).listFiles().filter(_.isDirectory).map(_.getName).sorted
    assert(dirs.sameElements(Array("type=log", "type=object", "type=relation")))
    val rel = spark.read.text(s"$out/type=relation").collect().map(_.getString(0))
    assert(rel.nonEmpty && rel.forall(l => l.contains("\"from\"") && !l.contains("\"name\"")))
  }

  test("q46 pipeline: one feature row per document, stable norms") {
    val out = Multimodal.q46MultimodalFeatures(spark, TestSpark.sf0001).cache()
    val nDocs = graft.Tables.documents(spark, TestSpark.sf0001).count()
    assert(out.count() == nDocs)
    assert(out.filter(col("feat_norm") <= 0).count() == 0)
    // deterministic across runs
    val again = Multimodal.q46MultimodalFeatures(spark, TestSpark.sf0001)
    assert(out.exceptAll(again).count() == 0)
  }
}
