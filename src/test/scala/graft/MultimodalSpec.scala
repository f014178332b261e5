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
