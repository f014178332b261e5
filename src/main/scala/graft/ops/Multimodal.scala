package graft.ops

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables._

/** Multimodal column plumbing (SURVEY §2.9): media payloads as opaque
  * binary columns with typed metadata, batch feature extraction via
  * mapPartitions (the Scala analogue of mapInPandas batch UDFs).
  *
  * ONE decode kernel behind the [[MediaDecoder]] seam (round-15: q46
  * and q159 share it as the default): [[ImageIODecoder]] is a REAL
  * pixel decoder for the formats the JDK ships readers for
  * (PNG/BMP/GIF/JPEG via javax.imageio — no external codec needed);
  * payloads no reader claims (plus audio/video, whose codecs are not
  * in this container) fall back to [[FakeDecoder]], a deterministic
  * hash mix. Everything around the seam is the real Spark plumbing a
  * 100 TB multimodal pipeline needs: binary column + metadata struct
  * schema, partition-batched decode (decoder initialized once per
  * partition, not per row), and a narrow, column-pruned output schema.
  */
object Multimodal {

  /** Codec seam: one decode kernel behind every media query.
    * [[ImageIODecoder]] (the default everywhere, declared queries
    * included) really decodes what the JDK has readers for and falls
    * back deterministically for the rest; bind a richer
    * implementation here to add audio/video codecs. */
  trait MediaDecoder extends Serializable {
    def features(payload: Array[Byte], dim: Int): Array[Float]
  }

  /** Deterministic fallback decoder: xxhash-style mixing of payload
    * bytes into `dim` floats in [-1, 1]. Not a declared-query surface
    * of its own — it is the undecodable-payload fallback inside
    * [[ImageIODecoder]] (audio/video payloads, corrupt images) and a
    * direct stand-in only in determinism tests. */
  object FakeDecoder extends MediaDecoder {
    def features(payload: Array[Byte], dim: Int): Array[Float] = {
      val out = new Array[Float](dim)
      var h = 0x9E3779B97F4A7C15L
      var i = 0
      while (i < payload.length) {
        h = (h ^ payload(i)) * 0xC2B2AE3D27D4EB4FL
        h = java.lang.Long.rotateLeft(h, 31)
        i += 1
      }
      var j = 0
      while (j < dim) {
        h = (h + 0x9E3779B97F4A7C15L) * 0xBF58476D1CE4E5B9L
        h ^= (h >>> 27)
        out(j) = (h.toDouble / Long.MaxValue.toDouble).toFloat
        j += 1
      }
      out
    }
  }

  /** Real pure-JVM image decoder (javax.imageio — PNG/BMP/GIF/JPEG
    * readers ship with the JDK): decodes pixels and pools mean
    * luminance (Rec.601) per band of the row-major pixel stream into
    * `dim` floats in [0, 1] (pixel-index banding keeps every band
    * populated even when the image has fewer rows than bands).
    * Payloads no reader recognizes fall back to
    * [[FakeDecoder]] so mixed corpora keep flowing — decode failure
    * must not kill a 100 TB job. */
  object ImageIODecoder extends MediaDecoder {

    /** Magic-byte sniff for the formats the JDK ships readers for.
      * Payloads that can't possibly be one skip ImageIO entirely:
      * reader discovery (ImageInputStream + SPI iteration) costs real
      * time PER PAYLOAD, and a mixed 100 TB corpus is mostly
      * non-image bytes — paying it per text document made q46 ×3.9
      * the moment this decoder became the default (round-15 bench
      * diff). Real codecs sniff exactly this way. */
    private def looksLikeImage(p: Array[Byte]): Boolean =
      p.length >= 4 && (
        (p(0) == 0x89.toByte && p(1) == 'P' && p(2) == 'N' && p(3) == 'G') ||
        (p(0) == 0xFF.toByte && p(1) == 0xD8.toByte && p(2) == 0xFF.toByte) ||
        (p(0) == 'G' && p(1) == 'I' && p(2) == 'F' && p(3) == '8') ||
        (p(0) == 'B' && p(1) == 'M') ||
        (p(0) == 'I' && p(1) == 'I' && p(2) == 0x2A.toByte && p(3) == 0) ||
        (p(0) == 'M' && p(1) == 'M' && p(2) == 0 && p(3) == 0x2A.toByte))

    def features(payload: Array[Byte], dim: Int): Array[Float] = {
      val img =
        // NonFatal, not just IOException: a reader that CLAIMS a
        // corrupt payload throws RuntimeExceptions (CMMException on a
        // bad ICC profile, AIOOBE/NegativeArraySize on crafted GIF/BMP
        // headers) — all must fall back, per the contract above
        if (!looksLikeImage(payload)) null
        else try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
        catch { case scala.util.control.NonFatal(_) => null }
      if (img == null) FakeDecoder.features(payload, dim)
      else {
        val out = new Array[Float](dim)
        val counts = new Array[Int](dim)
        val h = img.getHeight
        val w = img.getWidth
        val n = w.toLong * h
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val band = math.min(dim - 1, (((y.toLong * w + x) * dim) / n).toInt)
            val rgb = img.getRGB(x, y)
            val lum = (((rgb >> 16) & 0xFF) * 299 + ((rgb >> 8) & 0xFF) * 587 +
              (rgb & 0xFF) * 114) / 1000.0f
            out(band) += lum / 255.0f
            counts(band) += 1
            x += 1
          }
          y += 1
        }
        var i = 0
        while (i < dim) { if (counts(i) > 0) out(i) /= counts(i); i += 1 }
        out
      }
    }
  }

  val mediaSchema: StructType = StructType(Seq(
    StructField("payload", BinaryType, nullable = false),
    StructField("meta", StructType(Seq(
      StructField("mime", StringType, nullable = false),
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("duration_ms", LongType, nullable = true))), nullable = false)))

  /** Packs documents into a multimodal frame: opaque binary payload +
    * typed metadata struct (mime/width/height/duration). A null-text
    * document packs as an EMPTY payload — mediaSchema declares payload
    * non-null, and a null would NPE both decoders' payload.length and
    * the phash digest, killing the whole query on one bad row
    * (round-14 review; both decoders handle zero-length payloads). */
  def packMedia(df: DataFrame): DataFrame =
    df.select(
      col("doc_id"),
      struct(
        encode(coalesce(col("text"), lit("")), "UTF-8").as("payload"),
        struct(
          lit("application/x-fake-image").as("mime"),
          (col("n_chars") % 1024).cast("int").as("width"),
          ((col("n_chars") / 1024) % 1024 + 1).cast("int").as("height"),
          lit(null).cast("long").as("duration_ms")).as("meta")).as("media"),
      col("source"))

  val FeatureDim = 8

  /** Batch feature extraction: one decoder per partition, iterator-to-
    * iterator (streaming, no partition materialization). */
  def extractFeatures(packed: DataFrame,
                      decoder: MediaDecoder = ImageIODecoder): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("source", StringType, nullable = true),
      StructField("width", IntegerType, nullable = true),
      StructField("feature", ArrayType(FloatType, containsNull = false), nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    packed.mapPartitions { rows =>
      // decoder "session" initialized once per partition (the expensive
      // part for a real codec); rows stream through it
      val dec = decoder
      rows.map { r =>
        val media = r.getStruct(r.fieldIndex("media"))
        val payload = media.getAs[Array[Byte]]("payload")
        val meta = media.getStruct(media.fieldIndex("meta"))
        Row(r.getLong(r.fieldIndex("doc_id")),
            r.getAs[String]("source"),
            meta.getAs[Integer]("width"),
            dec.features(payload, FeatureDim))
      }
    }(enc)
  }

  /** Frame sampling: slice the payload into `n` evenly-spaced fixed-size
    * "frames" (the video-pipeline shape: the decode stub stands in for a
    * codec, the slicing/schema/explode plumbing is real). One row per
    * (doc, frame) with the frame payload as binary. */
  def frameSample(packed: DataFrame, n: Int, frameBytes: Int): DataFrame = {
    // n = 0 would make sequence(0, -1) COUNT DOWN (step inference) and
    // emit frame_idx -1, whose negative offset substring reads from
    // the payload's END — silently wrong frames, not zero frames
    require(n >= 1, s"frameSample needs n >= 1 frames, got $n")
    val total = length(col("media.payload"))
    val idx = explode(sequence(lit(0), lit(n - 1))).as("frame_idx")
    packed
      .select(col("doc_id"), col("media"), idx)
      // evenly-spaced offsets over the payload; substring on binary is
      // positional (1-based), codegen'd — no UDF in the slicing path
      .withColumn("offset",
        // 64-bit arithmetic: frame_idx * (total - frameBytes) wraps a
        // 32-bit int for payloads past ~2GB/n, and a negative offset
        // makes substring count from the END — silently wrong frames.
        // The span floor is 0, not 1 (round-14 review): for payloads
        // ≤ frameBytes every frame is the whole payload from offset 1,
        // and a floor of 1 shifted the LAST frame to offset 2, quietly
        // dropping its first byte.
        (col("frame_idx").cast("long") *
          greatest(total.cast("long") - frameBytes, lit(0L))
          / lit(math.max(n - 1, 1).toLong)).cast("long") + 1)
      .withColumn("frame",
        expr(s"substring(media.payload, offset, $frameBytes)"))
      .select(col("doc_id"), col("frame_idx"), col("offset"), col("frame"),
              col("media.meta").as("meta"))
  }

  /** "Resize": metadata-level transform of the stubbed decode — scales
    * target dimensions, recomputes features at the new size (the
    * decoder stub keys off payload + dims so output genuinely changes). */
  def resizeMeta(packed: DataFrame, maxDim: Int): DataFrame = {
    val w = col("media.meta.width"); val h = col("media.meta.height")
    val scale = least(lit(1.0), lit(maxDim) / greatest(w, h).cast("double"))
    packed.select(
      col("doc_id"),
      col("media"),
      (w * scale).cast("int").as("out_width"),
      (h * scale).cast("int").as("out_height"))
  }

  /** Perceptual-hash dim: 64 sign bits over 64 luminance bands (the
    * classic aHash shape — bit i set iff band i is brighter than the
    * image mean). FeatureDim=8 is for embedding-style features; a
    * dedup key needs the finer grid. */
  val PhashDim = 64

  /** Batch (fp, phash) extraction for media dedup: one pass, one
    * decoder per partition — emits the exact 128-bit payload
    * fingerprint and the 64-bit perceptual hash per doc. A one-pixel
    * retouch keeps the phash (the band mean barely moves) while the
    * md5 changes — exactly the near-dup class exact dedup misses. */
  def extractPhash(packed: DataFrame,
                   decoder: MediaDecoder = ImageIODecoder): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("fp", StringType, nullable = false),
      StructField("phash", LongType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    packed.mapPartitions { rows =>
      val dec = decoder
      val md = java.security.MessageDigest.getInstance("MD5")
      rows.map { r =>
        val media = r.getStruct(r.fieldIndex("media"))
        val payload = media.getAs[Array[Byte]]("payload")
        md.reset()
        val fp = md.digest(payload).map(b => f"$b%02x").mkString
        val f = dec.features(payload, PhashDim)
        var mean = 0.0f
        var i = 0
        while (i < f.length) { mean += f(i); i += 1 }
        mean /= f.length
        var h = 0L
        i = 0
        while (i < f.length) { if (f(i) > mean) h |= (1L << i); i += 1 }
        Row(r.getLong(r.fieldIndex("doc_id")), fp, h)
      }
    }(enc)
  }

  /** q159: MEDIA DEDUP via perceptual hash — q30's keeper-decision
    * shape over the multimodal frame: per doc, its phash bucket's
    * keeper (min doc_id), whether the doc is a perceptual duplicate,
    * and whether it's byte-identical to the keeper's payload group.
    * The image-dedup step every multimodal pretraining pipeline runs:
    * is_dup && !is_exact flags retouches/re-encodes ONLY the
    * perceptual bucket catches. (This deliberately unduplicated corpus
    * yields all-keepers — the decision column, not a dup census, is
    * the operator surface; MultimodalSpec plants the dup cases.)
    *
    * 100 TB shape: decode happens once per payload in the partition-
    * batched extraction; the dedup decision is a bucket-keyed window
    * over (8 B phash, 16 B fp, 8 B id) — never payload bytes (q30's
    * discipline on binary columns). Rows-only (mapPartitions decode);
    * MultimodalSpec plants a one-pixel PNG retouch (same bucket,
    * different fp ⇒ perceptual-only dup) and an inverted image
    * (different bucket). */
  def mediaPhashDedup(s: SparkSession, packed: DataFrame,
                      decoder: MediaDecoder = ImageIODecoder): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // is_exact keys on the doc's OWN fp group (not the bucket keeper's
    // fp — round-10 review: a byte copy of a non-keeper would otherwise
    // read as a retouch). Exact implies perceptual: same payload ⇒
    // same phash, and the fp-group min can't precede the bucket min.
    val wP = Window.partitionBy(col("phash"))
    val wF = Window.partitionBy(col("fp"))
    extractPhash(packed, decoder)
      .withColumn("keep_id", min(col("doc_id")).over(wP))
      .withColumn("fp_keep", min(col("doc_id")).over(wF))
      .select(col("doc_id"), col("phash"), col("keep_id"),
        (col("doc_id") =!= col("keep_id")).cast("int").as("is_dup"),
        (col("doc_id") =!= col("fp_keep")).cast("int").as("is_exact"))
      .orderBy(col("doc_id"))
  }

  def q159MediaPhashDedup(s: SparkSession, d: String): DataFrame =
    mediaPhashDedup(s, packMedia(documents(s, d)))

  /** Multimodal pipeline query: pack → batch-decode → per-source feature
    * aggregation. Rows-only check (binary/mapPartitions not in DuckDB). */
  def q46MultimodalFeatures(s: SparkSession, d: String): DataFrame = {
    val feats = extractFeatures(packMedia(documents(s, d)))
    feats
      .select(col("doc_id"), col("source"), col("width"),
        round(Similarity.norm(col("feature").cast("array<double>")), 5).as("feat_norm"))
      .orderBy(col("doc_id"))
  }

  val queries: Seq[(String, (SparkSession, String) => DataFrame, Option[String])] = Seq(
    ("q46_multimodal_features", q46MultimodalFeatures _, None),
    ("q159_media_phash_dedup", q159MediaPhashDedup _, None),
  )
}
