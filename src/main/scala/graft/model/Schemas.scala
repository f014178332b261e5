package graft.model

import org.apache.spark.sql.types._

/** Declared schemas for the mapwarper pipeline (SURVEY §1.3): no JSON
  * inference anywhere in the engine path.
  *
  * The intermediate NDJSON stream is a tagged union
  * `{type: 'map'|'layer', data: {...}}` (/root/reference/mapwarper.js:160-163,
  * 205-208); `data` here is the superset of the fields either record type
  * carries, so both files read through ONE schema and dispatch on `type`
  * — mirroring the reference's single merged stream
  * (/root/reference/mapwarper.js:423-429).
  */
object Schemas {

  /** GeoJSON Polygon as a nested struct (no native geo type in Spark). */
  val geometryType: StructType = StructType(Seq(
    StructField("type", StringType),
    StructField("coordinates", ArrayType(ArrayType(ArrayType(DoubleType))))))

  val layerErrorType: StructType = StructType(Seq(
    StructField("error", StringType),
    StructField("url", StringType)))

  /** Superset of map-record and layer-record fields (FIXTURES.md A.1/A.2). */
  val dataType: StructType = StructType(Seq(
    StructField("id", LongType),
    StructField("title", StringType),
    StructField("name", StringType),              // layer only
    StructField("description", StringType),
    StructField("uuid", StringType),
    StructField("parent_uuid", StringType),
    StructField("nypl_digital_id", StringType),
    StructField("bbox", StringType),
    StructField("map_type", StringType),
    StructField("status", StringType),
    StructField("mask_status", StringType),
    StructField("transform_options", StringType),
    StructField("depicts_year", StringType),
    StructField("issue_year", StringType),
    StructField("maps_count", IntegerType),       // layer only
    StructField("layerIds", ArrayType(LongType)),
    StructField("layerErrors", ArrayType(layerErrorType)),
    StructField("mask", StringType),
    StructField("gcps", ArrayType(ArrayType(DoubleType))),
    StructField("maskGeometry", geometryType),
    StructField("maskError", StringType)))

  /** One NDJSON line: `{type, data}`. */
  val recordType: StructType = StructType(Seq(
    StructField("type", StringType),
    StructField("data", dataType)))

  /** Output contract (tagged union of object/relation/log — the
    * Space/Time writer records, /root/reference/mapwarper.js:316-320,
    * 338-345, 368-390, 400-414). Unused branches are null; the JSON
    * writer drops nulls (≡ JS dropping undefined on stringify). */
  val objDataType: StructType = StructType(Seq(
    StructField("description", StringType),
    StructField("imageId", StringType),
    StructField("uuid", StringType),
    StructField("parentUuid", StringType),
    StructField("inset", BooleanType),
    StructField("masked", BooleanType),
    StructField("nyplUrl", StringType),
    StructField("tileUrl", StringType),
    StructField("area", DoubleType),
    StructField("gcps", ArrayType(ArrayType(DoubleType))),
    StructField("mapCount", IntegerType),         // layer objects only
    StructField("bbox", ArrayType(DoubleType))))  // layer objects only
}

/** GeoJSON Polygon, typed. */
case class Geometry(`type`: String, coordinates: Seq[Seq[Seq[Double]]])

/** Result of the GCP mask→GeoJSON transform (F12): preserves the
  * in-band error channel (/root/reference/mapwarper.js:89-96). */
case class MaskTransformResult(geometry: Geometry, error: String)
