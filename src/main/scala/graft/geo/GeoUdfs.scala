package graft.geo

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions._

import graft.model.{Geometry, MaskTransformResult}

/** Column-level wrappers over the pure geo functions (SURVEY §2.6 A2,
  * F11, F12). Scalar UDFs for the genuinely custom math; everything
  * simpler (bounds checks, counts) stays as built-in expressions in
  * Validate so it remains inside whole-stage codegen. */
object GeoUdfs {

  /** Geodesic WGS84 area in m², rounded to whole m²
    * (turf.area + Math.round semantics, /root/reference/mapwarper.js:364). */
  val areaM2Udf: UserDefinedFunction =
    udf((coords: Seq[Seq[Seq[Double]]]) =>
      if (coords == null) null else java.lang.Long.valueOf(Geo.areaM2(coords)))

  /** Count of polygon self-intersections (turf.kinks semantics,
    * /root/reference/mapwarper.js:250-257). */
  val kinksUdf: UserDefinedFunction =
    udf((coords: Seq[Seq[Seq[Double]]]) =>
      if (coords == null) null else Integer.valueOf(Geo.selfIntersections(coords)))

  /** F12: pixel mask + GCPs → lon/lat GeoJSON Polygon via first-order
    * (affine) GCP fit — the GDAL-free re-implementation of
    * mask-to-geojson (/root/reference/mapwarper.js:84-97). The mask
    * string is "x1,y1 x2,y2 …" pixel pairs; errors are returned in-band
    * (maskError channel), never thrown. */
  val maskToGeometryUdf: UserDefinedFunction =
    udf((mask: String, gcps: Seq[Seq[Double]]) => maskToGeometry(mask, gcps))

  def maskToGeometry(mask: String, gcps: Seq[Seq[Double]]): MaskTransformResult = {
    if (mask == null || mask.trim.isEmpty)
      return MaskTransformResult(null, "empty mask")
    if (gcps == null || gcps.length < 3)
      return MaskTransformResult(null, s"need >= 3 gcps, got ${if (gcps == null) 0 else gcps.length}")
    try {
      val pts = mask.trim.split("\\s+").toSeq.map { pair =>
        val xy = pair.split(",")
        Seq(xy(0).toDouble, xy(1).toDouble)
      }
      if (pts.length < 3) return MaskTransformResult(null, s"mask has ${pts.length} points")
      Geo.gcpAffineFit(gcps) match {
        case None => MaskTransformResult(null, "degenerate gcps: affine fit unsolvable")
        case Some(fit) =>
          val closed = if (pts.head == pts.last) pts else pts :+ pts.head
          val ring = Geo.applyAffine(fit, Seq(closed)).head
          MaskTransformResult(Geometry("Polygon", Seq(ring)), null)
      }
    } catch {
      case e: Exception => MaskTransformResult(null, s"mask parse failed: ${e.getMessage}")
    }
  }

  def areaM2(c: Column): Column = areaM2Udf(c)
  def kinks(c: Column): Column = kinksUdf(c)
  def maskToGeom(mask: Column, gcps: Column): Column = maskToGeometryUdf(mask, gcps)
}
