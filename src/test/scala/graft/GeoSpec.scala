package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.geo.{Geo, GeoUdfs}

class GeoSpec extends AnyFunSuite {

  // ~0.1°×0.1° square near NYC: closed ring, [lon, lat]
  val square: Seq[Seq[Double]] = Seq(
    Seq(-74.0, 40.8), Seq(-73.9, 40.8), Seq(-73.9, 40.7),
    Seq(-74.0, 40.7), Seq(-74.0, 40.8))

  test("geodesic area of 0.1-degree square near 40.75N is ~93.7 km2") {
    val a = Geo.polygonArea(Seq(square))
    // 0.1° lon at 40.75N ≈ 8.43 km; 0.1° lat ≈ 11.1 km ⇒ ~93.6e6 m²
    assert(a > 88e6 && a < 100e6, s"area was $a")
  }

  test("area is invariant under ring rotation") {
    val rotated = square.drop(1) ++ Seq(square(1)) // rotate closed ring
    val r = rotated.dropRight(1)
    val closed = (r.drop(2) ++ r.take(2)) :+ r(2)
    assert(math.abs(Geo.polygonArea(Seq(square)) -
      math.abs(Geo.ringArea(closed))) / Geo.polygonArea(Seq(square)) < 1e-9)
  }

  test("area of polygon with hole subtracts the hole") {
    val hole = Seq(Seq(-73.98, 40.78), Seq(-73.92, 40.78), Seq(-73.92, 40.72),
                   Seq(-73.98, 40.72), Seq(-73.98, 40.78))
    val withHole = Geo.polygonArea(Seq(square, hole))
    assert(withHole < Geo.polygonArea(Seq(square)))
    assert(math.abs(withHole - (Geo.polygonArea(Seq(square)) - Geo.polygonArea(Seq(hole)))) < 1.0)
  }

  test("degenerate rings have zero area") {
    assert(Geo.ringArea(Seq(Seq(0.0, 0.0), Seq(1.0, 1.0))) == 0.0)
  }

  test("square has no self-intersections; bowtie does") {
    assert(Geo.selfIntersections(Seq(square)) == 0)
    val bowtie = Seq(Seq(0.0, 0.0), Seq(1.0, 1.0), Seq(1.0, 0.0), Seq(0.0, 1.0), Seq(0.0, 0.0))
    assert(Geo.selfIntersections(Seq(bowtie)) > 0)
  }

  test("coordinate validity bounds") {
    assert(Geo.coordValid(-180, -90) && Geo.coordValid(180, 90) && Geo.coordValid(0, 0))
    assert(!Geo.coordValid(-180.01, 0) && !Geo.coordValid(0, 90.5))
    assert(Geo.allCoordsValid(Seq(square)))
    assert(!Geo.allCoordsValid(Seq(Seq(Seq(200.0, 40.0), Seq(0.0, 0.0)))))
  }

  test("affine GCP fit recovers an exact affine mapping") {
    // lon = 1e-4·x − 74, lat = −1.25e-4·y + 40.8  (gcps are [x, y, lat, lon])
    val gcps = Seq(
      Seq(0.0, 0.0, 40.8, -74.0), Seq(1000.0, 0.0, 40.8, -73.9),
      Seq(1000.0, 800.0, 40.7, -73.9), Seq(0.0, 800.0, 40.7, -74.0))
    val fit = Geo.gcpAffineFit(gcps).get
    val out = Geo.applyAffine(fit, Seq(Seq(Seq(500.0, 400.0))))
    assert(math.abs(out.head.head.head - (-73.95)) < 1e-9)
    assert(math.abs(out.head.head(1) - 40.75) < 1e-9)
  }

  test("affine fit rejects < 3 or collinear gcps") {
    assert(Geo.gcpAffineFit(Seq(Seq(0.0, 0.0, 1.0, 1.0), Seq(1.0, 1.0, 2.0, 2.0))).isEmpty)
    val collinear = Seq(
      Seq(0.0, 0.0, 1.0, 1.0), Seq(1.0, 1.0, 2.0, 2.0), Seq(2.0, 2.0, 3.0, 3.0))
    assert(Geo.gcpAffineFit(collinear).isEmpty)
  }

  test("maskToGeometry end-to-end: pixel mask + gcps -> lon/lat polygon") {
    val gcps = Seq(
      Seq(0.0, 0.0, 40.8, -74.0), Seq(1000.0, 0.0, 40.8, -73.9),
      Seq(1000.0, 800.0, 40.7, -73.9))
    val res = GeoUdfs.maskToGeometry("0,0 1000,0 1000,800 0,800", gcps)
    assert(res.error == null)
    assert(res.geometry.`type` == "Polygon")
    val ring = res.geometry.coordinates.head
    assert(ring.length == 5) // auto-closed
    assert(math.abs(ring.head.head - (-74.0)) < 1e-9)
    assert(math.abs(ring(2)(1) - 40.7) < 1e-9)
  }

  test("maskToGeometry error channel: too few gcps, bad mask") {
    assert(GeoUdfs.maskToGeometry("0,0 1,0 1,1", Seq(Seq(0.0, 0.0, 1.0, 1.0))).error != null)
    assert(GeoUdfs.maskToGeometry("", Seq()).error != null)
    assert(GeoUdfs.maskToGeometry("not,numbers oops", Seq(
      Seq(0.0, 0.0, 40.8, -74.0), Seq(1000.0, 0.0, 40.8, -73.9),
      Seq(1000.0, 800.0, 40.7, -73.9))).error != null)
  }
}
