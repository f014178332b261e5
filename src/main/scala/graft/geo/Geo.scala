package graft.geo

/** Pure geospatial functions for the mapwarper pipeline (SURVEY §2.6).
  *
  * All algorithms are re-implementations of public, documented formulas:
  *  - geodesic polygon area: the WGS84 spherical-excess approximation
  *    used by `turf.area` / Mapbox geojson-area (reference dependency at
  *    /root/reference/package.json:21) — published in Chamberlain &
  *    Duquette, "Some algorithms for polygons on a sphere" (JPL, 2007).
  *  - self-intersection (kink) detection: classic O(n²) pairwise
  *    segment-intersection sweep, semantics of `turf.kinks` (reference
  *    dependency /root/reference/package.json:23, used at
  *    /root/reference/mapwarper.js:250-257).
  *  - GCP fitting: first-order polynomial (6-parameter affine) least
  *    squares, the GDAL `-order 1` model the reference invokes through
  *    mask-to-geojson (/root/reference/mapwarper.js:84-97) — solved here
  *    directly via 3×3 normal equations, no native libs.
  *
  * Everything operates on GeoJSON-shaped nested arrays:
  * ring = Seq[Seq[Double]] of [lon, lat] points (closed: first == last).
  */
object Geo {

  val WGS84Radius = 6378137.0

  private def rad(x: Double): Double = x * math.Pi / 180.0

  /** Spherical ring area (signed) — Chamberlain–Duquette approximation
    * on the WGS84 sphere; same semantics as Mapbox geojson-area. */
  def ringArea(ring: Seq[Seq[Double]]): Double = {
    val n = ring.length
    if (n <= 2) return 0.0
    var area = 0.0
    var i = 0
    while (i < n) {
      val p1 = ring(i)
      val p2 = ring((i + 1) % n)
      area += (rad(p2.head) - rad(p1.head)) * (2 + math.sin(rad(p1(1))) + math.sin(rad(p2(1))))
      i += 1
    }
    area * WGS84Radius * WGS84Radius / 2.0
  }

  /** Geodesic polygon area in m²: |outer ring| − Σ|holes|
    * (turf.area semantics for a GeoJSON Polygon's coordinates). */
  def polygonArea(coordinates: Seq[Seq[Seq[Double]]]): Double =
    coordinates match {
      case outer +: holes =>
        math.abs(ringArea(outer)) - holes.map(h => math.abs(ringArea(h))).sum
      case _ => 0.0
    }

  /** Geodesic area of a full (Multi)Polygon coordinate set, rounded to
    * whole m² as the reference does (Math.round(turf.area(...)),
    * /root/reference/mapwarper.js:364). */
  def areaM2(coordinates: Seq[Seq[Seq[Double]]]): Long =
    math.round(polygonArea(coordinates))

  /** lon ∈ [-180, 180] ∧ lat ∈ [-90, 90]
    * (/root/reference/mapwarper.js:261-266). */
  def coordValid(lon: Double, lat: Double): Boolean =
    lon >= -180.0 && lon <= 180.0 && lat >= -90.0 && lat <= 90.0

  def allCoordsValid(coordinates: Seq[Seq[Seq[Double]]]): Boolean =
    coordinates.forall(_.forall(p => coordValid(p.head, p(1))))

  /** Proper-intersection test between segments p1-p2 and p3-p4,
    * including collinear-overlap and endpoint-touch cases, but the
    * caller excludes adjacent segments (which legitimately share an
    * endpoint in a ring). */
  private def segmentsIntersect(p1: Seq[Double], p2: Seq[Double],
                                p3: Seq[Double], p4: Seq[Double]): Boolean = {
    def cross(ox: Double, oy: Double, ax: Double, ay: Double, bx: Double, by: Double): Double =
      (ax - ox) * (by - oy) - (ay - oy) * (bx - ox)
    val d1 = cross(p3.head, p3(1), p4.head, p4(1), p1.head, p1(1))
    val d2 = cross(p3.head, p3(1), p4.head, p4(1), p2.head, p2(1))
    val d3 = cross(p1.head, p1(1), p2.head, p2(1), p3.head, p3(1))
    val d4 = cross(p1.head, p1(1), p2.head, p2(1), p4.head, p4(1))
    if (((d1 > 0 && d2 < 0) || (d1 < 0 && d2 > 0)) &&
        ((d3 > 0 && d4 < 0) || (d3 < 0 && d4 > 0))) return true
    def onSeg(ax: Double, ay: Double, bx: Double, by: Double, px: Double, py: Double): Boolean =
      math.min(ax, bx) <= px && px <= math.max(ax, bx) &&
      math.min(ay, by) <= py && py <= math.max(ay, by)
    (d1 == 0 && onSeg(p3.head, p3(1), p4.head, p4(1), p1.head, p1(1))) ||
    (d2 == 0 && onSeg(p3.head, p3(1), p4.head, p4(1), p2.head, p2(1))) ||
    (d3 == 0 && onSeg(p1.head, p1(1), p2.head, p2(1), p3.head, p3(1))) ||
    (d4 == 0 && onSeg(p1.head, p1(1), p2.head, p2(1), p4.head, p4(1)))
  }

  /** Count of self-intersection features, turf.kinks semantics: turf
    * compares every ORDERED pair of segments (i vs j AND j vs i,
    * /root/reference/package.json:23 → @turf/kinks), so each crossing
    * contributes 2 features — the reference's log message embeds that
    * feature count, hence the ×2 here. Adjacent segments (sharing a
    * ring vertex) and the ring-closing adjacency are skipped. */
  def selfIntersections(coordinates: Seq[Seq[Seq[Double]]]): Int = {
    var count = 0
    for (ring <- coordinates) {
      val n = ring.length - 1 // closed ring: last point == first
      var i = 0
      while (i < n) {
        var j = i + 2
        while (j < n) {
          val adjacentViaClosure = i == 0 && j == n - 1
          if (!adjacentViaClosure &&
              segmentsIntersect(ring(i), ring(i + 1), ring(j), ring(j + 1)))
            count += 2 // one kink feature per segment ordering
          j += 1
        }
        i += 1
      }
    }
    count
  }

  /** First-order polynomial (affine) GCP fit by least squares.
    * GCPs are rows [pixelX, pixelY, lat, lon] (the reference's gcps
    * shape, /root/reference/mapwarper.js:95 + mapwarper.dataset.json:123-149).
    * Returns (a,b,c,d,e,f) with lon = a·x + b·y + c, lat = d·x + e·y + f,
    * or None when < 3 GCPs or a degenerate (collinear) configuration. */
  def gcpAffineFit(gcps: Seq[Seq[Double]]): Option[Array[Double]] = {
    if (gcps.length < 3) return None
    // normal equations: M · [p,q,r]ᵀ = v for each target dimension
    var sxx = 0.0; var sxy = 0.0; var sx = 0.0
    var syy = 0.0; var sy = 0.0; var n = 0.0
    var sxLon = 0.0; var syLon = 0.0; var sLon = 0.0
    var sxLat = 0.0; var syLat = 0.0; var sLat = 0.0
    gcps.foreach { g =>
      val x = g.head; val y = g(1); val lat = g(2); val lon = g(3)
      sxx += x * x; sxy += x * y; sx += x
      syy += y * y; sy += y; n += 1
      sxLon += x * lon; syLon += y * lon; sLon += lon
      sxLat += x * lat; syLat += y * lat; sLat += lat
    }
    val m = Array(Array(sxx, sxy, sx), Array(sxy, syy, sy), Array(sx, sy, n))
    def solve3(a: Array[Array[Double]], b: Array[Double]): Option[Array[Double]] = {
      val aa = a.map(_.clone()); val bb = b.clone()
      var col = 0
      while (col < 3) {
        var piv = col
        var r = col + 1
        while (r < 3) { if (math.abs(aa(r)(col)) > math.abs(aa(piv)(col))) piv = r; r += 1 }
        if (math.abs(aa(piv)(col)) < 1e-12) return None
        val tmp = aa(col); aa(col) = aa(piv); aa(piv) = tmp
        val tb = bb(col); bb(col) = bb(piv); bb(piv) = tb
        r = col + 1
        while (r < 3) {
          val f = aa(r)(col) / aa(col)(col)
          var c = col
          while (c < 3) { aa(r)(c) -= f * aa(col)(c); c += 1 }
          bb(r) -= f * bb(col)
          r += 1
        }
        col += 1
      }
      val x = new Array[Double](3)
      var i = 2
      while (i >= 0) {
        var s = bb(i)
        var j = i + 1
        while (j < 3) { s -= aa(i)(j) * x(j); j += 1 }
        x(i) = s / aa(i)(i)
        i -= 1
      }
      Some(x)
    }
    for {
      lonC <- solve3(m, Array(sxLon, syLon, sLon))
      latC <- solve3(m, Array(sxLat, syLat, sLat))
    } yield Array(lonC(0), lonC(1), lonC(2), latC(0), latC(1), latC(2))
  }

  /** Applies an affine fit to a pixel-space ring set → lon/lat rings. */
  def applyAffine(fit: Array[Double],
                  pixelRings: Seq[Seq[Seq[Double]]]): Seq[Seq[Seq[Double]]] =
    pixelRings.map(_.map { p =>
      val x = p.head; val y = p(1)
      Seq(fit(0) * x + fit(1) * y + fit(2), fit(3) * x + fit(4) * y + fit(5))
    })
}
