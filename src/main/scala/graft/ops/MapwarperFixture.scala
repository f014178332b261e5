package graft.ops

/** Embedded NDJSON fixture for the mapwarper pipeline (FIXTURES.md §A):
  * one row per getLogs rule (/root/reference/mapwarper.js:221-321), plus
  * silently-dropped rows (non-is_map, null bbox), an inset-uuid row, a
  * year-coalesce row, and a relation-less row. Tests write these lines
  * to temp NDJSON files to exercise the file scan; `entry` parses them
  * in-memory.
  */
object MapwarperFixture {

  private def sq(lonW: Double, latS: Double, lonE: Double, latN: Double): String =
    s"""{"type":"Polygon","coordinates":[[[$lonW,$latN],[$lonE,$latN],[$lonE,$latS],[$lonW,$latS],[$lonW,$latN]]]}"""

  private val gcps = """[[0,0,40.8,-74.0],[1000,0,40.8,-73.9],[1000,800,40.7,-73.9],[0,800,40.7,-74.0]]"""

  // ids: 1 clean+layers, 2 missing_uuid, 3 short ring, 4 bowtie kink,
  // 5 invalid coords, 6 multipolygon, 7 maskError, 8 warped_but_unmasked,
  // 9 unwarped_but_masked, 10 mask_missing fallback, 11 wrong map_type
  // (dropped), 12 null bbox (dropped), 13 inset uuid, 14 issue_year only,
  // 15 clean without layerIds
  val mapLines: Seq[String] = Seq(
    s"""{"type":"map","data":{"id":1,"title":"Map One","description":"desc one","uuid":"uuid-1","parent_uuid":"parent-1","nypl_digital_id":"img-1","bbox":"-74.0,40.7,-73.9,40.8","map_type":"is_map","status":"warped","mask_status":"masked","depicts_year":"1893","issue_year":"1900","layerIds":[10,11],"gcps":$gcps,"maskGeometry":${sq(-74.0, 40.7, -73.9, 40.8)}}}""",
    s"""{"type":"map","data":{"id":2,"title":"No UUID","description":"d2","nypl_digital_id":"img-2","bbox":"-74,40,-73,41","map_type":"is_map","status":"warped","mask_status":"masked","maskGeometry":${sq(-74.0, 40.0, -73.0, 41.0)}}}""",
    """{"type":"map","data":{"id":3,"title":"Short Ring","uuid":"uuid-3","nypl_digital_id":"img-3","bbox":"-74,40,-73,41","map_type":"is_map","status":"warped","mask_status":"masked","maskGeometry":{"type":"Polygon","coordinates":[[[-74.0,40.0],[-73.0,40.0],[-74.0,40.0]]]}}}""",
    """{"type":"map","data":{"id":4,"title":"Bowtie","uuid":"uuid-4","nypl_digital_id":"img-4","bbox":"-74,40,-73,41","map_type":"is_map","status":"warped","mask_status":"masked","maskGeometry":{"type":"Polygon","coordinates":[[[0.0,0.0],[1.0,1.0],[1.0,0.0],[0.0,1.0],[0.0,0.0]]]}}}""",
    """{"type":"map","data":{"id":5,"title":"Bad Coords","uuid":"uuid-5","nypl_digital_id":"img-5","bbox":"-74,40,-73,41","map_type":"is_map","status":"warped","mask_status":"masked","maskGeometry":{"type":"Polygon","coordinates":[[[200.0,40.0],[201.0,40.0],[201.0,41.0],[200.0,41.0],[200.0,40.0]]]}}}""",
    s"""{"type":"map","data":{"id":6,"title":"Multi","uuid":"uuid-6","nypl_digital_id":"img-6","bbox":"-74,40,-73,41","map_type":"is_map","status":"warped","mask_status":"masked","maskGeometry":{"type":"Polygon","coordinates":[[[-74.0,40.8],[-73.9,40.8],[-73.9,40.7],[-74.0,40.7],[-74.0,40.8]],[[-73.5,40.8],[-73.4,40.8],[-73.4,40.7],[-73.5,40.7],[-73.5,40.8]]]}}}""",
    """{"type":"map","data":{"id":7,"title":"Mask Err","uuid":"uuid-7","nypl_digital_id":"img-7","bbox":"-74,40,-73,41","map_type":"is_map","status":"warped","mask_status":"masked","maskError":"mask-to-geojson: GDAL transform failed"}}""",
    s"""{"type":"map","data":{"id":8,"title":"Warped Unmasked","uuid":"uuid-8","nypl_digital_id":"img-8","bbox":"-74,40,-73,41","map_type":"is_map","status":"warped","mask_status":"unmasked","maskGeometry":${sq(-74.0, 40.0, -73.0, 41.0)}}}""",
    s"""{"type":"map","data":{"id":9,"title":"Unwarped Masked","uuid":"uuid-9","nypl_digital_id":"img-9","bbox":"-74,40,-73,41","map_type":"is_map","status":"unwarped","mask_status":"masked","maskGeometry":${sq(-74.0, 40.0, -73.0, 41.0)}}}""",
    """{"type":"map","data":{"id":10,"title":"No Mask","uuid":"uuid-10","nypl_digital_id":"img-10","bbox":"-74,40,-73,41","map_type":"is_map","status":"published","mask_status":"unmasked"}}""",
    """{"type":"map","data":{"id":11,"title":"Atlas Page","uuid":"uuid-11","nypl_digital_id":"img-11","bbox":"-74,40,-73,41","map_type":"is_atlas","status":"warped","mask_status":"masked"}}""",
    """{"type":"map","data":{"id":12,"title":"No Bbox","uuid":"uuid-12","nypl_digital_id":"img-12","map_type":"is_map","status":"warped","mask_status":"masked"}}""",
    s"""{"type":"map","data":{"id":13,"title":"Inset Map","uuid":"inset-uuid-13","nypl_digital_id":"img-13","bbox":"-74,40,-73,41","map_type":"is_map","status":"warped","mask_status":"masking","depicts_year":"1850","maskGeometry":${sq(-74.0, 40.7, -73.95, 40.75)}}}""",
    s"""{"type":"map","data":{"id":14,"title":"Issue Year Only","uuid":"uuid-14","nypl_digital_id":"img-14","bbox":"-74,40,-73,41","map_type":"is_map","status":"published","mask_status":"masked","issue_year":"1920","maskGeometry":${sq(-74.0, 40.7, -73.98, 40.72)}}}""",
    s"""{"type":"map","data":{"id":15,"title":"Loner","uuid":"uuid-15","nypl_digital_id":"img-15","bbox":"-74,40,-73,41","map_type":"is_map","status":"warped","mask_status":"masked","maskGeometry":${sq(-74.0, 40.7, -73.99, 40.71)}}}""",
    // 16: no maskGeometry but pixel mask + gcps → F12 enrichment computes it
    s"""{"type":"map","data":{"id":16,"title":"Needs Transform","uuid":"uuid-16","nypl_digital_id":"img-16","bbox":"-74,40,-73,41","map_type":"is_map","status":"warped","mask_status":"masked","mask":"0,0 1000,0 1000,800 0,800","gcps":$gcps}}""",
    // 17: pixel mask with too few gcps → maskError → mask_to_geojson log
    """{"type":"map","data":{"id":17,"title":"Bad GCPs","uuid":"uuid-17","nypl_digital_id":"img-17","bbox":"-74,40,-73,41","map_type":"is_map","status":"warped","mask_status":"masked","mask":"0,0 1000,0 1000,800","gcps":[[0,0,40.8,-74.0],[1000,0,40.8,-73.9]]}}""",
    // 18: truthy-but-unparseable depicts_year → year null, NO fallback
    // to issue_year (reference picks first truthy THEN parseInt)
    s"""{"type":"map","data":{"id":18,"title":"Circa Year","uuid":"uuid-18","nypl_digital_id":"img-18","bbox":"-74,40,-73,41","map_type":"is_map","status":"warped","mask_status":"masked","depicts_year":"ca. 1880","issue_year":"1885","maskGeometry":${sq(-74.0, 40.7, -73.97, 40.73)}}}""",
    // 19: TPS transform_options → geometry via the thin-plate-spline
    // fit (interpolates the 4 GCPs exactly; mask corners = GCP pixels)
    s"""{"type":"map","data":{"id":19,"title":"TPS Warp","uuid":"uuid-19","nypl_digital_id":"img-19","bbox":"-74,40,-73,41","map_type":"is_map","status":"warped","mask_status":"masked","transform_options":"tps","mask":"0,0 1000,0 1000,800 0,800","gcps":$gcps}}""",
    // 20: clean map carrying layerErrors → object AND a layer_error log
    s"""{"type":"map","data":{"id":20,"title":"Layer Fetch Failed","uuid":"uuid-20","nypl_digital_id":"img-20","bbox":"-74,40,-73,41","map_type":"is_map","status":"warped","mask_status":"masked","layerErrors":[{"error":"Request timed out","url":"http://maps.nypl.org/warper/api/v1/maps/20/layers.json"}],"maskGeometry":${sq(-74.0, 40.7, -73.96, 40.74)}}}""",
    // 21: unrecognized transform_options → maskError → mask_to_geojson log
    s"""{"type":"map","data":{"id":21,"title":"Projective Warp","uuid":"uuid-21","nypl_digital_id":"img-21","bbox":"-74,40,-73,41","map_type":"is_map","status":"warped","mask_status":"masked","transform_options":"projective","mask":"0,0 1000,0 1000,800 0,800","gcps":$gcps}}""")

  val layerLines: Seq[String] = Seq(
    """{"type":"layer","data":{"id":10,"name":"Manhattan 1893","depicts_year":"1893","maps_count":12,"bbox":"-74.03,40.68,-73.9,40.88"}}""",
    """{"type":"layer","data":{"id":11,"name":"Brooklyn 1900","issue_year":"1900","maps_count":7}}""",
    """{"type":"layer","data":{"id":12,"name":"Queens","maps_count":3,"bbox":"-73.96,40.54,-73.7,40.8"}}""")

  val allLines: Seq[String] = mapLines ++ layerLines
}
