package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{call_function, lit}

/**
 * Typed Scala facade over the registered st_* functions — the DSL analog of
 * the reference's Python GeoSeries methods
 * (python/geopolars/internals/georust/geoseries.py). Requires
 * `GeoRegistry.register(spark)` (or GraftExtensions) on the session.
 *
 * Built on `call_function` so it stays agnostic to Column internals and the
 * plans are identical to the SQL surface.
 */
object st {
  // accessors
  def area(g: Column): Column         = call_function("st_area", g)
  def length(g: Column): Column       = call_function("st_length", g)
  def centroid(g: Column): Column     = call_function("st_centroid", g)
  def convexHull(g: Column): Column   = call_function("st_convexhull", g)
  def envelope(g: Column): Column     = call_function("st_envelope", g)
  def exteriorRing(g: Column): Column = call_function("st_exteriorring", g)
  def x(g: Column): Column            = call_function("st_x", g)
  def y(g: Column): Column            = call_function("st_y", g)
  def isEmpty(g: Column): Column      = call_function("st_isempty", g)
  def isRing(g: Column): Column       = call_function("st_isring", g)
  def geometryType(g: Column): Column = call_function("st_geometrytype", g)
  def geomTypeId(g: Column): Column   = call_function("st_geomtypeid", g)
  def numPoints(g: Column): Column    = call_function("st_numpoints", g)
  def xMin(g: Column): Column         = call_function("st_xmin", g)
  def yMin(g: Column): Column         = call_function("st_ymin", g)
  def xMax(g: Column): Column         = call_function("st_xmax", g)
  def yMax(g: Column): Column         = call_function("st_ymax", g)
  def asText(g: Column): Column       = call_function("st_astext", g)
  def dump(g: Column): Column         = call_function("st_dump", g)

  // binary predicates / measures (row-aligned, geoseries.rs:141-146)
  def distance(a: Column, b: Column): Column   = call_function("st_distance", a, b)
  def intersects(a: Column, b: Column): Column = call_function("st_intersects", a, b)
  def contains(a: Column, b: Column): Column   = call_function("st_contains", a, b)
  def within(a: Column, b: Column): Column     = call_function("st_within", a, b)
  def dWithin(a: Column, b: Column, dist: Column): Column =
    call_function("st_dwithin", a, b, dist)
  def touches(a: Column, b: Column): Column   = call_function("st_touches", a, b)
  def crosses(a: Column, b: Column): Column   = call_function("st_crosses", a, b)
  def overlaps(a: Column, b: Column): Column  = call_function("st_overlaps", a, b)
  def stEquals(a: Column, b: Column): Column  = call_function("st_equals", a, b)
  def disjoint(a: Column, b: Column): Column  = call_function("st_disjoint", a, b)
  def isSimple(g: Column): Column = call_function("st_issimple", g)
  def equalsExact(a: Column, b: Column, tol: Column): Column =
    call_function("st_equalsexact", a, b, tol)
  def almostEquals(a: Column, b: Column): Column =
    call_function("st_almostequals", a, b)
  def almostEquals(a: Column, b: Column, decimal: Column): Column =
    call_function("st_almostequals", a, b, decimal)
  def z(g: Column): Column = call_function("st_z", g)
  def hasZ(g: Column): Column = call_function("st_hasz", g)

  // transforms
  def simplify(g: Column, tol: Column): Column = call_function("st_simplify", g, tol)
  def boundary(g: Column): Column = call_function("st_boundary", g)
  def representativePoint(g: Column): Column = call_function("st_representativepoint", g)
  def isValid(g: Column): Column = call_function("st_isvalid", g)
  def clipByRect(g: Column, xmin: Column, ymin: Column, xmax: Column, ymax: Column): Column =
    call_function("st_clipbyrect", g, xmin, ymin, xmax, ymax)
  def buffer(g: Column, dist: Column): Column = call_function("st_buffer", g, dist)
  def buffer(g: Column, dist: Column, quadSegs: Column): Column =
    call_function("st_buffer", g, dist, quadSegs)
  def geodesicLength(g: Column): Column = call_function("st_geodesiclength", g)
  def geodesicArea(g: Column): Column = call_function("st_geodesicarea", g)
  def tileX(g: Column, zoom: Column): Column = call_function("st_tilex", g, zoom)
  def tileY(g: Column, zoom: Column): Column = call_function("st_tiley", g, zoom)
  def tileEnvelope(zoom: Column, x: Column, y: Column): Column =
    call_function("st_tileenvelope", zoom, x, y)
  def geodesicLength(g: Column, method: String): Column =
    call_function("st_geodesiclength", g, lit(method))
  def transform(g: Column, from: String, to: String): Column =
    call_function("st_transform", g, lit(from), lit(to))
  def affine(g: Column, a: Double, b: Double, d: Double, e: Double, xoff: Double, yoff: Double): Column =
    call_function("st_affine", g, lit(a), lit(b), lit(d), lit(e), lit(xoff), lit(yoff))
  def translate(g: Column, dx: Column, dy: Column): Column = call_function("st_translate", g, dx, dy)
  def rotate(g: Column, deg: Column): Column = call_function("st_rotate", g, deg)
  def rotate(g: Column, deg: Column, origin: String): Column =
    call_function("st_rotate", g, deg, lit(origin))
  def scale(g: Column, xf: Column, yf: Column): Column = call_function("st_scale", g, xf, yf)
  def scale(g: Column, xf: Column, yf: Column, origin: String): Column =
    call_function("st_scale", g, xf, yf, lit(origin))
  def skew(g: Column, xs: Column, ys: Column): Column = call_function("st_skew", g, xs, ys)
  def skew(g: Column, xs: Column, ys: Column, origin: String): Column =
    call_function("st_skew", g, xs, ys, lit(origin))

  // constructors
  def point(x: Column, y: Column): Column = call_function("st_point", x, y)
  def geomFromText(wkt: Column): Column   = call_function("st_geomfromtext", wkt)
  def makeEnvelope(x0: Column, y0: Column, x1: Column, y1: Column): Column =
    call_function("st_makeenvelope", x0, y0, x1, y1)
  def geomFromGeoJson(json: Column): Column = call_function("st_geomfromgeojson", json)
  def asGeoJson(g: Column): Column          = call_function("st_asgeojson", g)

  // aggregates (SURVEY §2.5)
  def envelopeAgg(g: Column): Column = call_function("st_envelope_agg", g)
  def collect(g: Column): Column     = call_function("st_collect", g)
  def unionAgg(g: Column): Column    = call_function("st_union_agg", g)
}
