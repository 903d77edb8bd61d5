package graft.geom

/** Axis-aligned bounding box. Empty is encoded as (PosInf, PosInf, NegInf, NegInf). */
final case class Envelope(minX: Double, minY: Double, maxX: Double, maxY: Double) {
  def isEmpty: Boolean = minX > maxX || minY > maxY
  def width: Double = if (isEmpty) 0.0 else maxX - minX
  def height: Double = if (isEmpty) 0.0 else maxY - minY
  def area: Double = width * height
  def centerX: Double = (minX + maxX) / 2
  def centerY: Double = (minY + maxY) / 2
  def expand(o: Envelope): Envelope =
    if (isEmpty) o else if (o.isEmpty) this
    else Envelope(math.min(minX, o.minX), math.min(minY, o.minY),
                  math.max(maxX, o.maxX), math.max(maxY, o.maxY))
  def expand(x: Double, y: Double): Envelope =
    if (isEmpty) Envelope(x, y, x, y)
    else Envelope(math.min(minX, x), math.min(minY, y), math.max(maxX, x), math.max(maxY, y))
  def intersects(o: Envelope): Boolean =
    !isEmpty && !o.isEmpty && minX <= o.maxX && o.minX <= maxX && minY <= o.maxY && o.minY <= maxY
  def contains(o: Envelope): Boolean =
    !isEmpty && !o.isEmpty && minX <= o.minX && o.maxX <= maxX && minY <= o.minY && o.maxY <= maxY
  def contains(x: Double, y: Double): Boolean =
    !isEmpty && x >= minX && x <= maxX && y >= minY && y <= maxY
  def distanceSq(o: Envelope): Double = {
    val dx = if (o.maxX < minX) minX - o.maxX else if (o.minX > maxX) o.minX - maxX else 0.0
    val dy = if (o.maxY < minY) minY - o.maxY else if (o.minY > maxY) o.minY - maxY else 0.0
    dx * dx + dy * dy
  }
}

object Envelope {
  val empty: Envelope = Envelope(Double.PositiveInfinity, Double.PositiveInfinity,
                                 Double.NegativeInfinity, Double.NegativeInfinity)
  /** Envelope of a packed coordinate array (x0,y0,x1,y1,...). */
  def ofCoords(cs: Array[Double]): Envelope = {
    var i = 0
    var mnx = Double.PositiveInfinity; var mny = Double.PositiveInfinity
    var mxx = Double.NegativeInfinity; var mxy = Double.NegativeInfinity
    while (i < cs.length) {
      val x = cs(i); val y = cs(i + 1)
      if (x < mnx) mnx = x; if (x > mxx) mxx = x
      if (y < mny) mny = y; if (y > mxy) mxy = y
      i += 2
    }
    Envelope(mnx, mny, mxx, mxy)
  }
}

/**
 * Geometry ADT — the engine's in-memory geometry model (2D, xy, f64).
 *
 * Mirrors the reference's GEOS-style type taxonomy and ids
 * (reference: python/geopolars/enums.py:4-15 and geoseries.rs:60-73):
 * POINT=0, LINESTRING=1, LINEARRING=2 (never materialized — rings live
 * inside Polygon), POLYGON=3, MULTIPOINT=4, MULTILINESTRING=5,
 * MULTIPOLYGON=6, GEOMETRYCOLLECTION=7; MISSING=-1 is a SQL NULL here.
 *
 * Coordinates are packed `Array[Double]` (x0,y0,x1,y1,…) for cache-friendly
 * kernels — the per-row hot loops (area, length, affine) iterate flat arrays
 * with no per-vertex allocation.
 */
sealed trait Geometry {
  def typeId: Int
  def typeName: String
  def isEmpty: Boolean
  def envelope: Envelope
  def numPoints: Int
  /** Structure-preserving coordinate map (affine transforms, reprojection). */
  def mapCoords(f: (Double, Double) => (Double, Double)): Geometry
  /** Visit every coordinate. */
  def foreachCoord(f: (Double, Double) => Unit): Unit
}

final case class Point(x: Double, y: Double) extends Geometry {
  def typeId = 0; def typeName = "Point"
  def isEmpty: Boolean = x.isNaN || y.isNaN
  def envelope: Envelope = if (isEmpty) Envelope.empty else Envelope(x, y, x, y)
  def numPoints: Int = if (isEmpty) 0 else 1
  def mapCoords(f: (Double, Double) => (Double, Double)): Geometry =
    if (isEmpty) this else { val (nx, ny) = f(x, y); Point(nx, ny) }
  def foreachCoord(f: (Double, Double) => Unit): Unit = if (!isEmpty) f(x, y)
}
object Point { val empty: Point = Point(Double.NaN, Double.NaN) }

/** coords packed x0,y0,x1,y1,... */
final case class LineString(coords: Array[Double]) extends Geometry {
  require(coords.length % 2 == 0, "packed coords must have even length")
  def typeId = 1; def typeName = "LineString"
  def isEmpty: Boolean = coords.length == 0
  def envelope: Envelope = Envelope.ofCoords(coords)
  def numPoints: Int = coords.length / 2
  def isClosed: Boolean =
    numPoints >= 2 && coords(0) == coords(coords.length - 2) && coords(1) == coords(coords.length - 1)
  def mapCoords(f: (Double, Double) => (Double, Double)): Geometry = {
    val out = new Array[Double](coords.length)
    var i = 0
    while (i < coords.length) { val (nx, ny) = f(coords(i), coords(i + 1)); out(i) = nx; out(i + 1) = ny; i += 2 }
    LineString(out)
  }
  def foreachCoord(f: (Double, Double) => Unit): Unit = {
    var i = 0; while (i < coords.length) { f(coords(i), coords(i + 1)); i += 2 }
  }
  // Array fields break case-class equality; define structurally (tests rely on it).
  override def equals(o: Any): Boolean = o match {
    case LineString(c) => java.util.Arrays.equals(coords, c); case _ => false
  }
  override def hashCode: Int = java.util.Arrays.hashCode(coords)
}

/** rings(0) = exterior; rest = holes. Each ring is packed and closed. */
final case class Polygon(rings: Array[Array[Double]]) extends Geometry {
  def typeId = 3; def typeName = "Polygon"
  def isEmpty: Boolean = rings.length == 0 || rings(0).length == 0
  def exterior: Array[Double] = if (rings.length == 0) Array.emptyDoubleArray else rings(0)
  def envelope: Envelope = if (isEmpty) Envelope.empty else Envelope.ofCoords(rings(0))
  def numPoints: Int = { var n = 0; var i = 0; while (i < rings.length) { n += rings(i).length / 2; i += 1 }; n }
  def mapCoords(f: (Double, Double) => (Double, Double)): Geometry =
    Polygon(rings.map { r =>
      val out = new Array[Double](r.length)
      var i = 0; while (i < r.length) { val (nx, ny) = f(r(i), r(i + 1)); out(i) = nx; out(i + 1) = ny; i += 2 }
      out
    })
  def foreachCoord(f: (Double, Double) => Unit): Unit = {
    var j = 0
    while (j < rings.length) {
      val r = rings(j); var i = 0
      while (i < r.length) { f(r(i), r(i + 1)); i += 2 }
      j += 1
    }
  }
  override def equals(o: Any): Boolean = o match {
    case Polygon(rs) =>
      rs.length == rings.length && rings.indices.forall(i => java.util.Arrays.equals(rings(i), rs(i)))
    case _ => false
  }
  override def hashCode: Int = rings.foldLeft(17)((h, r) => h * 31 + java.util.Arrays.hashCode(r))
}

sealed trait GeometryCollectionLike extends Geometry {
  def geoms: Array[_ <: Geometry]
  def isEmpty: Boolean = geoms.forall(_.isEmpty)
  def envelope: Envelope = geoms.foldLeft(Envelope.empty)((e, g) => e.expand(g.envelope))
  def numPoints: Int = { var n = 0; geoms.foreach(n += _.numPoints); n }
  def foreachCoord(f: (Double, Double) => Unit): Unit = geoms.foreach(_.foreachCoord(f))
  override def equals(o: Any): Boolean = o match {
    case that: GeometryCollectionLike =>
      typeId == that.typeId && geoms.length == that.geoms.length &&
        geoms.indices.forall(i => geoms(i) == that.geoms(i))
    case _ => false
  }
  override def hashCode: Int = geoms.foldLeft(typeId)((h, g) => h * 31 + g.hashCode)
}

final case class MultiPoint(geoms: Array[Point]) extends GeometryCollectionLike {
  def typeId = 4; def typeName = "MultiPoint"
  def mapCoords(f: (Double, Double) => (Double, Double)): Geometry =
    MultiPoint(geoms.map(_.mapCoords(f).asInstanceOf[Point]))
}
final case class MultiLineString(geoms: Array[LineString]) extends GeometryCollectionLike {
  def typeId = 5; def typeName = "MultiLineString"
  def mapCoords(f: (Double, Double) => (Double, Double)): Geometry =
    MultiLineString(geoms.map(_.mapCoords(f).asInstanceOf[LineString]))
}
final case class MultiPolygon(geoms: Array[Polygon]) extends GeometryCollectionLike {
  def typeId = 6; def typeName = "MultiPolygon"
  def mapCoords(f: (Double, Double) => (Double, Double)): Geometry =
    MultiPolygon(geoms.map(_.mapCoords(f).asInstanceOf[Polygon]))
}
final case class GeometryCollection(geoms: Array[Geometry]) extends GeometryCollectionLike {
  def typeId = 7; def typeName = "GeometryCollection"
  def mapCoords(f: (Double, Double) => (Double, Double)): Geometry =
    GeometryCollection(geoms.map(_.mapCoords(f)))
}

object Geometry {
  /** Split multi-part geometries into parts (reference `explode`, geoseries.rs:49-50). */
  def parts(g: Geometry): Array[Geometry] = g match {
    case m: MultiPoint        => m.geoms.asInstanceOf[Array[Geometry]]
    case m: MultiLineString   => m.geoms.asInstanceOf[Array[Geometry]]
    case m: MultiPolygon      => m.geoms.asInstanceOf[Array[Geometry]]
    case m: GeometryCollection => m.geoms
    case other                => Array(other)
  }
}
