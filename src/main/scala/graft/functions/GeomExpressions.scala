package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.geom.{Geometry => Geom, _}
import scala.collection.mutable.ArrayBuffer

/**
 * st_* scalar kernels over WKB `BinaryType` columns.
 *
 * This is the Spark re-expression of the reference's per-op kernel registry
 * (reference: py-geopolars/src/api.rs:16-33 registers one pyfunction per
 * GeoSeries op; trait surface geopolars-geo/src/geoseries.rs:10-181). Instead
 * of Arrow-FFI'd Rust functions we register Catalyst `Expression`s so every
 * op is usable from both the DataFrame DSL (`graft.functions.st`) and SQL
 * (`selectExpr("st_area(geometry)")`), runs on executors with no FFI, and
 * participates in Catalyst optimization (constant folding, null propagation,
 * filter pushdown around them).
 *
 * All kernels are pure and stateless, hence streaming-safe (SURVEY §2.10).
 * Invalid WKB evaluates to NULL (SQL-friendly analog of the reference's
 * GeopolarsError, geopolars-geo/src/error.rs:8-50).
 */
object GeomKernels {
  private def wkb(g: Geom): Array[Byte] = WKB.write(g)
  private def utf8(s: String): UTF8String = UTF8String.fromString(s)

  /** Unary geometry op: decoded geometry => Catalyst-internal value. */
  final case class U(out: DataType, fn: Geom => Any)

  // Semantics pinned to the reference (citations per entry in SURVEY §2.2).
  val unary: Map[String, U] = Map(
    "st_area"         -> U(DoubleType, g => Algos.area(g)),
    "st_length"       -> U(DoubleType, g => Algos.length(g)),
    "st_centroid"     -> U(BinaryType, g => wkb(Algos.centroid(g))),
    "st_convexhull"   -> U(BinaryType, g => wkb(Algos.convexHull(g))),
    "st_delaunaytriangles" -> U(BinaryType, g => Delaunay.triangles(g) match {
      case null => null
      case t    => wkb(t)
    }),
    // merge line segments through unambiguous degree-2 junctions
    "st_linemerge" -> U(BinaryType, g => Algos.lineMerge(g) match {
      case null => null
      case m    => wkb(m)
    }),
    // planarize a line arrangement: split segments at every intersection
    "st_node" -> U(BinaryType, g => Algos.nodeLines(g) match {
      case null => null
      case m    => wkb(m)
    }),
    // faces of the planar graph formed by the (noded) input lines
    "st_polygonize" -> U(BinaryType, g => Algos.polygonize(g) match {
      case null => null
      case m    => wkb(m)
    }),
    // repair invalid polygons by re-assembling the noded boundary faces
    "st_makevalid" -> U(BinaryType, g => Algos.makeValid(g) match {
      case null => null
      case m    => wkb(m)
    }),
    "st_removerepeatedpoints" -> U(BinaryType, g => wkb(Algos.removeRepeatedPoints(g, 0.0))),
    // min-area rotated rectangle of the convex hull (rotating calipers)
    "st_orientedenvelope" -> U(BinaryType, g => Algos.orientedEnvelope(g) match {
      case null => null
      case e    => wkb(e)
    }),
    // radius of the minimum enclosing circle (ST_MinimumBoundingRadius's r)
    "st_minimumboundingradius" -> U(DoubleType, g => Algos.minBoundingCircle(g) match {
      case null => null
      case c    => c(2)
    }),
    // minimum enclosing circle as geometry (32-gon; radius 0 => the point)
    "st_minimumboundingcircle" -> U(BinaryType, g => Shape.minBoundingCircleGeom(g, 32) match {
      case null => null
      case c    => wkb(c)
    }),
    // ear-clipping triangulation of hole-free polygons (GEOS-stub surface)
    "st_triangulatepolygon" -> U(BinaryType, g => Shape.triangulate(g) match {
      case null => null
      case t    => wkb(t)
    }),
    // dissolve the parts of ONE areal (multi)geometry (PostGIS
    // ST_UnaryUnion slice) on the planar-overlay kernel
    "st_unaryunion" -> U(BinaryType, g => g match {
      case _: Polygon | _: MultiPolygon | _: GeometryCollection =>
        Option(Union.union(Geom.parts(g).toSeq)).map(wkb).orNull
      case _ => null
    }),
    // canonical form: identical bytes for geometrically identical inputs
    // (ring rotation/orientation/part order factored out)
    "st_normalize" -> U(BinaryType, g => wkb(Shape.normalize(g))),
    // ring-orientation family (PostGIS ST_ForcePolygonCW/CCW + predicates):
    // winding flips preserve ring start vertices; predicates are null for
    // inputs with no polygon component
    "st_forcepolygoncw"  -> U(BinaryType, g => wkb(Shape.forceOrientation(g, cwExterior = true))),
    "st_forcepolygonccw" -> U(BinaryType, g => wkb(Shape.forceOrientation(g, cwExterior = false))),
    "st_ispolygoncw"  -> U(BooleanType,
      g => Shape.isPolygonOriented(g, cw = true).map(Boolean.box).orNull),
    "st_ispolygonccw" -> U(BooleanType,
      g => Shape.isPolygonOriented(g, cw = false).map(Boolean.box).orNull),
    // wrap atomic geometry in its multi-type (PostGIS ST_Multi)
    "st_multi" -> U(BinaryType, g => wkb(Shape.asMulti(g))),
    // great-circle polygon area on the mean-Earth sphere (m^2), lon/lat
    // degrees; the geodesic companion of st_distancesphere
    "st_areasphere" -> U(DoubleType, g => {
      def ringsOf(x: Geom): Double = x match {
        case p: Polygon if !p.isEmpty      => Geodesy.sphericalArea(p.rings)
        case mp: MultiPolygon              => mp.geoms.map(ringsOf).sum
        case gc: GeometryCollection        => gc.geoms.map(ringsOf).sum
        case _                             => 0.0
      }
      g match {
        case _: Polygon | _: MultiPolygon | _: GeometryCollection => ringsOf(g)
        case _ => null
      }
    }),
    "st_envelope"     -> U(BinaryType, g => wkb(Algos.envelopeGeom(g))),
    "st_exteriorring" -> U(BinaryType, g => Algos.exteriorRing(g) match {
      case null => null
      case r    => wkb(r)
    }),
    "st_boundary"     -> U(BinaryType, g => Algos.boundary(g) match {
      case null => null
      case b    => wkb(b)
    }),
    "st_representativepoint" -> U(BinaryType, g => Algos.representativePoint(g) match {
      case null => null
      case p    => wkb(p)
    }),
    // PostGIS-name aliases for interop with existing SQL
    "st_pointonsurface" -> U(BinaryType, g => Algos.representativePoint(g) match {
      case null => null
      case p    => wkb(p)
    }),
    "st_npoints"      -> U(IntegerType, g => g.numPoints),
    "st_isvalid"      -> U(BooleanType, g => Algos.isValid(g)),
    "st_x"            -> U(DoubleType, { case p: Point if !p.isEmpty => p.x; case _ => null }),
    "st_y"            -> U(DoubleType, { case p: Point if !p.isEmpty => p.y; case _ => null }),
    // the data model is strictly 2D (reference writes WKB CoordDimensions::xy
    // and force_2d's on read — py-geopolars geoseries.rst:29,41 reserves
    // these): z is NULL and has_z false for every geometry, by contract
    "st_z"            -> U(DoubleType, _ => null),
    "st_hasz"         -> U(BooleanType, _ => false),
    "st_isempty"      -> U(BooleanType, g => g.isEmpty),
    "st_isring"       -> U(BooleanType, g => Algos.isRing(g)),
    // GEOS is_simple: no anomalous self-intersection (lines revisit no
    // point except closure; multipoints have no repeats)
    "st_issimple"     -> U(BooleanType, g => Algos.isSimple(g)),
    "st_geometrytype" -> U(StringType, g => utf8(g.typeName)),
    "st_geomtypeid"   -> U(IntegerType, g => g.typeId),
    "st_numpoints"    -> U(IntegerType, g => g.numPoints),
    "st_xmin"         -> U(DoubleType, g => { val e = g.envelope; if (e.isEmpty) null else e.minX }),
    "st_ymin"         -> U(DoubleType, g => { val e = g.envelope; if (e.isEmpty) null else e.minY }),
    "st_xmax"         -> U(DoubleType, g => { val e = g.envelope; if (e.isEmpty) null else e.maxX }),
    "st_ymax"         -> U(DoubleType, g => { val e = g.envelope; if (e.isEmpty) null else e.maxY }),
    "st_startpoint"   -> U(BinaryType, g => Algos.startPoint(g) match {
      case null => null
      case p    => wkb(p)
    }),
    "st_endpoint"     -> U(BinaryType, g => Algos.endPoint(g) match {
      case null => null
      case p    => wkb(p)
    }),
    "st_reverse"      -> U(BinaryType, g => wkb(Algos.reverse(g))),
    "st_flipcoordinates" -> U(BinaryType, g => wkb(Algos.flipCoordinates(g))),
    "st_perimeter"    -> U(DoubleType, g => Algos.perimeter(g)),
    "st_numinteriorrings" -> U(IntegerType, g => {
      val n = Algos.numInteriorRings(g)
      if (n < 0) null else n
    }),
    // collection accessors: part count (1 for atomic geometries, PostGIS)
    "st_numgeometries" -> U(IntegerType, g => if (g.isEmpty) 0 else Geom.parts(g).length),
    "st_makepolygon"  -> U(BinaryType, g => Algos.makePolygon(g) match {
      case null => null
      case p    => wkb(p)
    }),
    "st_astext"       -> U(StringType, g => utf8(WKT.write(g))),
    "st_asgeojson"    -> U(StringType, g => utf8(GeoJSON.write(g))),
    // st_dump: multi-part => parts, single => itself (reference explode,
    // geoseries.rs:49-50); pair with Spark's built-in explode() for rows.
    "st_dump"         -> U(ArrayType(BinaryType, containsNull = false),
                           g => new GenericArrayData(Geom.parts(g).map(p => wkb(p): Any))),
    // GeoArrow-style ragged coordinate view (reference §1.2 struct
    // encoding; shapely.to_ragged_array parity): every vertex in
    // traversal order as struct<x, y>. Pair with transform()/struct SQL
    // to build typed GeoArrow columns without leaving codegen.
    "st_coorddump"    -> U(
      ArrayType(StructType(Seq(StructField("x", DoubleType, nullable = false),
        StructField("y", DoubleType, nullable = false))), containsNull = false),
      g => {
        val buf = scala.collection.mutable.ArrayBuffer[Any]()
        g.foreachCoord((x, y) =>
          buf += new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
            Array[Any](x, y)))
        new GenericArrayData(buf.toArray)
      }),
    // GeoArrow nested-native polygon encoding (reference §1.2 phase-2
    // storage: List<List<Struct{x,y}>>): rings as arrays of vertex structs
    // (closed, exterior first). POLYGON ONLY — a MultiPolygon dumps to
    // null, because this two-level encoding cannot mark part boundaries
    // and a flattened dump would make GeoArrow.polygonArea subtract other
    // parts' exteriors as if they were holes; MultiPolygon's own encoding
    // is st_partsdump below (the GeoArrow fourth list level). Pair with
    // GeoArrow.* HOF
    // kernels to run area/perimeter/affine chains entirely inside
    // whole-stage codegen, no per-op WKB decode (the reference's own
    // WKB-vs-struct bench motivation, geopolars/benches/affine.rs:16-34).
    "st_ringdump"     -> U(
      ArrayType(ArrayType(StructType(Seq(
        StructField("x", DoubleType, nullable = false),
        StructField("y", DoubleType, nullable = false))), containsNull = false),
        containsNull = false),
      g => {
        g match {
          case p: Polygon => new GenericArrayData(p.rings.map(ringStructs(_): Any))
          case _ => null
        }
      }),
    // GeoArrow MultiLineString encoding (List<List<Struct{x,y}>> with
    // CHAIN semantics — same physical level as st_ringdump, no closure):
    // reference read direction geoseries.py:170-214 declares all six
    // layouts; this is the line-family list level. LineString dumps as a
    // single chain so the encoding is total over the line family.
    "st_linedump"     -> U(
      ArrayType(ArrayType(StructType(Seq(
        StructField("x", DoubleType, nullable = false),
        StructField("y", DoubleType, nullable = false))), containsNull = false),
        containsNull = false),
      g => {
        g match {
          case l: LineString => new GenericArrayData(Array(ringStructs(l.coords): Any))
          case ml: MultiLineString =>
            new GenericArrayData(ml.geoms.map(l => ringStructs(l.coords): Any))
          case _ => null
        }
      }),
    // GeoArrow MultiPolygon encoding — the FOURTH list level
    // (List<List<List<Struct{x,y}>>>, reference geoseries.py:109-138):
    // parts -> rings (closed, exterior first) -> vertex structs. The part
    // boundary staying explicit is the point: a flattened ringdump would
    // subtract other parts' exteriors as if they were holes. Polygon
    // dumps as one part so the encoding is total over the areal family.
    "st_partsdump"    -> U(
      ArrayType(ArrayType(ArrayType(StructType(Seq(
        StructField("x", DoubleType, nullable = false),
        StructField("y", DoubleType, nullable = false))), containsNull = false),
        containsNull = false), containsNull = false),
      g => {
        def polyData(p: Polygon): GenericArrayData =
          new GenericArrayData(p.rings.map(ringStructs(_): Any))
        g match {
          case p: Polygon => new GenericArrayData(Array(polyData(p): Any))
          case mp: MultiPolygon =>
            new GenericArrayData(mp.geoms.map(polyData(_): Any))
          case _ => null
        }
      })
  )

  /** One coordinate ring/chain as an array of struct<x,y> rows (shared by
    * the st_ringdump / st_linedump / st_partsdump encodings). */
  private def ringStructs(r: Array[Double]): GenericArrayData =
    new GenericArrayData(Array.tabulate[Any](r.length / 2)(i =>
      new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](r(2 * i), r(2 * i + 1)))))

  /** Binary geometry op (row-aligned two-column semantics, geoseries.rs:141-146). */
  final case class B(out: DataType, fn: (Geom, Geom) => Any)

  val binary: Map[String, B] = Map(
    "st_distance"   -> B(DoubleType, (a, b) => Algos.distance(a, b)),
    "st_intersects" -> B(BooleanType, (a, b) => Algos.intersects(a, b)),
    "st_contains"   -> B(BooleanType, (a, b) => Algos.contains(a, b)),
    "st_within"     -> B(BooleanType, (a, b) => Algos.contains(b, a)),
    // boolean overlay ops on the shared planar-overlay kernel; unsupported
    // operand combinations (lines) come back null => SQL NULL
    // proximity argmin pair (witness of the reference's distance,
    // geoseries.rs:141-146): nearest point ON a to b / the connecting line
    "st_closestpoint" -> B(BinaryType, (a, b) => Algos.closestPoints(a, b) match {
      case null => null
      case c    => wkb(Point(c(0), c(1)))
    }),
    "st_shortestline" -> B(BinaryType, (a, b) => Algos.closestPoints(a, b) match {
      case null => null
      case c    => wkb(LineString(Array(c(0), c(1), c(2), c(3))))
    }),
    // north-based clockwise bearing between two points (PostGIS ST_Azimuth);
    // non-point input or identical points => null
    "st_azimuth" -> B(DoubleType, (a, b) => (a, b) match {
      case (p: Point, q: Point) if !p.isEmpty && !q.isEmpty =>
        val az = Algos.azimuth(p.x, p.y, q.x, q.y)
        if (az.isNaN) null else az
      case _ => null
    }),
    // farthest-point duals of closestpoint/shortestline (vertex-exact)
    "st_maxdistance" -> B(DoubleType, (a, b) => Algos.farthestPoints(a, b) match {
      case null => null
      case c    => math.hypot(c(0) - c(2), c(1) - c(3))
    }),
    "st_longestline" -> B(BinaryType, (a, b) => Algos.farthestPoints(a, b) match {
      case null => null
      case c    => wkb(LineString(Array(c(0), c(1), c(2), c(3))))
    }),
    // fraction of line a's length at the point nearest to point b
    "st_linelocatepoint" -> B(DoubleType, (a, b) => b match {
      case p: Point if !p.isEmpty =>
        val f = Algos.lineLocatePoint(a, p.x, p.y)
        if (f.isNaN) null else f
      case _ => null
    }),
    "st_makeline"     -> B(BinaryType, (a, b) => Algos.makeLine(a, b) match {
      case null => null
      case l    => wkb(l)
    }),
    // closure containment (boundary contact suffices) vs interior-requiring
    // contains — the PostGIS covers/contains distinction
    "st_covers"    -> B(BooleanType, (a, b) => Algos.covers(a, b)),
    "st_coveredby" -> B(BooleanType, (a, b) => Algos.covers(b, a)),
    // DE-9IM family completion: interiors-based predicates (Algos relate
    // kernels); st_disjoint is exact negation of the exact intersects
    "st_touches"   -> B(BooleanType, (a, b) => Algos.touches(a, b)),
    "st_crosses"   -> B(BooleanType, (a, b) => Algos.crosses(a, b)),
    "st_overlaps"  -> B(BooleanType, (a, b) => Algos.overlapsPred(a, b)),
    "st_equals"    -> B(BooleanType, (a, b) => Algos.equalsTop(a, b)),
    "st_disjoint"  -> B(BooleanType, (a, b) => !Algos.intersects(a, b)),
    // cut a line at every crossing with the blade (PostGIS ST_Split slice)
    "st_split"     -> B(BinaryType, (a, b) => Algos.splitLine(a, b) match {
      case null => null
      case m    => wkb(m)
    }),
    // vertex-discrete symmetric Hausdorff distance
    "st_hausdorffdistance" -> B(DoubleType, (a, b) => {
      val h = Algos.hausdorff(a, b)
      if (h.isNaN) null else h
    }),
    // discrete Fréchet distance (vertex-sequence coupling DP) — the
    // order-sensitive companion of st_hausdorffdistance
    "st_frechetdistance" -> B(DoubleType, (a, b) => {
      val f = Shape.frechet(a, b)
      if (f.isNaN) null else f
    }),
    // collinear-overlap extraction between lineal geometries
    "st_sharedpaths" -> B(BinaryType, (a, b) => Shape.sharedPaths(a, b) match {
      case null => null
      case s    => wkb(s)
    }),
    // great-circle meters between two lon/lat points (PostGIS
    // ST_DistanceSphere; same mean radius as st_geodesiclength's haversine)
    "st_distancesphere" -> B(DoubleType, (a, b) => (a, b) match {
      case (p: Point, q: Point) if !p.isEmpty && !q.isEmpty =>
        Geodesy.haversine(p.x, p.y, q.x, q.y)
      case _ => null
    }),
    "st_union"          -> B(BinaryType, (a, b) => wkb(Union.union(Seq(a, b)))),
    "st_intersection"   -> B(BinaryType, (a, b) => Option(Union.intersection(a, b)).map(wkb).orNull),
    "st_difference"     -> B(BinaryType, (a, b) => Option(Union.difference(a, b)).map(wkb).orNull),
    "st_symdifference"  -> B(BinaryType, (a, b) => Option(Union.symDifference(a, b)).map(wkb).orNull)
  )

  /** EPSG:3857 half-world extent (R_WGS84 * pi). */
  private[functions] val WebMercatorBound = 20037508.342789244

  private def d(v: Any): Double = v.asInstanceOf[Double]
  private def s(v: Any): String = v.toString
  private def origin(args: IndexedSeq[Any], i: Int): TransformOrigin =
    if (args.length <= i || args(i) == null) TransformOrigin.Center
    else TransformOrigin.parse(s(args(i)))

  /**
   * Geom + scalar-argument op. `arities` = accepted scalar-arg counts
   * (beyond the leading geometry child).
   */
  final case class W(out: DataType, arities: Set[Int], fn: (Geom, IndexedSeq[Any]) => Any)

  val withArgs: Map[String, W] = Map(
    "st_simplify" -> W(BinaryType, Set(1), (g, a) => wkb(Algos.simplify(g, d(a(0))))),
    // Visvalingam-Whyatt area-threshold simplification
    "st_simplifyvw" -> W(BinaryType, Set(1), (g, a) => wkb(Shape.simplifyVW(g, d(a(0))))),
    // Chaikin corner-cutting smoothing (default 1 iteration, capped at 5)
    "st_chaikinsmoothing" -> W(BinaryType, Set(0, 1), (g, a) => {
      val it = if (a.isEmpty || a(0) == null) 1 else d(a(0)).toInt
      wkb(Shape.chaikin(g, it))
    }),
    // recursive envelope-halving split of areal geometry; explode() the array
    "st_subdivide" -> W(ArrayType(BinaryType, containsNull = false), Set(1), (g, a) =>
      new GenericArrayData(Shape.subdivide(g, d(a(0)).toInt).map(p => wkb(p): Any))),
    // parallel offset with miter joins (left positive, PostGIS convention)
    "st_offsetcurve" -> W(BinaryType, Set(1), (g, a) =>
      Shape.offsetCurve(g, d(a(0))) match { case null => null; case l => wkb(l) }),
    // line vertex editing (PostGIS ST_AddPoint/ST_RemovePoint/ST_SetPoint)
    "st_addpoint" -> W(BinaryType, Set(1, 2), (g, a) => {
      val p = WKB.readOrNull(a(0).asInstanceOf[Array[Byte]])
      val pos = if (a.length > 1 && a(1) != null) d(a(1)).toInt else -1
      if (p == null) null
      else Shape.addPoint(g, p, pos) match { case null => null; case l => wkb(l) }
    }),
    "st_removepoint" -> W(BinaryType, Set(1), (g, a) =>
      Shape.removePoint(g, d(a(0)).toInt) match { case null => null; case l => wkb(l) }),
    "st_setpoint" -> W(BinaryType, Set(2), (g, a) => {
      val p = WKB.readOrNull(a(1).asInstanceOf[Array[Byte]])
      if (p == null) null
      else Shape.setPoint(g, d(a(0)).toInt, p) match { case null => null; case l => wkb(l) }
    }),
    // n deterministic points covered by the areal geometry (seeded)
    "st_generatepoints" -> W(BinaryType, Set(1, 2), (g, a) => {
      val seed = if (a.length > 1 && a(1) != null) d(a(1)).toLong else 0L
      Shape.generatePoints(g, d(a(0)).toInt, seed) match {
        case null => null
        case pts  => wkb(pts)
      }
    }),
    // clip by rectangle = overlay intersection with the envelope polygon
    // (geopandas clip_by_rect, commented in the reference docs); operand
    // combos the overlay kernel can't express (lines) => null
    "st_clipbyrect" -> W(BinaryType, Set(4), (g, a) => {
      val rect = Polygon(Array(Array(
        d(a(0)), d(a(1)), d(a(2)), d(a(1)),
        d(a(2)), d(a(3)), d(a(0)), d(a(3)), d(a(0)), d(a(1)))))
      Option(Union.intersection(g, rect)).map(wkb).orNull
    }),
    // point/multipoint buffer (4*quadSegs-gon); lines/polygons => null
    "st_buffer" -> W(BinaryType, Set(1, 2), (g, a) => {
      val segs = if (a.length > 1 && a(1) != null) d(a(1)).toInt else 8
      Option(Algos.buffer(g, d(a(0)), segs)).map(wkb).orNull
    }),
    // geodesic buffer in METERS over lon/lat input (AEQD projection
    // about the envelope center — PostGIS ST_Buffer(geography) strategy)
    "st_geodesicbuffer" -> W(BinaryType, Set(1, 2), (g, a) => {
      val segs = if (a.length > 1 && a(1) != null) d(a(1)).toInt else 8
      Option(Algos.geodesicBuffer(g, d(a(0)), segs)).map(wkb).orNull
    }),
    // forward (direct) geodesic: the point dist METERS from a lon/lat
    // point at the given initial bearing (degrees clockwise from north)
    "st_geodesicproject" -> W(BinaryType, Set(2), (g, a) => g match {
      case p: Point if !p.isEmpty =>
        val (lo, la) = CRS.directSphere(p.x, p.y, d(a(0)), d(a(1)))
        wkb(Point(lo, la))
      case _ => null
    }),
    "st_geodesiclength" -> W(DoubleType, Set(0, 1), (g, a) => {
      val m = if (a.isEmpty || a(0) == null) Geodesy.Method.Geodesic else Geodesy.Method.parse(s(a(0)))
      Geodesy.geodesicLength(g, m)
    }),
    // XYZ/slippy tile index of a Point at zoom z (x: column, y: row from
    // the north; web-mercator clamp at +/-85.05112878). Non-points => null.
    "st_tilex" -> W(LongType, Set(1), (g, a) => g match {
      case p: Point if !p.x.isNaN =>
        val z = d(a(0)).toInt
        if (z < 0 || z > 30) null
        else {
          val t = math.floor((p.x + 180.0) / 360.0 * (1L << z).toDouble).toLong
          math.max(0L, math.min((1L << z) - 1, t))
        }
      case _ => null
    }),
    "st_tiley" -> W(LongType, Set(1), (g, a) => g match {
      case p: Point if !p.y.isNaN =>
        val z = d(a(0)).toInt
        if (z < 0 || z > 30) null
        else {
          val latR = math.toRadians(math.max(-85.05112878, math.min(85.05112878, p.y)))
          val t = math.floor((1.0 - math.log(math.tan(latR) + 1.0 / math.cos(latR)) / math.Pi) / 2.0 *
            (1L << z).toDouble).toLong
          math.max(0L, math.min((1L << z) - 1, t))
        }
      case _ => null
    }),
    // Bing/quadkey tile address at zoom z: base-4 digit per level,
    // digit = 2*yBit + xBit from the top zoom down — the key property is
    // that a tile's quadkey PREFIXES all its descendants', so prefix
    // filters prune tile hierarchies (the Bing Maps tile system, public).
    // Composes with st_tilex/st_tiley (identical slippy arithmetic).
    "st_quadkey" -> W(StringType, Set(1), (g, a) => g match {
      case p: Point if !p.x.isNaN && !p.y.isNaN =>
        val z = d(a(0)).toInt
        if (z < 1 || z > 30) null
        else {
          val n = (1L << z).toDouble
          val tx = math.max(0L, math.min((1L << z) - 1,
            math.floor((p.x + 180.0) / 360.0 * n).toLong))
          val latR = math.toRadians(math.max(-85.05112878, math.min(85.05112878, p.y)))
          val ty = math.max(0L, math.min((1L << z) - 1,
            math.floor((1.0 - math.log(math.tan(latR) + 1.0 / math.cos(latR)) / math.Pi) / 2.0 * n).toLong))
          val sb = new java.lang.StringBuilder(z)
          var k = z - 1
          while (k >= 0) {
            sb.append((2 * ((ty >> k) & 1) + ((tx >> k) & 1)).toString)
            k -= 1
          }
          utf8(sb.toString)
        }
      case _ => null
    }),
    // Chamberlain-Duquette polygon area in m^2 on the mean sphere with
    // edges PLANAR IN LON/LAT (the GeoJSON/turf.js convention — lon/lat
    // data digitized as straight segments in degree space). Contrast
    // st_areasphere, which treats edges as great circles (exact solid
    // angle); the two agree to ~1e-6 relative on sub-degree polygons and
    // diverge as edges lengthen.
    "st_geodesicarea" -> W(DoubleType, Set(0), (g, _) => Geodesy.geodesicArea(g)),
    "st_transform" -> W(BinaryType, Set(2), (g, a) => wkb(CRS.transform(g, s(a(0)), s(a(1))))),
    "st_affine" -> W(BinaryType, Set(6), (g, a) =>
      wkb(AffineOps.affine(g, AffineMatrix(d(a(0)), d(a(1)), d(a(2)), d(a(3)), d(a(4)), d(a(5)))))),
    "st_translate" -> W(BinaryType, Set(2), (g, a) => wkb(AffineOps.translate(g, d(a(0)), d(a(1))))),
    "st_rotate" -> W(BinaryType, Set(1, 2), (g, a) => wkb(AffineOps.rotate(g, d(a(0)), origin(a, 1)))),
    "st_scale" -> W(BinaryType, Set(2, 3), (g, a) => wkb(AffineOps.scale(g, d(a(0)), d(a(1)), origin(a, 2)))),
    "st_skew" -> W(BinaryType, Set(2, 3), (g, a) => wkb(AffineOps.skew(g, d(a(0)), d(a(1)), origin(a, 2)))),
    "st_dwithin" -> W(BooleanType, Set(2), (g, a) => {
      // (geomA, geomB-wkb, dist) — geomB arrives as raw WKB bytes
      val b = WKB.readOrNull(a(0).asInstanceOf[Array[Byte]])
      if (b == null) null else Algos.distance(g, b) <= d(a(1))
    }),
    // structural per-ordinate-tolerance equality (JTS equalsExact /
    // geopandas geom_equals_exact); same shape as st_dwithin
    "st_equalsexact" -> W(BooleanType, Set(2), (g, a) => {
      val b = WKB.readOrNull(a(0).asInstanceOf[Array[Byte]])
      if (b == null) null else Algos.equalsExact(g, b, d(a(1)))
    }),
    // geopandas geom_almost_equals(other, decimal=6): equalsExact with
    // tolerance 0.5 * 10^-decimal — a decimal-places alias over the same
    // structural kernel
    "st_almostequals" -> W(BooleanType, Set(1, 2), (g, a) => {
      val b = WKB.readOrNull(a(0).asInstanceOf[Array[Byte]])
      val dec = if (a.length < 2 || a(1) == null) 6 else d(a(1)).toInt
      if (b == null) null else Algos.equalsExact(g, b, 0.5 * math.pow(10.0, -dec))
    }),
    // n-th vertex of a LineString, 1-based, negative from the end
    "st_pointn" -> W(BinaryType, Set(1), (g, a) =>
      Algos.pointN(g, d(a(0)).toInt) match {
        case null => null
        case p    => wkb(p)
      }),
    // snap coordinates to a grid (round-half-up multiples of the cell size)
    "st_snaptogrid" -> W(BinaryType, Set(1), (g, a) => wkb(Algos.snapToGrid(g, d(a(0))))),
    // TWKB compact varint encoding (PostGIS ST_AsTWKB; default precision
    // 5). Out-of-range precision -> null, matching every sibling codec
    // and tile entry point (never a thrown job failure on bad scalars).
    "st_astwkb" -> W(BinaryType, Set(0, 1), (g, a) => {
      val prec = if (a.isEmpty || a(0) == null) 5 else d(a(0)).toInt
      if (prec < -7 || prec > 7) null else TWKB.write(g, prec)
    }),
    // PostGIS ST_ReducePrecision: snap to grid, then drop the collapsed
    // consecutive duplicates the snap introduces
    "st_reduceprecision" -> W(BinaryType, Set(1), (g, a) =>
      wkb(Algos.removeRepeatedPoints(Algos.snapToGrid(g, d(a(0))), 0.0))),
    // alpha-shape concave hull: drop Delaunay triangles with an edge
    // longer than maxEdge, dissolve the rest
    "st_concavehull" -> W(BinaryType, Set(1), (g, a) =>
      Delaunay.concaveHull(g, d(a(0))) match {
        case null => null
        case h    => wkb(h)
      }),
    // Voronoi cells of g's distinct vertices clipped to (xmin,ymin,xmax,ymax)
    "st_voronoipolygons" -> W(BinaryType, Set(4), (g, a) =>
      Voronoi.polygons(g, d(a(0)), d(a(1)), d(a(2)), d(a(3))) match {
        case null => null
        case v    => wkb(v)
      }),
    // linear referencing along a LineString
    "st_lineinterpolatepoint" -> W(BinaryType, Set(1), (g, a) =>
      Algos.lineInterpolatePoint(g, d(a(0))) match {
        case null => null
        case p    => wkb(p)
      }),
    "st_linesubstring" -> W(BinaryType, Set(2), (g, a) =>
      Algos.lineSubstring(g, d(a(0)), d(a(1))) match {
        case null => null
        case l    => wkb(l)
      }),
    // planar destination point: distance along a north-based clockwise azimuth
    "st_project" -> W(BinaryType, Set(2), (g, a) => g match {
      case p: Point if !p.isEmpty => wkb(Algos.project(p.x, p.y, d(a(0)), d(a(1))))
      case _ => null
    }),
    "st_interiorringn" -> W(BinaryType, Set(1), (g, a) =>
      Algos.interiorRingN(g, d(a(0)).toInt) match {
        case null => null
        case r    => wkb(r)
      }),
    // clockwise angle at p2 between rays to p1 and p3 (args arrive as WKB)
    "st_angle" -> W(DoubleType, Set(2), (p1, a) => {
      val p2 = WKB.readOrNull(a(0).asInstanceOf[Array[Byte]])
      val p3 = WKB.readOrNull(a(1).asInstanceOf[Array[Byte]])
      (p1, p2, p3) match {
        case (q1: Point, q2: Point, q3: Point) if !q1.isEmpty && !q2.isEmpty && !q3.isEmpty =>
          val ang = Algos.angle(q1.x, q1.y, q2.x, q2.y, q3.x, q3.y)
          if (ang.isNaN) null else ang
        case _ => null
      }
    }),
    // split segments so none exceeds the given length
    "st_segmentize" -> W(BinaryType, Set(1), (g, a) => wkb(Algos.segmentize(g, d(a(0))))),
    // great-circle densify in METERS over lon/lat input (slerp; the
    // geography twin of st_segmentize)
    "st_geodesicsegmentize" -> W(BinaryType, Set(1), (g, a) =>
      wkb(Algos.geodesicSegmentize(g, d(a(0))))),
    // grow (or shrink, negative d) the bounding box by d on every side
    // (PostGIS ST_Expand); an emptied box => null
    "st_expand" -> W(BinaryType, Set(1), (g, a) => {
      val e = g.envelope
      if (e.isEmpty) null
      else {
        val dd = d(a(0))
        val (x0, y0, x1, y1) = (e.minX - dd, e.minY - dd, e.maxX + dd, e.maxY + dd)
        if (x0 > x1 || y0 > y1) null
        else wkb(Polygon(Array(Array(x0, y0, x1, y0, x1, y1, x0, y1, x0, y0))))
      }
    }),
    // n-th part of a multi-geometry, 1-based; atomic geometries are their
    // own single part (PostGIS ST_GeometryN); out of range => null
    "st_geometryn" -> W(BinaryType, Set(1), (g, a) => {
      val n = d(a(0)).toInt
      val parts = Geom.parts(g)
      if (g.isEmpty || n < 1 || n > parts.length) null else wkb(parts(n - 1))
    }),
    // keep only parts of the given type id (1=point 2=line 3=polygon, the
    // PostGIS ST_CollectionExtract convention, recursing through nested
    // collections/multis): multi-wrapper result, or null when nothing matches
    "st_collectionextract" -> W(BinaryType, Set(1), (g, a) => {
      val want = d(a(0)).toInt
      def atoms(x: Geom): Array[Geom] = x match {
        case m: GeometryCollectionLike => m.geoms.flatMap(atoms(_: Geom))
        case other => Array(other)
      }
      val parts = atoms(g).filter {
        case _: Point => want == 1
        case _: LineString => want == 2
        case _: Polygon => want == 3
        case _ => false
      }
      if (parts.isEmpty) null
      else want match {
        case 1 => wkb(MultiPoint(parts.map(_.asInstanceOf[Point])))
        case 2 => wkb(MultiLineString(parts.map(_.asInstanceOf[LineString])))
        case 3 => wkb(MultiPolygon(parts.map(_.asInstanceOf[Polygon])))
        case _ => null
      }
    }),
    // spatial bucketing: base32 cell id of a POINT (prefix = grid cell);
    // non-point or out-of-range input => null
    "st_geohash" -> W(StringType, Set(1), (g, a) => g match {
      case p: Point if !p.isEmpty =>
        Geohash.encode(p.x, p.y, d(a(0)).toInt) match {
          case null => null
          case h    => utf8(h)
        }
      case _ => null
    })
  )

  /** Constructors: plain scalars => WKB geometry. */
  final case class C(out: DataType, arities: Set[Int], fn: IndexedSeq[Any] => Any)

  val constructors: Map[String, C] = Map(
    "st_point" -> C(BinaryType, Set(2), a => wkb(Point(d(a(0)), d(a(1))))),
    "st_geomfromtext" -> C(BinaryType, Set(1), a => WKT.readOrNull(s(a(0))) match {
      case null => null
      case g    => wkb(g)
    }),
    // TWKB decode (PostGIS ST_GeomFromTWKB); invalid bytes -> null like
    // the other codec entry points
    "st_geomfromtwkb" -> C(BinaryType, Set(1), a =>
      TWKB.readOrNull(a(0).asInstanceOf[Array[Byte]]) match {
        case null => null
        case g    => wkb(g)
      }),
    "st_geomfromgeojson" -> C(BinaryType, Set(1), a => GeoJSON.readOrNull(s(a(0))) match {
      case null => null
      case g    => wkb(g)
    }),
    "st_makeenvelope" -> C(BinaryType, Set(4), a => {
      val (x0, y0, x1, y1) = (d(a(0)), d(a(1)), d(a(2)), d(a(3)))
      wkb(Polygon(Array(Array(x0, y0, x1, y0, x1, y1, x0, y1, x0, y0))))
    }),
    // PostGIS ST_TileEnvelope: the EPSG:3857 square of XYZ/slippy tile
    // (z, x, y) — the standard web-scale spatial sharding scheme (pair
    // with st_tilex/st_tiley for tile-aligned partitioning of point data)
    "st_tileenvelope" -> C(BinaryType, Set(3), a => {
      val z = d(a(0)).toInt; val x = d(a(1)).toLong; val y = d(a(2)).toLong
      if (z < 0 || z > 30 || x < 0 || y < 0 || x >= (1L << z) || y >= (1L << z)) null
      else {
        val b = WebMercatorBound
        val size = 2 * b / (1L << z)
        val xmin = -b + x * size; val xmax = -b + (x + 1) * size
        val ymax = b - y * size; val ymin = b - (y + 1) * size
        wkb(Polygon(Array(Array(xmin, ymin, xmax, ymin, xmax, ymax, xmin, ymax, xmin, ymin))))
      }
    }),
    // square tessellation of an envelope (PostGIS ST_SquareGrid): cells of
    // the origin-aligned `size` grid whose interior overlaps the box, in
    // row-major (y, x) order; pair with explode() for one row per cell
    "st_squaregrid" -> C(ArrayType(BinaryType, containsNull = false), Set(5), a => {
      val size = d(a(4))
      val (x0, y0, x1, y1) = (d(a(0)), d(a(1)), d(a(2)), d(a(3)))
      if (size <= 0 || x1 <= x0 || y1 <= y0) null
      else {
        val ix0 = math.floor(x0 / size).toLong
        val ix1 = math.ceil(x1 / size).toLong - 1
        val iy0 = math.floor(y0 / size).toLong
        val iy1 = math.ceil(y1 / size).toLong - 1
        val nx = ix1 - ix0 + 1; val ny = iy1 - iy0 + 1
        // guard each factor before multiplying: nx * ny can wrap Long
        require(nx <= 1000000 && ny <= 1000000 && nx * ny <= 1000000,
          s"st_squaregrid would emit $nx x $ny cells (max 1e6)")
        val out = new Array[Any]((nx * ny).toInt)
        var k = 0
        var iy = iy0
        while (iy <= iy1) {
          var ix = ix0
          while (ix <= ix1) {
            val cx0 = ix * size; val cy0 = iy * size
            out(k) = wkb(Polygon(Array(Array(
              cx0, cy0, cx0 + size, cy0, cx0 + size, cy0 + size, cx0, cy0 + size, cx0, cy0))))
            k += 1; ix += 1
          }
          iy += 1
        }
        new GenericArrayData(out)
      }
    }),
    // flat-top hexagon lattice anchored at (xmin, ymin): cells whose CENTER
    // lies in the rect; size = circumradius; H3-style binning companion to
    // st_squaregrid (explode + groupBy cell for hex aggregation)
    "st_hexgrid" -> C(ArrayType(BinaryType, containsNull = false), Set(5), a => {
      val size = d(a(4))
      val (x0, y0, x1, y1) = (d(a(0)), d(a(1)), d(a(2)), d(a(3)))
      if (size <= 0 || x1 <= x0 || y1 <= y0) null
      else {
        val dx = 1.5 * size
        val dy = math.sqrt(3.0) * size
        val w = x1 - x0; val h = y1 - y0
        val ncols = math.floor(w / dx).toLong + 1
        require(ncols <= 1000000, s"st_hexgrid would emit $ncols columns (max 1e6)")
        val out = ArrayBuffer.empty[Any]
        var col = 0L
        while (col < ncols) {
          val cx = x0 + col * dx
          val off = if (col % 2 == 1) dy / 2 else 0.0
          if (off <= h) {
            val nrows = math.floor((h - off) / dy).toLong + 1
            require(out.length + nrows <= 1000000,
              s"st_hexgrid would emit more than 1e6 cells")
            var row = 0L
            while (row < nrows) {
              val cy = y0 + off + row * dy
              val ring = new Array[Double](14)
              var k = 0
              while (k < 6) {
                val t = math.Pi / 3.0 * k
                ring(2 * k) = cx + size * math.cos(t)
                ring(2 * k + 1) = cy + size * math.sin(t)
                k += 1
              }
              ring(12) = ring(0); ring(13) = ring(1)
              out += wkb(Polygon(Array(ring)))
              row += 1
            }
          }
          col += 1
        }
        new GenericArrayData(out.toArray)
      }
    }),
    // Web-Mercator envelope of slippy-map tile (z, x, y), OSM y-from-north
    // convention (PostGIS ST_TileEnvelope)
    "st_tileenvelope" -> C(BinaryType, Set(3), a =>
      Shape.tileEnvelope(d(a(0)).toInt, d(a(1)).toLong, d(a(2)).toLong) match {
        case null => null
        case t    => wkb(t)
      }),
    // geohash cell => its envelope polygon (PostGIS ST_GeomFromGeoHash)
    "st_geomfromgeohash" -> C(BinaryType, Set(1), a => Geohash.decodeBounds(s(a(0))) match {
      case null => null
      case b =>
        wkb(Polygon(Array(Array(b(0), b(1), b(2), b(1), b(2), b(3), b(0), b(3), b(0), b(1)))))
    })
  )

  /** Raw-WKB unary ops — no standard 2D decode first (which would NULL the
    * very inputs these exist to handle). */
  val rawUnary: Map[String, Array[Byte] => Array[Byte]] = Map(
    // strip Z/M ordinates (ISO 1000-offsets and EWKB dimension flags) and
    // re-encode 2D — read_file's force_2d (reference io/file.py:55-58);
    // invalid WKB => NULL like every other kernel
    "st_force2d" -> (bytes => WKB.force2dOrNull(bytes))
  )

  val allNames: Seq[String] =
    (unary.keys ++ binary.keys ++ withArgs.keys ++ constructors.keys ++
      rawUnary.keys).toSeq.sorted
}

/**
 * Static row-level kernels invoked from generated code. Whole-stage codegen
 * calls these directly on the column values — no InternalRow
 * materialization, no expression-tree walk per row (the cost
 * CodegenFallback pays).
 */
object GeomRowEval {
  def unary(k: GeomKernels.U, wkb: Array[Byte]): Any = {
    val g = WKB.readOrNull(wkb)
    if (g == null) null else k.fn(g)
  }
  def binary(k: GeomKernels.B, a: Array[Byte], b: Array[Byte]): Any = {
    val ga = WKB.readOrNull(a)
    if (ga == null) return null
    val gb = WKB.readOrNull(b)
    if (gb == null) null else k.fn(ga, gb)
  }
  def point(x: Double, y: Double): Array[Byte] = WKB.write(Point(x, y))

  /** Catalyst-internal scalar => the kernel-facing representation. */
  def normalize(v: Any): Any = v match {
    case u: UTF8String      => u.toString
    case i: Integer         => i.doubleValue(): Any
    case l: java.lang.Long  => l.doubleValue(): Any
    case f: java.lang.Float => f.doubleValue(): Any
    case dec: Decimal       => dec.toDouble: Any
    case other              => other
  }

  def constructor(k: GeomKernels.C, args: Array[Any]): Any = {
    var i = 0
    while (i < args.length) { if (args(i) == null) return null; i += 1 }
    k.fn(args.map(normalize).toIndexedSeq)
  }

  def withArgs(k: GeomKernels.W, geomBytes: Array[Byte], args: Array[Any]): Any = {
    val g = WKB.readOrNull(geomBytes)
    if (g == null) return null
    var i = 0
    while (i < args.length) { if (args(i) == null) return null; i += 1 }
    k.fn(g, args.map(normalize).toIndexedSeq)
  }
}

/** Shared unboxing snippet for generated code: `Object` kernel result => typed slot. */
private[functions] object GeomCodegen {
  import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodeGenerator, ExprCode}

  def assignResult(dataType: DataType, resultVar: String, ev: ExprCode): String = {
    val unbox = dataType match {
      case DoubleType  => s"((java.lang.Double) $resultVar).doubleValue()"
      case IntegerType => s"((java.lang.Integer) $resultVar).intValue()"
      case LongType    => s"((java.lang.Long) $resultVar).longValue()"
      case BooleanType => s"((java.lang.Boolean) $resultVar).booleanValue()"
      case _           => s"(${CodeGenerator.javaType(dataType)}) $resultVar"
    }
    s"""
       |if ($resultVar == null) {
       |  ${ev.isNull} = true;
       |} else {
       |  ${ev.value} = $unbox;
       |}""".stripMargin
  }

  /** Explicit boxing for Janino (no reliable autoboxing in generated code). */
  def boxValue(dataType: DataType, v: String): String = dataType match {
    case DoubleType | IntegerType | BooleanType | org.apache.spark.sql.types.LongType |
         org.apache.spark.sql.types.FloatType | org.apache.spark.sql.types.ShortType |
         org.apache.spark.sql.types.ByteType =>
      s"${CodeGenerator.boxedType(dataType)}.valueOf($v)"
    case _ => v
  }

  /**
   * Generic n-ary codegen: evaluate children, box non-geometry args into an
   * Object[], call `callTarget(argsVar)`; any null child => null result
   * (matching the interpreted eval of GeomArgsExpr/GeomConstructorExpr).
   */
  def nAryCall(
      ctx: CodegenContext,
      ev: ExprCode,
      boxedChildren: Seq[(Expression, Int)],   // (child, slot in Object[])
      prefixChildren: Seq[Expression],          // evaluated, passed positionally
      arity: Int,
      dataType: DataType,
      call: (Seq[ExprCode], String) => String): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val prefixCodes = prefixChildren.map(_.genCode(ctx))
    val argCodes = boxedChildren.map { case (c, _) => c.genCode(ctx) }
    val arr = ctx.freshName("geomArgs")
    val res = ctx.freshName("geomRes")
    val fills = boxedChildren.zip(argCodes).map { case ((c, slot), code) =>
      s"""if (${code.isNull}) { ${ev.isNull} = true; } else { $arr[$slot] = ${boxValue(c.dataType, code.value.toString)}; }"""
    }.mkString("\n")
    val prefixNullChecks =
      prefixCodes.map(c => s"if (${c.isNull}) { ${ev.isNull} = true; }").mkString("\n")
    ev.copy(code =
      code"""
         |${prefixCodes.map(_.code).mkString("\n")}
         |${argCodes.map(_.code).mkString("\n")}
         |boolean ${ev.isNull} = false;
         |${CodeGenerator.javaType(dataType)} ${ev.value} = ${CodeGenerator.defaultValue(dataType)};
         |Object[] $arr = new Object[$arity];
         |$prefixNullChecks
         |$fills
         |if (!${ev.isNull}) {
         |  Object $res = ${call(prefixCodes, arr)};
         |  ${assignResult(dataType, res, ev)}
         |}""".stripMargin)
  }
}

/** Raw-bytes unary st_* expression (GeomKernels.rawUnary): the kernel sees
  * the WKB bytes themselves, not a pre-decoded 2D geometry. Codegen calls
  * the kernel function object directly, staying in whole-stage codegen. */
case class GeomRawUnaryExpr(name: String, child: Expression) extends UnaryExpression {
  @transient private lazy val kernel = GeomKernels.rawUnary(name)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = name
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType || child.dataType == NullType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$name expects WKB BinaryType, got ${child.dataType}")
  override protected def nullSafeEval(input: Any): Any =
    kernel(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode):
      org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val kRef = ctx.addReferenceObj("kernel", kernel, "scala.Function1")
    nullSafeCodeGen(ctx, ev, c => {
      val res = ctx.freshName("rawRes")
      s"""
         |Object $res = ((scala.Function1) $kRef).apply($c);
         |${GeomCodegen.assignResult(dataType, res, ev)}""".stripMargin
    })
  }
  override protected def withNewChildInternal(newChild: Expression): GeomRawUnaryExpr =
    copy(child = newChild)
}

/** Unary st_* expression: WKB child, kernel looked up by name (stable plan equality).
  * doGenCode calls the static kernel on the column value directly, so the
  * expression stays inside whole-stage codegen without the
  * CodegenFallback row-materialization detour. */
case class GeomUnaryExpr(name: String, child: Expression) extends UnaryExpression {
  @transient private lazy val kernel = GeomKernels.unary(name)
  override def dataType: DataType = kernel.out
  override def nullable: Boolean = true
  override def prettyName: String = name
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType || child.dataType == NullType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$name expects WKB BinaryType, got ${child.dataType}")
  override protected def nullSafeEval(input: Any): Any =
    GeomRowEval.unary(kernel, input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode):
      org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val kRef = ctx.addReferenceObj("kernel", kernel, classOf[GeomKernels.U].getName)
    nullSafeCodeGen(ctx, ev, c => {
      val res = ctx.freshName("geomRes")
      s"""
         |Object $res = graft.functions.GeomRowEval.unary($kRef, $c);
         |${GeomCodegen.assignResult(dataType, res, ev)}""".stripMargin
    })
  }
  override protected def withNewChildInternal(newChild: Expression): GeomUnaryExpr =
    copy(child = newChild)
}

/** Binary st_* expression over two WKB columns (row-aligned, like the reference's distance). */
case class GeomBinaryExpr(name: String, left: Expression, right: Expression)
    extends BinaryExpression {
  @transient private lazy val kernel = GeomKernels.binary(name)
  override def dataType: DataType = kernel.out
  override def nullable: Boolean = true
  override def prettyName: String = name
  override protected def nullSafeEval(l: Any, r: Any): Any =
    GeomRowEval.binary(kernel, l.asInstanceOf[Array[Byte]], r.asInstanceOf[Array[Byte]])
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode):
      org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val kRef = ctx.addReferenceObj("kernel", kernel, classOf[GeomKernels.B].getName)
    nullSafeCodeGen(ctx, ev, (l, r) => {
      val res = ctx.freshName("geomRes")
      s"""
         |Object $res = graft.functions.GeomRowEval.binary($kRef, $l, $r);
         |${GeomCodegen.assignResult(dataType, res, ev)}""".stripMargin
    })
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): GeomBinaryExpr =
    copy(left = l, right = r)
}

/** Geom-plus-scalar-args st_* expression (simplify, affine family, transform, ...). */
case class GeomArgsExpr(name: String, children: Seq[Expression]) extends Expression {
  @transient private lazy val kernel = GeomKernels.withArgs(name)
  override def dataType: DataType = kernel.out
  override def nullable: Boolean = true
  override def foldable: Boolean = children.forall(_.foldable)
  override def prettyName: String = name
  override def eval(input: InternalRow): Any = {
    val geomBytes = children.head.eval(input)
    if (geomBytes == null) return null
    val args = children.tail.map(_.eval(input)).toArray
    GeomRowEval.withArgs(kernel, geomBytes.asInstanceOf[Array[Byte]], args)
  }
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode):
      org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val kRef = ctx.addReferenceObj("kernel", kernel, classOf[GeomKernels.W].getName)
    GeomCodegen.nAryCall(ctx, ev, children.tail.zipWithIndex, Seq(children.head),
      children.length - 1, dataType,
      (prefix, arr) => s"graft.functions.GeomRowEval.withArgs($kRef, ${prefix.head.value}, $arr)")
  }
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): GeomArgsExpr =
    copy(children = cs)
}

/** Scalar-only constructors (st_point, st_geomfromtext, st_makeenvelope, ...).
  * st_point — the hot synthesized-geometry path — gets a direct two-double
  * call; the rest go through the generic boxed-args codegen. */
case class GeomConstructorExpr(name: String, children: Seq[Expression]) extends Expression {
  @transient private lazy val kernel = GeomKernels.constructors(name)
  override def dataType: DataType = kernel.out
  override def nullable: Boolean = true
  override def foldable: Boolean = children.forall(_.foldable)
  override def prettyName: String = name
  override def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode):
      org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    if (name == "st_point" && children.length == 2 &&
        children.forall(_.dataType == DoubleType)) {
      import org.apache.spark.sql.catalyst.expressions.codegen.Block._
      val xCode = children(0).genCode(ctx)
      val yCode = children(1).genCode(ctx)
      ev.copy(code =
        code"""
           |${xCode.code}
           |${yCode.code}
           |boolean ${ev.isNull} = ${xCode.isNull} || ${yCode.isNull};
           |byte[] ${ev.value} = null;
           |if (!${ev.isNull}) {
           |  ${ev.value} = graft.functions.GeomRowEval.point(${xCode.value}, ${yCode.value});
           |}""".stripMargin)
    } else {
      val kRef = ctx.addReferenceObj("kernel", kernel, classOf[GeomKernels.C].getName)
      GeomCodegen.nAryCall(ctx, ev, children.zipWithIndex, Nil, children.length, dataType,
        (_, arr) => s"graft.functions.GeomRowEval.constructor($kRef, $arr)")
    }
  }
  override def eval(input: InternalRow): Any =
    GeomRowEval.constructor(kernel, children.map(_.eval(input)).toArray)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): GeomConstructorExpr =
    copy(children = cs)
}
