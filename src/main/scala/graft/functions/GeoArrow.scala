package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.internal.{columnExpr, exprColumn}

/**
 * GeoArrow nested-native kernels (reference SURVEY §1.2 phase-2 encoding:
 * Struct{x,y} / List<Struct> / List<List<Struct>> storage instead of WKB;
 * the reference's own affine bench exists precisely because WKB decode
 * dominates hot loops — geopolars/benches/affine.rs:16-34).
 *
 * The Spark re-expression: geometry lives in native nested columns
 * (struct<x,y>, array<struct>, array<array<struct>>) and every kernel here
 * is a PURE `org.apache.spark.sql.functions` composition. Numeric behavior
 * matches the WKB kernels bit-for-bit on the affine / shoelace / hypot
 * family (same multiply-add order as geom.Algos), so an encoding-switched
 * query hash-matches its WKB twin (q241 vs q11/q12/q13).
 *
 * Measured positioning (tools/EncodingBench, sf0.1, both encodings cached):
 *  - affine/accessor chains on struct COLLAPSE: Catalyst's
 *    SimplifyExtractValueOps folds getField(struct(...)) through the whole
 *    chain into plain arithmetic inside WholeStageCodegen — an 8-op
 *    translate chain beats the WKB path (~1.1x) with zero per-op
 *    decode/encode, and the gap widens with chain depth.
 *  - vertex-ITERATING measurements initially rode Spark HOFs
 *    (aggregate/transform), which are CodegenFallback — interpreted, ~10x
 *    slower than the WKB doGenCode kernels. They now delegate to
 *    [[NestedGeomExpr]] codegen kernels (direct ArrayData loops), which
 *    beat even the WKB kernels (~1.1x: same loop, no WKB decode). The
 *    struct encoding is now the fastest path for BOTH families.
 */
object GeoArrow {

  /** struct<x,y> from two double columns. */
  def xy(x: Column, y: Column): Column = struct(x.as("x"), y.as("y"))

  /** WKB Point -> struct<x,y> (the one-time encode boundary). */
  def toPointStruct(geom: Column): Column =
    xy(exprColumn(GeomUnaryExpr("st_x", columnExpr(geom))),
       exprColumn(GeomUnaryExpr("st_y", columnExpr(geom))))

  /** struct<x,y> -> WKB Point (the one-time decode boundary; requires
    * GeoRegistry.register on the session, like the rest of the st surface). */
  def fromPointStruct(p: Column): Column =
    st.point(p.getField("x"), p.getField("y"))

  // ------------------------------------------------------------ affine ops

  def translate(p: Column, dx: Column, dy: Column): Column =
    xy(p.getField("x") + dx, p.getField("y") + dy)

  def scale(p: Column, sx: Column, sy: Column): Column =
    xy(p.getField("x") * sx, p.getField("y") * sy)

  /** General 2D affine (a b; d e) + (xoff, yoff) — PostGIS ST_Affine order,
    * matching st_affine's kernel (geom.Affine). */
  def affine(p: Column, a: Column, b: Column, d: Column, e: Column,
      xoff: Column, yoff: Column): Column =
    xy(a * p.getField("x") + b * p.getField("y") + xoff,
       d * p.getField("x") + e * p.getField("y") + yoff)

  def rotate(p: Column, degrees: Column): Column = {
    val th = radians(degrees)
    affine(p, cos(th), -sin(th), sin(th), cos(th), lit(0.0), lit(0.0))
  }

  // ---------------------------------------------------------- measurements

  def distance(a: Column, b: Column): Column = {
    val dx = b.getField("x") - a.getField("x")
    val dy = b.getField("y") - a.getField("y")
    sqrt(dx * dx + dy * dy)
  }

  // Vertex-iterating measurements delegate to the NestedGeomExpr codegen
  // kernels (NestedGeom.scala): Spark HOFs are CodegenFallback and measured
  // ~10x slower than direct ArrayData loops inside whole-stage codegen
  // (tools/EncodingBench); the kernels keep the exact sequential fold order
  // so results stay hash-identical.

  /** Length of an array<struct<x,y>> vertex chain. */
  def lineLength(line: Column): Column =
    exprColumn(NestedGeomExpr("st_chain_length", columnExpr(line)))

  /** Signed shoelace area of one closed ring (array<struct<x,y>>, first
    * vertex repeated last) — CCW positive, same term order as Algos. */
  def ringSignedArea(ring: Column): Column =
    exprColumn(NestedGeomExpr("st_ring_signed_area", columnExpr(ring)))

  /** Polygon area from st_ringdump encoding: |exterior| minus hole areas. */
  def polygonArea(rings: Column): Column =
    exprColumn(NestedGeomExpr("st_rings_area", columnExpr(rings)))

  /** Perimeter over all rings (closed chains). */
  def polygonPerimeter(rings: Column): Column =
    exprColumn(NestedGeomExpr("st_rings_perimeter", columnExpr(rings)))

  /** Total length over an st_linedump encoding (MultiLineString level). */
  def multiLineLength(chains: Column): Column =
    exprColumn(NestedGeomExpr("st_chains_length", columnExpr(chains)))

  /** Area over an st_partsdump encoding (the GeoArrow MultiPolygon
    * fourth list level: parts -> rings -> vertices). */
  def multiPolygonArea(parts: Column): Column =
    exprColumn(NestedGeomExpr("st_parts_area", columnExpr(parts)))

  /** Perimeter over an st_partsdump encoding. */
  def multiPolygonPerimeter(parts: Column): Column =
    exprColumn(NestedGeomExpr("st_parts_perimeter", columnExpr(parts)))
}
