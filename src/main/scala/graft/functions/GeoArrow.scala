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
 *    translate chain runs 1.1x the WKB path and the gap widens with chain
 *    depth, with zero per-op WKB decode/encode.
 *  - vertex-ITERATING kernels (lineLength / ringSignedArea) ride Spark's
 *    higher-order functions, which are CodegenFallback — interpreted — so
 *    the codegen'd WKB kernels (st_area/st_perimeter via doGenCode) stay
 *    ~10x faster on polygon measurement. The hot measurement path therefore
 *    REMAINS WKB+codegen by design; this module is the interop/export
 *    encoding (GeoArrow ragged arrays) and the fast path for affine chains.
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

  /** Length of an array<struct<x,y>> vertex chain (sequential fold — the
    * same accumulation order as Algos.length). Index-based transform +
    * element_at: no slice copies, one result array per ring. */
  def lineLength(line: Column): Column =
    when(size(line) < 2, lit(0.0)).otherwise(
      aggregate(
        transform(line, (a, i) =>
          when(i < size(line) - 1, {
            val b = element_at(line, i + 2) // i is 0-based, element_at 1-based
            val dx = b.getField("x") - a.getField("x")
            val dy = b.getField("y") - a.getField("y")
            sqrt(dx * dx + dy * dy)
          }).otherwise(lit(0.0))),
        lit(0.0), (acc, d) => acc + d))

  /** Signed shoelace area of one closed ring (array<struct<x,y>>, first
    * vertex repeated last) — CCW positive, same term order as Algos. */
  def ringSignedArea(ring: Column): Column =
    when(size(ring) < 4, lit(0.0)).otherwise(
      aggregate(
        transform(ring, (a, i) =>
          when(i < size(ring) - 1, {
            val b = element_at(ring, i + 2)
            a.getField("x") * b.getField("y") - b.getField("x") * a.getField("y")
          }).otherwise(lit(0.0))),
        lit(0.0), (acc, t) => acc + t) / 2.0)

  /** Polygon area from st_ringdump encoding: |exterior| minus hole areas. */
  def polygonArea(rings: Column): Column =
    when(size(rings) === 0, lit(0.0)).otherwise(
      abs(ringSignedArea(element_at(rings, 1))) -
        when(size(rings) < 2, lit(0.0)).otherwise(
          aggregate(slice(rings, lit(2), size(rings) - 1), lit(0.0),
            (acc, r) => acc + abs(ringSignedArea(r)))))

  /** Perimeter over all rings (closed chains). */
  def polygonPerimeter(rings: Column): Column =
    aggregate(rings, lit(0.0), (acc, r) => acc + lineLength(r))
}
