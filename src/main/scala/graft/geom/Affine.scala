package graft.geom

/**
 * 2D affine transforms — matrix layout `[a, b, d, e, xoff, yoff]`:
 *   x' = a*x + b*y + xoff
 *   y' = d*x + e*y + yoff
 * (reference: affine matrix doc georust/geoseries.py:22-41; skew matrix
 * geoseries.rs:118-139; TransformOrigin py-geopolars/src/utils.rs:5-27).
 */
final case class AffineMatrix(a: Double, b: Double, d: Double, e: Double, xoff: Double, yoff: Double) {
  def apply(x: Double, y: Double): (Double, Double) = (a * x + b * y + xoff, d * x + e * y + yoff)
  /** this ∘ that (apply `that` first). */
  def compose(that: AffineMatrix): AffineMatrix = AffineMatrix(
    a * that.a + b * that.d,
    a * that.b + b * that.e,
    d * that.a + e * that.d,
    d * that.b + e * that.e,
    a * that.xoff + b * that.yoff + xoff,
    d * that.xoff + e * that.yoff + yoff)
}

object AffineMatrix {
  val identity: AffineMatrix = AffineMatrix(1, 0, 0, 1, 0, 0)
  def translation(x: Double, y: Double): AffineMatrix = AffineMatrix(1, 0, 0, 1, x, y)
  def rotationDeg(deg: Double): AffineMatrix = {
    val r = math.toRadians(deg); val c = math.cos(r); val s = math.sin(r)
    AffineMatrix(c, -s, s, c, 0, 0)
  }
  def scaling(xf: Double, yf: Double): AffineMatrix = AffineMatrix(xf, 0, 0, yf, 0, 0)
  /** Shear by angles (degrees): [[1, tan(xs)], [tan(ys), 1]] per geoseries.rs:129-138. */
  def skewDeg(xs: Double, ys: Double): AffineMatrix =
    AffineMatrix(1, math.tan(math.toRadians(xs)), math.tan(math.toRadians(ys)), 1, 0, 0)
  /** Conjugate m by a translation so it acts about (ox, oy). */
  def about(m: AffineMatrix, ox: Double, oy: Double): AffineMatrix =
    translation(ox, oy).compose(m).compose(translation(-ox, -oy))
}

/** Origin for rotate/scale/skew: bbox center | centroid | explicit point. */
sealed trait TransformOrigin
object TransformOrigin {
  case object Center extends TransformOrigin
  case object Centroid extends TransformOrigin
  final case class XY(x: Double, y: Double) extends TransformOrigin

  def parse(s: String): TransformOrigin = s.trim.toLowerCase match {
    case "center"   => Center
    case "centroid" => Centroid
    case other =>
      val parts = other.split(",").map(_.trim.toDouble)
      require(parts.length == 2, s"bad origin: $s")
      XY(parts(0), parts(1))
  }

  def resolve(origin: TransformOrigin, g: Geometry): (Double, Double) = origin match {
    case XY(x, y) => (x, y)
    case Center   => val e = g.envelope; (e.centerX, e.centerY)
    case Centroid => val c = Algos.centroid(g); (c.x, c.y)
  }
}

object AffineOps {
  def affine(g: Geometry, m: AffineMatrix): Geometry = g.mapCoords((x, y) => m(x, y))
  def translate(g: Geometry, x: Double, y: Double): Geometry = g.mapCoords((px, py) => (px + x, py + y))
  def rotate(g: Geometry, deg: Double, origin: TransformOrigin): Geometry = {
    val (ox, oy) = TransformOrigin.resolve(origin, g)
    affine(g, AffineMatrix.about(AffineMatrix.rotationDeg(deg), ox, oy))
  }
  def scale(g: Geometry, xf: Double, yf: Double, origin: TransformOrigin): Geometry = {
    val (ox, oy) = TransformOrigin.resolve(origin, g)
    affine(g, AffineMatrix.about(AffineMatrix.scaling(xf, yf), ox, oy))
  }
  def skew(g: Geometry, xs: Double, ys: Double, origin: TransformOrigin): Geometry = {
    val (ox, oy) = TransformOrigin.resolve(origin, g)
    affine(g, AffineMatrix.about(AffineMatrix.skewDeg(xs, ys), ox, oy))
  }
}
