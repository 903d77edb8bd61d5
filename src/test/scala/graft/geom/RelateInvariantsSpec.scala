package graft.geom

import org.scalatest.funsuite.AnyFunSuite

/** Systematic sweep of the DE-9IM predicate family over a grid of
  * box/line/point configurations: symmetry, mutual exclusion, and
  * implication invariants must hold in every cell. */
class RelateInvariantsSpec extends AnyFunSuite {
  private def box(x: Double, y: Double, s: Double): Geometry =
    WKT.read(s"POLYGON (($x $y, ${x + s} $y, ${x + s} ${y + s}, $x ${y + s}, $x $y))")
  private def hline(x: Double, y: Double, len: Double): Geometry =
    WKT.read(s"LINESTRING ($x $y, ${x + len} $y)")

  private def checkPair(a: Geometry, b: Geometry, label: String): Unit = {
    val isect = Algos.intersects(a, b)
    assert(isect == Algos.intersects(b, a), s"$label intersects asymmetric")
    assert(Algos.touches(a, b) == Algos.touches(b, a), s"$label touches asymmetric")
    assert(Algos.overlapsPred(a, b) == Algos.overlapsPred(b, a), s"$label overlaps asymmetric")
    assert(Algos.equalsTop(a, b) == Algos.equalsTop(b, a), s"$label equals asymmetric")
    assert(Algos.crosses(a, b) == Algos.crosses(b, a), s"$label crosses asymmetric")
    val t = Algos.touches(a, b); val o = Algos.overlapsPred(a, b)
    val c = Algos.crosses(a, b); val e = Algos.equalsTop(a, b)
    if (t || o || c || e) assert(isect, s"$label positive predicate without intersects")
    // touches excludes every interior-sharing predicate
    if (t) assert(!o && !c && !e, s"$label touches not exclusive (o=$o c=$c e=$e)")
    // overlaps and crosses are mutually exclusive by dimension rules
    assert(!(o && c), s"$label overlaps and crosses both true")
    // equality implies mutual coverage and excludes overlaps/crosses
    if (e) {
      assert(Algos.coversX(a, b) && Algos.coversX(b, a), s"$label equals without coverage")
      assert(!o && !c && !t, s"$label equals overlapping other predicates")
    }
    // containment (covers, unequal) excludes touches+overlaps+crosses of equals-dim
    if (Algos.coversX(a, b) && !e && Algos.geomDim(a) == Algos.geomDim(b))
      assert(!o && !c, s"$label covered operand still overlaps/crosses")
  }

  test("box-box sweep: all offsets hold the invariants") {
    for (dx <- -12 to 12 by 3; dy <- -12 to 12 by 3)
      checkPair(box(0, 0, 10), box(dx, dy, 10), s"box dx=$dx dy=$dy")
  }

  test("box sizes differing: containment cells included") {
    for (dx <- -8 to 8 by 2; s <- Seq(4.0, 10.0, 16.0))
      checkPair(box(0, 0, 10), box(dx, 2, s), s"box2 dx=$dx s=$s")
  }

  test("line-box sweep") {
    for (dy <- -4 to 14 by 2; len <- Seq(5.0, 10.0, 20.0))
      checkPair(hline(-2, dy, len), box(0, 0, 10), s"lineBox dy=$dy len=$len")
  }

  test("line-line sweep: parallel, collinear, crossing") {
    for (dx <- -12 to 12 by 3; dy <- Seq(-2, 0, 2)) {
      checkPair(hline(0, 0, 10), hline(dx, dy, 10), s"ll dx=$dx dy=$dy")
      val v = WKT.read(s"LINESTRING ($dx ${dy - 5}, $dx ${dy + 5})")
      checkPair(hline(0, 0, 10), v, s"lv dx=$dx dy=$dy")
    }
  }

  test("point against everything") {
    for (px <- -2 to 12 by 2; py <- -2 to 12 by 2) {
      val p = WKT.read(s"POINT ($px $py)")
      checkPair(p, box(0, 0, 10), s"pb $px,$py")
      checkPair(p, hline(0, 0, 10), s"pl $px,$py")
      checkPair(p, WKT.read("POINT (4 4)"), s"pp $px,$py")
    }
  }
}
