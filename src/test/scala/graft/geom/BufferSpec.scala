package graft.geom

import org.scalatest.funsuite.AnyFunSuite

/** Line/polygon buffer (capsule union) — the straight-segment capsule has a
  * closed-form area because the symmetric n-gon caps are cut exactly in
  * half by the rectangle ends: 2*r*L + (n/2)*r^2*sin(2*pi/n). */
class BufferSpec extends AnyFunSuite {
  private def g(wkt: String) = WKT.read(wkt)
  private val n = 32 // 4 * quadSegs default

  private def ngonArea(r: Double) = n / 2.0 * r * r * math.sin(2 * math.Pi / n)

  test("straight-segment capsule area is exact (rect + two half n-gons)") {
    for ((len, r) <- Seq((10.0, 1.0), (5.0, 2.0), (1.0, 0.5))) {
      val b = Algos.buffer(g(s"LINESTRING (0 0, $len 0)"), r)
      assert(b != null && Algos.geomDim(b) == 2)
      val expect = 2 * r * len + ngonArea(r)
      assert(math.abs(Algos.area(b) - expect) < 1e-9, s"len=$len r=$r got=${Algos.area(b)}")
    }
  }

  test("L-shaped line buffer: contains the line, area between rect-sum bounds") {
    val l = g("LINESTRING (0 0, 10 0, 10 10)")
    val b = Algos.buffer(l, 1.0)
    assert(Algos.coversX(b, l))
    val area = Algos.area(b)
    // at least the two capsules minus their joint disk overlap; at most their sum
    val capsule = 2 * 1.0 * 10 + ngonArea(1.0)
    assert(area < 2 * capsule)
    assert(area > 2 * capsule - 2 * ngonArea(1.0))
  }

  test("closed ring line buffer forms an annulus-like region covering the ring") {
    val ring = g("LINESTRING (0 0, 10 0, 10 10, 0 10, 0 0)")
    val b = Algos.buffer(ring, 1.0)
    assert(Algos.coversX(b, ring))
    // hole survives: center far from the ring is NOT covered
    assert(!Algos.intersects(b, g("POINT (5 5)")))
  }

  test("polygon buffer covers the polygon and grows the area") {
    val p = g("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))")
    val b = Algos.buffer(p, 1.0)
    assert(Algos.coversX(b, p))
    val area = Algos.area(b)
    // exact for convex polygon with n-gon joints: A + P*r + ngon area
    val expect = 100.0 + 40.0 * 1.0 + ngonArea(1.0)
    assert(math.abs(area - expect) < 1e-6, s"got=$area expect=$expect")
  }

  test("zero and negative radius => null; degenerate zero-length segment = point buffer") {
    assert(Algos.buffer(g("LINESTRING (0 0, 1 0)"), 0.0) == null)
    assert(Algos.buffer(g("LINESTRING (0 0, 1 0)"), -1.0) == null)
    val b = Algos.buffer(g("LINESTRING (3 3, 3 3)"), 1.0)
    assert(math.abs(Algos.area(b) - ngonArea(1.0)) < 1e-9)
  }

  test("multiline buffer of disjoint far-apart parts keeps them separate") {
    val b = Algos.buffer(g("MULTILINESTRING ((0 0, 5 0), (100 0, 105 0))"), 1.0)
    val expect = 2 * (2 * 1.0 * 5 + ngonArea(1.0))
    assert(math.abs(Algos.area(b) - expect) < 1e-9)
  }
}
