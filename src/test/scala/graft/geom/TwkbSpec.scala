package graft.geom

import org.scalatest.funsuite.AnyFunSuite

class TwkbSpec extends AnyFunSuite {

  private def rt(g: Geometry, prec: Int = 5): Geometry =
    TWKB.readOrNull(TWKB.write(g, prec))

  private def assertClose(a: Geometry, b: Geometry, tol: Double): Unit = {
    val ca = scala.collection.mutable.ArrayBuffer[Double]()
    val cb = scala.collection.mutable.ArrayBuffer[Double]()
    a.foreachCoord((x, y) => { ca += x; ca += y })
    b.foreachCoord((x, y) => { cb += x; cb += y })
    assert(ca.length == cb.length, s"coord count ${ca.length} vs ${cb.length}")
    ca.zip(cb).foreach { case (x, y) => assert(math.abs(x - y) <= tol, s"$x vs $y") }
  }

  test("round-trips every geometry type within quantization tolerance") {
    val geoms = Seq[Geometry](
      Point(12.3456789, -98.7654321),
      LineString(Array(0.0, 0.0, 10.5, -3.25, -7.125, 42.0)),
      Polygon(Array(
        Array(0.0, 0, 10, 0, 10, 10, 0, 10, 0, 0),
        Array(2.0, 2, 2, 4, 4, 4, 4, 2, 2, 2))),
      MultiPoint(Array(Point(1, 2), Point(-3, -4))),
      MultiLineString(Array(
        LineString(Array(0.0, 0, 1, 1)), LineString(Array(5.0, 5, 6, 7, 8, 9)))),
      MultiPolygon(Array(
        Polygon(Array(Array(0.0, 0, 1, 0, 1, 1, 0, 1, 0, 0))),
        Polygon(Array(Array(5.0, 5, 6, 5, 6, 6, 5, 6, 5, 5))))),
      GeometryCollection(Array(Point(1, 1), LineString(Array(0.0, 0, 2, 2)))))
    for (g <- geoms; prec <- Seq(2, 5, 7)) {
      val back = rt(g, prec)
      assert(back != null, s"$g at prec $prec")
      assert(back.typeName == g.typeName)
      assertClose(g, back, 0.5 * math.pow(10.0, -prec) + 1e-12)
    }
  }

  test("empty geometries round-trip via the empty bit") {
    val empties = Seq[Geometry](Point.empty, LineString(Array.empty),
      Polygon(Array.empty), MultiPolygon(Array.empty), GeometryCollection(Array.empty))
    empties.foreach { g =>
      val back = rt(g)
      assert(back != null && back.isEmpty && back.typeName == g.typeName, g.typeName)
    }
  }

  test("negative precision quantizes to coarse grid") {
    val back = rt(Point(12345.0, -6789.0), prec = -2).asInstanceOf[Point]
    assert(back.x == 12300.0 && back.y == -6800.0)
  }

  test("fuzz: random geometries survive, corrupt bytes return null") {
    val rnd = new scala.util.Random(99)
    def randLine(n: Int) = LineString(Array.fill(2 * n)(rnd.nextDouble() * 2000 - 1000))
    (1 to 200).foreach { _ =>
      val g: Geometry = rnd.nextInt(3) match {
        case 0 => Point(rnd.nextDouble() * 360 - 180, rnd.nextDouble() * 180 - 90)
        case 1 => randLine(rnd.nextInt(20) + 2)
        case 2 =>
          val x = rnd.nextDouble() * 100; val y = rnd.nextDouble() * 100
          Polygon(Array(Array(x, y, x + 1, y, x + 1, y + 1, x, y + 1, x, y)))
      }
      val back = rt(g, 6)
      assert(back != null)
      assertClose(g, back, 0.5e-6 + 1e-12)
      // corruption: truncations and bit flips never throw
      val bytes = TWKB.write(g, 6)
      (0 until bytes.length by math.max(1, bytes.length / 5)).foreach { cut =>
        TWKB.readOrNull(bytes.take(cut)) // may be null or partial-valid; must not throw
      }
      val flipped = bytes.clone(); flipped(rnd.nextInt(flipped.length)) = rnd.nextInt(256).toByte
      TWKB.readOrNull(flipped)
    }
  }

  test("implausible counts in corrupt bytes return null, never allocate") {
    // MultiPoint header + huge count varint (0x7FFFFFFF): must fail the
    // bytes-remaining bound, not reach Array.fill
    val huge = Array[Byte](0x04, 0x00, 0xff.toByte, 0xff.toByte, 0xff.toByte, 0xff.toByte, 0x07)
    assert(TWKB.readOrNull(huge) == null)
    // same for ring and collection counts
    assert(TWKB.readOrNull(Array[Byte](0x03, 0x00, 0xff.toByte, 0xff.toByte, 0x7f)) == null)
    assert(TWKB.readOrNull(Array[Byte](0x07, 0x00, 0xff.toByte, 0xff.toByte, 0x7f)) == null)
  }

  test("compactness: TWKB beats WKB substantially on typical geometries") {
    val poly = Polygon(Array((0 to 64).flatMap { i =>
      val a = i * 2 * math.Pi / 64
      Seq(100 + 50 * math.cos(a), 100 + 50 * math.sin(a))
    }.toArray))
    val wkb = WKB.write(poly).length
    val twkb = TWKB.write(poly, 5).length
    assert(twkb * 2 < wkb, s"twkb=$twkb wkb=$wkb")
  }

  test("reader tolerates bbox and size headers") {
    // hand-build: point (7, -3) at precision 0 with bbox+size flags
    val out = new java.io.ByteArrayOutputStream()
    out.write(0x01)       // prec 0, type point
    out.write(0x03)       // bbox + size
    out.write(Array[Byte](6)) // size varint: 6 bytes follow (bbox 4 + coords 2)
    Seq(14, 0, 5, 0).foreach(v => out.write(v)) // bbox zigzag: xmin=7 dx=0 ymin=-3...
    out.write(14); out.write(5)                 // coords zigzag(7), zigzag(-3)
    val g = TWKB.readOrNull(out.toByteArray)
    assert(g == Point(7.0, -3.0))
  }
}
