package graft.geom

import org.scalatest.funsuite.AnyFunSuite

class UnionSpec extends AnyFunSuite {

  private def box(x0: Double, y0: Double, x1: Double, y1: Double): Polygon =
    Polygon(Array(Array(x0, y0, x1, y0, x1, y1, x0, y1, x0, y0)))

  private val tol = 1e-9

  test("union of two overlapping squares: area = sum - overlap") {
    val u = Union.union(Seq(box(0, 0, 2, 2), box(1, 1, 3, 3)))
    assert(u.isInstanceOf[Polygon])
    assert(math.abs(Algos.area(u) - (4 + 4 - 1)) < tol)
  }

  test("union of adjacent squares dissolves the shared edge") {
    val u = Union.union(Seq(box(0, 0, 1, 1), box(1, 0, 2, 1)))
    assert(u.isInstanceOf[Polygon])
    assert(math.abs(Algos.area(u) - 2.0) < tol)
    // dissolved rectangle boundary: perimeter 6, not 8
    assert(math.abs(Algos.length(u) - 6.0) < tol)
  }

  test("union of disjoint squares is a MultiPolygon") {
    val u = Union.union(Seq(box(0, 0, 1, 1), box(5, 5, 6, 6)))
    assert(u.isInstanceOf[MultiPolygon])
    assert(math.abs(Algos.area(u) - 2.0) < tol)
  }

  test("contained polygon is absorbed") {
    val u = Union.union(Seq(box(0, 0, 10, 10), box(2, 2, 3, 3)))
    assert(u.isInstanceOf[Polygon])
    assert(math.abs(Algos.area(u) - 100.0) < tol)
  }

  test("3x3 grid minus center forms a hole") {
    val cells = for {
      i <- 0 until 3; j <- 0 until 3 if !(i == 1 && j == 1)
    } yield box(i, j, i + 1, j + 1)
    val u = Union.union(cells)
    val p = u match {
      case p: Polygon => p
      case other      => fail(s"expected Polygon, got ${other.typeName}")
    }
    assert(p.rings.length == 2, "exterior + one hole")
    assert(math.abs(Algos.area(p) - 8.0) < tol)
  }

  test("many-way overlap chain") {
    // 5 unit squares stepping by 0.5: union area = 1 + 4*0.5*1 = 3
    val chain = (0 until 5).map(i => box(i * 0.5, 0, i * 0.5 + 1, 1))
    val u = Union.union(chain)
    assert(math.abs(Algos.area(u) - 3.0) < tol)
  }

  test("points: distinct, absorbed by polygons") {
    val u = Union.union(Seq(Point(1, 1), Point(1, 1), Point(9, 9)))
    assert(u == MultiPoint(Array(Point(1, 1), Point(9, 9))))
    val mixed = Union.union(Seq(box(0, 0, 2, 2), Point(1, 1), Point(9, 9)))
    val gc = mixed.asInstanceOf[GeometryCollection]
    assert(gc.geoms.exists(_.isInstanceOf[Polygon]))
    assert(gc.geoms.collect { case p: Point => p }.toSeq == Seq(Point(9, 9)))
  }

  test("empty input") {
    assert(Union.union(Nil).isEmpty)
  }

  test("intersection: overlap, containment, disjoint, point operands") {
    val i1 = Union.intersection(box(0, 0, 2, 2), box(1, 1, 3, 3))
    assert(math.abs(Algos.area(i1) - 1.0) < tol)
    val i2 = Union.intersection(box(0, 0, 10, 10), box(2, 2, 3, 3)) // contained
    assert(math.abs(Algos.area(i2) - 1.0) < tol)
    assert(Union.intersection(box(0, 0, 1, 1), box(5, 5, 6, 6)).isEmpty)
    assert(Union.intersection(Point(1, 1), box(0, 0, 2, 2)) == Point(1, 1))
    assert(Union.intersection(Point(9, 9), box(0, 0, 2, 2)).isEmpty)
  }

  test("difference: notch, hole punch, disjoint, full erase") {
    val d1 = Union.difference(box(0, 0, 2, 2), box(1, 1, 3, 3)) // corner notch
    assert(math.abs(Algos.area(d1) - 3.0) < tol)
    val d2 = Union.difference(box(0, 0, 10, 10), box(4, 4, 6, 6)) // hole punch
    val p2 = d2.asInstanceOf[Polygon]
    assert(p2.rings.length == 2 && math.abs(Algos.area(p2) - 96.0) < tol)
    val d3 = Union.difference(box(0, 0, 1, 1), box(5, 5, 6, 6)) // disjoint
    assert(math.abs(Algos.area(d3) - 1.0) < tol)
    assert(Union.difference(box(2, 2, 3, 3), box(0, 0, 10, 10)).isEmpty) // erased
  }

  test("symDifference: XOR region; union minus intersection") {
    val s = Union.symDifference(box(0, 0, 2, 2), box(1, 1, 3, 3))
    assert(math.abs(Algos.area(s) - 6.0) < tol) // 4 + 4 - 2*1
    val disjoint = Union.symDifference(box(0, 0, 1, 1), box(5, 5, 6, 6))
    assert(math.abs(Algos.area(disjoint) - 2.0) < tol)
    assert(Union.symDifference(box(1, 1, 2, 2), box(1, 1, 2, 2)).isEmpty) // a xor a = empty
  }

  test("overlay operand edge cases: lines null, symdiff keeps outside points") {
    val line = LineString(Array(0.0, 0.0, 5.0, 5.0))
    assert(Union.intersection(line, box(0, 0, 2, 2)) == null)
    assert(Union.difference(box(0, 0, 2, 2), line) == null)
    assert(Union.symDifference(line, line) == null)
    val sd = Union.symDifference(Point(9, 9), box(0, 0, 1, 1))
    val gc = sd.asInstanceOf[GeometryCollection]
    assert(gc.geoms.exists(_ == Point(9, 9)) && gc.geoms.exists(_.isInstanceOf[Polygon]))
    assert(Union.symDifference(Point(0.5, 0.5), box(0, 0, 1, 1)) == box(0, 0, 1, 1))
    assert(Union.symDifference(Point(1, 1), Point(1, 1)).isEmpty)
  }

  test("scale mix: tiny feature against a huge extent survives the union") {
    // thin huge rectangle keeps the area exactly representable (1e8 + 1),
    // while the global extent (1e8) would give eps = 10 >> the 1x1 feature —
    // the per-fragment offset cap is what keeps the protrusion classified
    val huge = box(0, 0, 1e8, 1)
    val tiny = box(1e8 - 1, 0, 1e8 + 1, 1) // pokes 1 unit out of the huge box
    val u = Union.union(Seq(huge, tiny))
    assert(math.abs(Algos.area(u) - (1e8 + 1.0)) < 1e-6, s"area=${Algos.area(u)}")
  }

  test("property: intersection + difference partition the minuend") {
    val rnd = new scala.util.Random(97)
    for (_ <- 1 to 100) {
      def rb() = {
        val x = rnd.nextDouble() * 10; val y = rnd.nextDouble() * 10
        box(x, y, x + rnd.nextDouble() * 5 + 0.1, y + rnd.nextDouble() * 5 + 0.1)
      }
      val (a, b) = (rb(), rb())
      val inter = Algos.area(Union.intersection(a, b))
      val diff = Algos.area(Union.difference(a, b))
      assert(math.abs(inter + diff - Algos.area(a)) < 1e-6,
        s"area(a∩b)=$inter + area(a-b)=$diff != area(a)=${Algos.area(a)}")
    }
  }

  // deterministic pseudo-property tests (same pattern as GeomKernelSpec)
  test("property: random box pairs obey inclusion-exclusion") {
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 200) {
      def rb() = {
        val x = rnd.nextDouble() * 10; val y = rnd.nextDouble() * 10
        val w = rnd.nextDouble() * 5 + 0.1; val h = rnd.nextDouble() * 5 + 0.1
        box(x, y, x + w, y + h)
      }
      val (a, b) = (rb(), rb())
      val (ea, eb) = (a.envelope, b.envelope)
      val ix = math.max(0.0, math.min(ea.maxX, eb.maxX) - math.max(ea.minX, eb.minX))
      val iy = math.max(0.0, math.min(ea.maxY, eb.maxY) - math.max(ea.minY, eb.minY))
      val expected = ea.area + eb.area - ix * iy
      val got = Algos.area(Union.union(Seq(a, b)))
      assert(math.abs(got - expected) < 1e-6, s"a=$ea b=$eb got=$got expected=$expected")
    }
  }

  test("property: random box sets — monotone bounds, idempotence, vertex coverage") {
    val rnd = new scala.util.Random(41)
    for (_ <- 1 to 40) {
      val boxes = Seq.fill(2 + rnd.nextInt(6)) {
        val x = rnd.nextDouble() * 8; val y = rnd.nextDouble() * 8
        box(x, y, x + rnd.nextDouble() * 4 + 0.1, y + rnd.nextDouble() * 4 + 0.1)
      }
      val u = Union.union(boxes)
      val area = Algos.area(u)
      val maxIn = boxes.map(Algos.area(_)).max
      val sumIn = boxes.map(Algos.area(_)).sum
      assert(area >= maxIn - 1e-9 && area <= sumIn + 1e-9, s"area=$area not in [$maxIn, $sumIn]")
      // idempotence: dissolving the dissolved result changes nothing
      assert(math.abs(Algos.area(Union.union(Seq(u))) - area) < 1e-9)
      // every input corner lies in or on the union
      val polys = u match {
        case p: Polygon       => Seq(p)
        case m: MultiPolygon  => m.geoms.toSeq
        case other            => fail(s"unexpected ${other.typeName}")
      }
      boxes.foreach(_.foreachCoord { (x, y) =>
        assert(polys.exists(p => Algos.pointInPolygon(x, y, p) > 0), s"corner ($x,$y) escaped the union")
      })
    }
  }
}
