package graft.geom

import org.scalatest.funsuite.AnyFunSuite

/** Great-circle densify: uniform slerp spacing, endpoint preservation,
  * poleward arcing of east-west chords, antimeridian safety. */
class GeodesicSegmentizeSpec extends AnyFunSuite {
  private def line(wkt: String) = WKT.read(wkt)
  private val R = Geodesy.MeanEarthRadius

  private def coords(g: Geometry): Seq[(Double, Double)] = {
    val b = scala.collection.mutable.ArrayBuffer.empty[(Double, Double)]
    g.foreachCoord((x, y) => b += ((x, y)))
    b.toSeq
  }

  test("meridian segment: exact vertex count, uniform spacing, endpoints kept") {
    val g = Algos.geodesicSegmentize(line("LINESTRING (12 -30, 12 -20)"), R * 3.0 * math.Pi / 180)
    val cs = coords(g)
    assert(cs.size == 5) // ceil(10/3) = 4 segments
    assert(cs.head == ((12.0, -30.0)) && cs.last == ((12.0, -20.0)))
    val dists = cs.sliding(2).map { case Seq((ax, ay), (bx, by)) =>
      Geodesy.haversine(ax, ay, bx, by)
    }.toSeq
    val expect = R * 2.5 * math.Pi / 180
    dists.foreach(d => assert(math.abs(d - expect) < 1e-4, s"d=$d"))
    cs.foreach { case (x, _) => assert(math.abs(x - 12.0) < 1e-9) } // stays on the meridian
  }

  test("east-west chord arcs poleward of its parallel; total length preserved") {
    val g = Algos.geodesicSegmentize(line("LINESTRING (-60 40, 60 40)"), 500000.0)
    val cs = coords(g)
    assert(cs.size == 20)
    assert(cs.map(_._2).max > 59.0 && cs.map(_._2).max < 59.5) // vertex lat 59.21
    val total = cs.sliding(2).map { case Seq((ax, ay), (bx, by)) =>
      Geodesy.haversine(ax, ay, bx, by)
    }.sum
    assert(math.abs(total - Geodesy.haversine(-60, 40, 60, 40)) < 1e-3)
  }

  test("antimeridian crossing: interpolated lons stay near +-180, no planar sweep") {
    val g = Algos.geodesicSegmentize(line("LINESTRING (179 10, -179 10)"), 60000.0)
    val cs = coords(g)
    assert(cs.size > 3)
    // every interpolated vertex is within the 2-degree lon corridor
    cs.foreach { case (x, _) => assert(math.abs(x) >= 179.0 - 1e-9, s"lon=$x") }
  }

  test("directSphere: inverse round-trip, meridian closed form, antimeridian wrap") {
    // distance round-trips under haversine on the shared radius
    for ((lon, lat, az, d) <- Seq((-122.4, 37.8, 63.0, 250000.0), (10.0, -45.0, 200.0, 80000.0),
                                  (179.5, 10.0, 90.0, 120000.0))) {
      val (lo2, la2) = CRS.directSphere(lon, lat, az, d)
      assert(math.abs(Geodesy.haversine(lon, lat, lo2, la2) - d) < 1e-4, s"($lon,$lat,$az)")
    }
    // due north adds exactly degrees(d/R)
    val (nlo, nla) = CRS.directSphere(12.0, 40.0, 0.0, 100000.0)
    assert(nlo == 12.0 && math.abs(nla - (40.0 + math.toDegrees(100000.0 / Geodesy.MeanEarthRadius))) < 1e-12)
    // eastbound across the antimeridian wraps into (-180, 180]
    val (wlo, _) = CRS.directSphere(179.9, 0.0, 90.0, 100000.0)
    assert(wlo < -179.0 && wlo >= -180.0, s"wrapped lon $wlo")
  }

  test("exactly antipodal endpoints: raw segment kept, no NaN vertices") {
    val g = Algos.geodesicSegmentize(line("LINESTRING (0 0, 180 0)"), 100000.0)
    val cs = coords(g)
    assert(cs == Seq((0.0, 0.0), (180.0, 0.0)))
    cs.foreach { case (x, y) => assert(!x.isNaN && !y.isNaN) }
  }

  test("polygon rings densify per ring; non-positive max and points pass through") {
    val p = WKT.read("POLYGON ((0 0, 20 0, 20 20, 0 0))")
    val d = Algos.geodesicSegmentize(p, 500000.0)
    assert(d.numPoints > p.numPoints)
    assert(Algos.geodesicSegmentize(p, 0.0) eq p)
    val pt = WKT.read("POINT (3 4)")
    assert(Algos.geodesicSegmentize(pt, 1000.0) eq pt)
  }
}
