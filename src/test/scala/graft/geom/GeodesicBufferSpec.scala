package graft.geom

import org.scalatest.funsuite.AnyFunSuite

/** Geodesic buffer = AEQD projection about the center + planar buffer +
  * inverse. For POINT inputs the AEQD distance-preservation property makes
  * every ring vertex sit at EXACTLY the requested great-circle radius — the
  * invariant q270 oracles in SQL and these tests assert directly, including
  * at high latitude and across the antimeridian where naive lon/lat
  * arithmetic breaks.
  */
class GeodesicBufferSpec extends AnyFunSuite {
  private def pt(lon: Double, lat: Double) = WKT.read(s"POINT ($lon $lat)")

  private def sphereDist(ax: Double, ay: Double, bx: Double, by: Double): Double = {
    // haversine on the SAME mean radius the projection uses
    val f1 = math.toRadians(ay); val f2 = math.toRadians(by)
    val dl = math.toRadians(bx - ax)
    val a = math.pow(math.sin((f2 - f1) / 2), 2) +
      math.cos(f1) * math.cos(f2) * math.pow(math.sin(dl / 2), 2)
    2 * Geodesy.MeanEarthRadius * math.asin(math.min(1.0, math.sqrt(a)))
  }

  private def ringRadii(g: Geometry, cx: Double, cy: Double): Seq[Double] = {
    val coords = scala.collection.mutable.ArrayBuffer.empty[(Double, Double)]
    g.foreachCoord((x, y) => coords += ((x, y)))
    coords.toSeq.map { case (x, y) => sphereDist(cx, cy, x, y) }
  }

  test("point buffer: every vertex at exactly r, mid-latitudes and tropics") {
    for ((lon, lat) <- Seq((0.0, 0.0), (-122.4, 37.8), (151.2, -33.9), (18.4, 59.3));
         r <- Seq(1000.0, 100000.0)) {
      val b = Algos.geodesicBuffer(pt(lon, lat), r)
      assert(b != null, s"($lon,$lat,$r)")
      val radii = ringRadii(b, lon, lat)
      assert(radii.size == 33) // 4*quadSegs + closing vertex
      radii.foreach(d => assert(math.abs(d - r) < 1e-3, s"($lon,$lat,$r) d=$d"))
    }
  }

  test("high latitude and antimeridian: radii still exact, lons wrap sanely") {
    for ((lon, lat) <- Seq((179.95, 80.0), (-179.9, -72.0), (0.0, 89.0))) {
      val r = 50000.0
      val b = Algos.geodesicBuffer(pt(lon, lat), r)
      val radii = ringRadii(b, lon, lat)
      radii.foreach(d => assert(math.abs(d - r) < 1e-3, s"($lon,$lat) d=$d"))
    }
  }

  test("quadSegs controls vertex count; line buffer radius bounded by [r, r+extent distortion]") {
    val b = Algos.geodesicBuffer(pt(10, 45), 5000.0, 16)
    assert(ringRadii(b, 10, 45).size == 65)
    // extended geometry: a ~10 km line; every buffer vertex must be >= r from
    // the LINE (approximated via its endpoints/midpoint) and within small
    // relative distortion of r from the nearest line vertex
    val line = WKT.read("LINESTRING (10 45, 10.1 45.05)")
    val lb = Algos.geodesicBuffer(line, 2000.0)
    assert(lb != null)
    val anchors = Seq((10.0, 45.0), (10.1, 45.05), (10.05, 45.025))
    var minToLine = Double.MaxValue
    lb.foreachCoord { (x, y) =>
      val d = anchors.map { case (ax, ay) => sphereDist(ax, ay, x, y) }.min
      minToLine = math.min(minToLine, d)
    }
    // nearest ring vertex to the sampled line anchors ~ r (within 1%)
    assert(minToLine > 2000.0 * 0.99 && minToLine < 2000.0 * 1.01, s"minToLine=$minToLine")
  }

  test("AEQD forward/inverse round-trip across the oblique aspect") {
    val p = CRS.AzimuthalEquidistant(Geodesy.MeanEarthRadius, -30.0, 52.0)
    for ((lon, lat) <- Seq((-30.0, 52.0), (-35.2, 49.9), (10.0, 60.0), (-150.0, -10.0))) {
      val (x, y) = p.forward(lon, lat)
      val (lo, la) = p.inverse(x, y)
      assert(math.abs(lo - lon) < 1e-9 && math.abs(la - lat) < 1e-9, s"($lon,$lat)->($lo,$la)")
      // distance-from-center preservation: planar rho == great-circle dist
      val rho = math.hypot(x, y)
      assert(math.abs(rho - sphereDist(-30.0, 52.0, lon, lat)) < 1e-6)
    }
  }

  test("antimeridian-crossing line: projection centered ON the geometry, buffer stays local") {
    val line = WKT.read("LINESTRING (179.9 0, -179.9 0)") // ~22 km across the antimeridian
    val b = Algos.geodesicBuffer(line, 5000.0)
    assert(b != null)
    // every ring vertex within ~radius + half-line-length of the crossing
    // point (180, 0) — nothing sweeps the wrong way around the globe
    var maxD = 0.0
    b.foreachCoord { (x, y) =>
      val d = sphereDist(180.0, 0.0, x, y)
      maxD = math.max(maxD, d)
    }
    assert(maxD < 25000.0, s"maxD=$maxD")
  }

  test("degenerate inputs: non-positive radius, empty, null") {
    assert(Algos.geodesicBuffer(pt(0, 0), 0.0) == null)
    assert(Algos.geodesicBuffer(pt(0, 0), -5.0) == null)
    assert(Algos.geodesicBuffer(WKT.read("POLYGON EMPTY"), 10.0) == null)
    assert(Algos.geodesicBuffer(null, 10.0) == null)
  }
}
