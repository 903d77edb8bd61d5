package graft.geom

import org.scalatest.funsuite.AnyFunSuite

/** Karney-style geodesic inverse: cross-validated against Vincenty where
  * Vincenty converges, and against closed-form meridian arcs where it
  * does not (the near-antipodal region Vincenty handles with a haversine
  * fallback that is off by up to ~0.5%). */
class KarneySpec extends AnyFunSuite {

  // rectifying semicircumference: pi * A1-scaled minor-axis series — the
  // same independent constant the TM series uses (a1 in CRS.TransverseMercator)
  private val meridianHalf = {
    val f = Geodesy.WGS84_F
    val n = f / (2 - f)
    val a1 = Geodesy.WGS84_A / (1 + n) * (1 + n * n / 4 + n * n * n * n / 64)
    math.Pi * a1
  }

  test("agrees with Vincenty to sub-mm away from the antipodal region") {
    var checked = 0
    for {
      lat1 <- Seq(-80.0, -45.0, -10.0, 0.0, 23.5, 60.0, 89.0)
      lat2 <- Seq(-75.0, -30.0, 0.0, 15.0, 52.0, 88.0)
      dlon <- Seq(0.0, 0.5, 30.0, 90.0, 150.0, 170.0)
    } {
      val v = Geodesy.vincenty(10.0, lat1, 10.0 + dlon, lat2)
      val k = Geodesy.karney(10.0, lat1, 10.0 + dlon, lat2)
      // skip pairs where Vincenty itself fell back (still non-antipodal
      // here, so it should not) — require mm agreement
      assert(math.abs(v - k) < 1e-3, s"($lat1, $lat2, dlon=$dlon): v=$v k=$k")
      checked += 1
    }
    assert(checked > 200)
  }

  test("closed-form anchors: meridian, poles, equator") {
    // pole to pole = rectifying semicircumference
    assert(math.abs(Geodesy.karney(7.0, 90.0, 123.0, -90.0) - meridianHalf) < 1e-3)
    // equatorial antipodes route over the pole: same constant
    assert(math.abs(Geodesy.karney(0.0, 0.0, 180.0, 0.0) - meridianHalf) < 1e-3)
    // short equatorial segment: exactly a * dlon
    val d = Geodesy.karney(5.0, 0.0, 6.0, 0.0)
    assert(math.abs(d - Geodesy.WGS84_A * math.toRadians(1.0)) < 1e-6)
    // meridional arc equals Vincenty's meridional value
    assert(math.abs(Geodesy.karney(30.0, -20.0, 30.0, 41.0) -
      Geodesy.vincenty(30.0, -20.0, 30.0, 41.0)) < 1e-3)
  }

  test("near-antipodal: finite, symmetric, bounded by pi*a and continuous") {
    // Vincenty diverges here (falls back to haversine); Karney must give a
    // symmetric, smoothly-varying distance close to (but under) pi * a
    val pairs = Seq(
      ((0.0, 30.0), (179.5, -29.7)),
      ((10.0, 5.0), (-170.2, -4.9)),
      ((0.0, 41.0), (179.9, -41.05)))
    pairs.foreach { case ((lo1, la1), (lo2, la2)) =>
      val d12 = Geodesy.karney(lo1, la1, lo2, la2)
      val d21 = Geodesy.karney(lo2, la2, lo1, la1)
      assert(math.abs(d12 - d21) < 1e-3, s"symmetry @($la1,$la2)")
      assert(d12 > 1.9e7 && d12 <= math.Pi * Geodesy.WGS84_A + 1,
        s"magnitude $d12")
    }
    // continuity: 0.01-degree nudges move the distance by < 2.5 km
    val base = Geodesy.karney(0.0, 30.0, 179.5, -29.7)
    val nudged = Geodesy.karney(0.0, 30.0, 179.51, -29.7)
    assert(math.abs(base - nudged) < 2500.0)
  }
}
