package graft.geom

import org.scalatest.funsuite.AnyFunSuite

class GeohashSpec extends AnyFunSuite {

  test("published vectors") {
    // Wikipedia's canonical example: 57.64911 N, 10.40744 E
    assert(Geohash.encode(10.40744, 57.64911, 11) == "u4pruydqqvj")
    assert(Geohash.encode(10.40744, 57.64911, 6) == "u4pruy")
    // original Niemeyer example
    assert(Geohash.encode(-5.6, 42.6, 5) == "ezs42")
  }

  test("range and precision guards => null") {
    assert(Geohash.encode(181.0, 0.0, 6) == null)
    assert(Geohash.encode(0.0, -91.0, 6) == null)
    assert(Geohash.encode(Double.NaN, 0.0, 6) == null)
    assert(Geohash.encode(0.0, 0.0, 0) == null)
    assert(Geohash.encode(0.0, 0.0, 13) == null)
  }

  test("poles and antimeridian clamp into the last cell") {
    assert(Geohash.encode(180.0, 90.0, 4) != null)
    assert(Geohash.encode(-180.0, -90.0, 4) == "0000")
  }

  test("decodeBounds inverts encode (cell contains the point; re-encoding the center is stable)") {
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 500) {
      val lon = rnd.nextDouble() * 360 - 180
      val lat = rnd.nextDouble() * 180 - 90
      val p = 1 + rnd.nextInt(12)
      val h = Geohash.encode(lon, lat, p)
      val b = Geohash.decodeBounds(h)
      assert(lon >= b(0) && lon <= b(2) && lat >= b(1) && lat <= b(3),
        s"($lon,$lat) outside cell of $h")
      val ch = Geohash.encode((b(0) + b(2)) / 2, (b(1) + b(3)) / 2, p)
      assert(ch == h)
    }
  }

  test("prefix nesting: longer hash is inside the shorter cell") {
    val b5 = Geohash.decodeBounds("u4pru")
    val b8 = Geohash.decodeBounds("u4pruydq")
    assert(b8(0) >= b5(0) && b8(2) <= b5(2) && b8(1) >= b5(1) && b8(3) <= b5(3))
  }

  test("invalid decode input => null") {
    assert(Geohash.decodeBounds("abc!") == null) // '!' and 'a' not in the alphabet
    assert(Geohash.decodeBounds("") == null)
    assert(Geohash.decodeBounds(null) == null)
  }

  test("st_geohash / st_geomfromgeohash SQL round-trip") {
    val spark = graft.TestSpark.spark
    val r = spark.sql(
      """SELECT st_geohash(st_point(10.40744d, 57.64911d), 6) AS gh,
        |  st_astext(st_geomfromgeohash('u4pruy')) AS cell,
        |  st_intersects(st_geomfromgeohash(st_geohash(st_point(1.5d, 2.5d), 8)),
        |                st_point(1.5d, 2.5d)) AS holds,
        |  st_geohash(st_point(200.0d, 0.0d), 6) AS bad,
        |  st_geomfromgeohash('not a hash') AS badcell""".stripMargin).head()
    assert(r.getString(0) == "u4pruy")
    assert(r.getString(1).startsWith("POLYGON"))
    assert(r.getBoolean(2))
    assert(r.isNullAt(3) && r.isNullAt(4))
  }
}
