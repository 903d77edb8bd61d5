package graft.sources

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.geom._

class MvtSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("spec example: Point(25,17) encodes commands [9, 50, 34]") {
    // vector-tile-spec 2.1 §4.3.5.1 worked example
    assert(MVT.commands(Point(25, 17)).toSeq == Seq(9L, 50L, 34L))
  }

  test("layer round-trips: version, extent, name, ids, geometry") {
    val feats = Seq(
      (7L, Point(100, 200): Geometry),
      (8L, LineString(Array(0.0, 0, 50, 60, 70, 80)): Geometry),
      (9L, Polygon(Array(
        Array(0.0, 0, 100, 0, 100, 100, 0, 100, 0, 0),
        Array(20.0, 20, 20, 40, 40, 40, 40, 20, 20, 20))): Geometry))
    val bytes = MVT.encodeLayer("roads", feats, extent = 4096)
    val layers = MVT.decode(bytes)
    assert(layers.length == 1)
    val l = layers.head
    assert(l.name == "roads" && l.version == 2 && l.extent == 4096)
    assert(l.features.map(_.id) == Seq(7L, 8L, 9L))
    assert(l.features.map(_.geomType) == Seq(1, 2, 3))
    // geometry reconstruction
    assert(MVT.commandsToGeom(1, l.features(0).commands) == Point(100, 200))
    val ls = MVT.commandsToGeom(2, l.features(1).commands).asInstanceOf[LineString]
    assert(ls.coords.toSeq == Seq(0.0, 0, 50, 60, 70, 80))
    val poly = MVT.commandsToGeom(3, l.features(2).commands).asInstanceOf[Polygon]
    assert(poly.rings.length == 2)
    assert(poly.rings(0).toSeq == Seq(0.0, 0, 100, 0, 100, 100, 0, 100, 0, 0))
    assert(poly.rings(1).toSeq == Seq(20.0, 20, 20, 40, 40, 40, 40, 20, 20, 20))
  }

  test("multi geometries keep the running cursor across parts") {
    val ml = MultiLineString(Array(
      LineString(Array(10.0, 10, 20, 20)), LineString(Array(30.0, 30, 25, 35))))
    val cmds = MVT.commands(ml)
    val back = MVT.commandsToGeom(2, cmds).asInstanceOf[MultiLineString]
    assert(back.geoms.map(_.coords.toSeq).toSeq ==
      Seq(Seq(10.0, 10, 20, 20), Seq(30.0, 30, 25, 35)))
    val mp = MultiPoint(Array(Point(5, 7), Point(3, 2)))
    val backMp = MVT.commandsToGeom(1, MVT.commands(mp)).asInstanceOf[MultiPoint]
    assert(backMp.geoms.toSeq == Seq(Point(5, 7), Point(3, 2)))
  }

  test("toTileCoords: z1 tile corners map to [0, extent]") {
    // tile (0,0) at z1 covers lon [-180,0], upper half; its center is
    // (-90, ~66.5) -> local (2048, 2048)
    val c = MVT.toTileCoords(Point(-90, 66.51326044311186), 1, 0, 0).asInstanceOf[Point]
    assert(math.abs(c.x - 2048) < 1e-6 && math.abs(c.y - 2048) < 1e-3)
    val west = MVT.toTileCoords(Point(-180, 85.05112878), 1, 0, 0).asInstanceOf[Point]
    assert(math.abs(west.x) < 1e-9 && math.abs(west.y) < 1e-6)
  }

  test("tileLayer: distributed tile build, counts, decodable payloads") {
    val spark2 = spark
    graft.functions.GeoRegistry.register(spark2)
    import spark2.implicits._
    // 100 points spread over the 4 z1 tiles (deterministic quadrant mix)
    val pts = (1 to 100).map { i =>
      val lon = if (i % 2 == 0) -90.0 + i * 0.1 else 90.0 - i * 0.1
      val lat = if (i % 4 < 2) 40.0 + (i % 10) else -40.0 - (i % 10)
      (i.toLong, WKB.write(Point(lon, lat)))
    }.toDF("fid", "geometry")
    val tiles = MVT.tileLayer(pts, "fid", "geometry", zoom = 1, layerName = "pts")
      .collect()
    assert(tiles.length == 4) // all four quadrant tiles occupied
    assert(tiles.map(_.getLong(3)).sum == 100)
    tiles.foreach { r =>
      val layers = MVT.decode(r.getAs[Array[Byte]]("mvt"))
      assert(layers.head.name == "pts")
      assert(layers.head.features.length == r.getLong(3))
      // every local coordinate decodes inside the tile (points were
      // assigned by their own location)
      layers.head.features.foreach { f =>
        val p = MVT.commandsToGeom(1, f.commands).asInstanceOf[Point]
        assert(p.x >= 0 && p.x <= 4096 && p.y >= 0 && p.y <= 4096,
          s"local coord out of tile: $p")
      }
    }
  }
}
