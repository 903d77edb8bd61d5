package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.geom._

class OgcXmlSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def tmpFile(name: String, content: String): String = {
    val dir = Files.createTempDirectory("ogcxml").toFile
    dir.deleteOnExit()
    val f = new java.io.File(dir, name)
    f.deleteOnExit()
    Files.write(f.toPath, content.getBytes(StandardCharsets.UTF_8))
    f.getAbsolutePath
  }

  // ---------------------------------------------------------------- KML

  private val kmlDoc =
    """<?xml version="1.0" encoding="UTF-8"?>
      |<kml xmlns="http://www.opengis.net/kml/2.2">
      |<Document><name>doc</name>
      |  <Folder><name>cities</name>
      |    <Placemark>
      |      <name>alpha</name><description>first &amp; best</description>
      |      <ExtendedData><Data name="pop"><value>120</value></Data></ExtendedData>
      |      <Point><coordinates>10.5,-3.25,99</coordinates></Point>
      |    </Placemark>
      |    <Placemark>
      |      <name>beta</name>
      |      <LineString><coordinates>0,0 1,1 2,0.5</coordinates></LineString>
      |    </Placemark>
      |  </Folder>
      |  <Placemark>
      |    <name>gamma</name>
      |    <Polygon>
      |      <outerBoundaryIs><LinearRing><coordinates>0,0 4,0 4,4 0,4 0,0</coordinates></LinearRing></outerBoundaryIs>
      |      <innerBoundaryIs><LinearRing><coordinates>1,1 2,1 2,2 1,2 1,1</coordinates></LinearRing></innerBoundaryIs>
      |    </Polygon>
      |  </Placemark>
      |  <Placemark><name>nogeom</name></Placemark>
      |  <Placemark>
      |    <name>multi</name>
      |    <MultiGeometry>
      |      <Point><coordinates>1,2</coordinates></Point>
      |      <Point><coordinates>3,4</coordinates></Point>
      |    </MultiGeometry>
      |  </Placemark>
      |</Document>
      |</kml>""".stripMargin

  test("KML: placemarks, folders, extended data, geometry types") {
    val path = tmpFile("t.kml", kmlDoc)
    val df = OgcXml.readKml(spark, path)
    val rows = df.collect().map(r => r.getAs[String]("name") -> r).toMap
    assert(rows.size == 5)
    val alpha = rows("alpha")
    assert(alpha.getAs[String]("description") == "first & best")
    assert(alpha.getAs[String]("folder") == "doc/cities")
    assert(alpha.getAs[Map[String, String]]("extended") == Map("pop" -> "120"))
    assert(WKB.readOrNull(alpha.getAs[Array[Byte]]("geometry")) == Point(10.5, -3.25))
    val beta = WKB.readOrNull(rows("beta").getAs[Array[Byte]]("geometry"))
    assert(beta == LineString(Array(0.0, 0, 1, 1, 2, 0.5)))
    val gamma = WKB.readOrNull(rows("gamma").getAs[Array[Byte]]("geometry"))
      .asInstanceOf[Polygon]
    assert(gamma.rings.length == 2)
    assert(rows("gamma").getAs[String]("folder") == "doc")
    assert(rows("nogeom").getAs[Array[Byte]]("geometry") == null)
    val multi = WKB.readOrNull(rows("multi").getAs[Array[Byte]]("geometry"))
    assert(multi == MultiPoint(Array(Point(1, 2), Point(3, 4))))
  }

  test("KML: write -> read round-trip is exact (Double.toString)") {
    import spark.implicits._
    val src = Seq(
      ("a", 0.1 + 0.2, WKB.write(Point(1.0 / 3.0, -2.0 / 7.0))),
      ("b", 42.0, WKB.write(Polygon(Array(Array(0.0, 0, 1, 0, 1, 1, 0, 0))))),
      ("c", -1.5, WKB.write(MultiLineString(Array(
        LineString(Array(0.0, 0, 1, 1)), LineString(Array(2.0, 2, 3, 3))))))
    ).toDF("name", "score", "geometry")
    val dir = Files.createTempDirectory("kmlrt").toFile
    dir.deleteOnExit()
    val path = new java.io.File(dir, "rt.kml").getAbsolutePath
    OgcXml.writeKml(src, path)
    val back = OgcXml.readKml(spark, path).collect()
      .map(r => r.getAs[String]("name") ->
        (r.getAs[Map[String, String]]("extended"), WKB.readOrNull(r.getAs[Array[Byte]]("geometry"))))
      .toMap
    assert(back("a")._1("score").toDouble == 0.1 + 0.2)
    assert(back("a")._2 == Point(1.0 / 3.0, -2.0 / 7.0))
    assert(back("b")._2.isInstanceOf[Polygon])
    // MultiLineString round-trips through MultiGeometry
    assert(back("c")._2 == MultiLineString(Array(
      LineString(Array(0.0, 0, 1, 1)), LineString(Array(2.0, 2, 3, 3)))))
  }

  test("KML: fid follows document order") {
    val path = tmpFile("f.kml", kmlDoc)
    val df = OgcXml.readKml(spark, path, withFid = true)
    val byFid = df.collect().map(r => r.getAs[Long]("fid") -> r.getAs[String]("name")).toMap
    assert(byFid == Map(0L -> "alpha", 1L -> "beta", 2L -> "gamma", 3L -> "nogeom", 4L -> "multi"))
  }

  // ---------------------------------------------------------------- GPX

  private val gpxDoc =
    """<?xml version="1.0" encoding="UTF-8"?>
      |<gpx version="1.1" creator="t" xmlns="http://www.topografix.com/GPX/1/1">
      |  <wpt lat="47.5" lon="-122.25"><ele>12.5</ele><time>2024-01-02T03:04:05Z</time><name>w1</name></wpt>
      |  <wpt lat="-1.5" lon="30.75"><name>w2</name></wpt>
      |  <rte><name>r1</name>
      |    <rtept lat="0" lon="0"><ele>1</ele></rtept>
      |    <rtept lat="1" lon="1"/>
      |    <rtept lat="2" lon="1.5"/>
      |  </rte>
      |  <trk><name>t1</name>
      |    <trkseg>
      |      <trkpt lat="10" lon="20"><ele>100</ele></trkpt>
      |      <trkpt lat="11" lon="21"/>
      |    </trkseg>
      |    <trkseg>
      |      <trkpt lat="12" lon="22"/>
      |      <trkpt lat="13" lon="23"/>
      |    </trkseg>
      |  </trk>
      |</gpx>""".stripMargin

  test("GPX: all five layers") {
    val path = tmpFile("t.gpx", gpxDoc)
    val wpts = OgcXml.readGpx(spark, path, "waypoints").collect()
      .map(r => r.getAs[String]("name") -> r).toMap
    assert(wpts.size == 2)
    assert(WKB.readOrNull(wpts("w1").getAs[Array[Byte]]("geometry")) == Point(-122.25, 47.5))
    assert(wpts("w1").getAs[Double]("ele") == 12.5)
    assert(wpts("w1").getAs[String]("time") == "2024-01-02T03:04:05Z")
    assert(wpts("w2").isNullAt(wpts("w2").fieldIndex("ele")))

    val routes = OgcXml.readGpx(spark, path, "routes").collect()
    assert(routes.length == 1)
    assert(WKB.readOrNull(routes(0).getAs[Array[Byte]]("geometry")) ==
      LineString(Array(0.0, 0, 1, 1, 1.5, 2)))

    val tracks = OgcXml.readGpx(spark, path, "tracks").collect()
    assert(tracks.length == 1)
    assert(WKB.readOrNull(tracks(0).getAs[Array[Byte]]("geometry")) ==
      MultiLineString(Array(
        LineString(Array(20.0, 10, 21, 11)), LineString(Array(22.0, 12, 23, 13)))))

    val tp = OgcXml.readGpx(spark, path, "track_points").collect()
    assert(tp.length == 4)
    assert(tp.map(r => (r.getAs[Long]("track_fid"), r.getAs[Long]("track_seg_id"),
      r.getAs[Long]("track_seg_point_id"))).toSet ==
      Set((0L, 0L, 0L), (0L, 0L, 1L), (0L, 1L, 0L), (0L, 1L, 1L)))

    val rp = OgcXml.readGpx(spark, path, "route_points").collect()
    assert(rp.length == 3)
    assert(rp.count(!_.isNullAt(2)) == 1) // only the first rtept has ele

    intercept[IllegalArgumentException](OgcXml.readGpx(spark, path, "nope"))
  }

  test("GPX: waypoint write -> read round-trip") {
    import spark.implicits._
    val src = Seq(
      ("p1", 3.25, "2024-06-01T00:00:00Z", WKB.write(Point(-0.125, 51.5))),
      ("p2", -7.5, null, WKB.write(Point(2.35, 48.85))))
      .toDF("name", "ele", "time", "geometry")
    val dir = Files.createTempDirectory("gpxrt").toFile
    dir.deleteOnExit()
    val path = new java.io.File(dir, "rt.gpx").getAbsolutePath
    OgcXml.writeGpx(src, path)
    val back = OgcXml.readGpx(spark, path).collect()
      .map(r => r.getAs[String]("name") -> r).toMap
    assert(WKB.readOrNull(back("p1").getAs[Array[Byte]]("geometry")) == Point(-0.125, 51.5))
    assert(back("p1").getAs[Double]("ele") == 3.25)
    assert(back("p2").getAs[String]("time") == null)
  }

  // ---------------------------------------------------------------- GML

  private val gmlDoc =
    """<?xml version="1.0" encoding="UTF-8"?>
      |<wfs:FeatureCollection xmlns:wfs="http://www.opengis.net/wfs"
      |    xmlns:gml="http://www.opengis.net/gml" xmlns:app="http://example.com/app">
      |  <gml:featureMember>
      |    <app:city gml:id="c1">
      |      <app:cname>oslo</app:cname><app:pop>700000</app:pop>
      |      <app:geom><gml:Point><gml:pos>10.75 59.91</gml:pos></gml:Point></app:geom>
      |    </app:city>
      |  </gml:featureMember>
      |  <gml:featureMember>
      |    <app:road gml:id="r1">
      |      <app:rname>e6</app:rname>
      |      <app:geom><gml:LineString><gml:posList>0 0 1 1 2 3</gml:posList></gml:LineString></app:geom>
      |    </app:road>
      |  </gml:featureMember>
      |  <gml:featureMember>
      |    <app:zone gml:id="z1">
      |      <app:geom>
      |        <gml:Polygon>
      |          <gml:exterior><gml:LinearRing><gml:posList>0 0 5 0 5 5 0 5 0 0</gml:posList></gml:LinearRing></gml:exterior>
      |          <gml:interior><gml:LinearRing><gml:posList>1 1 2 1 2 2 1 2 1 1</gml:posList></gml:LinearRing></gml:interior>
      |        </gml:Polygon>
      |      </app:geom>
      |    </app:zone>
      |  </gml:featureMember>
      |  <gml:featureMember>
      |    <app:old gml:id="o1">
      |      <app:geom>
      |        <gml:Polygon>
      |          <gml:outerBoundaryIs><gml:LinearRing><gml:coordinates>0,0 2,0 2,2 0,0</gml:coordinates></gml:LinearRing></gml:outerBoundaryIs>
      |        </gml:Polygon>
      |      </app:geom>
      |    </app:old>
      |  </gml:featureMember>
      |  <gml:featureMember>
      |    <app:m gml:id="m1">
      |      <app:geom>
      |        <gml:MultiSurface>
      |          <gml:surfaceMember><gml:Polygon><gml:exterior><gml:LinearRing><gml:posList>0 0 1 0 1 1 0 0</gml:posList></gml:LinearRing></gml:exterior></gml:Polygon></gml:surfaceMember>
      |          <gml:surfaceMember><gml:Polygon><gml:exterior><gml:LinearRing><gml:posList>5 5 6 5 6 6 5 5</gml:posList></gml:LinearRing></gml:exterior></gml:Polygon></gml:surfaceMember>
      |        </gml:MultiSurface>
      |      </app:geom>
      |    </app:m>
      |  </gml:featureMember>
      |  <gml:featureMember>
      |    <app:z3 gml:id="d3">
      |      <app:geom><gml:LineString><gml:posList srsDimension="3">0 0 9 1 1 9</gml:posList></gml:LineString></app:geom>
      |    </app:z3>
      |  </gml:featureMember>
      |</wfs:FeatureCollection>""".stripMargin

  test("GML: features, GML2+GML3 geometries, srsDimension=3") {
    val path = tmpFile("t.gml", gmlDoc)
    val rows = OgcXml.readGml(spark, path).collect()
      .map(r => r.getAs[String]("fid") -> r).toMap
    assert(rows.size == 6)
    assert(rows("c1").getAs[Map[String, String]]("properties") ==
      Map("cname" -> "oslo", "pop" -> "700000"))
    assert(WKB.readOrNull(rows("c1").getAs[Array[Byte]]("geometry")) == Point(10.75, 59.91))
    assert(WKB.readOrNull(rows("r1").getAs[Array[Byte]]("geometry")) ==
      LineString(Array(0.0, 0, 1, 1, 2, 3)))
    val z = WKB.readOrNull(rows("z1").getAs[Array[Byte]]("geometry")).asInstanceOf[Polygon]
    assert(z.rings.length == 2)
    val old = WKB.readOrNull(rows("o1").getAs[Array[Byte]]("geometry")).asInstanceOf[Polygon]
    assert(old.rings(0).length == 8)
    val m = WKB.readOrNull(rows("m1").getAs[Array[Byte]]("geometry"))
    assert(m.isInstanceOf[MultiPolygon])
    assert(m.asInstanceOf[MultiPolygon].geoms.length == 2)
    // srsDimension=3: z ordinate dropped
    assert(WKB.readOrNull(rows("d3").getAs[Array[Byte]]("geometry")) ==
      LineString(Array(0.0, 0, 1, 1)))
  }

  test("KML: whitespace after commas in coordinates (real-world tolerance)") {
    val doc =
      """<?xml version="1.0"?><kml><Document>
        |<Placemark><name>sp</name><LineString><coordinates>
        |  10.5, -3.25  11.0 ,4.5
        |  12.25 , 6.0
        |</coordinates></LineString></Placemark>
        |</Document></kml>""".stripMargin
    val g = OgcXml.readKml(spark, tmpFile("sp.kml", doc)).collect()
    assert(WKB.readOrNull(g(0).getAs[Array[Byte]]("geometry")) ==
      LineString(Array(10.5, -3.25, 11.0, 4.5, 12.25, 6.0)))
  }

  test("malformed coordinates -> NULL geometry, rows kept (codec contract)") {
    val badKml =
      """<?xml version="1.0"?><kml><Document>
        |<Placemark><name>bad</name><Point><coordinates>not,numbers</coordinates></Point></Placemark>
        |<Placemark><name>ok</name><Point><coordinates>1,2</coordinates></Point></Placemark>
        |</Document></kml>""".stripMargin
    val kml = OgcXml.readKml(spark, tmpFile("bad.kml", badKml)).collect()
      .map(r => r.getAs[String]("name") -> r.getAs[Array[Byte]]("geometry")).toMap
    assert(kml("bad") == null && kml("ok") != null)

    val badGpx =
      """<?xml version="1.0"?><gpx>
        |<wpt lat="oops" lon="1"><name>b</name><ele>junk</ele></wpt>
        |<wpt lat="2" lon="3"><name>g</name></wpt>
        |<trk><name>t</name><trkseg>
        |  <trkpt lat="0" lon="0"/><trkpt lat="zz" lon="1"/><trkpt lat="1" lon="1"/>
        |</trkseg></trk>
        |</gpx>""".stripMargin
    val p = tmpFile("bad.gpx", badGpx)
    val w = OgcXml.readGpx(spark, p).collect()
      .map(r => r.getAs[String]("name") -> r.getAs[Array[Byte]]("geometry")).toMap
    assert(w("b") == null && w("g") != null)
    // the unparseable trkpt is skipped, the track survives with 2 points
    val t = OgcXml.readGpx(spark, p, "tracks").collect()
    assert(WKB.readOrNull(t(0).getAs[Array[Byte]]("geometry")) ==
      MultiLineString(Array(LineString(Array(0.0, 0, 1, 1)))))
  }

  test("readFile facade dispatches .kml/.gpx/.gml") {
    val kml = graft.api.GeoIO.readFile(spark, tmpFile("d.kml", kmlDoc))
    assert(kml.df.count() == 5)
    val gpx = graft.api.GeoIO.readFile(spark, tmpFile("d.gpx", gpxDoc),
      graft.api.GeoIO.ReadOptions(layer = Some("tracks")))
    assert(gpx.df.count() == 1)
    val gml = graft.api.GeoIO.readFile(spark, tmpFile("d.gml", gmlDoc))
    assert(gml.df.count() == 6)
    // facade options compose: bbox filter on KML points
    val boxed = graft.api.GeoIO.readFile(spark, tmpFile("e.kml", kmlDoc),
      graft.api.GeoIO.ReadOptions(bbox = Some((10.0, -4.0, 11.0, 0.0))))
    assert(boxed.df.collect().map(_.getAs[String]("name")).toSet == Set("alpha"))
  }
}
