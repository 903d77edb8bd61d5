package graft.api

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class GeoApiSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import GeoDataFrame.implicits._

  test("GeoDataFrame wraps by name convention and metadata marker") {
    val df = spark.range(3).selectExpr("id", "st_point(cast(id as double), 0.0) AS geometry")
    val g = df.geo
    assert(g.geometryColumn == "geometry")
    assert(g.crs.isEmpty)
    val tagged = g.withCrs("EPSG:4326")
    assert(tagged.crs.contains("EPSG:4326"))
    // metadata-driven detection on a non-default name
    val renamed = tagged.df.withColumnRenamed("geometry", "geom2")
    assert(GeoDataFrame(renamed).geometryColumn == "geom2")
  }

  test("toCrs reprojects and re-tags") {
    val g = spark.sql("SELECT st_point(10.0, 0.0) AS geometry").geo.withCrs("EPSG:4326")
    val merc = g.toCrs("EPSG:4326", "EPSG:3857")
    assert(merc.crs.contains("EPSG:3857"))
    val x = merc.df.selectExpr("st_x(geometry)").collect()(0).getDouble(0)
    assert(math.abs(x - 6378137.0 * math.toRadians(10.0)) < 1e-6)
  }

  test("toCrsWithOptions registers definitions from search paths (ProjOptions analog)") {
    // a custom Mercator clone under a private tag, provided as a search-path
    // file the way PROJ resource dirs supply definitions
    val dir = Files.createTempDirectory("graft_proj").toFile
    val f = new java.io.File(dir, "TEST_99901.proj4")
    Files.write(f.toPath,
      "+proj=merc +lon_0=0 +k=1 +x_0=0 +y_0=0 +ellps=WGS84 +units=m".getBytes)
    val g = spark.sql("SELECT st_point(10.0, 0.0) AS geometry").geo.withCrs("EPSG:4326")
    val out = g.toCrsWithOptions("EPSG:4326", "TEST:99901",
      graft.geom.CRS.ProjOptions(searchPaths = Seq(dir.getAbsolutePath)))
    assert(out.crs.contains("TEST:99901"))
    val x = out.df.selectExpr("st_x(geometry)").collect()(0).getDouble(0)
    assert(math.abs(x - 6378137.0 * math.toRadians(10.0)) < 1e-6)
    // unknown extension files are ignored; missing dirs are a no-op
    assert(graft.geom.CRS.registerSearchPaths(
      graft.geom.CRS.ProjOptions(Seq("/nonexistent"))).isEmpty)
  }

  test("spatialJoin through the wrapper matches reference shapes") {
    val pts = spark.range(9).selectExpr("id", "st_point(cast(id as double), 0.5) AS geometry").geo
    val box = spark.sql("SELECT st_makeenvelope(1.5, 0.0, 4.5, 1.0) AS geometry, 'b' AS tag").geo
    assert(pts.spatialJoin(box).count() == 3) // x in {2,3,4}
    assert(pts.spatialJoin(box, joinType = "left").count() == 9)
  }

  test("explodeParts repeats attribute columns per part") {
    val g = spark.sql(
      "SELECT 7 AS k, st_geomfromtext('MULTIPOINT ((1 1), (2 2), (3 3))') AS geometry").geo
    val parts = g.explodeParts()
    val rows = parts.df.selectExpr("k", "st_x(geometry)").collect()
    assert(rows.length == 3 && rows.forall(_.getInt(0) == 7))
  }

  test("GeoJSON: expressions round-trip and file reader") {
    val wkt = spark.sql(
      """SELECT st_astext(st_geomfromgeojson(st_asgeojson(
        |  st_geomfromtext('POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))')))) AS t""".stripMargin)
      .collect()(0).getString(0)
    assert(wkt == "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))")

    val dir = Files.createTempDirectory("geojson").toFile
    dir.deleteOnExit()
    val f = new java.io.File(dir, "fc.geojson")
    val fw = new java.io.FileWriter(f)
    fw.write(
      """{"type": "FeatureCollection", "features": [
        |  {"type": "Feature", "properties": {"name": "alpha", "pop": 10},
        |   "geometry": {"type": "Point", "coordinates": [1.5, 2.5]}},
        |  {"type": "Feature", "properties": {"name": "beta", "pop": 20},
        |   "geometry": {"type": "Polygon", "coordinates": [[[0,0],[2,0],[2,2],[0,2],[0,0]]]}}
        |]}""".stripMargin)
    fw.close()
    val g = GeoIO.readGeoJson(spark, f.getAbsolutePath)
    val rows = g.df.selectExpr("name", "pop", "st_geometrytype(geometry) AS t")
      .orderBy("name").collect()
    assert(rows.map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSeq ==
      Seq(("alpha", 10L, "Point"), ("beta", 20L, "Polygon")))
  }

  test("GeoJSON reader: newline-delimited features all survive") {
    val dir = Files.createTempDirectory("ndjson").toFile
    dir.deleteOnExit()
    val f = new java.io.File(dir, "features.geojsonl")
    val fw = new java.io.FileWriter(f)
    fw.write(
      """{"type": "Feature", "properties": {"n": 1}, "geometry": {"type": "Point", "coordinates": [1, 1]}}
        |{"type": "Feature", "properties": {"n": 2}, "geometry": {"type": "Point", "coordinates": [2, 2]}}
        |{"type": "Feature", "properties": {"n": 3}, "geometry": {"type": "Point", "coordinates": [3, 3]}}
        |""".stripMargin)
    fw.close()
    val g = GeoIO.readGeoJson(spark, f.getAbsolutePath)
    val rows = g.df.selectExpr("n", "st_x(geometry)").orderBy("n").collect()
    assert(rows.map(r => (r.getLong(0), r.getDouble(1))).toSeq ==
      Seq((1L, 1.0), (2L, 2.0), (3L, 3.0)))
  }

  test("GeoJSON reader: blank leading lines don't break NDJSON detection") {
    val dir = Files.createTempDirectory("ndjson_blank").toFile
    dir.deleteOnExit()
    val f = new java.io.File(dir, "features.geojsonl")
    val fw = new java.io.FileWriter(f)
    fw.write(
      "\n\n" + // leading blank lines: the probe must skip them
        """{"type": "Feature", "properties": {"n": 1}, "geometry": {"type": "Point", "coordinates": [1, 1]}}
          |
          |{"type": "Feature", "properties": {"n": 2}, "geometry": {"type": "Point", "coordinates": [2, 2]}}
          |""".stripMargin)
    fw.close()
    val g = GeoIO.readGeoJson(spark, f.getAbsolutePath)
    assert(g.df.count() == 2)
  }

  test("GeoJSON writer: NDJSON features round-trip through the reader") {
    graft.functions.GeoRegistry.register(spark)
    val dir = Files.createTempDirectory("geojson_write").toString + "/out"
    val src = spark.range(5).selectExpr(
      "id AS fid",
      "concat('f', id) AS tag",
      "CASE WHEN id = 3 THEN cast(null as binary) " +
        "ELSE st_point(cast(id as double), cast(id * 2 as double)) END AS geometry")
    GeoIO.writeGeoJson(GeoDataFrame(src), dir)
    val back = GeoIO.readGeoJson(spark, dir).df
    val rows = back.selectExpr("fid", "tag", "st_x(geometry) AS x").orderBy("fid").collect()
    assert(rows.length == 5)
    assert(rows.map(_.getString(1)).toSeq == Seq("f0", "f1", "f2", "f3", "f4"))
    assert(rows(2).getDouble(2) == 2.0)
    assert(rows(3).isNullAt(2)) // null geometry survives the round trip
  }

  test("datasets loader: cities fixture shape (202 rows, name + WKB point)") {
    val g = Datasets.readDataset(spark, "cities")
    assert(g.crs.contains("EPSG:4326"))
    assert(g.df.count() == 202)
    val r = g.df.selectExpr("name", "st_geomtypeid(geometry) AS t").collect()
    assert(r.forall(_.getInt(1) == 0))
    intercept[IllegalArgumentException] { Datasets.readDataset(spark, "nope") }
  }
}
