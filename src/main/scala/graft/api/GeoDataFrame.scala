package graft.api

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{Metadata, MetadataBuilder}

import graft.spatial.SpatialJoin

/**
 * GeoDataFrame: a DataFrame with one designated geometry column.
 *
 * Parity with the reference's `GeoDataFrame(pl.DataFrame)` (reference:
 * python/geopolars/internals/geodataframe.py:12-83): default geometry column
 * name "geometry", `.geometry` accessor, all host-DataFrame methods reachable
 * through `.df`. Where the reference is blocked on Polars extension types
 * and threads `_geom_type` through Python (README.md:37-46), Spark column
 * `Metadata` carries the geometry marker + CRS natively, surviving
 * select/join/write.
 */
final case class GeoDataFrame(df: DataFrame, geometryColumn: String = GeoDataFrame.DefaultGeometry) {

  require(df.columns.contains(geometryColumn),
    s"geometry column '$geometryColumn' not in ${df.columns.mkString("[", ", ", "]")}")

  /** The geometry column (reference: geodataframe.py:28-65 `.geometry`). */
  def geometry: Column = df(geometryColumn)

  /** CRS recorded in column metadata, if any. */
  def crs: Option[String] = {
    val md = df.schema(geometryColumn).metadata
    if (md.contains(GeoDataFrame.CrsKey)) Some(md.getString(GeoDataFrame.CrsKey)) else None
  }

  /** Attach/replace the CRS marker on the geometry column's metadata. */
  def withCrs(crsId: String): GeoDataFrame = {
    val md: Metadata = new MetadataBuilder()
      .withMetadata(df.schema(geometryColumn).metadata)
      .putBoolean(GeoDataFrame.GeometryKey, true)
      .putString(GeoDataFrame.CrsKey, crsId)
      .build()
    GeoDataFrame(df.withColumn(geometryColumn, df(geometryColumn).as(geometryColumn, md)), geometryColumn)
  }

  /** Reproject the geometry column (reference to_crs, geoseries.rs:148-161). */
  def toCrs(from: String, to: String): GeoDataFrame =
    GeoDataFrame(
      df.withColumn(geometryColumn, expr(s"st_transform($geometryColumn, '$from', '$to')")),
      geometryColumn).withCrs(to)

  /** Reproject with a resolution-options object (reference
    * to_crs_with_options + ProjOptions, geoseries.rs:253-266 /
    * proj.rs:12-31): the options' search paths are scanned for custom CRS
    * definition files (`<TAG>.proj4` / `<TAG>.projjson`) and registered
    * before transforming — the offline analog of PROJ resource dirs. */
  def toCrsWithOptions(from: String, to: String,
      options: graft.geom.CRS.ProjOptions): GeoDataFrame = {
    graft.geom.CRS.registerSearchPaths(options)
    toCrs(from, to)
  }

  /** Spatial join (reference spatial_join, spatial_index.rs:37-204). */
  def spatialJoin(
      other: GeoDataFrame,
      predicate: String = "intersects",
      joinType: String = "inner",
      lSuffix: String = "_left",
      rSuffix: String = "_right"): DataFrame =
    SpatialJoin.join(df, other.df, SpatialJoin.Predicate.parse(predicate), joinType,
      geometryColumn, other.geometryColumn, lSuffix, rSuffix)

  /** Explode multi-part geometries to one row per part (reference explode). */
  def explodeParts(): GeoDataFrame = {
    val others = df.columns.filter(_ != geometryColumn).map(col)
    GeoDataFrame(
      df.select(others :+ explode(expr(s"st_dump($geometryColumn)")).as(geometryColumn): _*),
      geometryColumn)
  }

  /** Dissolve geometries per group — globally when `by` is empty — via the
    * distributed two-stage grid plan ([[graft.spatial.Dissolve.unionAll]]:
    * per-cell st_union_agg across the cluster, final merge bounded by the
    * grid). The geopandas-style `dissolve(by)` / unary_union surface
    * (reference reserves unary_union at geoseries.rst:104-112). */
  def dissolve(by: Seq[String] = Nil, cells: Int = 16): GeoDataFrame =
    GeoDataFrame(
      graft.spatial.Dissolve.unionAll(df, geometryColumn, by, cells)
        .withColumnRenamed("union_geom", geometryColumn),
      geometryColumn)

  /** Write as GeoParquet with a bbox covering column. */
  def writeGeoParquet(path: String, mode: String = "overwrite"): Unit =
    graft.sources.GeoParquet.write(df, path, geometryColumn, mode)
}

object GeoDataFrame {
  val DefaultGeometry = "geometry"
  val GeometryKey = "graft.geometry"
  val CrsKey = "graft.crs"

  /** Wrap a DataFrame, detecting the geometry column by metadata marker
    * first, then by the conventional name (reference: name convention,
    * geodataframe.py:12 + file `geo` metadata, io/file.py:112-119). */
  def apply(df: DataFrame): GeoDataFrame = {
    val byMeta = df.schema.fields.find(f =>
      f.metadata.contains(GeometryKey) && f.metadata.getBoolean(GeometryKey))
    val name = byMeta.map(_.name).getOrElse(DefaultGeometry)
    GeoDataFrame(df, name)
  }

  object implicits {
    implicit class RichDataFrame(private val df: DataFrame) extends AnyVal {
      /** `df.geo` — the reference's `.geo` backend accessor analog. */
      def geo: GeoDataFrame = GeoDataFrame(df)
    }
  }
}

/**
 * IO entry points paralleling the reference's readers
 * (python/geopolars/io/file.py, convert.py, datasets/__init__.py).
 */
object GeoIO {

  /**
   * Option set of the reference's `read_file`
   * (python/geopolars/io/file.py:15-119), re-expressed Spark-first:
   * `columns` => column pruning, `where` => a SQL predicate pushed into the
   * scan plan, `bbox` => index pushdown (FlatGeobuf) or an envelope filter,
   * `skipFeatures`/`maxFeatures` => offset/limit, `fids` => record-number
   * selection (formats with a stored record order: .fgb, .shp), `sql` =>
   * arbitrary Spark SQL over the layer registered as `layer`,
   * `encoding` => DBF codepage (shapefiles; other supported formats are
   * UTF-8 by spec), `readGeometry = false` => filters still see the real
   * geometry but the returned column is NULL (the reference returns a
   * plain frame, io/file.py:53-55), `force2d` => Z/M ordinates stripped
   * via st_force2d instead of nulling out (the engine is 2D-native),
   * `sqlDialect` => only Spark SQL exists here, so anything other than
   * "spark" fails loud rather than mis-parsing OGRSQL/SQLITE clauses.
   */
  final case class ReadOptions(
      columns: Seq[String] = Nil,
      where: Option[String] = None,
      bbox: Option[(Double, Double, Double, Double)] = None,
      skipFeatures: Int = 0,
      maxFeatures: Int = -1,
      fids: Seq[Long] = Nil,
      sql: Option[String] = None,
      layer: Option[String] = None,
      encoding: Option[String] = None,
      readGeometry: Boolean = true,
      force2d: Boolean = false,
      sqlDialect: Option[String] = None)

  /**
   * Format-dispatching reader (the reference's `read_file`): .geojson /
   * .json / .ndjson, .shp, .gpkg, .fgb, .parquet / GeoParquet, .arrow —
   * chosen by extension — with the OGR-style option set applied on top of
   * the native reader. Options the underlying format can push down are
   * pushed (FlatGeobuf bbox via the packed R-tree; columns/where prune into
   * any columnar scan through Catalyst); the rest apply as plan operators.
   */
  def readFile(
      spark: SparkSession,
      path: String,
      options: ReadOptions = ReadOptions()): GeoDataFrame = {
    graft.functions.GeoRegistry.register(spark)
    options.sqlDialect.foreach { d =>
      require(d.equalsIgnoreCase("spark"),
        s"sql_dialect '$d' not supported: queries run as Spark SQL " +
          "(OGRSQL/SQLITE dialects have no engine here)")
    }
    val lower = path.toLowerCase
    val needFid = options.fids.nonEmpty
    val base: GeoDataFrame =
      if (lower.endsWith(".geojson") || lower.endsWith(".json") || lower.endsWith(".ndjson"))
        readGeoJson(spark, path)
      else if (lower.endsWith(".shp") || lower.endsWith(".shp.zip"))
        GeoDataFrame(graft.sources.Shapefile.read(spark, path, withFid = needFid,
          encoding = options.encoding))
      else if (lower.endsWith(".gpkg")) readGeoPackage(spark, path, options.layer)
      else if (lower.endsWith(".fgb"))
        GeoDataFrame(graft.sources.FlatGeobuf.read(spark, path,
          bbox = options.bbox, withFid = needFid))
      else if (lower.endsWith(".parquet")) readParquet(spark, path)
      else if (lower.endsWith(".arrow") || lower.endsWith(".ipc"))
        readArrow(spark, path)
      else if (lower.endsWith(".kml"))
        GeoDataFrame(graft.sources.OgcXml.readKml(spark, path, withFid = needFid))
      else if (lower.endsWith(".gpx"))
        GeoDataFrame(graft.sources.OgcXml.readGpx(spark, path,
          options.layer.getOrElse("waypoints")))
      else if (lower.endsWith(".gml"))
        GeoDataFrame(graft.sources.OgcXml.readGml(spark, path))
      else
        // directories: sniff by contents, preferring the indexed format
        GeoDataFrame(graft.sources.FlatGeobuf.read(spark, path,
          bbox = options.bbox, withFid = needFid))

    var df = base.df
    val geomCol = base.geometryColumn
    // Z/M inputs would otherwise decode to NULL (the engine is 2D-native);
    // force2d strips the extra ordinates first, so every later step —
    // bbox/where filters included — sees the salvaged 2D geometry
    if (options.force2d)
      df = df.withColumn(geomCol,
        org.apache.spark.sql.functions.expr(s"st_force2d(`$geomCol`)"))
    if (needFid && df.columns.contains("fid"))
      df = df.filter(org.apache.spark.sql.functions.col("fid")
        .isin(options.fids.map(Long.box): _*))
    options.bbox.foreach { case (x0, y0, x1, y1) =>
      // formats without native pushdown get the envelope filter here;
      // FlatGeobuf already applied it through the R-tree (re-filtering is
      // a no-op on its result set)
      if (!lower.endsWith(".fgb"))
        df = df.filter(org.apache.spark.sql.functions.expr(
          s"st_xmax($geomCol) >= $x0 AND st_ymax($geomCol) >= $y0 AND " +
            s"st_xmin($geomCol) <= $x1 AND st_ymin($geomCol) <= $y1"))
    }
    options.where.foreach(w => df = df.filter(org.apache.spark.sql.functions.expr(w)))
    if (options.columns.nonEmpty) {
      val keep = (options.columns :+ geomCol).distinct
      df = df.select(keep.map(org.apache.spark.sql.functions.col): _*)
    }
    if (options.skipFeatures > 0) df = df.offset(options.skipFeatures)
    if (options.maxFeatures >= 0) df = df.limit(options.maxFeatures)
    // read_geometry=False AFTER the geometry-dependent options: bbox/where
    // filter on the real geometry (OGR behavior), the returned column is
    // NULL. Catalyst then prunes the decoded column out of columnar scans.
    if (!options.readGeometry)
      df = df.withColumn(geomCol,
        org.apache.spark.sql.functions.lit(null).cast("binary"))
    options.sql.foreach { q =>
      df.createOrReplaceTempView("layer")
      df = spark.sql(q)
    }
    // a `sql` projection may drop the geometry column (aggregates etc.);
    // carry an empty one so the result still satisfies the GeoDataFrame
    // contract (mirrors read_geometry=False in the reference)
    if (!df.columns.contains(geomCol))
      df = df.withColumn(geomCol,
        org.apache.spark.sql.functions.lit(null).cast("binary"))
    GeoDataFrame(df, geomCol)
  }

  /**
   * Read GeoJSON into a GeoDataFrame. Handles both newline-delimited
   * Feature-per-line files and whole FeatureCollection documents.
   *
   * Distributed shape: features are re-emitted as property JSON with the
   * WKB injected base64-encoded, then `spark.read.json` infers the
   * property schema — pushdown/pruning then work as for any json source.
   */
  def readGeoJson(spark: SparkSession, path: String): GeoDataFrame = {
    import spark.implicits._

    def featureJsons(root: com.fasterxml.jackson.databind.JsonNode,
                     m: com.fasterxml.jackson.databind.ObjectMapper): Iterator[String] = {
      def featureToJson(f: com.fasterxml.jackson.databind.JsonNode): Option[String] = {
        val geomNode = f.get("geometry")
        val props = Option(f.get("properties"))
          .collect { case o: com.fasterxml.jackson.databind.node.ObjectNode => o }
          .getOrElse(m.createObjectNode())
        // null-geometry features keep their row (geometry column is null)
        if (geomNode != null && !geomNode.isNull) {
          val g = graft.geom.GeoJSON.read(geomNode)
          props.put("__geometry_b64",
            java.util.Base64.getEncoder.encodeToString(graft.geom.WKB.write(g)))
        }
        Some(m.writeValueAsString(props))
      }
      root.get("type").asText() match {
        case "FeatureCollection" =>
          val it = root.get("features").elements()
          Iterator.continually(it).takeWhile(_.hasNext).map(_.next()).flatMap(featureToJson)
        case "Feature" => featureToJson(root).iterator
        case _ => // bare geometry document
          val g = graft.geom.GeoJSON.read(root)
          val o = m.createObjectNode()
          o.put("__geometry_b64", java.util.Base64.getEncoder.encodeToString(graft.geom.WKB.write(g)))
          Iterator(m.writeValueAsString(o))
      }
    }

    // NDJSON (one Feature/geometry per line) parses line-per-row, fully
    // parallel across file splits. Only a whole-document FeatureCollection —
    // detected by probing the first non-empty line, which then fails to
    // parse on its own or declares the collection type — falls back to
    // wholetext, where one task must hold the document (inherent to the
    // format). The wholetext branch still splits non-FeatureCollection
    // documents per line (Jackson's readTree parses only the first JSON
    // value, so a misclassified NDJSON file would otherwise silently keep
    // one feature).
    val firstLine = spark.read.text(path).as[String]
      .filter((l: String) => l.trim.nonEmpty).limit(1).collect().headOption.getOrElse("")
    val isNdjson =
      try {
        val n = new com.fasterxml.jackson.databind.ObjectMapper().readTree(firstLine)
        n != null && n.isObject && n.get("type") != null &&
          n.get("type").asText() != "FeatureCollection"
      } catch { case _: Throwable => false }

    val propJson: org.apache.spark.sql.Dataset[String] =
      if (isNdjson)
        spark.read.text(path).as[String]
          .filter((l: String) => l.trim.nonEmpty)
          .mapPartitions { lines =>
            val m = new com.fasterxml.jackson.databind.ObjectMapper()
            lines.flatMap(l => featureJsons(m.readTree(l), m))
          }
      else
        spark.read.option("wholetext", true).text(path).as[String].flatMap { doc =>
          val m = new com.fasterxml.jackson.databind.ObjectMapper()
          val root = m.readTree(doc)
          if (root != null && root.isObject && root.get("type") != null &&
              root.get("type").asText() == "FeatureCollection")
            featureJsons(root, m)
          else
            doc.linesIterator.map(_.trim).filter(_.nonEmpty)
              .flatMap(l => featureJsons(m.readTree(l), m))
        }
    val parsed = spark.read.json(propJson)
    val withGeom = parsed
      .withColumn(GeoDataFrame.DefaultGeometry, unbase64(org.apache.spark.sql.functions.col("__geometry_b64")))
      .drop("__geometry_b64")
    GeoDataFrame(withGeom, GeoDataFrame.DefaultGeometry)
  }

  /**
   * Write a GeoDataFrame as newline-delimited GeoJSON Features (one per
   * line) — the format readGeoJson parses fully in parallel. Distributed
   * text write; null geometries produce `"geometry": null` features.
   */
  def writeGeoJson(gdf: GeoDataFrame, path: String, mode: String = "overwrite"): Unit = {
    val spark = gdf.df.sparkSession
    graft.functions.GeoRegistry.register(spark)
    val geom = gdf.geometryColumn
    val props = gdf.df.columns.filter(_ != geom)
    gdf.df.select(concat(
        lit("""{"type":"Feature","geometry":"""),
        when(col(geom).isNull, lit("null")).otherwise(expr(s"st_asgeojson(`$geom`)")),
        lit(""","properties":"""),
        to_json(struct(props.map(col): _*)),
        lit("}")).as("value"))
      .write.mode(mode).text(path)
  }

  /** Read (Geo)Parquet; geometry column by metadata/name convention. */
  def readParquet(spark: SparkSession, path: String): GeoDataFrame =
    GeoDataFrame(spark.read.parquet(path))

  /** Read ESRI Shapefile(s) — .shp geometry + .dbf attributes (the
    * reference reaches these through GDAL; here a pure-Scala parser,
    * one task per file). */
  def readShapefile(spark: SparkSession, path: String): GeoDataFrame =
    GeoDataFrame(graft.sources.Shapefile.read(spark, path))

  /** Write one ESRI shapefile (.shp/.shx/.dbf; driver-side single-file
    * export — results, not raw inputs). */
  def writeShapefile(df: DataFrame, basePath: String, geomCol: String = "geometry"): Unit =
    graft.sources.Shapefile.write(df, basePath, geomCol)

  /** Read GeoPackage feature layer(s) — pure-Scala SQLite b-tree + OGC
    * geometry-BLOB parser, one task per .gpkg file (the reference reaches
    * GeoPackage through GDAL; reference: python/geopolars/io/file.py:15-119). */
  def readGeoPackage(spark: SparkSession, path: String, layer: Option[String] = None): GeoDataFrame = {
    val df = graft.sources.GeoPackage.read(spark, path, layer)
    val geomCol = df.schema.fields.find(f =>
        f.metadata.contains("graft.geometry") && f.metadata.getBoolean("graft.geometry"))
      .map(_.name).getOrElse(GeoDataFrame.DefaultGeometry)
    GeoDataFrame(df, geomCol)
  }

  /** Write a single-file GeoPackage export (driver-side; results, not raw inputs). */
  def writeGeoPackage(gdf: GeoDataFrame, path: String, tableName: String = "features"): Unit =
    graft.sources.GeoPackage.write(gdf.df, path, gdf.geometryColumn, tableName)

  /** Read FlatGeobuf file(s) — the cloud-native OGR format (the reference
    * reaches it through GDAL). With `bbox`, indexed files decode only the
    * features whose packed-R-tree leaf intersects the box. */
  def readFlatGeobuf(
      spark: SparkSession, path: String,
      bbox: Option[(Double, Double, Double, Double)] = None): GeoDataFrame =
    GeoDataFrame(graft.sources.FlatGeobuf.read(spark, path, bbox))

  /** Write one .fgb file (driver-side single-file export; Hilbert-sorted
    * features + packed R-tree index). */
  def writeFlatGeobuf(gdf: GeoDataFrame, path: String, indexNodeSize: Int = 16): Unit =
    graft.sources.FlatGeobuf.write(gdf.df, path, gdf.geometryColumn, indexNodeSize)

  /** Read KML (Placemarks: name/description/folder/ExtendedData + WKB
    * geometry; the reference reaches KML through GDAL's OGR driver). */
  def readKml(spark: SparkSession, path: String): GeoDataFrame =
    GeoDataFrame(graft.sources.OgcXml.readKml(spark, path))

  /** Write one .kml document (driver-side single-file export). */
  def writeKml(gdf: GeoDataFrame, path: String, docName: String = "graft"): Unit =
    graft.sources.OgcXml.writeKml(gdf.df, path, gdf.geometryColumn, docName)

  /** Read a GPX layer (waypoints | routes | tracks | route_points |
    * track_points — OGR's GPX layer model). */
  def readGpx(spark: SparkSession, path: String, layer: String = "waypoints"): GeoDataFrame =
    GeoDataFrame(graft.sources.OgcXml.readGpx(spark, path, layer))

  /** Write one .gpx file of waypoints (driver-side single-file export). */
  def writeGpx(gdf: GeoDataFrame, path: String): Unit =
    graft.sources.OgcXml.writeGpx(gdf.df, path, gdf.geometryColumn)

  /** Read GML Simple Features (GML2/GML3 geometries, properties map). */
  def readGml(spark: SparkSession, path: String): GeoDataFrame =
    GeoDataFrame(graft.sources.OgcXml.readGml(spark, path))

  /** Read Arrow IPC file(s) — the reference's native columnar format
    * (its datasets and bench inputs are `.arrow` files, and `from_arrow`
    * builds frames from Arrow tables; reference: convert.py:33-56,
    * benches/affine.rs:8-22). One task per file; WKB binary columns pass
    * through as geometry. */
  def readArrow(spark: SparkSession, path: String): GeoDataFrame =
    GeoDataFrame(graft.sources.ArrowIPC.read(spark, path))

  /** Write as Arrow IPC file format, one file per partition. */
  def writeArrow(gdf: GeoDataFrame, path: String): Unit =
    graft.sources.ArrowIPC.write(gdf.df, path)
}

/**
 * Bundled example datasets, paralleling `geopolars.datasets.read_dataset`
 * (reference: python/geopolars/datasets/__init__.py:11-42 — IPC files of
 * `name: utf8, geometry: binary(WKB Point)`). The files themselves are not
 * redistributable here, so the same SHAPE is synthesized deterministically:
 * 202 named WKB points, mirroring the cities fixture schema and row count
 * (reference: data/cities.arrow, FIXTURES.md §1).
 */
object Datasets {
  val names: Seq[String] = Seq("cities")

  def readDataset(spark: SparkSession, name: String): GeoDataFrame = name match {
    case "cities" =>
      val df = spark.range(202).selectExpr(
        "concat('city_', id) AS name",
        // deterministic lon/lat spread, same value domain as the fixture
        "st_point(cast((id * 97) % 360 - 180 + 0.22 as double), cast((id * 31) % 128 - 64 + 0.15 as double)) AS geometry")
      GeoDataFrame(df).withCrs("EPSG:4326")
    case other =>
      throw new IllegalArgumentException(s"unknown dataset '$other'; available: ${names.mkString(", ")}")
  }
}
