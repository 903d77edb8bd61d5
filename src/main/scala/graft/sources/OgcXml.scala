package graft.sources

import java.io.ByteArrayInputStream

import javax.xml.stream.{XMLInputFactory, XMLStreamConstants, XMLStreamReader}

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

import graft.geom.{Geometry => Geom, _}

/**
 * OGC/consumer XML formats — KML, GPX, GML — the `read_file` long tail the
 * reference reaches through GDAL's OGR drivers (reference:
 * python/geopolars/io/file.py:15-119 delegates every format to
 * pyogrio/GDAL). Re-expressed without native dependencies: pure-JDK StAX
 * (`javax.xml.stream`) parsing on executors, one task per file
 * (`binaryFile` source), the same per-file parallelism as the other
 * unsplittable single-file formats here (Shapefile, GeoPackage).
 *
 * Memory model: the document is STREAMED — only one feature subtree
 * (Placemark / wpt / trk / featureMember) is materialized at a time, so a
 * multi-GB KML costs bounded heap beyond the raw bytes the binaryFile
 * source holds. External entities and DTDs are disabled (XXE-safe).
 */
object OgcXml {

  // ------------------------------------------------------------- XML infra

  /** Minimal element tree for ONE feature subtree (never the document). */
  private[sources] final case class Node(
      name: String,                       // local name, namespace dropped
      attrs: Map[String, String],
      children: Vector[Node],
      text: String) {
    def child(n: String): Option[Node] = children.find(_.name == n)
    def childText(n: String): Option[String] =
      child(n).map(_.text.trim).filter(_.nonEmpty)
  }

  private def newReader(bytes: Array[Byte]): XMLStreamReader = {
    val f = XMLInputFactory.newInstance()
    f.setProperty(XMLInputFactory.SUPPORT_DTD, false)
    f.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, false)
    f.setProperty(XMLInputFactory.IS_COALESCING, true)
    f.createXMLStreamReader(new ByteArrayInputStream(bytes))
  }

  /** Read the subtree of the element the reader is positioned ON (START_
    * ELEMENT); returns with the reader past the matching END_ELEMENT. */
  private def readSubtree(r: XMLStreamReader): Node = {
    val name = r.getLocalName
    val attrs = (0 until r.getAttributeCount)
      .map(i => r.getAttributeLocalName(i) -> r.getAttributeValue(i)).toMap
    val children = Vector.newBuilder[Node]
    val text = new StringBuilder
    var done = false
    while (!done && r.hasNext) {
      r.next() match {
        case XMLStreamConstants.START_ELEMENT => children += readSubtree(r)
        case XMLStreamConstants.CHARACTERS | XMLStreamConstants.CDATA =>
          text.append(r.getText)
        case XMLStreamConstants.END_ELEMENT => done = true
        case _ => ()
      }
    }
    Node(name, attrs, children.result(), text.toString)
  }

  /** Stream the document, yielding the subtree of every element whose local
    * name is in `targets` (not descending INTO matches — a nested Placemark
    * inside a Placemark is not a thing in these formats). */
  private def subtrees(bytes: Array[Byte], targets: Set[String]): Iterator[Node] = {
    val r = newReader(bytes)
    new Iterator[Node] {
      private var nextNode: Node = advance()
      private def advance(): Node = {
        while (r.hasNext) {
          if (r.next() == XMLStreamConstants.START_ELEMENT &&
              targets.contains(r.getLocalName))
            return readSubtree(r)
        }
        r.close(); null
      }
      def hasNext: Boolean = nextNode != null
      def next(): Node = { val n = nextNode; nextNode = advance(); n }
    }
  }

  private def binaryFiles(spark: SparkSession, path: String, glob: String) = {
    import spark.implicits._
    spark.read.format("binaryFile").option("pathGlobFilter", glob).load(path)
      .select("path", "content").as[(String, Array[Byte])]
  }

  /** "lon,lat[,alt] lon,lat[,alt] ..." (KML coordinates) -> packed xy.
    * The spec forbids whitespace inside tuples but real-world files write
    * "10.5, -3.25" anyway (OGR tolerates it); whitespace around commas is
    * normalized away before tuple-splitting. */
  private[sources] def parseKmlCoords(s: String): Array[Double] = {
    val tuples = s.trim.replaceAll("\\s*,\\s*", ",").split("\\s+").filter(_.nonEmpty)
    val out = new Array[Double](tuples.length * 2)
    var i = 0
    while (i < tuples.length) {
      val parts = tuples(i).split(",")
      out(2 * i) = parts(0).toDouble
      out(2 * i + 1) = parts(1).toDouble      // altitude (parts(2)) dropped: 2D engine
      i += 1
    }
    out
  }

  // ------------------------------------------------------------------- KML

  /**
   * KML reader (OGC KML 2.2, a public spec): every `<Placemark>` becomes a
   * row with `name`, `description`, `folder` (enclosing Folder/Document
   * name path), `extended` (ExtendedData Data/SimpleData name->value map)
   * and WKB `geometry` — the same surface OGR's KML driver exposes.
   * Geometry: Point / LineString / LinearRing / Polygon (outer/inner
   * boundaries) / MultiGeometry; altitude ordinates are dropped (2D).
   */
  def readKml(spark: SparkSession, path: String, withFid: Boolean = false): DataFrame = {
    val base = Seq(
      StructField("name", StringType),
      StructField("description", StringType),
      StructField("folder", StringType),
      StructField("extended", MapType(StringType, StringType)),
      StructField("geometry", BinaryType))
    val schema = StructType(
      if (withFid) StructField("fid", LongType, nullable = false) +: base else base)
    val emitFid = withFid
    val rows = binaryFiles(spark, path, "*.kml").flatMap { case (_, bytes) =>
      // stream Folders too so each Placemark knows its containment path
      parseKmlPlacemarks(bytes).zipWithIndex.map { case (r, i) =>
        if (emitFid) Row.fromSeq(i.toLong +: r.toSeq) else r
      }
    }(org.apache.spark.sql.Encoders.row(schema))
    rows.toDF()
  }

  private[sources] def parseKmlPlacemarks(bytes: Array[Byte]): Iterator[Row] = {
    // One pass with an open-element stack: Placemark subtrees are read
    // whole (and so never appear on the stack); Folder/Document elements
    // contribute their <name> to the containment path. A <name> whose
    // immediate parent is a Folder/Document fills that level's slot;
    // every other element just rides the stack.
    val r = newReader(bytes)
    val open = scala.collection.mutable.Stack.empty[String]    // element names
    val folders = scala.collection.mutable.Stack.empty[String] // Folder/Document names
    new Iterator[Row] {
      private var nextRow: Row = advance()
      private def advance(): Row = {
        while (r.hasNext) {
          r.next() match {
            case XMLStreamConstants.START_ELEMENT =>
              r.getLocalName match {
                case "Placemark" =>
                  val n = readSubtree(r) // consumes through </Placemark>
                  val path = folders.toSeq.reverse.filter(_.nonEmpty).mkString("/")
                  return placemarkRow(n, path)
                case "Folder" | "Document" =>
                  open.push(r.getLocalName)
                  folders.push("") // name fills in when its <name> child arrives
                case "name" if open.nonEmpty &&
                    (open.top == "Folder" || open.top == "Document") &&
                    folders.nonEmpty && folders.top.isEmpty =>
                  val n = readSubtree(r) // consumes through </name>
                  folders.pop(); folders.push(n.text.trim)
                case other => open.push(other)
              }
            case XMLStreamConstants.END_ELEMENT =>
              if (open.nonEmpty) {
                val popped = open.pop()
                if ((popped == "Folder" || popped == "Document") && folders.nonEmpty)
                  folders.pop()
              }
            case _ => ()
          }
        }
        r.close(); null
      }
      def hasNext: Boolean = nextRow != null
      def next(): Row = { val n = nextRow; nextRow = advance(); n }
    }
  }

  private def placemarkRow(n: Node, folder: String): Row = {
    val ext: Map[String, String] = n.child("ExtendedData").map { ed =>
      val data = ed.children.collect {
        case d if d.name == "Data" =>
          d.attrs.getOrElse("name", "") -> d.childText("value").getOrElse("")
      }
      val simple = ed.children.flatMap {
        case sd if sd.name == "SchemaData" => sd.children.collect {
          case f if f.name == "SimpleData" =>
            f.attrs.getOrElse("name", "") -> f.text.trim
        }
        case _ => Vector.empty
      }
      (data ++ simple).toMap
    }.getOrElse(Map.empty)
    // malformed coordinates -> NULL geometry, row kept (the same
    // invalid-input contract as the WKB/WKT codecs)
    val geom = n.children.collectFirst {
      case c if KmlGeomNames(c.name) =>
        try kmlGeometry(c) catch { case _: RuntimeException => null }
    }.flatMap(Option(_)).orNull
    Row(
      n.childText("name").orNull,
      n.childText("description").orNull,
      if (folder.isEmpty) null else folder,
      ext,
      if (geom == null) null else WKB.write(geom))
  }

  private val KmlGeomNames =
    Set("Point", "LineString", "LinearRing", "Polygon", "MultiGeometry")

  private[sources] def kmlGeometry(n: Node): Geom = n.name match {
    case "Point" =>
      val c = parseKmlCoords(n.childText("coordinates").getOrElse(""))
      if (c.length < 2) null else Point(c(0), c(1))
    case "LineString" | "LinearRing" =>
      LineString(parseKmlCoords(n.childText("coordinates").getOrElse("")))
    case "Polygon" =>
      val outer = n.child("outerBoundaryIs").flatMap(_.child("LinearRing"))
        .map(lr => parseKmlCoords(lr.childText("coordinates").getOrElse("")))
      val inners = n.children.filter(_.name == "innerBoundaryIs")
        .flatMap(_.child("LinearRing"))
        .map(lr => parseKmlCoords(lr.childText("coordinates").getOrElse("")))
      outer.map(o => Polygon((o +: inners).toArray)).orNull
    case "MultiGeometry" =>
      val parts = n.children.filter(c => KmlGeomNames(c.name))
        .map(kmlGeometry).filter(_ != null)
      collectGeoms(parts)
    case _ => null
  }

  /** Homogeneous parts -> Multi*; mixed -> GeometryCollection (KML
    * MultiGeometry and GML Multi* both allow heterogeneity only via
    * collections). */
  private def collectGeoms(parts: Seq[Geom]): Geom =
    if (parts.isEmpty) null
    else if (parts.forall(_.isInstanceOf[Point]))
      MultiPoint(parts.map(_.asInstanceOf[Point]).toArray)
    else if (parts.forall(_.isInstanceOf[LineString]))
      MultiLineString(parts.map(_.asInstanceOf[LineString]).toArray)
    else if (parts.forall(_.isInstanceOf[Polygon]))
      MultiPolygon(parts.map(_.asInstanceOf[Polygon]).toArray)
    else GeometryCollection(parts.toArray)

  /**
   * Write ONE .kml document (driver-side single-file export, like the
   * Shapefile/GeoPackage/FlatGeobuf writers — results, not raw inputs;
   * [[SingleFile.guard]] enforces the boundary). `name`/`description`
   * columns map to the KML fields; every other non-geometry column becomes
   * an ExtendedData Data element (stringified). Doubles serialize via
   * Double.toString, which round-trips bit-exact through readKml.
   */
  def writeKml(df: DataFrame, path: String, geomCol: String = "geometry",
      docName: String = "graft"): Unit = {
    SingleFile.guard(df, "KML")
    val schema = df.schema
    val gIdx = schema.fieldIndex(geomCol)
    val nameIdx = schema.fieldNames.indexOf("name")
    val descIdx = schema.fieldNames.indexOf("description")
    val extIdx = schema.fields.zipWithIndex
      .filter { case (f, i) => i != gIdx && i != nameIdx && i != descIdx }
    val sb = new StringBuilder
    sb.append("<?xml version=\"1.0\" encoding=\"UTF-8\"?>\n")
    sb.append("<kml xmlns=\"http://www.opengis.net/kml/2.2\"><Document><name>")
      .append(xmlEscape(docName)).append("</name>\n")
    df.collect().foreach { row =>
      sb.append("<Placemark>")
      if (nameIdx >= 0 && !row.isNullAt(nameIdx))
        sb.append("<name>").append(xmlEscape(String.valueOf(row.get(nameIdx)))).append("</name>")
      if (descIdx >= 0 && !row.isNullAt(descIdx))
        sb.append("<description>").append(xmlEscape(String.valueOf(row.get(descIdx)))).append("</description>")
      if (extIdx.nonEmpty) {
        sb.append("<ExtendedData>")
        extIdx.foreach { case (f, i) =>
          sb.append("<Data name=\"").append(xmlEscape(f.name)).append("\"><value>")
          if (!row.isNullAt(i)) sb.append(xmlEscape(String.valueOf(row.get(i))))
          sb.append("</value></Data>")
        }
        sb.append("</ExtendedData>")
      }
      if (!row.isNullAt(gIdx)) {
        val g = WKB.readOrNull(row.getAs[Array[Byte]](gIdx))
        if (g != null) sb.append(kmlGeomXml(g))
      }
      sb.append("</Placemark>\n")
    }
    sb.append("</Document></kml>\n")
    writeString(path, sb.toString)
  }

  private def coordString(xy: Array[Double]): String = {
    val b = new StringBuilder
    var i = 0
    while (i < xy.length) {
      if (i > 0) b.append(' ')
      b.append(xy(i)).append(',').append(xy(i + 1))
      i += 2
    }
    b.toString
  }

  private[sources] def kmlGeomXml(g: Geom): String = g match {
    case Point(x, y) => s"<Point><coordinates>$x,$y</coordinates></Point>"
    case LineString(c) => s"<LineString><coordinates>${coordString(c)}</coordinates></LineString>"
    case Polygon(rings) =>
      val outer = s"<outerBoundaryIs><LinearRing><coordinates>${coordString(rings(0))}</coordinates></LinearRing></outerBoundaryIs>"
      val inner = rings.drop(1).map(r =>
        s"<innerBoundaryIs><LinearRing><coordinates>${coordString(r)}</coordinates></LinearRing></innerBoundaryIs>").mkString
      s"<Polygon>$outer$inner</Polygon>"
    case MultiPoint(gs) => s"<MultiGeometry>${gs.map(kmlGeomXml).mkString}</MultiGeometry>"
    case MultiLineString(gs) => s"<MultiGeometry>${gs.map(kmlGeomXml).mkString}</MultiGeometry>"
    case MultiPolygon(gs) => s"<MultiGeometry>${gs.map(kmlGeomXml).mkString}</MultiGeometry>"
    case GeometryCollection(gs) => s"<MultiGeometry>${gs.map(kmlGeomXml).mkString}</MultiGeometry>"
    case _ => ""
  }

  private def xmlEscape(s: String): String = {
    val b = new StringBuilder(s.length)
    s.foreach {
      case '<' => b.append("&lt;")
      case '>' => b.append("&gt;")
      case '&' => b.append("&amp;")
      case '"' => b.append("&quot;")
      case c   => b.append(c)
    }
    b.toString
  }

  private def writeString(path: String, s: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(new org.apache.hadoop.conf.Configuration())
    val out = fs.create(p, true)
    try out.write(s.getBytes("UTF-8")) finally out.close()
  }

  // ------------------------------------------------------------------- GPX

  /**
   * GPX 1.1 reader (Topografix, public schema) with OGR's layer model:
   * `waypoints` (default) / `routes` / `tracks` / `route_points` /
   * `track_points`. Waypoints and *_points are WKB Points with `ele` /
   * `time`; routes are LineStrings over rtept; tracks are
   * MultiLineStrings (one LineString per trkseg).
   */
  def readGpx(spark: SparkSession, path: String, layer: String = "waypoints"): DataFrame = {
    val files = binaryFiles(spark, path, "*.gpx")
    // missing/garbage lat-lon -> NULL geometry (point layers) or point
    // skipped (line layers); garbage ele -> NULL — rows are kept, matching
    // the invalid-input contract of the WKB/WKT codecs
    def pt(n: Node): Geom = (n.attrs.get("lon"), n.attrs.get("lat")) match {
      case (Some(lo), Some(la)) =>
        try Point(lo.toDouble, la.toDouble)
        catch { case _: NumberFormatException => null }
      case _ => null
    }
    def wkbOrNull(g: Geom): Array[Byte] = if (g == null) null else WKB.write(g)
    def lineCoords(pts: Seq[Node]): Array[Double] = {
      val buf = new scala.collection.mutable.ArrayBuffer[Double](pts.length * 2)
      pts.foreach { p =>
        pt(p) match {
          case Point(x, y) => buf += x; buf += y
          case _ => ()
        }
      }
      buf.toArray
    }
    def ele(n: Node): Any = n.childText("ele")
      .flatMap(s => scala.util.Try(s.toDouble).toOption).orNull
    def time(n: Node): Any = n.childText("time").orNull

    layer match {
      case "waypoints" =>
        val schema = StructType(Seq(
          StructField("name", StringType), StructField("desc", StringType),
          StructField("ele", DoubleType), StructField("time", StringType),
          StructField("geometry", BinaryType)))
        files.flatMap { case (_, bytes) =>
          subtrees(bytes, Set("wpt")).map(w => Row(
            w.childText("name").orNull, w.childText("desc").orNull,
            ele(w), time(w), wkbOrNull(pt(w))))
        }(org.apache.spark.sql.Encoders.row(schema)).toDF()
      case "routes" =>
        val schema = StructType(Seq(
          StructField("name", StringType), StructField("desc", StringType),
          StructField("geometry", BinaryType)))
        files.flatMap { case (_, bytes) =>
          subtrees(bytes, Set("rte")).map { rte =>
            val xy = lineCoords(rte.children.filter(_.name == "rtept"))
            Row(rte.childText("name").orNull, rte.childText("desc").orNull,
              WKB.write(LineString(xy)))
          }
        }(org.apache.spark.sql.Encoders.row(schema)).toDF()
      case "tracks" =>
        val schema = StructType(Seq(
          StructField("name", StringType), StructField("desc", StringType),
          StructField("geometry", BinaryType)))
        files.flatMap { case (_, bytes) =>
          subtrees(bytes, Set("trk")).map { trk =>
            val segs = trk.children.filter(_.name == "trkseg").map { seg =>
              LineString(lineCoords(seg.children.filter(_.name == "trkpt")))
            }
            Row(trk.childText("name").orNull, trk.childText("desc").orNull,
              WKB.write(MultiLineString(segs.toArray)))
          }
        }(org.apache.spark.sql.Encoders.row(schema)).toDF()
      case "route_points" =>
        val schema = StructType(Seq(
          StructField("route_fid", LongType, nullable = false),
          StructField("route_point_id", LongType, nullable = false),
          StructField("ele", DoubleType), StructField("time", StringType),
          StructField("geometry", BinaryType)))
        files.flatMap { case (_, bytes) =>
          subtrees(bytes, Set("rte")).zipWithIndex.flatMap { case (rte, ri) =>
            rte.children.filter(_.name == "rtept").zipWithIndex.map { case (p, pi) =>
              Row(ri.toLong, pi.toLong, ele(p), time(p), wkbOrNull(pt(p)))
            }
          }
        }(org.apache.spark.sql.Encoders.row(schema)).toDF()
      case "track_points" =>
        val schema = StructType(Seq(
          StructField("track_fid", LongType, nullable = false),
          StructField("track_seg_id", LongType, nullable = false),
          StructField("track_seg_point_id", LongType, nullable = false),
          StructField("ele", DoubleType), StructField("time", StringType),
          StructField("geometry", BinaryType)))
        files.flatMap { case (_, bytes) =>
          subtrees(bytes, Set("trk")).zipWithIndex.flatMap { case (trk, ti) =>
            trk.children.filter(_.name == "trkseg").zipWithIndex.flatMap { case (seg, si) =>
              seg.children.filter(_.name == "trkpt").zipWithIndex.map { case (p, pi) =>
                Row(ti.toLong, si.toLong, pi.toLong, ele(p), time(p), wkbOrNull(pt(p)))
              }
            }
          }
        }(org.apache.spark.sql.Encoders.row(schema)).toDF()
      case other => throw new IllegalArgumentException(
        s"unknown GPX layer '$other'; available: waypoints, routes, tracks, route_points, track_points")
    }
  }

  /** Write ONE .gpx file of waypoints (Point geometries; `name`/`ele`/
    * `time` columns honored when present). Driver-side single-file export
    * behind [[SingleFile.guard]]. */
  def writeGpx(df: DataFrame, path: String, geomCol: String = "geometry"): Unit = {
    SingleFile.guard(df, "GPX")
    val schema = df.schema
    val gIdx = schema.fieldIndex(geomCol)
    def idx(n: String) = schema.fieldNames.indexOf(n)
    val (nameIdx, eleIdx, timeIdx) = (idx("name"), idx("ele"), idx("time"))
    val sb = new StringBuilder
    sb.append("<?xml version=\"1.0\" encoding=\"UTF-8\"?>\n")
    sb.append("<gpx version=\"1.1\" creator=\"graft\" xmlns=\"http://www.topografix.com/GPX/1/1\">\n")
    df.collect().foreach { row =>
      if (!row.isNullAt(gIdx)) {
        WKB.readOrNull(row.getAs[Array[Byte]](gIdx)) match {
          case Point(x, y) =>
            sb.append(s"""<wpt lat="$y" lon="$x">""")
            if (eleIdx >= 0 && !row.isNullAt(eleIdx))
              sb.append("<ele>").append(String.valueOf(row.get(eleIdx))).append("</ele>")
            if (timeIdx >= 0 && !row.isNullAt(timeIdx))
              sb.append("<time>").append(xmlEscape(String.valueOf(row.get(timeIdx)))).append("</time>")
            if (nameIdx >= 0 && !row.isNullAt(nameIdx))
              sb.append("<name>").append(xmlEscape(String.valueOf(row.get(nameIdx)))).append("</name>")
            sb.append("</wpt>\n")
          case _ => throw new IllegalArgumentException(
            "GPX waypoints are Points; write lines as routes/tracks or use another format")
        }
      }
    }
    sb.append("</gpx>\n")
    writeString(path, sb.toString)
  }

  // ------------------------------------------------------------------- GML

  /**
   * GML Simple Features reader (GML 2 and 3.x, public OGC specs): every
   * `featureMember`/`member` child (or `featureMembers` grandchild) is a
   * feature; text-only child elements become `properties` map entries,
   * `gml:id`/`fid` becomes `fid`, and the first geometry-bearing property
   * becomes WKB `geometry`. Handles `coordinates` ("x,y x,y", GML2) and
   * `pos`/`posList` ("x y x y", GML3) with srsDimension 2 or 3 (extra
   * ordinates dropped). Axis order is taken as written (x y) — the
   * engine does not reinterpret urn-style EPSG axis flips.
   */
  def readGml(spark: SparkSession, path: String): DataFrame = {
    val schema = StructType(Seq(
      StructField("fid", StringType),
      StructField("properties", MapType(StringType, StringType)),
      StructField("geometry", BinaryType)))
    binaryFiles(spark, path, "*.gml").flatMap { case (_, bytes) =>
      subtrees(bytes, Set("featureMember", "featureMembers", "member")).flatMap { m =>
        // featureMember wraps ONE feature; featureMembers wraps many
        m.children.map(gmlFeatureRow)
      }
    }(org.apache.spark.sql.Encoders.row(schema)).toDF()
  }

  private val GmlGeomNames = Set(
    "Point", "LineString", "LinearRing", "Polygon", "Curve", "Surface",
    "MultiPoint", "MultiLineString", "MultiPolygon", "MultiCurve",
    "MultiSurface", "MultiGeometry", "GeometryCollection")

  private def gmlFeatureRow(f: Node): Row = {
    val fid = f.attrs.get("id").orElse(f.attrs.get("fid")).orNull
    val props = f.children.collect {
      case c if c.children.isEmpty && c.text.trim.nonEmpty => c.name -> c.text.trim
    }.toMap
    val geom = f.children.iterator.flatMap { p =>
      if (GmlGeomNames(p.name)) Iterator(p)
      else p.children.iterator.filter(c => GmlGeomNames(c.name))
    }.map(gmlGeometry).find(_ != null).orNull
    Row(fid, props, if (geom == null) null else WKB.write(geom))
  }

  /** "x1 y1 x2 y2 ..." posList / "x,y x,y" coordinates -> packed xy. */
  private[sources] def gmlCoords(n: Node): Array[Double] = {
    n.childText("posList").orElse(n.childText("coordinates")) match {
      case Some(s) if s.contains(",") => // GML2 coordinates: tuples by space, ordinates by comma
        parseKmlCoords(s)
      case Some(s) =>
        val nums = s.trim.split("\\s+").map(_.toDouble)
        val dim = n.child("posList").flatMap(_.attrs.get("srsDimension"))
          .orElse(n.attrs.get("srsDimension")).map(_.toInt).getOrElse(2)
        if (dim == 2) nums
        else {
          val out = new Array[Double](nums.length / dim * 2)
          var i = 0
          while (i < out.length / 2) {
            out(2 * i) = nums(dim * i); out(2 * i + 1) = nums(dim * i + 1); i += 1
          }
          out
        }
      case None => // sequence of <pos> children (GML3 point lists)
        n.children.filter(_.name == "pos")
          .flatMap(_.text.trim.split("\\s+").take(2).map(_.toDouble)).toArray
    }
  }

  private[sources] def gmlGeometry(n: Node): Geom = n.name match {
    case "Point" =>
      val c = n.childText("pos").orElse(n.childText("coordinates"))
        .map(s => s.trim.split("[\\s,]+").map(_.toDouble)).getOrElse(Array.empty[Double])
      if (c.length < 2) null else Point(c(0), c(1))
    case "LineString" | "LinearRing" => LineString(gmlCoords(n))
    case "Curve" => // Curve/segments/LineStringSegment*
      val segs = n.child("segments").map(_.children.filter(_.name == "LineStringSegment"))
        .getOrElse(Vector.empty).map(gmlCoords)
      if (segs.isEmpty) null
      else if (segs.length == 1) LineString(segs.head)
      else MultiLineString(segs.map(LineString(_)).toArray)
    case "Polygon" | "Surface" =>
      if (n.name == "Surface") { // Surface/patches/PolygonPatch*
        val patches = n.child("patches").map(_.children.filter(_.name == "PolygonPatch"))
          .getOrElse(Vector.empty).map(polygonRings).filter(_ != null)
        if (patches.isEmpty) null
        else if (patches.length == 1) patches.head
        else MultiPolygon(patches.toArray)
      } else polygonRings(n)
    case "MultiPoint" =>
      collectMembers(n, Set("pointMember", "pointMembers"))
    case "MultiLineString" | "MultiCurve" =>
      collectMembers(n, Set("lineStringMember", "curveMember", "curveMembers"))
    case "MultiPolygon" | "MultiSurface" =>
      collectMembers(n, Set("polygonMember", "surfaceMember", "surfaceMembers"))
    case "MultiGeometry" | "GeometryCollection" =>
      collectMembers(n, Set("geometryMember", "geometryMembers"))
    case _ => null
  }

  /** exterior/interior (GML3) or outerBoundaryIs/innerBoundaryIs (GML2). */
  private def polygonRings(n: Node): Polygon = {
    def ring(wrapper: Node): Option[Array[Double]] =
      wrapper.child("LinearRing").map(gmlCoords)
    val outer = n.children.filter(c => c.name == "exterior" || c.name == "outerBoundaryIs")
      .flatMap(ring).headOption
    val inners = n.children.filter(c => c.name == "interior" || c.name == "innerBoundaryIs")
      .flatMap(ring)
    outer.map(o => Polygon((o +: inners).toArray)).orNull
  }

  private def collectMembers(n: Node, wrappers: Set[String]): Geom = {
    val parts = n.children.filter(c => wrappers(c.name))
      .flatMap(_.children.filter(c => GmlGeomNames(c.name)))
      .map(gmlGeometry).filter(_ != null)
    collectGeoms(parts)
  }
}
