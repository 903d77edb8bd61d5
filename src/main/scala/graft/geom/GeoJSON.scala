package graft.geom

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}

/**
 * GeoJSON (RFC 7946) geometry codec.
 *
 * The reference ingests GeoJSON through its OGR scanner (reference:
 * python/geopolars/io/file.py:15-119 — GeoJSON is one of the OGR drivers);
 * we implement the geometry grammar directly (no GDAL offline). Jackson is
 * used for JSON plumbing — it ships on Spark's classpath.
 */
object GeoJSON {

  private val mapper = new ObjectMapper()

  def readOrNull(json: String): Geometry =
    try read(mapper.readTree(json)) catch { case _: Exception => null }

  def read(node: JsonNode): Geometry = {
    val tpe = node.get("type").asText()
    def coords: JsonNode = node.get("coordinates")
    tpe match {
      case "Point"           => pointOf(coords)
      case "LineString"      => LineString(packed(coords))
      case "Polygon"         => polygonOf(coords)
      case "MultiPoint"      => MultiPoint(iter(coords).map(pointOf).toArray)
      case "MultiLineString" => MultiLineString(iter(coords).map(c => LineString(packed(c))).toArray)
      case "MultiPolygon"    => MultiPolygon(iter(coords).map(polygonOf).toArray)
      case "GeometryCollection" =>
        GeometryCollection(iter(node.get("geometries")).map(read).toArray)
      case other => throw new IllegalArgumentException(s"unknown GeoJSON type: $other")
    }
  }

  private def iter(n: JsonNode): Iterator[JsonNode] = {
    val it = n.elements()
    new Iterator[JsonNode] { def hasNext = it.hasNext; def next() = it.next() }
  }

  private def pointOf(c: JsonNode): Point =
    if (c == null || c.size() == 0) Point.empty
    else Point(c.get(0).asDouble(), c.get(1).asDouble())

  private def packed(c: JsonNode): Array[Double] = {
    val out = new Array[Double](c.size() * 2)
    var i = 0
    iter(c).foreach { pt => out(i) = pt.get(0).asDouble(); out(i + 1) = pt.get(1).asDouble(); i += 2 }
    out
  }

  private def polygonOf(c: JsonNode): Polygon = Polygon(iter(c).map(packed).toArray)

  def write(g: Geometry): String = mapper.writeValueAsString(toNode(g))

  private def coordArr(x: Double, y: Double): ArrayNode = {
    val a = mapper.createArrayNode(); a.add(x); a.add(y); a
  }

  private def ringArr(cs: Array[Double]): ArrayNode = {
    val a = mapper.createArrayNode()
    var i = 0
    while (i < cs.length) { a.add(coordArr(cs(i), cs(i + 1))); i += 2 }
    a
  }

  private def toNode(g: Geometry): ObjectNode = {
    val o = mapper.createObjectNode()
    o.put("type", g.typeName match {
      case "Point" => "Point"; case "LineString" => "LineString"; case "Polygon" => "Polygon"
      case "MultiPoint" => "MultiPoint"; case "MultiLineString" => "MultiLineString"
      case "MultiPolygon" => "MultiPolygon"; case _ => "GeometryCollection"
    })
    g match {
      case p: Point =>
        o.set[JsonNode]("coordinates", if (p.isEmpty) mapper.createArrayNode() else coordArr(p.x, p.y))
      case l: LineString => o.set[JsonNode]("coordinates", ringArr(l.coords))
      case p: Polygon =>
        val rings = mapper.createArrayNode(); p.rings.foreach(r => rings.add(ringArr(r)))
        o.set[JsonNode]("coordinates", rings)
      case m: MultiPoint =>
        val a = mapper.createArrayNode(); m.geoms.foreach(p => a.add(coordArr(p.x, p.y)))
        o.set[JsonNode]("coordinates", a)
      case m: MultiLineString =>
        val a = mapper.createArrayNode(); m.geoms.foreach(l => a.add(ringArr(l.coords)))
        o.set[JsonNode]("coordinates", a)
      case m: MultiPolygon =>
        val a = mapper.createArrayNode()
        m.geoms.foreach { p =>
          val rings = mapper.createArrayNode(); p.rings.foreach(r => rings.add(ringArr(r)))
          a.add(rings)
        }
        o.set[JsonNode]("coordinates", a)
      case gc: GeometryCollection =>
        val a = mapper.createArrayNode(); gc.geoms.foreach(gg => a.add(toNode(gg)))
        o.set[JsonNode]("geometries", a)
    }
    o
  }
}
