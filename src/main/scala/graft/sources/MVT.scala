package graft.sources

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._

import graft.geom.{Geometry => Geom, _}

/**
 * Mapbox Vector Tile (MVT) encoder/decoder — the standard web-map tile
 * payload (public spec: github.com/mapbox/vector-tile-spec, v2.1):
 * protobuf Tile > Layer > Feature with geometry as zigzag-delta command
 * integers in tile-local integer coordinates (y down, `extent` units per
 * tile side). Hand-rolled protobuf (same zero-dependency posture as the
 * FlatGeobuf/TWKB codecs); decoder exists for round-trip verification.
 *
 * The distributed shape ([[tileLayer]]): assign each feature to its
 * slippy tile (the q258 arithmetic), ONE shuffle on the tile key,
 * per-tile encode in mapGroups — the classic tile-pipeline sink, output
 * as a (z, x, y, mvt) DataFrame the caller writes wherever tiles live
 * (parquet table, object store, …). Per-tile memory is one tile's
 * features — the same bound any tiler has.
 *
 * Scope: geometry + integer feature ids (attribute keys/values are
 * optional in the spec and omitted); Point/LineString/Polygon and their
 * Multis; GeometryCollections are rejected as null (not representable in
 * a single MVT feature).
 */
object MVT {

  val DefaultExtent = 4096

  // ------------------------------------------------------------ protobuf

  private def uvarint(out: ByteArrayOutputStream, v: Long): Unit =
    TWKB.writeUvarint(out, v) // shared LEB128 primitive
  private def key(out: ByteArrayOutputStream, field: Int, wire: Int): Unit =
    uvarint(out, (field.toLong << 3) | wire)
  private def bytesField(out: ByteArrayOutputStream, field: Int, b: Array[Byte]): Unit = {
    key(out, field, 2); uvarint(out, b.length.toLong); out.write(b, 0, b.length)
  }
  private def zigzag32(v: Long): Long = ((v << 1) ^ (v >> 31)) & 0xffffffffL

  // ------------------------------------------------------- geometry cmds

  /** Encode one geometry as MVT command integers in tile-local coords.
    * Returns null for unsupported shapes OR when any vertex delta
    * exceeds int32 (a geometry ~half a million tiles wide relative to
    * its assigned tile — zigzag32 would silently wrap it into garbage
    * coordinates; dropping the feature is the honest failure). Cursor
    * deltas persist across parts per the spec. */
  private[sources] def commands(g: Geom): Array[Long] = {
    val out = scala.collection.mutable.ArrayBuffer[Long]()
    var cx = 0L; var cy = 0L
    var overflow = false
    def delta(q: Long, c: Long): Long = {
      val d = q - c
      if (d > Int.MaxValue || d < Int.MinValue) overflow = true
      d
    }
    def move(xs: Array[Double], at: Int, n: Int, cmd: Int): Unit = {
      out += ((cmd & 0x7L) | (n.toLong << 3))
      var i = at
      while (i < at + n) {
        val qx = Math.round(xs(2 * i)); val qy = Math.round(xs(2 * i + 1))
        out += zigzag32(delta(qx, cx)); out += zigzag32(delta(qy, cy))
        cx = qx; cy = qy
        i += 1
      }
    }
    def line(cs: Array[Double]): Unit = {
      val n = cs.length / 2
      if (n >= 2) { move(cs, 0, 1, 1); move(cs, 1, n - 1, 2) }
    }
    def ring(cs: Array[Double]): Unit = {
      // rings drop the closing vertex; ClosePath implies it
      val n = cs.length / 2 - 1
      if (n >= 3) { move(cs, 0, 1, 1); move(cs, 1, n - 1, 2); out += 15L } // ClosePath = (1<<3)|7
    }
    g match {
      case p: Point if !p.isEmpty => move(Array(p.x, p.y), 0, 1, 1)
      case MultiPoint(ps) if ps.nonEmpty =>
        out += (1L | (ps.length.toLong << 3))
        ps.foreach { p =>
          val qx = Math.round(p.x); val qy = Math.round(p.y)
          out += zigzag32(delta(qx, cx)); out += zigzag32(delta(qy, cy)); cx = qx; cy = qy
        }
      case LineString(cs) => line(cs)
      case MultiLineString(ls) => ls.foreach(l => line(l.coords))
      case Polygon(rings) => rings.foreach(ring)
      case MultiPolygon(ps) => ps.foreach(_.rings.foreach(ring))
      case _ => return null
    }
    if (out.isEmpty || overflow) null else out.toArray
  }

  private def geomType(g: Geom): Int = g match {
    case _: Point | _: MultiPoint => 1
    case _: LineString | _: MultiLineString => 2
    case _: Polygon | _: MultiPolygon => 3
    case _ => 0
  }

  // ------------------------------------------------------------- encode

  /** One feature: id + geometry in tile-local integer coords. */
  def encodeFeature(id: Long, g: Geom): Array[Byte] = {
    val cmds = commands(g)
    if (cmds == null) return null
    val out = new ByteArrayOutputStream()
    key(out, 1, 0); uvarint(out, id)          // id
    key(out, 3, 0); uvarint(out, geomType(g)) // type
    val geo = new ByteArrayOutputStream()
    cmds.foreach(uvarint(geo, _))
    bytesField(out, 4, geo.toByteArray)       // packed geometry
    out.toByteArray
  }

  /** One layer from (id, tile-local geometry) features. */
  def encodeLayer(name: String, features: Seq[(Long, Geom)],
                  extent: Int = DefaultExtent): Array[Byte] = {
    val layer = new ByteArrayOutputStream()
    key(layer, 15, 0); uvarint(layer, 2L)     // version 2
    bytesField(layer, 1, name.getBytes("UTF-8"))
    features.foreach { case (id, g) =>
      val f = encodeFeature(id, g)
      if (f != null) bytesField(layer, 2, f)
    }
    key(layer, 5, 0); uvarint(layer, extent.toLong)
    val tile = new ByteArrayOutputStream()
    bytesField(tile, 3, layer.toByteArray)
    tile.toByteArray
  }

  /** Web-mercator lon/lat geometry -> tile-local integer coords of tile
    * (z, tx, ty), y down. Vertices may fall outside [0, extent) (features
    * crossing tile edges keep their true shape; clipping is a renderer
    * concern the spec leaves open). */
  def toTileCoords(g: Geom, z: Int, tx: Long, ty: Long,
                   extent: Int = DefaultExtent): Geom = {
    val n = (1L << z).toDouble
    g.mapCoords { (lon, lat) =>
      val mx = (lon + 180.0) / 360.0 * n
      val latR = math.toRadians(math.max(-85.05112878, math.min(85.05112878, lat)))
      val my = (1.0 - math.log(math.tan(latR) + 1.0 / math.cos(latR)) / math.Pi) / 2.0 * n
      ((mx - tx) * extent, (my - ty) * extent)
    }
  }

  // ------------------------------------------------------------- decode

  final case class DecodedFeature(id: Long, geomType: Int, commands: Array[Long])
  final case class DecodedLayer(name: String, version: Int, extent: Int,
                                features: Seq[DecodedFeature])

  private final class Rd(val b: Array[Byte]) {
    var pos = 0
    def hasMore: Boolean = pos < b.length
    def uv(): Long = {
      var v = 0L; var sh = 0; var x = 0
      do {
        require(pos < b.length && sh <= 63, "truncated varint")
        x = b(pos) & 0xff; pos += 1; v |= (x & 0x7fL) << sh; sh += 7
      } while ((x & 0x80) != 0)
      v
    }
    def sub(): Rd = {
      val len = uv().toInt
      require(len >= 0 && pos + len <= b.length, "bad length")
      val r = new Rd(java.util.Arrays.copyOfRange(b, pos, pos + len)); pos += len; r
    }
    def skip(wire: Int): Unit = wire match {
      case 0 => uv()
      case 2 => sub()
      case 5 => pos += 4
      case 1 => pos += 8
      case w => throw new IllegalArgumentException(s"wire $w")
    }
  }

  def decode(bytes: Array[Byte]): Seq[DecodedLayer] = {
    val rd = new Rd(bytes)
    val layers = scala.collection.mutable.ArrayBuffer[DecodedLayer]()
    while (rd.hasMore) {
      val k = rd.uv(); val field = (k >> 3).toInt; val wire = (k & 7).toInt
      if (field == 3 && wire == 2) layers += decodeLayer(rd.sub()) else rd.skip(wire)
    }
    layers.toSeq
  }

  private def decodeLayer(rd: Rd): DecodedLayer = {
    var name = ""; var version = 1; var extent = DefaultExtent
    val fs = scala.collection.mutable.ArrayBuffer[DecodedFeature]()
    while (rd.hasMore) {
      val k = rd.uv(); val field = (k >> 3).toInt; val wire = (k & 7).toInt
      field match {
        case 15 => version = rd.uv().toInt
        case 1 => name = new String(rd.sub().b, "UTF-8")
        case 5 => extent = rd.uv().toInt
        case 2 =>
          val f = rd.sub()
          var id = 0L; var tpe = 0; var cmds = Array.empty[Long]
          while (f.hasMore) {
            val fk = f.uv(); val ff = (fk >> 3).toInt; val fw = (fk & 7).toInt
            ff match {
              case 1 => id = f.uv()
              case 3 => tpe = f.uv().toInt
              case 4 =>
                val g = f.sub()
                val buf = scala.collection.mutable.ArrayBuffer[Long]()
                while (g.hasMore) buf += g.uv()
                cmds = buf.toArray
              case _ => f.skip(fw)
            }
          }
          fs += DecodedFeature(id, tpe, cmds)
        case _ => rd.skip(wire)
      }
    }
    DecodedLayer(name, version, extent, fs.toSeq)
  }

  /** Rebuild tile-local geometry from decoded commands (inverse of
    * [[commands]] for the supported shapes). */
  def commandsToGeom(tpe: Int, cmds: Array[Long]): Geom = {
    def unzig(v: Long): Long = (v >>> 1) ^ -(v & 1)
    var cx = 0L; var cy = 0L; var i = 0
    val parts = scala.collection.mutable.ArrayBuffer[Array[Double]]()
    var cur = scala.collection.mutable.ArrayBuffer[Double]()
    def flush(close: Boolean): Unit = if (cur.nonEmpty) {
      if (close && cur.length >= 2) { cur += cur(0); cur += cur(1) }
      parts += cur.toArray; cur = scala.collection.mutable.ArrayBuffer[Double]()
    }
    while (i < cmds.length) {
      val cmd = (cmds(i) & 7).toInt; val count = (cmds(i) >> 3).toInt; i += 1
      cmd match {
        case 1 =>
          flush(close = false)
          var c = 0
          while (c < count) {
            cx += unzig(cmds(i)); cy += unzig(cmds(i + 1)); i += 2
            if (tpe == 1) { cur += cx.toDouble; cur += cy.toDouble; flush(close = false) }
            else { flush(close = false); cur += cx.toDouble; cur += cy.toDouble }
            c += 1
          }
        case 2 =>
          var c = 0
          while (c < count) {
            cx += unzig(cmds(i)); cy += unzig(cmds(i + 1)); i += 2
            cur += cx.toDouble; cur += cy.toDouble
            c += 1
          }
        case 7 => flush(close = true)
        case c => throw new IllegalArgumentException(s"bad command $c")
      }
    }
    flush(close = false)
    tpe match {
      case 1 =>
        val pts = parts.map(p => Point(p(0), p(1))).toArray
        if (pts.length == 1) pts(0) else MultiPoint(pts)
      case 2 =>
        val ls = parts.map(LineString(_)).toArray
        if (ls.length == 1) ls(0) else MultiLineString(ls)
      case 3 =>
        // Rings arrive in order: each polygon = one exterior ring followed by
        // its holes (vector-tile-spec 2.1 §4.3.3.3 — exterior and interior
        // rings wind OPPOSITE ways). Group by orientation: a ring whose
        // signed area matches the FIRST ring's sign starts a new polygon,
        // opposite-sign rings are holes of the current one. A decoded
        // MultiPolygon therefore keeps its parts separate instead of
        // conflating extra exteriors into one polygon's hole list.
        def signedArea2(r: Array[Double]): Double = {
          var a = 0.0; var j = 0
          val np = r.length / 2
          while (j < np - 1) {
            a += r(2 * j) * r(2 * j + 3) - r(2 * j + 2) * r(2 * j + 1)
            j += 1
          }
          a
        }
        val polys = scala.collection.mutable.ArrayBuffer[Polygon]()
        var group = scala.collection.mutable.ArrayBuffer[Array[Double]]()
        var extSign = 0.0
        parts.foreach { r =>
          val s = math.signum(signedArea2(r))
          if (group.isEmpty) { extSign = s; group += r }
          else if (s == extSign || s == 0.0) {
            // same winding as the running exterior (or degenerate): if the
            // exterior sign is defined, this starts the next polygon
            if (s != 0.0) { polys += Polygon(group.toArray); group = scala.collection.mutable.ArrayBuffer(r) }
            else group += r
          } else group += r
        }
        if (group.nonEmpty) polys += Polygon(group.toArray)
        if (polys.length == 1) polys(0) else MultiPolygon(polys.toArray)
      case t => throw new IllegalArgumentException(s"bad geom type $t")
    }
  }

  // ------------------------------------------------------ distributed op

  /**
   * Distributed tile build: (id, wkb geometry in lon/lat) -> one row per
   * slippy tile at `zoom` with the encoded MVT layer. Features assign to
   * the tile of their envelope CENTER (one tile per feature — the
   * duplication-free choice; border-crossing features still carry their
   * full shape in tile-local coords). One shuffle on the tile key.
   */
  def tileLayer(df: DataFrame, idCol: String, geomCol: String, zoom: Int,
                layerName: String = "layer", extent: Int = DefaultExtent): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    require(zoom >= 0 && zoom <= 30, "zoom in [0,30]")
    val n = (1L << zoom).toDouble
    val prepped = df.select(col(idCol).cast("long").as("id"), col(geomCol).as("g"))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, wkb) =>
        val g = if (wkb == null) null else WKB.readOrNull(wkb)
        if (g == null || g.isEmpty) Iterator.empty
        else {
          val e = g.envelope
          val lon = (e.minX + e.maxX) / 2; val lat = (e.minY + e.maxY) / 2
          val tx = math.max(0L, math.min((1L << zoom) - 1,
            math.floor((lon + 180.0) / 360.0 * n).toLong))
          val latR = math.toRadians(math.max(-85.05112878, math.min(85.05112878, lat)))
          val ty = math.max(0L, math.min((1L << zoom) - 1,
            math.floor((1.0 - math.log(math.tan(latR) + 1.0 / math.cos(latR)) / math.Pi) / 2.0 * n).toLong))
          Iterator((tx, ty, id, wkb))
        }
      }.toDF("tx", "ty", "id", "g")
    prepped.groupByKey(r => (r.getLong(0), r.getLong(1)))(
        Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong))
      .mapGroups { (tile, rows) =>
        val (tx, ty) = tile
        val feats = rows.map { r =>
          val g = WKB.readOrNull(r.getAs[Array[Byte]]("g"))
          (r.getLong(2), toTileCoords(g, zoom, tx, ty, extent))
        }.toSeq.sortBy(_._1)
        (zoom, tx, ty, feats.length.toLong, encodeLayer(layerName, feats, extent))
      }
      .toDF("z", "x", "y", "n_features", "mvt")
  }
}
