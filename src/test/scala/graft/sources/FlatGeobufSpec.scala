package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.geom._

class FlatGeobufSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def tmpFile(tag: String): String = {
    val d = Files.createTempDirectory(s"graft_fgb_$tag").toFile
    d.deleteOnExit()
    d.getAbsolutePath + "/data.fgb"
  }

  private def mkDf(rows: Seq[Row], schema: StructType) =
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), schema)

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("name", StringType),
    StructField("score", DoubleType),
    StructField("flag", BooleanType),
    StructField("geometry", BinaryType)))

  private def pt(x: Double, y: Double): Array[Byte] = WKB.write(Point(x, y))

  test("round-trip: attributes, nulls, point geometry") {
    val rows = Seq(
      Row(1L, "alpha", 1.5, true, pt(0.5, 0.5)),
      Row(2L, null, -0.25, false, pt(9.5, 9.5)),
      Row(3L, "gamma", null, null, pt(5.0, 5.0)),
      Row(4L, "delta", 2.0, true, null))
    val path = tmpFile("rt")
    FlatGeobuf.write(mkDf(rows, schema), path)
    val back = FlatGeobuf.read(spark, path)
    assert(back.schema.map(f => (f.name, f.dataType)) ==
      schema.map(f => (f.name, f.dataType)))
    val got = back.collect().map(r => (r.getAs[Any]("id"), r.getAs[Any]("name"),
      r.getAs[Any]("score"), r.getAs[Any]("flag"))).toSet
    assert(got == Set((1L, "alpha", 1.5, true), (2L, null, -0.25, false),
      (3L, "gamma", null, null), (4L, "delta", 2.0, true)))
    val g1 = back.filter("id = 1").collect()(0).getAs[Array[Byte]]("geometry")
    assert(WKB.readOrNull(g1) == Point(0.5, 0.5))
    assert(back.filter("id = 4").collect()(0).isNullAt(4))
  }

  test("round-trip: every 2D geometry type") {
    val geoms: Seq[graft.geom.Geometry] = Seq(
      Point(1, 2),
      LineString(Array(0.0, 0.0, 1.0, 1.0, 2.0, 0.0)),
      Polygon(Array(Array(0.0, 0.0, 4.0, 0.0, 4.0, 4.0, 0.0, 4.0, 0.0, 0.0),
        Array(1.0, 1.0, 1.0, 2.0, 2.0, 2.0, 2.0, 1.0, 1.0, 1.0))),
      MultiPoint(Array(Point(0, 0), Point(1, 1))),
      MultiLineString(Array(LineString(Array(0.0, 0.0, 1.0, 0.0)),
        LineString(Array(0.0, 1.0, 1.0, 1.0)))),
      MultiPolygon(Array(
        Polygon(Array(Array(0.0, 0.0, 1.0, 0.0, 1.0, 1.0, 0.0, 1.0, 0.0, 0.0))),
        Polygon(Array(Array(5.0, 5.0, 6.0, 5.0, 6.0, 6.0, 5.0, 6.0, 5.0, 5.0))))),
      GeometryCollection(Array(Point(3, 3),
        LineString(Array(0.0, 0.0, 3.0, 3.0)))))
    val s2 = StructType(Seq(StructField("id", LongType),
      StructField("geometry", BinaryType)))
    val rows = geoms.zipWithIndex.map { case (g, i) =>
      Row(i.toLong, WKB.write(g))
    }
    val path = tmpFile("geoms")
    FlatGeobuf.write(mkDf(rows, s2), path)
    val back = FlatGeobuf.read(spark, path).collect()
      .map(r => r.getAs[Long]("id") -> WKB.readOrNull(r.getAs[Array[Byte]]("geometry")))
      .toMap
    geoms.zipWithIndex.foreach { case (g, i) =>
      assert(back(i.toLong) == g, s"geometry $i (${g.typeName})")
    }
  }

  test("bbox pushdown via packed R-tree matches full-scan filter") {
    // 400 points on a 20x20 grid; query a sub-box
    val s2 = StructType(Seq(StructField("id", LongType),
      StructField("geometry", BinaryType)))
    val rows = (0 until 400).map { i =>
      Row(i.toLong, pt((i % 20).toDouble, (i / 20).toDouble))
    }
    val path = tmpFile("bbox")
    FlatGeobuf.write(mkDf(rows, s2), path, indexNodeSize = 4)
    val q = (3.5, 3.5, 7.5, 7.5)
    val hit = FlatGeobuf.read(spark, path, bbox = Some(q)).collect()
      .map(_.getAs[Long]("id")).toSet
    val expected = (0 until 400).filter { i =>
      val x = (i % 20).toDouble; val y = (i / 20).toDouble
      x >= 3.5 && x <= 7.5 && y >= 3.5 && y <= 7.5
    }.map(_.toLong).toSet
    assert(hit == expected)
    assert(expected.size == 16)

    // unindexed file: same result through the post-filter fallback
    val path2 = tmpFile("noindex")
    FlatGeobuf.write(mkDf(rows, s2), path2, indexNodeSize = 0)
    val hit2 = FlatGeobuf.read(spark, path2, bbox = Some(q)).collect()
      .map(_.getAs[Long]("id")).toSet
    assert(hit2 == expected)
  }

  test("bbox read never returns null-geometry features, indexed or not") {
    // null geometries are indexed under a (0,0,0,0) placeholder bbox; a
    // query box covering the origin must still exclude them on both paths
    val s2 = StructType(Seq(StructField("id", LongType),
      StructField("geometry", BinaryType)))
    val rows = Seq(
      Row(1L, pt(0.0, 0.0)), Row(2L, null), Row(3L, pt(5.0, 5.0)), Row(4L, null))
    val q = (-1.0, -1.0, 1.0, 1.0) // covers the origin placeholder
    for (nodeSize <- Seq(4, 0)) {
      val path = tmpFile(s"nullgeom$nodeSize")
      FlatGeobuf.write(mkDf(rows, s2), path, indexNodeSize = nodeSize)
      val hit = FlatGeobuf.read(spark, path, bbox = Some(q)).collect()
        .map(_.getAs[Long]("id")).toSet
      assert(hit == Set(1L), s"indexNodeSize=$nodeSize got $hit")
      // no-bbox read still returns every feature, null geometries included
      assert(FlatGeobuf.read(spark, path).count() == 4)
    }
  }

  test("randomized round-trip: 300 features, mixed types/attrs/nulls") {
    val rnd = new scala.util.Random(20260813L)
    def randGeom(i: Int): graft.geom.Geometry = rnd.nextInt(5) match {
      case 0 => Point(rnd.nextDouble() * 360 - 180, rnd.nextDouble() * 170 - 85)
      case 1 =>
        LineString(Array.fill((2 + rnd.nextInt(6)) * 2)(rnd.nextDouble() * 100))
      case 2 =>
        val x = rnd.nextDouble() * 100; val y = rnd.nextDouble() * 100
        val w = 0.1 + rnd.nextDouble() * 5; val h = 0.1 + rnd.nextDouble() * 5
        Polygon(Array(Array(x, y, x + w, y, x + w, y + h, x, y + h, x, y)))
      case 3 => MultiPoint(Array.fill(1 + rnd.nextInt(4))(
        Point(rnd.nextDouble() * 10, rnd.nextDouble() * 10)))
      case _ => MultiLineString(Array.fill(1 + rnd.nextInt(3))(
        LineString(Array.fill(4)(rnd.nextDouble() * 10))))
    }
    val rows = (0 until 300).map { i =>
      Row(i.toLong,
        if (i % 7 == 0) null else s"name_${rnd.nextInt(1000)}_é中",
        if (i % 5 == 0) null else Double.box(rnd.nextDouble() * 1e6 - 5e5),
        if (i % 3 == 0) null else Boolean.box(rnd.nextBoolean()),
        if (i % 11 == 0) null else WKB.write(randGeom(i)))
    }
    val path = tmpFile("fuzz")
    FlatGeobuf.write(mkDf(rows, schema), path, indexNodeSize = 5)
    val back = FlatGeobuf.read(spark, path).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(back.size == 300)
    rows.foreach { r =>
      val id = r.getLong(0)
      val b = back(id)
      assert(b.getAs[String]("name") == r.getAs[String](1), s"name @$id")
      val s0 = r.getAs[java.lang.Double](2); val s1 = b.getAs[java.lang.Double]("score")
      assert((s0 == null && s1 == null) || s0 == s1, s"score @$id")
      assert(b.getAs[java.lang.Boolean]("flag") == r.getAs[java.lang.Boolean](3), s"flag @$id")
      val g0 = Option(r.getAs[Array[Byte]](4)).map(WKB.readOrNull).orNull
      val g1 = Option(b.getAs[Array[Byte]]("geometry")).map(WKB.readOrNull).orNull
      assert(g0 == g1, s"geometry @$id")
    }
  }

  test("hilbert index is a permutation on a small grid") {
    val seen = (0 until 16).flatMap(x => (0 until 16).map(y =>
      FlatGeobuf.hilbert(x * 4369, y * 4369))) // spread over the 16-bit range
    assert(seen.distinct.length == 256)
  }
}
