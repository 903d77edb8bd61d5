package graft.sources

import java.nio.file.Files

import scala.collection.JavaConverters._

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class ArrowIPCSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmpDir(tag: String): String = {
    val d = Files.createTempDirectory(s"graft_arrow_$tag").toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  test("round-trip: primitives, strings, binary, nulls") {
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("name", StringType),
      StructField("score", DoubleType),
      StructField("flag", BooleanType),
      StructField("wkb", BinaryType),
      StructField("small", IntegerType)))
    val rows = Seq(
      Row(1L, "alpha", 1.5, true, Array[Byte](1, 2, 3), 7),
      Row(2L, null, -0.25, false, null, -1),
      Row(3L, "gamma", null, null, Array[Byte](), 0))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), schema)

    val dir = tmpDir("prim")
    ArrowIPC.write(df, dir)
    val back = ArrowIPC.read(spark, dir)
    assert(back.schema.map(f => (f.name, f.dataType)) ==
      schema.map(f => (f.name, f.dataType)))
    val got = back.collect().map(r =>
      (r.getAs[Any]("id"), r.getAs[Any]("name"), r.getAs[Any]("score"),
       r.getAs[Any]("flag"),
       Option(r.getAs[Array[Byte]]("wkb")).map(_.toSeq).orNull,
       r.getAs[Any]("small"))).toSet
    assert(got == Set(
      (1L, "alpha", 1.5, true, Seq[Byte](1, 2, 3), 7),
      (2L, null, -0.25, false, null, -1),
      (3L, "gamma", null, null, Seq.empty[Byte], 0)))
  }

  test("round-trip: float-list embeddings column") {
    val df = Seq(
      (1L, Array(0.5f, -1.25f, 3.0f)),
      (2L, Array.empty[Float]),
      (3L, Array(9.5f))
    ).toDF("vec_id", "embedding")
    val dir = tmpDir("list")
    ArrowIPC.write(df, dir)
    val back = ArrowIPC.read(spark, dir)
    assert(back.schema("embedding").dataType.isInstanceOf[ArrayType])
    val got = back.select("vec_id", "embedding")
      .as[(Long, Array[Float])].collect().toMap
    assert(got(1L).toSeq == Seq(0.5f, -1.25f, 3.0f))
    assert(got(2L).isEmpty && got(3L).toSeq == Seq(9.5f))
  }

  test("round-trip: timestamp and date columns") {
    val ts = java.sql.Timestamp.valueOf("2026-03-01 12:34:56.123456")
    val d = java.sql.Date.valueOf("2026-03-01")
    val df = Seq((1L, ts, d)).toDF("id", "ts", "d")
    val dir = tmpDir("time")
    ArrowIPC.write(df, dir)
    val row = ArrowIPC.read(spark, dir).head()
    assert(row.getAs[java.sql.Timestamp]("ts") == ts)
    assert(row.getAs[java.sql.Date]("d") == d)
  }

  test("empty frame round-trips its schema") {
    val df = Seq((1L, "x")).toDF("id", "s").filter($"id" < 0)
    val dir = tmpDir("empty")
    ArrowIPC.write(df, dir)
    val back = ArrowIPC.read(spark, dir)
    assert(back.count() == 0)
    assert(back.schema.fieldNames.toSeq == Seq("id", "s"))
  }

  test("stream format (no ARROW1 magic) is auto-detected") {
    // hand-build a stream-format payload with Arrow Java directly
    val alloc = new org.apache.arrow.memory.RootAllocator()
    val field = new org.apache.arrow.vector.types.pojo.Field("v",
      org.apache.arrow.vector.types.pojo.FieldType.nullable(
        new org.apache.arrow.vector.types.pojo.ArrowType.Int(64, true)), null)
    val schema = new org.apache.arrow.vector.types.pojo.Schema(Seq(field).asJava)
    val root = org.apache.arrow.vector.VectorSchemaRoot.create(schema, alloc)
    val bos = new java.io.ByteArrayOutputStream()
    val w = new org.apache.arrow.vector.ipc.ArrowStreamWriter(
      root, null, java.nio.channels.Channels.newChannel(bos))
    w.start()
    root.allocateNew()
    val vec = root.getVector(0).asInstanceOf[org.apache.arrow.vector.BigIntVector]
    vec.setSafe(0, 41L); vec.setSafe(1, 42L)
    root.setRowCount(2)
    w.writeBatch(); w.end(); w.close(); root.close(); alloc.close()

    val dir = tmpDir("stream")
    Files.write(new java.io.File(dir, "part-00000.arrows").toPath, bos.toByteArray)
    val vals = ArrowIPC.read(spark, dir).as[Long].collect().toSet
    assert(vals == Set(41L, 42L))
  }

  test("GeoIO facade: Datasets cities frame survives an Arrow round-trip") {
    val cities = graft.api.Datasets.readDataset(spark, "cities")
    val dir = tmpDir("cities")
    graft.api.GeoIO.writeArrow(cities, dir)
    val back = graft.api.GeoIO.readArrow(spark, dir)
    assert(back.df.count() == 202)
    // WKB geometry intact: st_x recovers the synthesized lon values
    val x0 = back.df.filter($"name" === "city_0")
      .selectExpr("st_x(geometry)").as[Double].head()
    assert(math.abs(x0 - (-180 + 0.22)) < 1e-9)
  }
}
