package graft.sources

import java.io.ByteArrayInputStream
import java.nio.charset.StandardCharsets

import scala.collection.JavaConverters._

import org.apache.arrow.memory.RootAllocator
import org.apache.arrow.vector._
import org.apache.arrow.vector.complex.ListVector
import org.apache.arrow.vector.complex.impl.UnionListWriter
import org.apache.arrow.vector.ipc.{ArrowFileReader, ArrowFileWriter, ArrowStreamReader}
import org.apache.arrow.vector.types.{FloatingPointPrecision, TimeUnit => ArrowTimeUnit}
import org.apache.arrow.vector.types.pojo.{ArrowType, Field, FieldType, Schema => ArrowSchema}
import org.apache.arrow.vector.util.{ByteArrayReadableSeekableByteChannel, Text}
import org.apache.arrow.vector.ipc.SeekableReadChannel
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/**
 * Arrow IPC reader/writer — the reference's NATIVE columnar format: its
 * benches load `data/cities.arrow` through polars' IpcReader
 * (reference: geopolars/benches/affine.rs:8-22), its bundled datasets are
 * Arrow IPC files (python/geopolars/datasets/__init__.py:11-42), and
 * `from_arrow` constructs frames from Arrow tables (convert.py:33-56).
 * Spark has no IPC source, so this closes the §2.1 gap with the Arrow Java
 * library Spark already ships.
 *
 * Both the random-access FILE format (`ARROW1` magic) and the STREAM
 * format are read, auto-detected per file. Distribution model: one task
 * per file via the `binaryFile` source (same per-file parallelism as
 * Shapefile — a directory of IPC files fans out across executors; a single
 * giant file should be parquet instead, which is the engine's canonical
 * at-scale source). Writing emits one file per partition under the target
 * directory, so the write side scales with the upstream partitioning.
 *
 * Type coverage (both directions): int8/16/32/64, float32/64, bool, utf8,
 * binary, date32, timestamp[us], and list-of-numeric (embeddings). Readers
 * additionally accept large_utf8/large_binary.
 */
object ArrowIPC {

  // ---------------------------------------------------------------- schema

  private[sources] def toSparkType(t: ArrowType): DataType = t match {
    case i: ArrowType.Int if i.getIsSigned => i.getBitWidth match {
      case 8  => ByteType
      case 16 => ShortType
      case 32 => IntegerType
      case 64 => LongType
      case w  => throw new IllegalArgumentException(s"unsupported int width $w")
    }
    case f: ArrowType.FloatingPoint => f.getPrecision match {
      case FloatingPointPrecision.SINGLE => FloatType
      case FloatingPointPrecision.DOUBLE => DoubleType
      case p => throw new IllegalArgumentException(s"unsupported float precision $p")
    }
    case _: ArrowType.Utf8 | _: ArrowType.LargeUtf8     => StringType
    case _: ArrowType.Binary | _: ArrowType.LargeBinary => BinaryType
    case _: ArrowType.Bool                              => BooleanType
    case _: ArrowType.Date                              => DateType
    case ts: ArrowType.Timestamp if ts.getUnit == ArrowTimeUnit.MICROSECOND =>
      TimestampType
    case other =>
      throw new IllegalArgumentException(s"unsupported Arrow type $other")
  }

  private[sources] def toSparkSchema(s: ArrowSchema): StructType =
    StructType(s.getFields.asScala.toSeq.map { f =>
      val dt = f.getType match {
        case _: ArrowType.List =>
          ArrayType(toSparkType(f.getChildren.get(0).getType),
            f.getChildren.get(0).isNullable)
        case t => toSparkType(t)
      }
      StructField(f.getName, dt, f.isNullable)
    })

  private[sources] def toArrowField(f: StructField): Field = {
    def prim(dt: DataType): ArrowType = dt match {
      case ByteType    => new ArrowType.Int(8, true)
      case ShortType   => new ArrowType.Int(16, true)
      case IntegerType => new ArrowType.Int(32, true)
      case LongType    => new ArrowType.Int(64, true)
      case FloatType   => new ArrowType.FloatingPoint(FloatingPointPrecision.SINGLE)
      case DoubleType  => new ArrowType.FloatingPoint(FloatingPointPrecision.DOUBLE)
      case StringType  => new ArrowType.Utf8
      case BinaryType  => new ArrowType.Binary
      case BooleanType => new ArrowType.Bool
      case DateType    => new ArrowType.Date(org.apache.arrow.vector.types.DateUnit.DAY)
      case TimestampType => new ArrowType.Timestamp(ArrowTimeUnit.MICROSECOND, "UTC")
      case other => throw new IllegalArgumentException(
        s"unsupported Spark type for Arrow IPC write: $other")
    }
    f.dataType match {
      case ArrayType(et @ (FloatType | DoubleType | LongType | IntegerType), containsNull) =>
        new Field(f.name, FieldType.nullable(new ArrowType.List),
          Seq(new Field("element",
            new FieldType(containsNull, prim(et), null), null.asInstanceOf[java.util.List[Field]])).asJava)
      case ArrayType(other, _) => throw new IllegalArgumentException(
        s"unsupported Arrow IPC list element type on write: $other")
      case dt =>
        new Field(f.name, new FieldType(f.nullable, prim(dt), null),
          null.asInstanceOf[java.util.List[Field]])
    }
  }

  // ------------------------------------------------------------------ read

  private val FileMagic: Array[Byte] = "ARROW1".getBytes(StandardCharsets.US_ASCII)

  private def isFileFormat(bytes: Array[Byte]): Boolean =
    bytes.length >= 6 && FileMagic.indices.forall(i => bytes(i) == FileMagic(i))

  /** Parse one in-memory IPC payload (file or stream format) into rows. */
  private[sources] def parse(bytes: Array[Byte]): (ArrowSchema, Iterator[Row]) = {
    val allocator = new RootAllocator()
    val reader =
      if (isFileFormat(bytes))
        new ArrowFileReader(
          new SeekableReadChannel(new ByteArrayReadableSeekableByteChannel(bytes)), allocator)
      else
        new ArrowStreamReader(new ByteArrayInputStream(bytes), allocator)
    val root = reader.getVectorSchemaRoot
    val schema = root.getSchema
    val rows = scala.collection.mutable.ArrayBuffer.empty[Row]
    try {
      while (reader.loadNextBatch()) {
        val vecs = root.getFieldVectors.asScala.toArray
        var i = 0
        val n = root.getRowCount
        while (i < n) {
          rows += Row.fromSeq(vecs.map(v => value(v, i)).toSeq)
          i += 1
        }
      }
    } finally {
      reader.close()
      allocator.close()
    }
    (schema, rows.iterator)
  }

  private def value(v: FieldVector, i: Int): Any = {
    if (v.isNull(i)) return null
    v match {
      case x: BigIntVector    => x.get(i)
      case x: IntVector       => x.get(i)
      case x: SmallIntVector  => x.get(i)
      case x: TinyIntVector   => x.get(i)
      case x: Float8Vector    => x.get(i)
      case x: Float4Vector    => x.get(i)
      case x: BitVector       => x.get(i) == 1
      case x: VarCharVector   => new String(x.get(i), StandardCharsets.UTF_8)
      case x: LargeVarCharVector => new String(x.get(i), StandardCharsets.UTF_8)
      case x: VarBinaryVector => x.get(i)
      case x: LargeVarBinaryVector => x.get(i)
      case x: DateDayVector   => java.time.LocalDate.ofEpochDay(x.get(i).toLong)
      case x: TimeStampMicroTZVector => microsToInstant(x.get(i))
      case x: TimeStampMicroVector   => microsToInstant(x.get(i))
      case x: ListVector =>
        x.getObject(i).asScala.toSeq.map {
          case t: Text => t.toString
          case other   => other
        }
      case other => throw new IllegalArgumentException(
        s"unsupported Arrow vector ${other.getClass.getSimpleName}")
    }
  }

  private def microsToInstant(us: Long): java.time.Instant =
    java.time.Instant.ofEpochSecond(Math.floorDiv(us, 1000000L),
      Math.floorMod(us, 1000000L) * 1000L)

  /**
   * Read a `.arrow` file or a directory of them into a DataFrame. Schema
   * comes from the first file; every file is parsed in its own task.
   */
  def read(spark: SparkSession, path: String): DataFrame = {
    val bin = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.arrow*")
      .load(path)
      .select("content")
    val firstBytes = bin.head().getAs[Array[Byte]](0)
    val (arrowSchema, _) = parse(firstBytes)
    val sparkSchema = toSparkSchema(arrowSchema)
    val rows = bin.rdd.flatMap(r => parse(r.getAs[Array[Byte]](0))._2)
    spark.createDataFrame(rows, sparkSchema)
  }

  // ----------------------------------------------------------------- write

  /**
   * Write the DataFrame as Arrow IPC file format: one `part-NNNNN.arrow`
   * per non-empty partition (plus one empty schema-only file when the
   * frame has no rows, so a round-trip preserves the schema), batches of
   * `maxRecordsPerBatch` rows.
   */
  def write(df: DataFrame, dir: String, maxRecordsPerBatch: Int = 8192): Unit = {
    val schema = df.schema
    val arrowFields = schema.fields.map(toArrowField) // validates types up front
    require(arrowFields.nonEmpty, "cannot write a zero-column frame")
    val dirPath = new org.apache.hadoop.fs.Path(dir)
    val dfs = dirPath.getFileSystem(df.sparkSession.sparkContext.hadoopConfiguration)
    dfs.mkdirs(dirPath)
    dfs.listStatus(dirPath).filter(_.getPath.getName.endsWith(".arrow"))
      .foreach(s => dfs.delete(s.getPath, false))

    val sparkSchemaJson = schema.json
    val batchSize = maxRecordsPerBatch
    val written = df.rdd.mapPartitionsWithIndex { (pid, rows) =>
      if (rows.isEmpty) Iterator.empty
      else {
        writeOneFile(f"$dir%s/part-$pid%05d.arrow", sparkSchemaJson, rows, batchSize)
        Iterator.single(1)
      }
    }.count()
    if (written == 0L) // schema-only file so read() can infer
      writeOneFile(s"$dir/part-00000.arrow", sparkSchemaJson, Iterator.empty, batchSize)
  }

  private def writeOneFile(
      file: String,
      sparkSchemaJson: String,
      rows: Iterator[Row],
      batchSize: Int): Unit = {
    val schema = DataType.fromJson(sparkSchemaJson).asInstanceOf[StructType]
    val arrowSchema = new ArrowSchema(schema.fields.map(toArrowField).toSeq.asJava)
    val allocator = new RootAllocator()
    val root = VectorSchemaRoot.create(arrowSchema, allocator)
    val p = new org.apache.hadoop.fs.Path(file)
    // executor-side: a fresh Configuration resolves the default FS the same
    // way the task's other outputs do (local[.] => local fs, cluster => HDFS)
    val out = p.getFileSystem(new org.apache.hadoop.conf.Configuration()).create(p, true)
    val writer = new ArrowFileWriter(root, null, java.nio.channels.Channels.newChannel(out))
    try {
      writer.start()
      while (rows.hasNext) {
        val batch = rows.take(batchSize).toArray
        root.allocateNew()
        batch.zipWithIndex.foreach { case (row, i) =>
          var c = 0
          while (c < schema.length) {
            setValue(root.getVector(c), i, row.get(c), schema(c).dataType)
            c += 1
          }
        }
        root.setRowCount(batch.length)
        writer.writeBatch()
      }
      if (!root.getFieldVectors.isEmpty && root.getRowCount == 0) {
        root.allocateNew()
        root.setRowCount(0)
        writer.writeBatch() // schema-only batch for empty frames
      }
      writer.end()
    } finally {
      writer.close()
      root.close()
      allocator.close()
      out.close()
    }
  }

  private def setValue(v: FieldVector, i: Int, value: Any, dt: DataType): Unit = {
    if (value == null) { v.setNull(i); return }
    (v, value) match {
      case (x: BigIntVector, n: java.lang.Long)      => x.setSafe(i, n)
      case (x: IntVector, n: java.lang.Integer)      => x.setSafe(i, n)
      case (x: SmallIntVector, n: java.lang.Short)   => x.setSafe(i, n)
      case (x: TinyIntVector, n: java.lang.Byte)     => x.setSafe(i, n)
      case (x: Float8Vector, n: java.lang.Double)    => x.setSafe(i, n)
      case (x: Float4Vector, n: java.lang.Float)     => x.setSafe(i, n)
      case (x: BitVector, b: java.lang.Boolean)      => x.setSafe(i, if (b) 1 else 0)
      case (x: VarCharVector, s: String)             =>
        x.setSafe(i, s.getBytes(StandardCharsets.UTF_8))
      case (x: VarBinaryVector, b: Array[Byte])      => x.setSafe(i, b)
      case (x: DateDayVector, d: java.sql.Date)      =>
        x.setSafe(i, d.toLocalDate.toEpochDay.toInt)
      case (x: DateDayVector, d: java.time.LocalDate) => x.setSafe(i, d.toEpochDay.toInt)
      case (x: TimeStampMicroTZVector, t: java.sql.Timestamp) =>
        x.setSafe(i, t.getTime * 1000L + t.getNanos / 1000 % 1000)
      case (x: TimeStampMicroTZVector, t: java.time.Instant) =>
        x.setSafe(i, t.getEpochSecond * 1000000L + t.getNano / 1000)
      case (x: ListVector, seq: scala.collection.Seq[_]) =>
        val w: UnionListWriter = x.getWriter
        w.setPosition(i)
        w.startList()
        val et = dt.asInstanceOf[ArrayType].elementType
        seq.foreach { e =>
          (et, e) match {
            case (FloatType, f: java.lang.Float)    => w.float4().writeFloat4(f)
            case (DoubleType, d: java.lang.Double)  => w.float8().writeFloat8(d)
            case (LongType, n: java.lang.Long)      => w.bigInt().writeBigInt(n)
            case (IntegerType, n: java.lang.Integer) => w.integer().writeInt(n)
            case (t, e) => throw new IllegalArgumentException(
              s"unsupported list element $t / ${if (e == null) "null" else e.getClass}")
          }
        }
        w.endList()
      case (vec, other) => throw new IllegalArgumentException(
        s"type mismatch writing ${vec.getClass.getSimpleName} from " +
          s"${other.getClass.getSimpleName}")
    }
  }
}
