package graft.pipeline

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Multimodal-column plumbing (BASELINE.json capability extension): treat
 * image/audio/video payloads as opaque `binary` columns with typed metadata,
 * and run decode / feature-extract / resize / frame-sample as partition-wise
 * batch transforms.
 *
 * The actual codec step is STUBBED (no image/audio libraries in this
 * environment — see the builder contract): `FakeCodec` produces
 * deterministic pseudo-decoded output from the bytes so the Spark-side
 * contract (schema, partitioning, batch shape, null handling) is real and
 * testable; swap `FakeCodec` for a real decoder on a cluster with codecs
 * installed.
 */
object Multimodal {

  /** Typed metadata carried next to every payload column. */
  val mediaMetaSchema: StructType = StructType(Seq(
    StructField("media_type", StringType, nullable = false),   // image|audio|video
    StructField("format", StringType, nullable = true),        // png|wav|mp4|...
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("duration_ms", LongType, nullable = true)
  ))

  /**
   * Deterministic stand-in for the decode step. Everything below is derived
   * only from the payload bytes, so results are stable across runs/executors.
   */
  object FakeCodec {
    /** "Decode" an image payload to (width, height, meanLuma). */
    def decodeImage(bytes: Array[Byte]): (Int, Int, Double) = {
      if (bytes == null || bytes.isEmpty) return (0, 0, 0.0)
      val h = TextKernels.hash64(new String(java.util.Base64.getEncoder.encode(bytes.take(64)), "ascii"), 7)
      val w = 64 + math.floorMod(h, 448).toInt
      val ht = 64 + math.floorMod(h >>> 17, 448).toInt
      var sum = 0L
      var i = 0
      while (i < bytes.length) { sum += (bytes(i) & 0xff); i += 1 }
      (w, ht, sum.toDouble / bytes.length)
    }

    /** "Extract" a fixed-size feature vector from a payload. */
    def features(bytes: Array[Byte], dim: Int): Array[Float] = {
      val out = new Array[Float](dim)
      if (bytes == null) return out
      var i = 0
      while (i < dim) {
        out(i) = (TextKernels.hash64(s"f$i", bytes.length.toLong * 31 + i).toDouble / Long.MaxValue).toFloat
        i += 1
      }
      out
    }

    /** "Sample" frame offsets from a video payload: every `stepMs` up to duration. */
    def frameOffsets(durationMs: Long, stepMs: Long): Array[Long] =
      if (durationMs <= 0 || stepMs <= 0) Array.empty
      else (0L until durationMs by stepMs).toArray

    /**
     * md5-layout decode variant: width/height/luma from md5 hex-prefix
     * arithmetic on the payload (`('0x'||substr(md5(s),1,4))::INT`-style),
     * so a SQL engine can recompute the "decoded" metadata exactly —
     * the oracle-checkable twin of [[decodeImage]].
     */
    def decodeImageMd5(bytes: Array[Byte]): (Int, Int, Double) = {
      if (bytes == null || bytes.isEmpty) return (0, 0, 0.0)
      val s = new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
      val h = TextKernels.md5Hash60(s)
      // 60-bit value = hex digits 1..15; hex[1..4] = bits 59..44, etc.
      val w = 64 + ((h >>> 44) % 448).toInt
      val ht = 64 + (((h >>> 28) & 0xffffL) % 448).toInt
      val luma = (((h >>> 12) & 0xffffL) % 256).toDouble
      (w, ht, luma)
    }
  }

  /**
   * Decode metadata for a binary payload column — partition-wise batch over
   * rows (the Scala analog of `mapInPandas`: one iterator per partition,
   * vectorizable batch inside). Appends decoded_width/height/mean_luma.
   */
  def decodeImages(df: DataFrame, payloadCol: String): DataFrame = {
    val outSchema = StructType(df.schema.fields ++ Array(
      StructField("decoded_width", IntegerType),
      StructField("decoded_height", IntegerType),
      StructField("mean_luma", DoubleType)))
    val idx = df.schema.fieldIndex(payloadCol)
    implicit val enc = RowEncoder.encoderFor(outSchema)
    df.mapPartitions { rows =>
      rows.map { r =>
        val bytes = if (r.isNullAt(idx)) null else r.getAs[Array[Byte]](idx)
        val (w, h, luma) = FakeCodec.decodeImage(bytes)
        Row.fromSeq(r.toSeq ++ Seq[Any](w, h, luma))
      }
    }
  }

  /** [[FakeCodec.decodeImageMd5]] over a payload column — same partition-wise
    * batch shape as [[decodeImages]], but every decoded value is
    * SQL-recomputable (used by the oracle-verified multimodal queries). */
  def decodeImagesMd5(df: DataFrame, payloadCol: String): DataFrame = {
    val outSchema = StructType(df.schema.fields ++ Array(
      StructField("decoded_width", IntegerType),
      StructField("decoded_height", IntegerType),
      StructField("mean_luma", DoubleType)))
    val idx = df.schema.fieldIndex(payloadCol)
    implicit val enc = RowEncoder.encoderFor(outSchema)
    df.mapPartitions { rows =>
      rows.map { r =>
        val bytes = if (r.isNullAt(idx)) null else r.getAs[Array[Byte]](idx)
        val (w, h, luma) = FakeCodec.decodeImageMd5(bytes)
        Row.fromSeq(r.toSeq ++ Seq[Any](w, h, luma))
      }
    }
  }

  /** Feature-extraction to an embedding column (stubbed codec, real plumbing). */
  def extractFeatures(df: DataFrame, payloadCol: String, dim: Int = 16): DataFrame = {
    val outSchema = StructType(df.schema.fields :+
      StructField("features", ArrayType(FloatType, containsNull = false)))
    val idx = df.schema.fieldIndex(payloadCol)
    implicit val enc = RowEncoder.encoderFor(outSchema)
    df.mapPartitions { rows =>
      rows.map { r =>
        val bytes = if (r.isNullAt(idx)) null else r.getAs[Array[Byte]](idx)
        Row.fromSeq(r.toSeq :+ FakeCodec.features(bytes, dim).toSeq)
      }
    }
  }

  /** Frame sampling: one output row per sampled frame offset (row-multiplying).
    * duration <= 0 yields no frames, matching FakeCodec.frameOffsets. */
  def sampleFrames(df: DataFrame, durationCol: String, stepMs: Long): DataFrame =
    df.withColumn("frame_ms",
        explode(when(col(durationCol) > 0,
            sequence(lit(0L), col(durationCol) - 1, lit(stepMs)))
          .otherwise(array().cast("array<bigint>"))))
}
