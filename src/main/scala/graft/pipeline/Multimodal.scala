package graft.pipeline

import graft.expressions.{asColumn, asExpr}
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Multimodal column plumbing: image/audio/video payloads are opaque
 * `binary` columns with typed metadata. The Spark-side machinery
 * (schemas, expressions, batching, partitioning) is real; the actual
 * media decode is STUBBED deterministically because no image/audio
 * codecs exist in this environment — swap [[DecodeImageStub]]'s body
 * for a real decoder to productionize.
 */
object Multimodal {
  /** Stand-in payload: utf-8 bytes of a text column (or any binary source). */
  def to_blob(content: Column): Column = encode(content, "UTF-8")

  /** Deterministic fake decode: width/height/channels derived from payload
    * hash — STUB for a real image decoder. */
  def decode_image_stub(blob: Column): Column = asColumn(DecodeImageStub(asExpr(blob)))

  /** Normalized 16-bin byte-value histogram — a real, cheap feature vector. */
  def byte_histogram(blob: Column): Column = asColumn(ByteHistogram(asExpr(blob), 16))

  /** Fixed-size frame sampling: every `stride`-th window of `frameSize`
    * bytes (the video-frame-sample shape, on bytes). */
  def frame_sample(blob: Column, frameSize: Int, stride: Int): Column =
    asColumn(FrameSample(asExpr(blob), frameSize, stride))
}

/** STUB: deterministic pseudo-decode of an "image" payload. */
case class DecodeImageStub(child: Expression) extends UnaryExpression with CodegenFallback {
  override def prettyName: String = "mm_decode_image"
  override def dataType: DataType = StructType(Seq(
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("byte_len", IntegerType, nullable = false)))
  override def nullSafeEval(input: Any): Any = {
    val b = input.asInstanceOf[Array[Byte]]
    val h = Hashing.hashBytes(b, 99L)
    // STUB: a real decoder parses the container header here
    InternalRow(64 + (h & 0xff).toInt, 64 + ((h >>> 8) & 0xff).toInt, 3, b.length)
  }
  override protected def withNewChildInternal(c: Expression) = copy(c)
}

/** Normalized byte-value histogram over `bins` equal-width buckets. */
case class ByteHistogram(child: Expression, bins: Int) extends UnaryExpression with CodegenFallback {
  override def prettyName: String = "mm_byte_histogram"
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def nullSafeEval(input: Any): Any = {
    val b = input.asInstanceOf[Array[Byte]]
    val counts = new Array[Int](bins)
    val width = 256 / bins
    var i = 0
    while (i < b.length) { counts((b(i) & 0xff) / width) += 1; i += 1 }
    val out = new Array[Any](bins)
    val n = math.max(b.length, 1).toFloat
    i = 0
    while (i < bins) { out(i) = counts(i) / n; i += 1 }
    new GenericArrayData(out)
  }
  override protected def withNewChildInternal(c: Expression) = copy(c)
}

/** Every `stride`-th window of `frameSize` bytes as array<binary>. */
case class FrameSample(child: Expression, frameSize: Int, stride: Int)
    extends UnaryExpression with CodegenFallback {
  override def prettyName: String = "mm_frame_sample"
  override def dataType: DataType = ArrayType(BinaryType, containsNull = false)
  override def nullSafeEval(input: Any): Any = {
    val b = input.asInstanceOf[Array[Byte]]
    val frames = scala.collection.mutable.ArrayBuffer.empty[Any]
    var off = 0
    while (off + frameSize <= b.length) {
      frames += java.util.Arrays.copyOfRange(b, off, off + frameSize)
      off += stride
    }
    new GenericArrayData(frames.toArray)
  }
  override protected def withNewChildInternal(c: Expression) = copy(c)
}
