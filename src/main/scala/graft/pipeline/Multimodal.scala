package graft.pipeline

import graft.expressions.{asColumn, asExpr}
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Multimodal column plumbing: image/audio/video payloads are opaque
 * `binary` columns with typed metadata. Image decode/encode is REAL,
 * via the JDK's built-in `javax.imageio` codecs (PNG/JPEG/GIF/BMP/TIFF
 * readers ship with the JRE — no external library needed); audio has a
 * real PCM16 WAV parser ([[WavStats]] — RIFF chunk walk + exact sample
 * stats) over deterministic [[WavSynth]] fixtures (no audio corpus in
 * the sandbox); video remains byte-level ops ([[FrameSample]],
 * [[ByteHistogram]]).
 */
object Multimodal {
  /** Stand-in payload: utf-8 bytes of a text column (or any binary source). */
  def to_blob(content: Column): Column = encode(content, "UTF-8")

  /** Real image decode ([[DecodeImage]]): (width, height, channels,
    * byte_len) from any JDK-readable image payload, null otherwise. */
  def decode_image(blob: Column): Column = asColumn(DecodeImage(asExpr(blob)))

  /** Encode packed-RGB pixels (row-major array<int> of 0xRRGGBB) into a
    * PNG payload — the write half of the image round-trip. */
  def encode_png(pixels: Column, width: Column, height: Column): Column =
    asColumn(EncodePng(asExpr(pixels), asExpr(width), asExpr(height)))

  /** Packed 0xRRGGBB value of pixel (x, y); decodes per call, so project
    * it only a few times per row (use rf-style explode for bulk access). */
  def image_pixel(blob: Column, x: Column, y: Column): Column =
    asColumn(ImagePixel(asExpr(blob), asExpr(x), asExpr(y)))

  /** Nearest-neighbor resize to (w, h), re-encoded as PNG
    * ([[ImageResize]]) — the thumbnail/normalize step of an image
    * pipeline, with an integer floor resample grid. */
  def image_resize(blob: Column, w: Column, h: Column): Column =
    asColumn(ImageResize(asExpr(blob), asExpr(w), asExpr(h)))

  /** Whole-image (width, height, opaque-pixel count, red-channel sum)
    * summary ([[PngStats]]) — the read-back half of a PNG-writer oracle. */
  def png_stats(blob: Column): Column = asColumn(PngStats(asExpr(blob)))

  /** 64-bit average hash of an image blob — the image near-dup
    * fingerprint ([[ImageAHash]]). */
  def image_ahash(blob: Column): Column = asColumn(ImageAHash(asExpr(blob)))

  /** Deterministic fake decode: width/height/channels derived from payload
    * hash — retained for non-image payload plumbing tests; prefer
    * [[decode_image]] for anything that is actually an image. */
  def decode_image_stub(blob: Column): Column = asColumn(DecodeImageStub(asExpr(blob)))

  /** Normalized 16-bin byte-value histogram — a real, cheap feature vector. */
  def byte_histogram(blob: Column): Column = asColumn(ByteHistogram(asExpr(blob), 16))

  /** Fixed-size frame sampling: every `stride`-th window of `frameSize`
    * bytes (the video-frame-sample shape, on bytes). */
  def frame_sample(blob: Column, frameSize: Int, stride: Int): Column =
    asColumn(FrameSample(asExpr(blob), frameSize, stride))

  /** Consecutive-frame byte-histogram L1 deltas ([[FrameDeltas]]) — the
    * scene-change primitive over framed binary streams; all-integer, one
    * pass, no intermediate frame array. */
  def frame_deltas(blob: Column, frameSize: Int, stride: Int,
      bins: Int = 16): Column =
    asColumn(FrameDeltas(asExpr(blob), frameSize, stride, bins))

  /** Deterministic PCM16 WAV fixture ([[WavSynth]]): canonical RIFF
    * header + closed-form samples, so the parser is oracle-checkable. */
  def wav_synth(seed: Column, n: Column): Column =
    asColumn(WavSynth(asExpr(seed), asExpr(n)))

  /** Real PCM16 WAV parse ([[WavStats]]): RIFF chunk walk + exact
    * integer sample stats; null for non-PCM16 payloads. */
  def wav_stats(blob: Column): Column = asColumn(WavStats(asExpr(blob)))

  /** Per-window PCM16 energy array ([[WavEnergyWindows]]) — the
    * silence-split / voice-activity primitive. */
  def wav_energy(blob: Column, window: Column): Column =
    asColumn(WavEnergyWindows(asExpr(blob), asExpr(window)))
}

/** Shared `javax.imageio` entry points. The JDK ships PNG, JPEG, GIF,
  * BMP, WBMP and (since 9) TIFF reader plugins, so this is a real codec
  * with zero added dependencies. The stream cache is disabled once per
  * JVM: payloads are already in memory, a temp-file cache per decode
  * would add executor-local disk I/O for nothing. */
object ImageCodec {
  javax.imageio.ImageIO.setUseCache(false)
  /** Decoded image, or null when no installed reader claims the bytes.
    * Common PNGs (8-bit gray/RGB/RGBA, non-interlaced) take the native
    * fast path below — `ImageIO.read` instantiates a reader + stream +
    * color-converted raster per call, which dominates decode time for
    * the small images a training pipeline normalizes by the billions;
    * everything else (JPEG, palette/16-bit/interlaced PNG, ...) falls
    * back to the JDK plugin. */
  def read(bytes: Array[Byte]): java.awt.image.BufferedImage = {
    val fast = PngCodec.decode(bytes)
    if (fast != null) fast
    else
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      catch { case _: java.io.IOException => null }
  }

  // One-entry per-thread memo: a row typically evaluates several image
  // expressions over the SAME payload (dims + a few pixel probes), each
  // receiving its own byte-array copy — an Arrays.equals is orders of
  // magnitude cheaper than re-running the PNG/JPEG decoder per probe.
  private val last =
    new ThreadLocal[(Array[Byte], java.awt.image.BufferedImage)]
  def readCached(bytes: Array[Byte]): java.awt.image.BufferedImage = {
    val c = last.get()
    if (c != null && java.util.Arrays.equals(c._1, bytes)) c._2
    else {
      val img = read(bytes)
      last.set((bytes, img))
      img
    }
  }

  /** Direct PNG encode of packed-RGB pixels (8-bit RGB, filter 0 rows,
    * one zlib stream) — the public PNG spec via java.util.zip, ~10×
    * faster than the ImageIO writer plumbing for small images. Output is
    * a standard PNG any decoder (including [[read]]) round-trips. */
  def encodePng(pix: Array[Int], w: Int, h: Int): Array[Byte] = {
    val raw = new Array[Byte](h * (1 + 3 * w))
    var p = 0
    var i = 0
    for (y <- 0 until h) {
      raw(p) = 0 // filter type None
      p += 1
      var x = 0
      while (x < w) {
        val v = pix(i)
        raw(p) = ((v >>> 16) & 0xff).toByte
        raw(p + 1) = ((v >>> 8) & 0xff).toByte
        raw(p + 2) = (v & 0xff).toByte
        p += 3; i += 1; x += 1
      }
    }
    val deflater = new java.util.zip.Deflater(java.util.zip.Deflater.DEFAULT_COMPRESSION)
    deflater.setInput(raw)
    deflater.finish()
    val comp = new java.io.ByteArrayOutputStream(raw.length / 2 + 64)
    val tmp = new Array[Byte](8192)
    while (!deflater.finished()) comp.write(tmp, 0, deflater.deflate(tmp))
    deflater.end()

    val out = new java.io.ByteArrayOutputStream(comp.size() + 64)
    out.write(Array[Byte](0x89.toByte, 'P', 'N', 'G', '\r', '\n', 0x1a, '\n'))
    def chunk(typ: String, data: Array[Byte]): Unit = {
      val len = data.length
      out.write(Array[Byte]((len >>> 24).toByte, (len >>> 16).toByte,
        (len >>> 8).toByte, len.toByte))
      val tb = typ.getBytes("US-ASCII")
      val crc = new java.util.zip.CRC32()
      crc.update(tb); crc.update(data)
      out.write(tb); out.write(data)
      val c = crc.getValue
      out.write(Array[Byte]((c >>> 24).toByte, (c >>> 16).toByte,
        (c >>> 8).toByte, c.toByte))
    }
    val ihdr = java.nio.ByteBuffer.allocate(13)
      .putInt(w).putInt(h).put(8.toByte).put(2.toByte) // 8-bit, color type RGB
      .put(0.toByte).put(0.toByte).put(0.toByte)       // deflate, filter 0, no interlace
    chunk("IHDR", ihdr.array())
    chunk("IDAT", comp.toByteArray)
    chunk("IEND", Array.emptyByteArray)
    out.toByteArray
  }
}

/**
 * Native decoder for the common PNG shapes (8-bit depth, gray / RGB /
 * RGBA color, non-interlaced) straight from the public PNG spec:
 * IHDR parse, IDAT concatenation, one zlib inflate, per-row filter
 * reconstruction (None/Sub/Up/Average/Paeth). Returns null for
 * anything it doesn't handle — palette, 16-bit, interlaced — so the
 * caller can fall back to `ImageIO`. All-integer reconstruction ⇒
 * bit-identical to the reference decoder (spec-tested against
 * `ImageIO` on filtered images).
 */
object PngCodec {
  import java.awt.image.BufferedImage

  /** Upper bound on the filtered-scanline buffer (256 MiB). Anything larger
    * falls back to ImageIO rather than trusting header-claimed dimensions. */
  private val MaxDecodedBytes = 1L << 28

  def decode(b: Array[Byte]): BufferedImage = {
    if (b.length < 45 || (b(0) & 0xff) != 0x89 || b(1) != 'P' || b(2) != 'N' ||
      b(3) != 'G') return null
    def i32(o: Int): Int = ((b(o) & 0xff) << 24) | ((b(o + 1) & 0xff) << 16) |
      ((b(o + 2) & 0xff) << 8) | (b(o + 3) & 0xff)
    // IHDR is required first: 8 sig + 4 len + "IHDR"
    if (!(b(12) == 'I' && b(13) == 'H' && b(14) == 'D' && b(15) == 'R')) return null
    val w = i32(16)
    val h = i32(20)
    val bitDepth = b(24) & 0xff
    val colorType = b(25) & 0xff
    val interlace = b(28) & 0xff
    val channels = colorType match {
      case 0 => 1 // gray
      case 2 => 3 // RGB
      case 6 => 4 // RGBA
      case _ => return null // palette (3) / gray+alpha (4): fall back
    }
    if (bitDepth != 8 || interlace != 0 || w <= 0 || h <= 0) return null
    val bpp = channels // bytes per pixel at 8-bit depth
    // Guard in Long arithmetic on the actual allocation (filtered scanlines:
    // stride*h) so header-claimed dimensions can neither overflow Int nor
    // force a multi-GB allocation from a ~50-byte input.
    val strideL = 1L + w.toLong * bpp
    if (strideL * h > MaxDecodedBytes) return null
    // concatenate IDAT payloads
    val idat = new java.io.ByteArrayOutputStream(b.length)
    var off = 33 // 8 sig + 25 IHDR chunk
    var ok = true
    while (ok && off + 8 <= b.length) {
      val len = i32(off)
      if (len < 0 || off + 12 + len > b.length) ok = false
      else {
        val typ = new String(b, off + 4, 4, "US-ASCII")
        if (typ == "IDAT") idat.write(b, off + 8, len)
        // tRNS on gray/RGB adds transparency ImageIO honors but this fast
        // path would drop — defer to ImageIO for identical output.
        else if (typ == "tRNS" && colorType != 6) return null
        if (typ == "IEND") ok = false
        off += 12 + len
      }
    }
    val stride = strideL.toInt
    val raw = new Array[Byte](stride * h)
    val inf = new java.util.zip.Inflater()
    inf.setInput(idat.toByteArray)
    var got = 0
    try {
      while (got < raw.length && !inf.finished()) {
        val n = inf.inflate(raw, got, raw.length - got)
        if (n == 0 && inf.needsInput()) return null // truncated stream
        got += n
      }
    } catch { case _: java.util.zip.DataFormatException => return null }
    finally inf.end()
    if (got < raw.length) return null
    // per-row filter reconstruction, in place on the filtered bytes
    var y = 0
    while (y < h) {
      val ro = y * stride
      val filter = raw(ro) & 0xff
      val po = ro - stride
      var i = 1
      filter match {
        case 0 => // None
        case 1 => // Sub
          i = 1 + bpp
          while (i < stride) { raw(ro + i) = (raw(ro + i) + raw(ro + i - bpp)).toByte; i += 1 }
        case 2 => // Up
          if (y > 0) while (i < stride) { raw(ro + i) = (raw(ro + i) + raw(po + i)).toByte; i += 1 }
        case 3 => // Average
          while (i < stride) {
            val left = if (i > bpp) raw(ro + i - bpp) & 0xff else 0
            val up = if (y > 0) raw(po + i) & 0xff else 0
            raw(ro + i) = (raw(ro + i) + ((left + up) >> 1)).toByte
            i += 1
          }
        case 4 => // Paeth
          while (i < stride) {
            val a = if (i > bpp) raw(ro + i - bpp) & 0xff else 0
            val c2 = if (y > 0) raw(po + i) & 0xff else 0
            val c3 = if (y > 0 && i > bpp) raw(po + i - bpp) & 0xff else 0
            val p = a + c2 - c3
            val pa = math.abs(p - a); val pb = math.abs(p - c2); val pc = math.abs(p - c3)
            val pred = if (pa <= pb && pa <= pc) a else if (pb <= pc) c2 else c3
            raw(ro + i) = (raw(ro + i) + pred).toByte
            i += 1
          }
        case _ => return null
      }
      y += 1
    }
    // pack into a BufferedImage matching ImageIO's reported channel counts
    colorType match {
      case 0 =>
        val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
        val data = img.getRaster.getDataBuffer
          .asInstanceOf[java.awt.image.DataBufferByte].getData
        var yy = 0
        while (yy < h) {
          System.arraycopy(raw, yy * stride + 1, data, yy * w, w)
          yy += 1
        }
        img
      case 2 =>
        val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
        val data = img.getRaster.getDataBuffer
          .asInstanceOf[java.awt.image.DataBufferInt].getData
        var yy = 0
        while (yy < h) {
          var ro = yy * stride + 1
          var p = yy * w
          val end = p + w
          while (p < end) {
            data(p) = ((raw(ro) & 0xff) << 16) | ((raw(ro + 1) & 0xff) << 8) | (raw(ro + 2) & 0xff)
            ro += 3; p += 1
          }
          yy += 1
        }
        img
      case 6 =>
        val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_ARGB)
        val data = img.getRaster.getDataBuffer
          .asInstanceOf[java.awt.image.DataBufferInt].getData
        var yy = 0
        while (yy < h) {
          var ro = yy * stride + 1
          var p = yy * w
          val end = p + w
          while (p < end) {
            data(p) = ((raw(ro + 3) & 0xff) << 24) | ((raw(ro) & 0xff) << 16) |
              ((raw(ro + 1) & 0xff) << 8) | (raw(ro + 2) & 0xff)
            ro += 4; p += 1
          }
          yy += 1
        }
        img
    }
  }
}

/** Real image decode: header + raster parse via `javax.imageio`.
  * Null (not an error) for payloads that aren't a readable image, so it
  * can run over mixed binary columns. `channels` is the color model's
  * component count (RGB=3, RGBA=4, gray=1). */
case class DecodeImage(child: Expression) extends UnaryExpression with CodegenFallback {
  override def prettyName: String = "mm_decode_image"
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a binary payload, got ${child.dataType.simpleString}")
  override def nullable: Boolean = true
  override def dataType: DataType = StructType(Seq(
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("byte_len", IntegerType, nullable = false)))
  override def nullSafeEval(input: Any): Any = {
    val b = input.asInstanceOf[Array[Byte]]
    val img = ImageCodec.readCached(b)
    if (img == null) null
    else InternalRow(img.getWidth, img.getHeight,
      img.getColorModel.getNumComponents, b.length)
  }
  override protected def withNewChildInternal(c: Expression) = copy(c)
}

/** PNG-encode a row-major packed-RGB pixel array (0xRRGGBB ints).
  * Lossless, so `mm_image_pixel(mm_encode_png(p, w, h), x, y)` returns
  * exactly `p[y*w + x] & 0xFFFFFF` — the property the oracle checks. */
case class EncodePng(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with CodegenFallback {
  override def prettyName: String = "mm_encode_png"
  override def checkInputDataTypes(): TypeCheckResult =
    if (first.dataType == ArrayType(IntegerType, containsNull = false) ||
        first.dataType == ArrayType(IntegerType, containsNull = true)) {
      if (second.dataType == IntegerType && third.dataType == IntegerType)
        TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects integer width/height, got " +
          s"${second.dataType.simpleString} / ${third.dataType.simpleString}")
    } else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<int> packed-RGB pixels, got ${first.dataType.simpleString}")
  override def dataType: DataType = BinaryType
  override def nullSafeEval(p: Any, w: Any, h: Any): Any = {
    val pix = p.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].toIntArray()
    val wi = w.asInstanceOf[Int]
    val hi = h.asInstanceOf[Int]
    require(wi > 0 && hi > 0 && pix.length == wi * hi,
      s"mm_encode_png: ${pix.length} pixels for ${wi}x$hi image")
    ImageCodec.encodePng(pix, wi, hi)
  }
  override protected def withNewChildrenInternal(a: Expression, b: Expression, c: Expression) =
    copy(a, b, c)
}

/** Packed 0xRRGGBB of pixel (x, y); null when the payload doesn't decode
  * or the coordinate is out of bounds. */
case class ImagePixel(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with CodegenFallback {
  override def prettyName: String = "mm_image_pixel"
  override def checkInputDataTypes(): TypeCheckResult =
    if (first.dataType == BinaryType && second.dataType == IntegerType &&
        third.dataType == IntegerType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (binary, int, int), got " +
        Seq(first, second, third).map(_.dataType.simpleString).mkString(", "))
  override def nullable: Boolean = true
  override def dataType: DataType = IntegerType
  override def nullSafeEval(blob: Any, x: Any, y: Any): Any = {
    val img = ImageCodec.readCached(blob.asInstanceOf[Array[Byte]])
    val xi = x.asInstanceOf[Int]
    val yi = y.asInstanceOf[Int]
    if (img == null || xi < 0 || yi < 0 || xi >= img.getWidth || yi >= img.getHeight) null
    else img.getRGB(xi, yi) & 0xFFFFFF
  }
  override protected def withNewChildrenInternal(a: Expression, b: Expression, c: Expression) =
    copy(a, b, c)
}

/** Whole-image summary of a decodable payload: dimensions plus the
  * opaque (alpha = 255) pixel count and the red-channel sum over opaque
  * pixels — one scalar row per image instead of width×height
  * `mm_image_pixel` probes, which is what makes PNG writers (slippy
  * tiles, rf_render_png) oracle-able at scale. Null when the payload
  * doesn't decode. */
case class PngStats(child: Expression) extends UnaryExpression with CodegenFallback {
  override def prettyName: String = "mm_png_stats"
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a binary payload, got ${child.dataType.simpleString}")
  override def nullable: Boolean = true
  override def dataType: DataType = StructType(Seq(
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("opaque", LongType, nullable = false),
    StructField("red_sum", LongType, nullable = false)))
  override def nullSafeEval(input: Any): Any = {
    val img = ImageCodec.readCached(input.asInstanceOf[Array[Byte]])
    if (img == null) null
    else {
      var opaque = 0L
      var redSum = 0L
      var y = 0
      while (y < img.getHeight) {
        var x = 0
        while (x < img.getWidth) {
          val argb = img.getRGB(x, y)
          if ((argb >>> 24) == 0xff) {
            opaque += 1
            redSum += (argb >>> 16) & 0xff
          }
          x += 1
        }
        y += 1
      }
      InternalRow(img.getWidth, img.getHeight, opaque, redSum)
    }
  }
  override protected def withNewChildInternal(c: Expression) = copy(c)
}

/** Nearest-neighbor resize of a decodable image payload, re-encoded as
  * PNG: out(x, y) = src(x*sw÷w, y*sh÷h) with integer floor mapping, so
  * the resample grid is exactly reproducible by external engines. Null
  * when the payload doesn't decode; requires positive target dims. */
case class ImageResize(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with CodegenFallback {
  override def prettyName: String = "mm_image_resize"
  override def checkInputDataTypes(): TypeCheckResult =
    if (first.dataType == BinaryType && second.dataType == IntegerType &&
        third.dataType == IntegerType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (binary, int, int), got " +
        Seq(first, second, third).map(_.dataType.simpleString).mkString(", "))
  override def nullable: Boolean = true
  override def dataType: DataType = BinaryType
  override def nullSafeEval(blob: Any, w: Any, h: Any): Any = {
    val wi = w.asInstanceOf[Int]
    val hi = h.asInstanceOf[Int]
    require(wi > 0 && hi > 0, s"mm_image_resize: invalid target ${wi}x$hi")
    val img = ImageCodec.readCached(blob.asInstanceOf[Array[Byte]])
    if (img == null) null
    else {
      val sw = img.getWidth
      val sh = img.getHeight
      val out = new Array[Int](wi * hi)
      var p = 0
      var y = 0
      while (y < hi) {
        val sy = y * sh / hi
        var x = 0
        while (x < wi) {
          out(p) = img.getRGB(x * sw / wi, sy) & 0xFFFFFF
          p += 1; x += 1
        }
        y += 1
      }
      ImageCodec.encodePng(out, wi, hi)
    }
  }
  override protected def withNewChildrenInternal(a: Expression, b: Expression, c: Expression) =
    copy(a, b, c)
}

/**
 * 64-bit average hash (aHash) of an image blob — the classic image
 * near-duplicate fingerprint: decode, floor-resample to 8×8, gray each
 * cell as `(r + g + b) div 3`, threshold against the integer mean
 * (`sum div 64`), bit `y*8 + x` set iff `gray > mean`. Re-encodes,
 * crops and small noise keep the hash within a few bits, so a Hamming
 * band join on the hashes finds visual near-dups the way simhash finds
 * textual ones — same blocking recipe (split into 16-bit chunks,
 * equi-join per chunk) at corpus scale.
 *
 * ALL-integer math (floor resample, integer gray, integer mean), so
 * the hash is bit-deterministic and SQL-replayable — the q_image_ahash
 * oracle recomputes it from the closed-form synthetic pixels.
 */
case class ImageAHash(child: Expression) extends UnaryExpression with CodegenFallback {
  override def prettyName: String = "mm_image_ahash"
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a binary payload, got ${child.dataType.simpleString}")
  override def nullable: Boolean = true
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any = {
    val img = ImageCodec.readCached(input.asInstanceOf[Array[Byte]])
    if (img == null) null
    else {
      val sw = img.getWidth
      val sh = img.getHeight
      val gray = new Array[Long](64)
      var sum = 0L
      var k = 0
      var y = 0
      while (y < 8) {
        val sy = y * sh / 8
        var x = 0
        while (x < 8) {
          val rgb = img.getRGB(x * sw / 8, sy)
          val g = (((rgb >> 16) & 0xFF) + ((rgb >> 8) & 0xFF) + (rgb & 0xFF)) / 3
          gray(k) = g
          sum += g
          k += 1; x += 1
        }
        y += 1
      }
      val mean = sum / 64
      var hash = 0L
      k = 0
      while (k < 64) {
        if (gray(k) > mean) hash |= (1L << k)
        k += 1
      }
      hash
    }
  }
  override protected def withNewChildInternal(c: Expression) = copy(c)
}

/** STUB: deterministic pseudo-decode of an "image" payload — kept for
  * plumbing tests over non-image payloads (see [[DecodeImage]] for the
  * real codec). */
case class DecodeImageStub(child: Expression) extends UnaryExpression with CodegenFallback {
  override def prettyName: String = "mm_decode_image_stub"
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

/** Deterministic PCM16 WAV payload: a canonical 44-byte RIFF header
  * (mono, 16 kHz) + `n` little-endian int16 samples
  * `((seed·31 + i·7) mod 65536) − 32768` — the audio test fixture (the
  * sandbox ships no audio corpus; the closed-form samples let a SQL
  * oracle validate the PARSER end-to-end without byte plumbing). */
case class WavSynth(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def prettyName: String = "mm_wav_synth"
  override def dataType: DataType = BinaryType
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType | IntegerType, IntegerType | LongType) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.DataTypeMismatch("UNEXPECTED_INPUT_TYPE",
        Map("msg" -> s"mm_wav_synth expects (integral seed, integral n), got $other"))
    }
  override def nullSafeEval(seedAny: Any, nAny: Any): Any = {
    val seed = seedAny.asInstanceOf[Number].longValue()
    val n = nAny.asInstanceOf[Number].intValue()
    val dataLen = 2 * n
    val b = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    b.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1) // PCM
      .putShort(1) // mono
      .putInt(16000) // sample rate
      .putInt(32000) // byte rate
      .putShort(2) // block align
      .putShort(16) // bits per sample
    b.put("data".getBytes("US-ASCII")).putInt(dataLen)
    var i = 0
    while (i < n) {
      b.putShort(((((seed * 31 + i.toLong * 7) % 65536) - 32768)).toShort)
      i += 1
    }
    b.array()
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** REAL PCM16 WAV parse: walks the RIFF chunk list (tolerating extra
  * chunks like LIST/INFO), reads the `fmt ` block, and folds the
  * `data` samples into exact-integer stats —
  * `(sample_rate, channels, n_samples, min_s, max_s, sum_s)`.
  * Null for anything that is not a PCM16 RIFF/WAVE payload. */
/**
 * Per-window energy of a PCM16 WAV payload: sum of squared samples per
 * `window`-sample block (last partial block included) — the
 * voice-activity / silence-split primitive audio curation pipelines run
 * before transcription: quiet windows (low energy) mark trim points,
 * the peak window locates the loudest segment. ALL-integer (s², long
 * sums), so per-window energies are bit-deterministic and the
 * q_audio_windows oracle replays them from the closed-form synth
 * samples. NULL on malformed / non-PCM16 payloads, like [[WavStats]].
 */
case class WavEnergyWindows(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def prettyName: String = "mm_wav_energy"
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, IntegerType | LongType) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.DataTypeMismatch("UNEXPECTED_INPUT_TYPE",
        Map("msg" -> s"mm_wav_energy expects (binary, integral window), got $other"))
    }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any, winAny: Any): Any = {
    val win = winAny.asInstanceOf[Number].intValue()
    require(win > 0, s"mm_wav_energy: window must be positive, got $win")
    val raw = input.asInstanceOf[Array[Byte]]
    if (raw.length < 12) return null
    val b = java.nio.ByteBuffer.wrap(raw).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def tag(off: Int): String = new String(raw, off, 4, "US-ASCII")
    if (tag(0) != "RIFF" || tag(8) != "WAVE") return null
    var off = 12
    var bits = -1; var fmtCode = -1; var channels = -1
    var dataOff = -1; var dataLen = -1
    while (off + 8 <= raw.length) {
      val t = tag(off)
      val len = b.getInt(off + 4)
      if (len < 0 || off + 8 + len > raw.length) return null
      if (t == "fmt " && len >= 16) {
        fmtCode = b.getShort(off + 8) & 0xffff
        channels = b.getShort(off + 10) & 0xffff
        bits = b.getShort(off + 22) & 0xffff
      } else if (t == "data") {
        dataOff = off + 8; dataLen = len
      }
      off += 8 + len + (len & 1)
    }
    if (fmtCode != 1 || bits != 16 || channels <= 0 ||
      dataOff < 0 || dataLen % 2 != 0) return null
    val n = dataLen / 2
    val nWin = (n + win - 1) / win
    val out = new Array[Any](nWin)
    var w = 0
    while (w < nWin) {
      var e = 0L
      var i = w * win
      val end = math.min(i + win, n)
      while (i < end) {
        val s = b.getShort(dataOff + 2 * i).toLong
        e += s * s
        i += 1
      }
      out(w) = e
      w += 1
    }
    new GenericArrayData(out)
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(l, r)
}

case class WavStats(child: Expression) extends UnaryExpression with CodegenFallback {
  override def prettyName: String = "mm_wav_stats"
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.DataTypeMismatch("UNEXPECTED_INPUT_TYPE",
      Map("msg" -> s"mm_wav_stats expects binary, got $other"))
  }
  override def dataType: DataType = StructType(Seq(
    StructField("sample_rate", IntegerType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("n_samples", LongType, nullable = false),
    StructField("min_s", IntegerType, nullable = false),
    StructField("max_s", IntegerType, nullable = false),
    StructField("sum_s", LongType, nullable = false)))
  override def nullSafeEval(input: Any): Any = {
    val raw = input.asInstanceOf[Array[Byte]]
    if (raw.length < 12) return null
    val b = java.nio.ByteBuffer.wrap(raw).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def tag(off: Int): String =
      new String(raw, off, 4, "US-ASCII")
    if (tag(0) != "RIFF" || tag(8) != "WAVE") return null
    var off = 12
    var sampleRate = -1; var channels = -1; var bits = -1; var fmtCode = -1
    var dataOff = -1; var dataLen = -1
    while (off + 8 <= raw.length) {
      val t = tag(off)
      val len = b.getInt(off + 4)
      if (len < 0 || off + 8 + len > raw.length) return null
      if (t == "fmt " && len >= 16) {
        fmtCode = b.getShort(off + 8) & 0xffff
        channels = b.getShort(off + 10) & 0xffff
        sampleRate = b.getInt(off + 12)
        bits = b.getShort(off + 22) & 0xffff
      } else if (t == "data") {
        dataOff = off + 8; dataLen = len
      }
      off += 8 + len + (len & 1) // chunks are word-aligned
    }
    if (fmtCode != 1 || bits != 16 || channels <= 0 || sampleRate <= 0 ||
      dataOff < 0 || dataLen % 2 != 0) return null
    val n = dataLen / 2
    var mn = Int.MaxValue; var mx = Int.MinValue; var sum = 0L
    var i = 0
    while (i < n) {
      val s = b.getShort(dataOff + 2 * i).toInt
      if (s < mn) mn = s
      if (s > mx) mx = s
      sum += s
      i += 1
    }
    if (n == 0) { mn = 0; mx = 0 }
    InternalRow(sampleRate, channels, n.toLong, mn, mx, sum)
  }
  override protected def withNewChildInternal(c: Expression) = copy(c)
}

/**
 * Consecutive-frame byte-histogram L1 distances in ONE pass over the
 * blob — the scene-change / content-shift primitive for sampled video
 * (or any framed binary stream): frame f = bytes
 * [f·stride, f·stride + frameSize); delta[f] = Σ_b |hist_f[b] −
 * hist_{f+1}[b]| over `bins` equal-width byte buckets. A cut is a
 * position whose delta clears the caller's threshold. All-integer
 * counts (never the normalized fractions of [[ByteHistogram]]), so any
 * engine replays the deltas exactly; computing deltas inline avoids
 * materializing the array<binary> frames [[FrameSample]] would carry
 * through the plan.
 */
case class FrameDeltas(child: Expression, frameSize: Int, stride: Int,
    bins: Int) extends UnaryExpression with CodegenFallback {
  override def prettyName: String = "mm_frame_deltas"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != BinaryType) TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a binary payload, got ${child.dataType.simpleString}")
    else if (frameSize < 1 || stride < 1 || bins < 1 || 256 % bins != 0)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs frame_size/stride >= 1 and bins dividing 256")
    else TypeCheckResult.TypeCheckSuccess
  override def nullSafeEval(input: Any): Any = {
    val b = input.asInstanceOf[Array[Byte]]
    val width = 256 / bins
    val nFrames = if (b.length < frameSize) 0 else (b.length - frameSize) / stride + 1
    if (nFrames < 2) return new GenericArrayData(Array.empty[Any])
    def hist(off: Int): Array[Int] = {
      val h = new Array[Int](bins)
      var i = 0
      while (i < frameSize) { h((b(off + i) & 0xff) / width) += 1; i += 1 }
      h
    }
    val out = new Array[Any](nFrames - 1)
    var prev = hist(0)
    var f = 1
    while (f < nFrames) {
      val cur = hist(f * stride)
      var d = 0L
      var k = 0
      while (k < bins) { d += math.abs(cur(k) - prev(k)); k += 1 }
      out(f - 1) = d
      prev = cur
      f += 1
    }
    new GenericArrayData(out)
  }
  override protected def withNewChildInternal(c: Expression) = copy(c)
}
