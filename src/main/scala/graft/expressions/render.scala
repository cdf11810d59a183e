package graft.expressions

import graft.core._
import graft.udt.TileUDT
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Rendering/export expressions (reference:
 * /root/reference/core/src/main/scala/org/locationtech/rasterframes/expressions/transformers/DebugRender.scala,
 * RenderPNG.scala, RGBComposite.scala). PNG encoding uses the JDK's
 * javax.imageio writer (no native deps).
 */
case class RenderAscii(child: Expression) extends UnaryExpression with CodegenFallback {
  override def prettyName: String = "rf_render_ascii"
  override def dataType: DataType = StringType
  @transient private lazy val ext = tileExtractor(child.dataType)
  private val palette = " .:-=+*#%@"
  override def nullSafeEval(input: Any): Any = {
    val t = ext(input)
    val (_, _, mn, mx, _, _) = t.statsAccum
    val range = if (mx > mn) mx - mn else 1.0
    val sb = new java.lang.StringBuilder()
    var r = 0
    while (r < t.rows) {
      var c = 0
      while (c < t.cols) {
        val v = t.getDouble(r * t.cols + c)
        sb.append(
          if (NoData.isNoData(v)) '∘'
          else palette(((v - mn) / range * (palette.length - 1)).toInt))
        c += 1
      }
      sb.append('\n')
      r += 1
    }
    UTF8String.fromString(sb.toString)
  }
  override protected def withNewChildInternal(c: Expression) = copy(c)
}

case class RenderMatrix(child: Expression) extends UnaryExpression with CodegenFallback {
  override def prettyName: String = "rf_render_matrix"
  override def dataType: DataType = StringType
  @transient private lazy val ext = tileExtractor(child.dataType)
  override def nullSafeEval(input: Any): Any = {
    val t = ext(input)
    val sb = new java.lang.StringBuilder()
    var r = 0
    while (r < t.rows) {
      var c = 0
      while (c < t.cols) {
        if (c > 0) sb.append(' ')
        val v = t.getDouble(r * t.cols + c)
        sb.append(if (NoData.isNoData(v)) "--" else f"$v%.2f")
        c += 1
      }
      sb.append('\n')
      r += 1
    }
    UTF8String.fromString(sb.toString)
  }
  override protected def withNewChildInternal(c: Expression) = copy(c)
}

/** Single-band grayscale PNG (min-max stretched) as binary. */
case class RenderPNG(child: Expression) extends UnaryExpression with CodegenFallback {
  override def prettyName: String = "rf_render_png"
  override def dataType: DataType = BinaryType
  @transient private lazy val ext = tileExtractor(child.dataType)
  override def nullSafeEval(input: Any): Any = {
    val t = ext(input)
    val (_, _, mn, mx, _, _) = t.statsAccum
    val range = if (mx > mn) mx - mn else 1.0
    val img = new java.awt.image.BufferedImage(
      t.cols, t.rows, java.awt.image.BufferedImage.TYPE_INT_ARGB)
    var r = 0
    while (r < t.rows) {
      var c = 0
      while (c < t.cols) {
        val v = t.getDouble(r * t.cols + c)
        val argb =
          if (NoData.isNoData(v)) 0
          else {
            val g = ((v - mn) / range * 255).toInt & 0xff
            0xff000000 | (g << 16) | (g << 8) | g
          }
        img.setRGB(c, r, argb)
        c += 1
      }
      r += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }
  override protected def withNewChildInternal(c: Expression) = copy(c)
}

/** The reference's named color ramps (ref util/package.scala:157-185
  * ColorRampNames). The NAMES are the compatibility surface — a
  * reference user's `rf_render_png(tile, "Viridis")` runs unchanged —
  * while the stop colors are graft's own pinned tables (the reference's
  * stop values live in its GeoTrellis dependency, not its tree).
  * Greyscale{n} quantizes to n discrete levels like the original;
  * gradient ramps interpolate linearly between stops. Every cell→color
  * step is correctly-rounded IEEE arithmetic plus truncation, so
  * rendered PNGs replay exactly in the DuckDB oracle (q_render_ramp). */
object ColorRampNames {
  val gradients: Map[String, Array[Int]] = Map(
    "BlueToOrange" -> Array(0x2C7FB8, 0xEDF8B1, 0xFF8C00),
    "LightYellowToOrange" -> Array(0xFFFFCC, 0xFED976, 0xFD8D3C),
    "BlueToRed" -> Array(0x0571B0, 0xF7F7F7, 0xCA0020),
    "GreenToRedOrange" -> Array(0x1A9641, 0xFFFFBF, 0xFF4500),
    "LightToDarkSunset" -> Array(0xFFF7EC, 0xFC8D59, 0x7F0000),
    "LightToDarkGreen" -> Array(0xF7FCF5, 0x74C476, 0x00441B),
    "HeatmapYellowToRed" -> Array(0xFFFFB2, 0xFD8D3C, 0xBD0026),
    "HeatmapBlueToYellowToRedSpectrum" ->
      Array(0x0000FF, 0x00FFFF, 0x00FF00, 0xFFFF00, 0xFF0000),
    "HeatmapDarkRedToYellowWhite" -> Array(0x67000D, 0xFC9272, 0xFFFF00, 0xFFFFFF),
    "HeatmapLightPurpleToDarkPurpleToWhite" -> Array(0xDADAEB, 0x6A51A3, 0xFFFFFF),
    "ClassificationBoldLandUse" ->
      Array(0xB2DF8A, 0x33A02C, 0xFB9A99, 0xE31A1C, 0x1F78B4),
    "ClassificationMutedTerrain" -> Array(0xD9F0D3, 0xA6DBA0, 0xC2A5CF, 0x7B3294),
    "Magma" -> Array(0x000004, 0xB63679, 0xFCFDBF),
    "Inferno" -> Array(0x000004, 0xBB3754, 0xFCFFA4),
    "Plasma" -> Array(0x0D0887, 0xCC4778, 0xF0F921),
    "Viridis" -> Array(0x440154, 0x21918C, 0xFDE725))
  val greyscales: Map[String, Int] =
    Seq(2, 8, 32, 64, 128, 256).map(n => s"Greyscale$n" -> n).toMap
  def all: Seq[String] = (gradients.keySet ++ greyscales.keySet).toSeq.sorted

  /** t in [0,1] → packed ARGB, per the rules above. */
  def color(name: String, t: Double): Int = greyscales.get(name) match {
    case Some(n) =>
      val idx = math.min(n - 1, (t * n).toInt)
      val g = ((255.0 * idx) / (n - 1)).toInt
      0xff000000 | (g << 16) | (g << 8) | g
    case None =>
      val stops = gradients(name)
      val pos = t * (stops.length - 1)
      val i = math.min(stops.length - 2, pos.toInt)
      val f = pos - i
      def ch(shift: Int): Int = {
        val c0 = (stops(i) >> shift) & 0xff
        val c1 = (stops(i + 1) >> shift) & 0xff
        (c0 + f * (c1 - c0)).toInt
      }
      0xff000000 | (ch(16) << 16) | (ch(8) << 8) | ch(0)
  }
}

/** Single-band PNG through a named color ramp (reference
  * RenderPNG.RenderColorRampPNG + TileFunctions.scala:224: unknown
  * names fail analysis listing the valid set). Min-max stretch to
  * t ∈ [0,1], NoData transparent. */
case class RenderRampPNG(child: Expression, ramp: Expression)
    extends BinaryExpression with CodegenFallback {
  override def prettyName: String = "rf_render_png"
  override def left: Expression = child
  override def right: Expression = ramp
  override def dataType: DataType = BinaryType
  @transient private lazy val ext = tileExtractor(child.dataType)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    if (ramp.dataType != StringType || !ramp.foldable)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects a literal color ramp name")
    else (try scala.util.Right(ramp.eval(null)) catch {
      case e: Exception => scala.util.Left(e.getMessage)
    }) match {
      case scala.util.Left(msg) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName could not evaluate the ramp name: $msg")
      case scala.util.Right(null) =>
        TypeCheckResult.TypeCheckFailure(s"$prettyName ramp name must not be null")
      case scala.util.Right(s: UTF8String) if ColorRampNames.gradients.contains(s.toString) ||
          ColorRampNames.greyscales.contains(s.toString) => TypeCheckResult.TypeCheckSuccess
      case scala.util.Right(s) => TypeCheckResult.TypeCheckFailure(
        s"Provided color ramp name '$s' does not match one of " +
          ColorRampNames.all.mkString(", "))
    }
  }
  @transient private lazy val rampName = ramp.eval(null).asInstanceOf[UTF8String].toString
  override def nullSafeEval(input: Any, unused: Any): Any = {
    val t = ext(input)
    val (_, _, mn, mx, _, _) = t.statsAccum
    val range = if (mx > mn) mx - mn else 1.0
    val img = new java.awt.image.BufferedImage(
      t.cols, t.rows, java.awt.image.BufferedImage.TYPE_INT_ARGB)
    var r = 0
    while (r < t.rows) {
      var c = 0
      while (c < t.cols) {
        val v = t.getDouble(r * t.cols + c)
        img.setRGB(c, r,
          if (NoData.isNoData(v)) 0
          else ColorRampNames.color(rampName, (v - mn) / range))
        c += 1
      }
      r += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(child = l, ramp = r)
}

/** PNG of a packed-RGB tile (the rf_rgb_composite output): each cell IS
  * the 24-bit pixel, NoData transparent — the reference's three-band
  * `rf_render_png(red, green, blue)` = this over RGBComposite
  * (ref RenderPNG.RenderCompositePNG). */
case class RenderRGBPNG(child: Expression) extends UnaryExpression with CodegenFallback {
  override def prettyName: String = "rf_render_png"
  override def dataType: DataType = BinaryType
  @transient private lazy val ext = tileExtractor(child.dataType)
  override def nullSafeEval(input: Any): Any = {
    val t = ext(input)
    val img = new java.awt.image.BufferedImage(
      t.cols, t.rows, java.awt.image.BufferedImage.TYPE_INT_ARGB)
    var r = 0
    while (r < t.rows) {
      var c = 0
      while (c < t.cols) {
        val v = t.getDouble(r * t.cols + c)
        img.setRGB(c, r,
          if (NoData.isNoData(v)) 0 else 0xff000000 | (v.toInt & 0xffffff))
        c += 1
      }
      r += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }
  override protected def withNewChildInternal(c: Expression) = copy(c)
}

/** Pack three band tiles into one int32 RGB tile (8 bits per band, min-max stretched per band). */
case class RGBComposite(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with CodegenFallback {
  override def prettyName: String = "rf_rgb_composite"
  override def dataType: DataType = TileUDT.instance
  @transient private lazy val re = tileExtractor(first.dataType)
  @transient private lazy val ge = tileExtractor(second.dataType)
  @transient private lazy val be = tileExtractor(third.dataType)
  override def nullSafeEval(r: Any, g: Any, b: Any): Any = {
    val rt = re(r); val gt = ge(g); val bt = be(b)
    val out = Tile.empty(CellType.int32raw, rt.cols, rt.rows)
    def stretch(t: Tile): Array[Int] = {
      val (_, _, mn, mx, _, _) = t.statsAccum
      val range = if (mx > mn) mx - mn else 1.0
      Array.tabulate(t.size) { i =>
        val v = t.getDouble(i)
        if (NoData.isNoData(v)) 0 else ((v - mn) / range * 255).toInt & 0xff
      }
    }
    val rs = stretch(rt); val gs = stretch(gt); val bs = stretch(bt)
    var i = 0
    while (i < out.size) {
      out.setDouble(i, ((rs(i) << 16) | (gs(i) << 8) | bs(i)).toDouble)
      i += 1
    }
    tileResult(out)
  }
  override protected def withNewChildrenInternal(a: Expression, b: Expression, c: Expression) =
    copy(a, b, c)
}
