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
