package graft.expressions

import graft.core._
import graft.core.Focal.Neighborhood
import graft.udt.TileUDT
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/**
 * Focal and terrain expressions (reference family:
 * /root/reference/core/src/main/scala/org/locationtech/rasterframes/expressions/focalops/,
 * base FocalNeighborhoodOp.scala:35-62). The neighborhood argument is a
 * string ("square-1", "circle-2") or integer radius. Terrain ops take
 * cell sizes from the proj_raster extent when given one, else 1.0.
 */
abstract class FocalOpBase extends BinaryExpression with CodegenFallback {
  protected def apply(t: Tile, n: Neighborhood): Tile
  override def dataType: DataType = TileUDT.instance
  @transient protected lazy val ext: Any => Tile = tileExtractor(left.dataType)
  override def nullSafeEval(t: Any, n: Any): Any =
    tileResult(apply(ext(t), Neighborhood.parse(n.toString)))
}

case class FocalMean(left: Expression, right: Expression) extends FocalOpBase {
  override def prettyName: String = "rf_focal_mean"
  protected def apply(t: Tile, n: Neighborhood): Tile = Focal.mean(t, n)
  override protected def withNewChildrenInternal(l: Expression, r: Expression) = copy(l, r)
}
case class FocalMin(left: Expression, right: Expression) extends FocalOpBase {
  override def prettyName: String = "rf_focal_min"
  protected def apply(t: Tile, n: Neighborhood): Tile = Focal.min(t, n)
  override protected def withNewChildrenInternal(l: Expression, r: Expression) = copy(l, r)
}
case class FocalMax(left: Expression, right: Expression) extends FocalOpBase {
  override def prettyName: String = "rf_focal_max"
  protected def apply(t: Tile, n: Neighborhood): Tile = Focal.max(t, n)
  override protected def withNewChildrenInternal(l: Expression, r: Expression) = copy(l, r)
}
case class FocalMedian(left: Expression, right: Expression) extends FocalOpBase {
  override def prettyName: String = "rf_focal_median"
  protected def apply(t: Tile, n: Neighborhood): Tile = Focal.median(t, n)
  override protected def withNewChildrenInternal(l: Expression, r: Expression) = copy(l, r)
}
case class FocalMode(left: Expression, right: Expression) extends FocalOpBase {
  override def prettyName: String = "rf_focal_mode"
  protected def apply(t: Tile, n: Neighborhood): Tile = Focal.mode(t, n)
  override protected def withNewChildrenInternal(l: Expression, r: Expression) = copy(l, r)
}
case class FocalStdDev(left: Expression, right: Expression) extends FocalOpBase {
  override def prettyName: String = "rf_focal_stddev"
  protected def apply(t: Tile, n: Neighborhood): Tile = Focal.stddev(t, n)
  override protected def withNewChildrenInternal(l: Expression, r: Expression) = copy(l, r)
}
case class FocalMoransI(left: Expression, right: Expression) extends FocalOpBase {
  override def prettyName: String = "rf_focal_moransi"
  protected def apply(t: Tile, n: Neighborhood): Tile = Focal.moransI(t, n)
  override protected def withNewChildrenInternal(l: Expression, r: Expression) = copy(l, r)
}

/** Convolve with a square kernel given as array<double> (row-major, odd dim). */
case class Convolve(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def prettyName: String = "rf_convolve"
  override def dataType: DataType = TileUDT.instance
  @transient private lazy val ext = tileExtractor(left.dataType)
  @transient private lazy val et = right.dataType.asInstanceOf[ArrayType].elementType
  @transient private lazy val elemExt = doubleExtractor(et)
  override def nullSafeEval(t: Any, k: Any): Any = {
    val ad = k.asInstanceOf[ArrayData]
    val arr = new Array[Double](ad.numElements())
    var i = 0
    while (i < arr.length) { arr(i) = elemExt(ad.get(i, et)); i += 1 }
    val dim = math.sqrt(arr.length).toInt
    require(dim * dim == arr.length && dim % 2 == 1,
      s"rf_convolve kernel must be a square odd-dimension array, got ${arr.length} elements")
    tileResult(Focal.convolve(ext(t), arr, dim))
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression) = copy(l, r)
}

abstract class TerrainOpBase extends Expression with CodegenFallback {
  def tileChild: Expression
  override def nullable: Boolean = true
  override def dataType: DataType = TileUDT.instance
  @transient protected lazy val ext: Any => Tile = tileExtractor(tileChild.dataType)
  /** cell sizes from proj_raster extent when available */
  protected def cellSize(v: Any): (Tile, Double, Double) = {
    if (ProjRaster.isProjRasterType(tileChild.dataType)) {
      val row = v.asInstanceOf[InternalRow]
      val e = ProjRaster.extentOf(row)
      val t = ProjRaster.tileOf(row)
      (t, e.width / t.cols, e.height / t.rows)
    } else (ext(v), 1.0, 1.0)
  }
}

/** Slope in degrees (reference: focalops/Slope.scala → rf_slope). */
case class Slope(tileChild: Expression, zFactor: Expression) extends TerrainOpBase {
  override def prettyName: String = "rf_slope"
  override def children: Seq[Expression] = Seq(tileChild, zFactor)
  override def eval(input: InternalRow): Any = {
    val tv = tileChild.eval(input); val zv = zFactor.eval(input)
    if (tv == null || zv == null) null
    else {
      val (t, cw, ch) = cellSize(tv)
      tileResult(Focal.slope(t, cw, ch, doubleExtractor(zFactor.dataType)(zv)))
    }
  }
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]) =
    copy(cs(0), cs(1))
}

/** Aspect in degrees from north (reference: focalops/Aspect.scala → rf_aspect). */
case class Aspect(tileChild: Expression) extends TerrainOpBase {
  override def prettyName: String = "rf_aspect"
  override def children: Seq[Expression] = Seq(tileChild)
  override def eval(input: InternalRow): Any = {
    val tv = tileChild.eval(input)
    if (tv == null) null
    else {
      val (t, cw, ch) = cellSize(tv)
      tileResult(Focal.aspect(t, cw, ch))
    }
  }
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]) = copy(cs(0))
}

/** Hillshade (reference: focalops/Hillshade.scala → rf_hillshade). */
case class Hillshade(children: Seq[Expression]) extends Expression with CodegenFallback {
  require(children.size == 4, "rf_hillshade(tile, azimuth, altitude, zFactor)")
  override def prettyName: String = "rf_hillshade"
  override def nullable: Boolean = true
  override def dataType: DataType = TileUDT.instance
  @transient private lazy val ext = tileExtractor(children.head.dataType)
  override def eval(input: InternalRow): Any = {
    val vs = children.map(_.eval(input))
    if (vs.exists(_ == null)) return null
    val (t, cw, ch) =
      if (ProjRaster.isProjRasterType(children.head.dataType)) {
        val row = vs(0).asInstanceOf[InternalRow]
        val e = ProjRaster.extentOf(row)
        val tile = ProjRaster.tileOf(row)
        (tile, e.width / tile.cols, e.height / tile.rows)
      } else (ext(vs(0)), 1.0, 1.0)
    tileResult(Focal.hillshade(t, cw, ch,
      doubleExtractor(children(1).dataType)(vs(1)),
      doubleExtractor(children(2).dataType)(vs(2)),
      doubleExtractor(children(3).dataType)(vs(3))))
  }
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]) = copy(cs)
}
