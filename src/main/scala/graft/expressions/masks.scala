package graft.expressions

import graft.core._
import graft.udt.TileUDT
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/**
 * Masking expressions (reference family:
 * /root/reference/core/src/main/scala/org/locationtech/rasterframes/expressions/transformers/
 * MaskByDefined.scala, InverseMaskByDefined.scala, MaskByValue.scala,
 * InverseMaskByValue.scala, MaskByValues.scala, ExtractBits.scala).
 * Semantics: output takes `target`'s cells, with masked positions set to
 * NoData; the mask tile itself is never returned.
 */

/** Where mask cell is NoData → NoData in target (rf_mask). */
case class MaskByDefined(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def prettyName: String = "rf_mask"
  override def dataType: DataType = TileUDT.instance
  @transient private lazy val tExt = tileExtractor(left.dataType)
  @transient private lazy val mExt = tileExtractor(right.dataType)
  override def nullSafeEval(t: Any, m: Any): Any = {
    val target = tExt(t); val mask = mExt(m)
    tileResult(Masks.apply(target, i => NoData.isNoData(mask.getDouble(i))))
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression) = copy(l, r)
}

/** Where mask cell is data → NoData in target (rf_inverse_mask). */
case class InverseMaskByDefined(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def prettyName: String = "rf_inverse_mask"
  override def dataType: DataType = TileUDT.instance
  @transient private lazy val tExt = tileExtractor(left.dataType)
  @transient private lazy val mExt = tileExtractor(right.dataType)
  override def nullSafeEval(t: Any, m: Any): Any = {
    val target = tExt(t); val mask = mExt(m)
    tileResult(Masks.apply(target, i => NoData.isData(mask.getDouble(i))))
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression) = copy(l, r)
}

/** Where mask cell == maskValue → NoData in target (rf_mask_by_value). */
case class MaskByValue(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with CodegenFallback {
  override def prettyName: String = "rf_mask_by_value"
  override def dataType: DataType = TileUDT.instance
  @transient private lazy val tExt = tileExtractor(first.dataType)
  @transient private lazy val mExt = tileExtractor(second.dataType)
  @transient private lazy val vExt = doubleExtractor(third.dataType)
  override def nullSafeEval(t: Any, m: Any, v: Any): Any = {
    val target = tExt(t); val mask = mExt(m); val mv = vExt(v)
    tileResult(Masks.apply(target, i => mask.getRawDouble(i) == mv))
  }
  override protected def withNewChildrenInternal(a: Expression, b: Expression, c: Expression) =
    copy(a, b, c)
}

/** Keep only where mask cell == maskValue (rf_inverse_mask_by_value). */
case class InverseMaskByValue(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with CodegenFallback {
  override def prettyName: String = "rf_inverse_mask_by_value"
  override def dataType: DataType = TileUDT.instance
  @transient private lazy val tExt = tileExtractor(first.dataType)
  @transient private lazy val mExt = tileExtractor(second.dataType)
  @transient private lazy val vExt = doubleExtractor(third.dataType)
  override def nullSafeEval(t: Any, m: Any, v: Any): Any = {
    val target = tExt(t); val mask = mExt(m); val mv = vExt(v)
    tileResult(Masks.apply(target, i => mask.getRawDouble(i) != mv))
  }
  override protected def withNewChildrenInternal(a: Expression, b: Expression, c: Expression) =
    copy(a, b, c)
}

/** Where mask cell ∈ values → NoData in target (rf_mask_by_values). */
case class MaskByValues(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with CodegenFallback {
  override def prettyName: String = "rf_mask_by_values"
  override def dataType: DataType = TileUDT.instance
  @transient private lazy val tExt = tileExtractor(first.dataType)
  @transient private lazy val mExt = tileExtractor(second.dataType)
  @transient private lazy val et = third.dataType.asInstanceOf[ArrayType].elementType
  @transient private lazy val elemExt = doubleExtractor(et)
  override def nullSafeEval(t: Any, m: Any, vs: Any): Any = {
    val target = tExt(t); val mask = mExt(m)
    val arr = vs.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val vals = new Array[Double](n)
    var i = 0
    while (i < n) { vals(i) = elemExt(arr.get(i, et)); i += 1 }
    tileResult(Masks.apply(target, { i =>
      val mv = mask.getRawDouble(i)
      var j = 0; var found = false
      while (j < n && !found) { if (vals(j) == mv) found = true; j += 1 }
      found
    }))
  }
  override protected def withNewChildrenInternal(a: Expression, b: Expression, c: Expression) =
    copy(a, b, c)
}

/** Extract a bit range from integral cells: (cells >> start) & ((1<<numBits)-1)
  * (reference: transformers/ExtractBits.scala → rf_local_extract_bits). */
case class ExtractBits(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with CodegenFallback {
  override def prettyName: String = "rf_local_extract_bits"
  override def dataType: DataType = TileUDT.instance
  @transient private lazy val tExt = tileExtractor(first.dataType)
  override def nullSafeEval(t: Any, start: Any, bits: Any): Any = {
    val target = tExt(t)
    val s = start.asInstanceOf[Int]
    val nb = bits.asInstanceOf[Int]
    val maskBits = (1L << nb) - 1
    tileResult(target.mapDouble(v => ((v.toLong >> s) & maskBits).toDouble))
  }
  override protected def withNewChildrenInternal(a: Expression, b: Expression, c: Expression) =
    copy(a, b, c)
}

private[expressions] object Masks {
  /** Copy of `target` with positions where `masked(i)` is true set to NoData.
    * Output cell type gains a default NoData policy if the input had none. */
  def apply(target: Tile, masked: Int => Boolean): Tile = {
    val ct = if (target.cellType.hasNoData) target.cellType else target.cellType.withDefaultNoData
    val res = Tile.empty(ct, target.cols, target.rows)
    var i = 0; val n = res.size
    while (i < n) {
      res.setDouble(i, if (masked(i)) Double.NaN else target.getDouble(i))
      i += 1
    }
    res
  }
}
