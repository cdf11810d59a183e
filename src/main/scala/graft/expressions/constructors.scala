package graft.expressions

import graft.core._
import graft.udt.TileUDT
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Tile constructors, converters and accessors (reference families:
 * /root/reference/core/src/main/scala/org/locationtech/rasterframes/expressions/transformers/
 * and accessors/; UDF variants in functions/package.scala:61-100).
 */

/** array<numeric> + cols + rows → tile (reference: rf_array_to_tile, functions/package.scala:61-77).
  * SQL NULL array elements become NoData cells. Output is float64. */
case class ArrayToTile(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with CodegenFallback {
  override def prettyName: String = "rf_array_to_tile"
  override def dataType: DataType = TileUDT.instance
  override def checkInputDataTypes(): TypeCheckResult = first.dataType match {
    case ArrayType(_: NumericType, _) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(s"$prettyName expects array<numeric> first argument")
  }
  @transient private lazy val et = first.dataType.asInstanceOf[ArrayType].elementType
  @transient private lazy val elemExt = doubleExtractor(et)
  override def nullSafeEval(arr: Any, c: Any, r: Any): Any = {
    val a = arr.asInstanceOf[ArrayData]
    val cols = c.asInstanceOf[Int]
    val rows = r.asInstanceOf[Int]
    val t = Tile.empty(CellType.float64, cols, rows)
    val n = math.min(a.numElements(), cols * rows)
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i)) t.setDouble(i, elemExt(a.get(i, et)))
      i += 1
    }
    tileResult(t)
  }
  override protected def withNewChildrenInternal(a: Expression, b: Expression, c: Expression) =
    copy(a, b, c)
}

/** (value, cols, rows, cell_type_name) → constant tile (reference: rf_make_constant_tile). */
case class MakeConstantTile(children: Seq[Expression])
    extends Expression with CodegenFallback {
  override def prettyName: String = "rf_make_constant_tile"
  override def dataType: DataType = TileUDT.instance
  override def nullable: Boolean = children.exists(_.nullable)
  override def eval(input: InternalRow): Any = {
    val vs = children.map(_.eval(input))
    if (vs.exists(_ == null)) return null
    val value = doubleExtractor(children.head.dataType)(vs.head)
    val cols = vs(1).asInstanceOf[Int]
    val rows = vs(2).asInstanceOf[Int]
    val ct = if (children.size > 3) CellType.fromName(vs(3).toString) else CellType.float64
    tileResult(Tile.constant(value, ct, cols, rows))
  }
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]) = copy(cs)
}

/** tile → array<double> in cell index order; NoData → NULL (reference: transformers/TileToArrayDouble.scala). */
case class TileToArrayDouble(child: Expression) extends UnaryExpression with CodegenFallback {
  override def prettyName: String = "rf_tile_to_array_double"
  override def dataType: DataType = ArrayType(DoubleType, containsNull = true)
  @transient private lazy val ext = tileExtractor(child.dataType)
  override def nullSafeEval(input: Any): Any = {
    val t = ext(input)
    val out = new Array[Any](t.size)
    var i = 0
    while (i < t.size) {
      val v = t.getDouble(i)
      out(i) = if (NoData.isData(v)) v else null
      i += 1
    }
    new GenericArrayData(out)
  }
  override protected def withNewChildInternal(c: Expression) = copy(c)
}

/** tile → array<int>; NoData → NULL (reference: transformers/TileToArrayInt.scala). */
case class TileToArrayInt(child: Expression) extends UnaryExpression with CodegenFallback {
  override def prettyName: String = "rf_tile_to_array_int"
  override def dataType: DataType = ArrayType(IntegerType, containsNull = true)
  @transient private lazy val ext = tileExtractor(child.dataType)
  override def nullSafeEval(input: Any): Any = {
    val t = ext(input)
    val out = new Array[Any](t.size)
    var i = 0
    while (i < t.size) {
      val v = t.get(i)
      out(i) = if (NoData.isData(v)) v else null
      i += 1
    }
    new GenericArrayData(out)
  }
  override protected def withNewChildInternal(c: Expression) = copy(c)
}

/** Numeric cell-type conversion (reference: transformers/SetCellType.scala → rf_convert_cell_type). */
case class ConvertCellType(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def prettyName: String = "rf_convert_cell_type"
  override def dataType: DataType = TileUDT.instance
  @transient private lazy val ext = tileExtractor(left.dataType)
  override def nullSafeEval(t: Any, ctName: Any): Any =
    tileResult(ext(t).convert(CellType.fromName(ctName.toString)))
  override protected def withNewChildrenInternal(l: Expression, r: Expression) = copy(l, r)
}

/** Bit-reinterpretation under a new cell type (reference: transformers/InterpretAs.scala). */
case class InterpretAs(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def prettyName: String = "rf_interpret_cell_type_as"
  override def dataType: DataType = TileUDT.instance
  @transient private lazy val ext = tileExtractor(left.dataType)
  override def nullSafeEval(t: Any, ctName: Any): Any =
    tileResult(ext(t).interpretAs(CellType.fromName(ctName.toString)))
  override protected def withNewChildrenInternal(l: Expression, r: Expression) = copy(l, r)
}

/** Set a user-defined NoData sentinel (reference: transformers/SetNoDataValue.scala → rf_with_no_data). */
case class SetNoDataValue(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def prettyName: String = "rf_with_no_data"
  override def dataType: DataType = TileUDT.instance
  @transient private lazy val ext = tileExtractor(left.dataType)
  @transient private lazy val ndExt = doubleExtractor(right.dataType)
  override def nullSafeEval(t: Any, nd: Any): Any =
    tileResult(ext(t).withNoData(ndExt(nd)))
  override protected def withNewChildrenInternal(l: Expression, r: Expression) = copy(l, r)
}

/** Cell type name accessor (reference: accessors/GetCellType.scala). */
case class GetCellType(child: Expression) extends UnaryExpression with CodegenFallback {
  override def prettyName: String = "rf_cell_type"
  override def dataType: DataType = StringType
  @transient private lazy val ext = tileExtractor(child.dataType)
  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(ext(input).cellType.name)
  override protected def withNewChildInternal(c: Expression) = copy(c)
}

/** {cols, rows} accessor (reference: accessors/GetDimensions.scala). */
case class GetDimensions(child: Expression) extends UnaryExpression with CodegenFallback {
  override def prettyName: String = "rf_dimensions"
  override def dataType: DataType = StructType(Seq(
    StructField("cols", IntegerType, nullable = false),
    StructField("rows", IntegerType, nullable = false)))
  @transient private lazy val ext = tileExtractor(child.dataType)
  override def nullSafeEval(input: Any): Any = {
    val t = ext(input)
    InternalRow(t.cols, t.rows)
  }
  override protected def withNewChildInternal(c: Expression) = copy(c)
}

/** Up/down-sample a tile by factor or to match another tile's dims
  * (reference: localops/Resample.scala → rf_resample, ResampleNearest.scala). */
case class ResampleExpr(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with CodegenFallback {
  override def prettyName: String = "rf_resample"
  override def dataType: DataType = TileUDT.instance
  @transient private lazy val ext = tileExtractor(first.dataType)
  @transient private lazy val targetIsTile = isTileType(second.dataType)
  @transient private lazy val tExt = if (targetIsTile) tileExtractor(second.dataType) else null
  @transient private lazy val fExt = if (!targetIsTile) doubleExtractor(second.dataType) else null
  override def nullSafeEval(t: Any, target: Any, method: Any): Any = {
    val tile = ext(t)
    val (dc, dr) =
      if (targetIsTile) { val tt = tExt(target); (tt.cols, tt.rows) }
      else {
        val f = fExt(target)
        (math.max(1, math.round(tile.cols * f).toInt), math.max(1, math.round(tile.rows * f).toInt))
      }
    tileResult(Resample(tile, dc, dr, method.toString))
  }
  override protected def withNewChildrenInternal(a: Expression, b: Expression, c: Expression) =
    copy(a, b, c)
}

/** Deterministic pseudo-random tile from a seed — the analog of the
  * reference's test/bench `randomTile` (TestData.scala), as an expression
  * so benches and tests can generate tile corpora distributed, without
  * shipping data. Values span the cell type's data range. */
case class SyntheticTile(child: Expression, cols: Int, rows: Int, cellTypeName: String)
    extends UnaryExpression with CodegenFallback {
  override def prettyName: String = "rf_synthetic_tile"
  override def dataType: DataType = TileUDT.instance
  @transient private lazy val ct = CellType.fromName(cellTypeName)
  override def nullSafeEval(seed: Any): Any = {
    val s = seed.asInstanceOf[Number].longValue()
    val t = Tile.empty(ct, cols, rows)
    val n = t.size
    val (lo, hi) = ct.base match {
      case CellBase.Bit => (0.0, 1.0)
      case CellBase.Float32 | CellBase.Float64 => (0.0, 1000.0)
      case b => (math.max(b.minValue, 0.0), math.min(b.maxValue, 10000.0))
    }
    var i = 0
    while (i < n) {
      val u = (graft.pipeline.Hashing.mix64(s * 0x9e3779b97f4a7c15L + i) >>> 11).toDouble / (1L << 53).toDouble
      var v = lo + u * (hi - lo)
      if (!ct.isFloating) v = math.rint(v)
      if (ct.isNoData(v)) v = v + 1
      t.setDouble(i, v)
      i += 1
    }
    tileResult(t)
  }
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** Force a lazy (RasterRef) tile to a realized one — cells are fetched
  * here if they haven't been already (reference: accessors/RealizeTile.scala). */
case class RealizeTile(child: Expression) extends UnaryExpression with CodegenFallback {
  override def prettyName: String = "rf_tile"
  override def dataType: DataType = TileUDT.instance
  @transient private lazy val ext = tileExtractor(child.dataType)
  override def nullSafeEval(input: Any): Any = {
    val t = ext(input)
    // encode() writes cells (realizing a RefTile) unless still lazy
    tileResult(Tile.fromBytes(t.toBytes, t.cellType, t.cols, t.rows))
  }
  override protected def withNewChildInternal(c: Expression) = copy(c)
}

/** Crop a tile to a sub-window — trims the halo after buffered focal ops. */
case class CropTile(children: Seq[Expression]) extends Expression with CodegenFallback {
  require(children.size == 5, "rf_crop(tile, col_off, row_off, cols, rows)")
  override def prettyName: String = "rf_crop"
  override def nullable: Boolean = true
  override def dataType: DataType = TileUDT.instance
  @transient private lazy val ext = tileExtractor(children.head.dataType)
  override def eval(input: InternalRow): Any = {
    val vs = children.map(_.eval(input))
    if (vs.exists(_ == null)) return null
    val t = ext(vs(0))
    val c0 = vs(1).asInstanceOf[Number].intValue()
    val r0 = vs(2).asInstanceOf[Number].intValue()
    val nc = vs(3).asInstanceOf[Number].intValue()
    val nr = vs(4).asInstanceOf[Number].intValue()
    val out = Tile.empty(t.cellType, nc, nr)
    var r = 0
    while (r < nr) {
      var c = 0
      while (c < nc) {
        out.setDouble(r * nc + c, t.getDouble((r0 + r) * t.cols + (c0 + c)))
        c += 1
      }
      r += 1
    }
    tileResult(out)
  }
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]) = copy(cs)
}
