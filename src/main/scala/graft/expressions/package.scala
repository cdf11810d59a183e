package graft

import graft.core._
import graft.udt.TileUDT
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.types._

/**
 * Expression-layer utilities: Column↔Expression bridging for Spark 4's
 * ColumnNode API and dynamic argument extraction (the equivalent of the
 * reference's DynamicExtractors,
 * /root/reference/core/src/main/scala/org/locationtech/rasterframes/expressions/DynamicExtractors.scala:47-210):
 * one logical tile argument may arrive as the TileUDT or as its bare
 * struct (e.g. after a Parquet round-trip).
 */
package object expressions {

  def asColumn(e: Expression): Column = org.apache.spark.sql.graft.shims.column(e)
  def asExpr(c: Column): Expression = org.apache.spark.sql.graft.shims.expression(c)

  /** Can this child be interpreted as a tile? (TileUDT, its bare struct,
    * or a proj_raster struct — the DynamicExtractors discipline.) */
  def isTileType(dt: DataType): Boolean =
    TileUDT.isTileType(dt) || ProjRaster.isProjRasterType(dt)

  /** Extraction function for a tile-shaped child. */
  def tileExtractor(dt: DataType): Any => Tile = dt match {
    case dt if TileUDT.isTileType(dt) =>
      (a: Any) => TileUDT.decode(a.asInstanceOf[InternalRow])
    case dt if ProjRaster.isProjRasterType(dt) =>
      (a: Any) => ProjRaster.tileOf(a.asInstanceOf[InternalRow])
    case other =>
      throw new IllegalArgumentException(s"Expected tile argument, got: ${other.simpleString(10)}")
  }

  /** Extraction function for a numeric (scalar) child → Double. */
  def doubleExtractor(dt: DataType): Any => Double = dt match {
    case DoubleType => (a: Any) => a.asInstanceOf[Double]
    case FloatType => (a: Any) => a.asInstanceOf[Float].toDouble
    case IntegerType => (a: Any) => a.asInstanceOf[Int].toDouble
    case LongType => (a: Any) => a.asInstanceOf[Long].toDouble
    case ShortType => (a: Any) => a.asInstanceOf[Short].toDouble
    case ByteType => (a: Any) => a.asInstanceOf[Byte].toDouble
    case _: DecimalType => (a: Any) => a.asInstanceOf[org.apache.spark.sql.types.Decimal].toDouble
    case StringType => (a: Any) => a.toString.toDouble
    case other =>
      throw new IllegalArgumentException(s"Expected numeric argument, got: ${other.simpleString(10)}")
  }

  def isNumericArg(dt: DataType): Boolean = dt match {
    case _: NumericType => true
    case _ => false
  }

  /** Encode a result tile back to the UDT's internal row. */
  def tileResult(t: Tile): InternalRow = TileUDT.encode(t)
}
