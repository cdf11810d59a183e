package graft.expressions

import graft.core._
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/**
 * Per-tile scalar statistics (reference family:
 * /root/reference/core/src/main/scala/org/locationtech/rasterframes/expressions/tilestats/).
 * All skip NoData cells and iterate cells in index order, so results over
 * integer-valued cells are exactly reproducible by a SQL oracle.
 */
abstract class TileStatOp extends UnaryExpression with CodegenFallback with Serializable {
  override def checkInputDataTypes(): TypeCheckResult =
    if (isTileType(child.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName expects a tile argument")
  @transient protected lazy val ext: Any => Tile = tileExtractor(child.dataType)
}

case class TileSum(child: Expression) extends TileStatOp {
  override def prettyName: String = "rf_tile_sum"
  override def dataType: DataType = DoubleType
  override def nullSafeEval(input: Any): Any = ext(input).sum
  override protected def withNewChildInternal(c: Expression) = copy(c)
}
case class TileMean(child: Expression) extends TileStatOp {
  override def prettyName: String = "rf_tile_mean"
  override def dataType: DataType = DoubleType
  override def nullSafeEval(input: Any): Any = {
    val m = ext(input).mean
    if (NoData.isData(m)) m else null
  }
  override protected def withNewChildInternal(c: Expression) = copy(c)
}
case class TileMin(child: Expression) extends TileStatOp {
  override def prettyName: String = "rf_tile_min"
  override def dataType: DataType = DoubleType
  override def nullSafeEval(input: Any): Any = {
    val m = ext(input).minCell
    if (NoData.isData(m)) m else null
  }
  override protected def withNewChildInternal(c: Expression) = copy(c)
}
case class TileMax(child: Expression) extends TileStatOp {
  override def prettyName: String = "rf_tile_max"
  override def dataType: DataType = DoubleType
  override def nullSafeEval(input: Any): Any = {
    val m = ext(input).maxCell
    if (NoData.isData(m)) m else null
  }
  override protected def withNewChildInternal(c: Expression) = copy(c)
}
case class DataCells(child: Expression) extends TileStatOp {
  override def prettyName: String = "rf_data_cells"
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any = ext(input).dataCells
  override protected def withNewChildInternal(c: Expression) = copy(c)
}
case class NoDataCells(child: Expression) extends TileStatOp {
  override def prettyName: String = "rf_no_data_cells"
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any = ext(input).noDataCells
  override protected def withNewChildInternal(c: Expression) = copy(c)
}
case class IsNoDataTile(child: Expression) extends TileStatOp {
  override def prettyName: String = "rf_is_no_data_tile"
  override def dataType: DataType = BooleanType
  override def nullSafeEval(input: Any): Any = ext(input).isNoDataTile
  override protected def withNewChildInternal(c: Expression) = copy(c)
}

object TileStats {
  val statsSchema: StructType = StructType(Seq(
    StructField("data_cells", LongType, nullable = false),
    StructField("no_data_cells", LongType, nullable = false),
    StructField("min", DoubleType, nullable = true),
    StructField("max", DoubleType, nullable = true),
    StructField("mean", DoubleType, nullable = true),
    StructField("variance", DoubleType, nullable = true)
  ))
  /** Finalize a (count, ndCount, min, max, sum, sumSq) accumulator to the stats row.
    * Variance = (sumSq − sum·mean)/(n−1), sample variance, fixed op order so the
    * oracle formula reproduces it bit-for-bit on integer-valued cells. */
  def toRow(acc: (Long, Long, Double, Double, Double, Double)): InternalRow = {
    val (c, nd, min, max, s, s2) = acc
    if (c == 0) InternalRow(c, nd, null, null, null, null)
    else {
      val mean = s / c
      val variance = if (c < 2) null else (s2 - s * mean) / (c - 1)
      InternalRow(c, nd, min, max, mean, variance)
    }
  }
}

/** Struct of {data_cells, no_data_cells, min, max, mean, variance} (reference: tilestats/TileStats.scala). */
case class TileStatsExpr(child: Expression) extends TileStatOp {
  override def prettyName: String = "rf_tile_stats"
  override def dataType: DataType = TileStats.statsSchema
  override def nullSafeEval(input: Any): Any = TileStats.toRow(ext(input).statsAccum)
  override protected def withNewChildInternal(c: Expression) = copy(c)
}

/** Exact value→count histogram of one tile as array<struct<value,count>> ordered by value
  * (reference: tilestats/TileHistogram.scala; ours is exact with a distinct-value cap). */
case class TileHistogram(child: Expression) extends TileStatOp {
  override def prettyName: String = "rf_tile_histogram"
  override def dataType: DataType = TileHistogram.schema
  override def nullSafeEval(input: Any): Any = {
    val t = ext(input)
    val m = new java.util.TreeMap[Double, Long]()
    var i = 0; val n = t.size
    while (i < n) {
      val v = t.getDouble(i)
      if (NoData.isData(v)) {
        val c = m.get(v); m.put(v, if (c == 0L && !m.containsKey(v)) 1L else c + 1L)
      }
      i += 1
    }
    val bins = new Array[Any](m.size)
    var j = 0
    val it = m.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      bins(j) = InternalRow(e.getKey.doubleValue(), e.getValue.longValue())
      j += 1
    }
    InternalRow(new GenericArrayData(bins))
  }
  override protected def withNewChildInternal(c: Expression) = copy(c)
}
object TileHistogram {
  val binSchema: StructType = StructType(Seq(
    StructField("value", DoubleType, nullable = false),
    StructField("count", LongType, nullable = false)))
  val schema: StructType = StructType(Seq(
    StructField("bins", ArrayType(binSchema, containsNull = false), nullable = false)))
}

/** True if any data cell satisfies truthiness (≠0) (reference: tilestats/Exists.scala). */
case class TileExists(child: Expression) extends TileStatOp {
  override def prettyName: String = "rf_exists"
  override def dataType: DataType = BooleanType
  override def nullSafeEval(input: Any): Any = ext(input).exists(_ != 0.0)
  override protected def withNewChildInternal(c: Expression) = copy(c)
}
/** True if all cells are data and truthy (reference: tilestats/ForAll.scala). */
case class TileForAll(child: Expression) extends TileStatOp {
  override def prettyName: String = "rf_for_all"
  override def dataType: DataType = BooleanType
  override def nullSafeEval(input: Any): Any = ext(input).forAll(_ != 0.0)
  override protected def withNewChildInternal(c: Expression) = copy(c)
}
