package graft.ml

import graft.expressions._
import graft.functions._
import org.apache.spark.ml.Transformer
import org.apache.spark.ml.param.{Param, ParamMap}
import org.apache.spark.ml.util.Identifiable
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Spark-ML transformers (reference:
 * /root/reference/core/src/main/scala/org/locationtech/rasterframes/ml/TileExploder.scala:40-67
 * and ml/NoDataFilter.scala:42-59).
 */

/** Explodes all tile columns into cell rows (column_index/row_index + one
  * double column per former tile column); non-tile columns carried through. */
class TileExploder(override val uid: String) extends Transformer {
  def this() = this(Identifiable.randomUID("tile_exploder"))

  private def tileCols(schema: StructType): Array[StructField] =
    schema.fields.filter(f => isTileType(f.dataType))

  override def transform(df: Dataset[_]): DataFrame = {
    val tiles = tileCols(df.schema)
    val others = df.schema.fields.filterNot(f => isTileType(f.dataType))
    val exploder = rf_explode_tiles(tiles.map(f => col(f.name)).toIndexedSeq: _*)
    df.select(others.map(f => col(f.name)).toIndexedSeq :+ exploder: _*)
  }

  override def transformSchema(schema: StructType): StructType = {
    val tiles = tileCols(schema)
    val others = schema.fields.filterNot(f => isTileType(f.dataType))
    StructType(others ++
      Array(StructField("column_index", IntegerType, nullable = false),
        StructField("row_index", IntegerType, nullable = false)) ++
      tiles.map(f => StructField(f.name, DoubleType, nullable = true)))
  }
  override def copy(extra: ParamMap): TileExploder = new TileExploder(uid)
}

/** Drops rows where the configured column is null or NaN (post-explode). */
class NoDataFilter(override val uid: String) extends Transformer {
  def this() = this(Identifiable.randomUID("nodata_filter"))
  final val inputCols: Param[Array[String]] =
    new Param[Array[String]](this, "inputCols", "columns to require data in")
  def setInputCols(cols: Array[String]): this.type = set(inputCols, cols)
  setDefault(inputCols, Array.empty[String])

  override def transform(df: Dataset[_]): DataFrame = {
    // default: every numeric column (exploded cells may be float or
    // integral depending on the assembler's cell type)
    val cols = if ($(inputCols).isEmpty)
      df.schema.fields.collect { case f if f.dataType.isInstanceOf[NumericType] => f.name }
    else $(inputCols)
    cols.foldLeft(df.toDF()) { (d, c) =>
      val base = col(c).isNotNull
      d.where(d.schema(c).dataType match {
        case DoubleType | FloatType => base && !isnan(col(c))
        case _ => base
      })
    }
  }
  override def transformSchema(schema: StructType): StructType = schema
  override def copy(extra: ParamMap): NoDataFilter = new NoDataFilter(uid)
}
