package graft.udt

import graft.core._
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * UserDefinedType for [[graft.core.Tile]].
 *
 * Physical schema follows the shape of the reference's tile UDT
 * (/root/reference/core/src/main/scala/org/apache/spark/sql/rf/TileUDT.scala:49-57),
 * minus the lazy-ref/buffer fields (planned for the raster-source reader):
 * `{cell_type: string, cols: int, rows: int, cells: binary}`.
 * The cell payload is the native little-endian array; deserialization is
 * a single buffer copy per tile.
 */
class TileUDT extends UserDefinedType[Tile] {
  override def sqlType: StructType = TileUDT.schema
  override def serialize(obj: Tile): InternalRow = TileUDT.encode(obj)
  override def deserialize(datum: Any): Tile = datum match {
    case row: InternalRow => TileUDT.decode(row)
  }
  override def userClass: Class[Tile] = classOf[Tile]
  override def typeName: String = "tile"
  override def pyUDT: String = "graft.tile_udt"
  override def equals(o: Any): Boolean = o.isInstanceOf[TileUDT]
  override def hashCode(): Int = classOf[TileUDT].getName.hashCode
}

object TileUDT {
  val instance = new TileUDT

  val schema: StructType = StructType(Seq(
    StructField("cell_type", StringType, nullable = false),
    StructField("cols", IntegerType, nullable = false),
    StructField("rows", IntegerType, nullable = false),
    StructField("cells", BinaryType, nullable = true)
  ))

  def encode(t: Tile): InternalRow =
    new GenericInternalRow(Array[Any](
      UTF8String.fromString(t.cellType.name), t.cols, t.rows, t.toBytes))

  def decode(row: InternalRow): Tile = {
    val ct = CellType.fromName(row.getUTF8String(0).toString)
    val cols = row.getInt(1)
    val rows = row.getInt(2)
    Tile.fromBytes(row.getBinary(3), ct, cols, rows)
  }

  /** Register the UDT with Spark (idempotent). */
  def register(): Unit = {
    UDTRegistration.register(classOf[Tile].getName, classOf[TileUDT].getName)
    UDTRegistration.register(classOf[MutableTile].getName, classOf[TileUDT].getName)
  }

  /** True if a DataType can be treated as a tile (the UDT itself, or its bare struct, e.g. post-Parquet). */
  def isTileType(dt: DataType): Boolean = dt match {
    case _: TileUDT => true
    case st: StructType =>
      st.fields.length == 4 && st.fieldNames.sameElements(schema.fieldNames)
    case _ => false
  }
}
