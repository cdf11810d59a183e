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
 * (/root/reference/core/src/main/scala/org/apache/spark/sql/rf/TileUDT.scala:49-57):
 * `{cell_type: string, cols: int, rows: int, cells: binary, ref: struct}`.
 * Exactly one of `cells`/`ref` is set — a realized tile carries its
 * little-endian cell payload; a LAZY tile carries only a
 * (path, window) reference and fetches cells on the executor at first
 * access (mirroring RasterRef, reference ref/RasterRef.scala:49-64).
 */
class TileUDT extends UserDefinedType[Tile] {
  override def sqlType: StructType = TileUDT.schema
  override def serialize(obj: Tile): InternalRow = TileUDT.encode(obj)
  override def deserialize(datum: Any): Tile = datum match {
    case row: InternalRow => TileUDT.decode(row)
  }
  override def userClass: Class[Tile] = classOf[Tile]
  override def typeName: String = "tile"
  override def pyUDT: String = "graft.rf_types.TileUDT"
  override def equals(o: Any): Boolean = o.isInstanceOf[TileUDT]
  override def hashCode(): Int = classOf[TileUDT].getName.hashCode
}

object TileUDT {
  val instance = new TileUDT

  val refSchema: StructType = StructType(Seq(
    StructField("path", StringType, nullable = false),
    StructField("col_min", IntegerType, nullable = false),
    StructField("row_min", IntegerType, nullable = false),
    StructField("col_max", IntegerType, nullable = false),
    StructField("row_max", IntegerType, nullable = false),
    StructField("band", IntegerType, nullable = false)))

  val schema: StructType = StructType(Seq(
    StructField("cell_type", StringType, nullable = false),
    StructField("cols", IntegerType, nullable = false),
    StructField("rows", IntegerType, nullable = false),
    StructField("cells", BinaryType, nullable = true),
    StructField("ref", refSchema, nullable = true)
  ))

  def encode(t: Tile): InternalRow = t match {
    case r: RefTile if !r.isRealized =>
      new GenericInternalRow(Array[Any](
        UTF8String.fromString(t.cellType.name), t.cols, t.rows, null,
        new GenericInternalRow(Array[Any](UTF8String.fromString(r.path),
          r.win.colMin, r.win.rowMin, r.win.colMax, r.win.rowMax, r.band))))
    case _ =>
      new GenericInternalRow(Array[Any](
        UTF8String.fromString(t.cellType.name), t.cols, t.rows, t.toBytes, null))
  }

  def decode(row: InternalRow): Tile = {
    val ct = CellType.fromName(row.getUTF8String(0).toString)
    val cols = row.getInt(1)
    val rows = row.getInt(2)
    if (!row.isNullAt(3))
      Tile.fromBytes(row.getBinary(3), ct, cols, rows)
    else {
      val ref = row.getStruct(4, 6)
      new RefTile(ref.getUTF8String(0).toString,
        graft.core.GridBounds(ref.getInt(1), ref.getInt(2), ref.getInt(3), ref.getInt(4)),
        ct, cols, rows, ref.getInt(5))
    }
  }

  /** Register the UDT with Spark (idempotent). */
  def register(): Unit = {
    UDTRegistration.register(classOf[Tile].getName, classOf[TileUDT].getName)
    UDTRegistration.register(classOf[MutableTile].getName, classOf[TileUDT].getName)
    UDTRegistration.register(classOf[RefTile].getName, classOf[TileUDT].getName)
  }

  /** True if a DataType can be treated as a tile (the UDT itself, or its bare struct, e.g. post-Parquet). */
  def isTileType(dt: DataType): Boolean = dt match {
    case _: TileUDT => true
    case st: StructType =>
      st.fields.length == schema.fields.length &&
        st.fieldNames.sameElements(schema.fieldNames)
    case _ => false
  }
}
