package graft.udt

import org.apache.spark.sql.types._
import org.locationtech.jts.geom.Geometry
import org.locationtech.jts.io.{WKBReader, WKBWriter}

/**
 * JTS Geometry UDT over WKB, the standard shape used by Spark geometry
 * libraries (the reference inherits GeoMesa spark-jts' equivalent —
 * SURVEY.md §1.1). sqlType is BinaryType (WKB), so geometry columns
 * round-trip Parquet as plain binary.
 */
class GeometryUDT extends UserDefinedType[Geometry] {
  override def sqlType: DataType = BinaryType
  override def serialize(obj: Geometry): Any = GeometryUDT.write(obj)
  override def deserialize(datum: Any): Geometry = datum match {
    case b: Array[Byte] => GeometryUDT.read(b)
  }
  override def userClass: Class[Geometry] = classOf[Geometry]
  override def typeName: String = "geometry"
  override def equals(o: Any): Boolean = o.isInstanceOf[GeometryUDT]
  override def hashCode(): Int = classOf[GeometryUDT].getName.hashCode
}

object GeometryUDT {
  val instance = new GeometryUDT

  private val wkbWriter = new ThreadLocal[WKBWriter] {
    override def initialValue(): WKBWriter = new WKBWriter()
  }
  private val wkbReader = new ThreadLocal[WKBReader] {
    override def initialValue(): WKBReader = new WKBReader()
  }
  def write(g: Geometry): Array[Byte] = wkbWriter.get().write(g)
  def read(b: Array[Byte]): Geometry = wkbReader.get().read(b)

  def register(): Unit =
    UDTRegistration.register(classOf[Geometry].getName, classOf[GeometryUDT].getName)

  def isGeometryType(dt: DataType): Boolean = dt match {
    case _: GeometryUDT => true
    case _ => false
  }
}
