package graft.core

/**
 * Cell-type system for raster tiles: a storage base type plus a NoData
 * policy. Mirrors the semantics of the reference's cell types
 * (see /root/reference/core/src/main/scala/org/locationtech/rasterframes/functions/package.scala:140-157
 * and TileUDT name parsing at org/apache/spark/sql/rf/TileUDT.scala:109-116)
 * but is an independent implementation over plain JVM primitives.
 *
 * Conventions (shared with the reference):
 *  - Integer view of a NoData cell is `Int.MinValue` (`NODATA`).
 *  - Double view of a NoData cell is `Double.NaN`.
 *  - "raw" variants have no NoData; default variants use a per-base
 *    sentinel (type min for signed ints, 0 for unsigned, NaN for float);
 *    "udN" variants use a user-defined sentinel.
 */
sealed abstract class CellBase(
    val kind: String,
    val bytes: Int,
    val isFloating: Boolean,
    /** Min/max representable data values in the storage domain. */
    val minValue: Double,
    val maxValue: Double,
    /** Default NoData sentinel for the non-raw, non-ud variant. */
    val defaultNoData: Double
) extends Serializable

object CellBase {
  case object Bit extends CellBase("bool", 1, false, 0d, 1d, Double.NaN) // no NoData representable
  case object Int8 extends CellBase("int8", 1, false, (Byte.MinValue + 1).toDouble, Byte.MaxValue.toDouble, Byte.MinValue.toDouble)
  case object UInt8 extends CellBase("uint8", 1, false, 1d, 255d, 0d)
  case object Int16 extends CellBase("int16", 2, false, (Short.MinValue + 1).toDouble, Short.MaxValue.toDouble, Short.MinValue.toDouble)
  case object UInt16 extends CellBase("uint16", 2, false, 1d, 65535d, 0d)
  case object Int32 extends CellBase("int32", 4, false, (Int.MinValue + 1).toDouble, Int.MaxValue.toDouble, Int.MinValue.toDouble)
  case object Float32 extends CellBase("float32", 4, true, Float.MinValue.toDouble, Float.MaxValue.toDouble, Double.NaN)
  case object Float64 extends CellBase("float64", 8, true, Double.MinValue, Double.MaxValue, Double.NaN)

  val all: Seq[CellBase] = Seq(Bit, Int8, UInt8, Int16, UInt16, Int32, Float32, Float64)
}

sealed trait NoDataPolicy extends Serializable
object NoDataPolicy {
  /** "raw": no NoData; every bit pattern is data. */
  case object None extends NoDataPolicy
  /** Default sentinel for the base type. */
  case object Default extends NoDataPolicy
  /** User-defined sentinel (stored in the storage domain). */
  final case class UserDefined(value: Double) extends NoDataPolicy
}

final case class CellType(base: CellBase, policy: NoDataPolicy) extends Serializable {
  import NoDataPolicy._

  def name: String = policy match {
    case None => if (base == CellBase.Bit) "bool" else base.kind + "raw"
    case Default => base.kind
    case UserDefined(v) =>
      val vs = if (base.isFloating) {
        if (v == v.toLong.toDouble) v.toLong.toString else v.toString
      } else v.toLong.toString
      s"${base.kind}ud$vs"
  }

  def bytes: Int = base.bytes
  def isFloating: Boolean = base.isFloating
  def hasNoData: Boolean = policy != None && base != CellBase.Bit

  /** NoData sentinel in the storage domain; NaN when policy is Default on floats. */
  def noDataValue: Double = policy match {
    case None => Double.NaN
    case Default => base.defaultNoData
    case UserDefined(v) => v
  }

  /** Is this storage-domain value NoData under this cell type? */
  def isNoData(v: Double): Boolean = policy match {
    case None => false
    case Default => if (base.isFloating) v != v else v == base.defaultNoData
    case UserDefined(nd) => if (nd != nd) v != v else v == nd
  }
  def isNoData(v: Int): Boolean = policy match {
    case None => false
    case Default => !base.isFloating && v == base.defaultNoData.toInt
    case UserDefined(nd) => v == nd.toInt
  }

  def withNoData(v: Double): CellType = copy(policy = UserDefined(v))
  def withDefaultNoData: CellType = copy(policy = Default)
  def withoutNoData: CellType = copy(policy = None)

  /** Widest-common type for binary ops (float ∪ int → float; wider wins; NoData if either side has it). */
  def union(other: CellType): CellType = {
    import CellBase._
    def rank(b: CellBase): Int = b match {
      case Bit => 0; case Int8 => 1; case UInt8 => 2; case Int16 => 3
      case UInt16 => 4; case Int32 => 5; case Float32 => 6; case Float64 => 7
    }
    val b = if (rank(base) >= rank(other.base)) base else other.base
    val p: NoDataPolicy =
      if (hasNoData || other.hasNoData) Default
      else None
    // preserve user-defined only if bases equal and both sides agree
    val pol = (policy, other.policy) match {
      case (UserDefined(a), UserDefined(c)) if a == c && base == other.base => UserDefined(a)
      case _ => p
    }
    CellType(b, pol)
  }

  override def toString: String = name
}

object CellType {
  import CellBase._
  import NoDataPolicy._

  val bool: CellType = CellType(Bit, None)
  val int8raw: CellType = CellType(Int8, None)
  val int8: CellType = CellType(Int8, Default)
  val uint8raw: CellType = CellType(UInt8, None)
  val uint8: CellType = CellType(UInt8, Default)
  val int16raw: CellType = CellType(Int16, None)
  val int16: CellType = CellType(Int16, Default)
  val uint16raw: CellType = CellType(UInt16, None)
  val uint16: CellType = CellType(UInt16, Default)
  val int32raw: CellType = CellType(Int32, None)
  val int32: CellType = CellType(Int32, Default)
  val float32raw: CellType = CellType(Float32, None)
  val float32: CellType = CellType(Float32, Default)
  val float64raw: CellType = CellType(Float64, None)
  val float64: CellType = CellType(Float64, Default)

  /** Every fixed (non-user-defined-NoData) cell type, narrowest first —
    * the list `rf_cell_types` returns (reference:
    * functions/package.scala:140-157 builds the same 15 names). */
  val allNames: Seq[String] = Seq(
    bool, int8raw, int8, uint8raw, uint8, int16raw, int16,
    uint16raw, uint16, int32raw, int32, float32raw, float32,
    float64raw, float64
  ).map(_.name)

  private val fixed: Map[String, CellType] = Seq(
    bool, int8raw, int8, uint8raw, uint8, int16raw, int16,
    uint16raw, uint16, int32raw, int32, float32raw, float32,
    float64raw, float64
  ).map(ct => ct.name -> ct).toMap ++ Map("boolraw" -> bool)

  private val baseByKind: Map[String, CellBase] =
    CellBase.all.map(b => b.kind -> b).toMap

  /** Parse a cell-type name, e.g. "uint16ud255", "float32raw", "int32". */
  def fromName(name: String): CellType =
    fixed.getOrElse(name, {
      val i = name.indexOf("ud")
      require(i > 0, s"Unknown cell type: $name")
      val kind = name.substring(0, i)
      val nd = name.substring(i + 2).toDouble
      val base = baseByKind.getOrElse(kind, throw new IllegalArgumentException(s"Unknown cell type: $name"))
      CellType(base, UserDefined(nd))
    })
}

/** NoData guards for the two cell views (shared convention with the reference). */
object NoData {
  final val intNoData: Int = Int.MinValue
  @inline def isData(v: Int): Boolean = v != Int.MinValue
  @inline def isNoData(v: Int): Boolean = v == Int.MinValue
  @inline def isData(v: Double): Boolean = v == v
  @inline def isNoData(v: Double): Boolean = v != v
}
