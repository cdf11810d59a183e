package graft.core

import java.nio.{ByteBuffer, ByteOrder}

/**
 * A 2-D single-band grid of cells with a fixed [[CellType]].
 *
 * Independent re-implementation of the tile abstraction the reference
 * delegates to GeoTrellis (reference behavior observed at
 * /root/reference/core/src/main/scala/org/apache/spark/sql/rf/TileUDT.scala:49-124).
 * Cells are stored row-major in a primitive array of the storage type.
 *
 * Two views of every cell:
 *  - integer view: `get` (NoData → Int.MinValue)
 *  - double view: `getDouble` (NoData → NaN)
 */
trait Tile extends Serializable {
  def cellType: CellType
  def cols: Int
  def rows: Int
  final def size: Int = cols * rows
  final def dimensions: (Int, Int) = (cols, rows)

  /** Integer view; NoData → Int.MinValue. */
  def get(i: Int): Int
  /** Double view; NoData → NaN. */
  def getDouble(i: Int): Double

  final def get(col: Int, row: Int): Int = get(row * cols + col)
  final def getDouble(col: Int, row: Int): Double = getDouble(row * cols + col)

  /** Raw storage-domain value (no NoData translation), as double. */
  def getRawDouble(i: Int): Double

  /** Cell payload in native layout, little-endian. */
  def toBytes: Array[Byte]

  def mutableCopy: MutableTile

  /** Numeric conversion to another cell type (values preserved, clamped to range; NoData maps to NoData). */
  def convert(ct: CellType): Tile = {
    val out = Tile.empty(ct, cols, rows)
    var i = 0
    val n = size
    if (ct.isFloating) {
      while (i < n) { out.setDouble(i, getDouble(i)); i += 1 }
    } else {
      // clamp into the target's representable range — narrowing must
      // saturate (e.g. 300.0 → uint8 255), never wrap to garbage
      val lo = ct.base.minValue
      val hi = ct.base.maxValue
      while (i < n) {
        val v = getDouble(i)
        if (NoData.isNoData(v)) out.setDouble(i, Double.NaN)
        else out.setDouble(i, math.min(hi, math.max(lo, math.rint(v))))
        i += 1
      }
    }
    out
  }

  /** Reinterpret the same stored bits under a different cell type (same base width). */
  def interpretAs(ct: CellType): Tile = Tile.fromBytes(toBytes, ct, cols, rows)

  /** Same values, different NoData sentinel. Cells equal to the new sentinel become NoData. */
  def withNoData(nd: Double): Tile = interpretAs(cellType.withNoData(nd))

  /** Map over data cells (NoData stays NoData), result keeps this cell type. */
  def mapDouble(f: Double => Double): Tile = {
    val out = Tile.empty(cellType, cols, rows)
    var i = 0
    val n = size
    while (i < n) {
      val v = getDouble(i)
      out.setDouble(i, if (NoData.isData(v)) f(v) else Double.NaN)
      i += 1
    }
    out
  }

  /** Cell-wise combine; NoData in either input → NoData out; output cell type = union. */
  def combineDouble(other: Tile)(f: (Double, Double) => Double): Tile = {
    require(cols == other.cols && rows == other.rows,
      s"Tile dimension mismatch: ${cols}x$rows vs ${other.cols}x${other.rows}")
    val out = Tile.empty(cellType.union(other.cellType), cols, rows)
    var i = 0
    val n = size
    while (i < n) {
      val a = getDouble(i)
      val b = other.getDouble(i)
      out.setDouble(i, if (NoData.isData(a) && NoData.isData(b)) f(a, b) else Double.NaN)
      i += 1
    }
    out
  }

  // ---- statistics over data cells (index order; exact for integer-valued cells) ----
  def dataCells: Long = {
    var c = 0L; var i = 0; val n = size
    while (i < n) { if (NoData.isData(getDouble(i))) c += 1; i += 1 }
    c
  }
  def noDataCells: Long = size - dataCells
  def sum: Double = {
    var s = 0.0; var i = 0; val n = size
    while (i < n) { val v = getDouble(i); if (NoData.isData(v)) s += v; i += 1 }
    s
  }
  def minCell: Double = {
    var m = Double.NaN; var i = 0; val n = size
    while (i < n) { val v = getDouble(i); if (NoData.isData(v) && (NoData.isNoData(m) || v < m)) m = v; i += 1 }
    m
  }
  def maxCell: Double = {
    var m = Double.NaN; var i = 0; val n = size
    while (i < n) { val v = getDouble(i); if (NoData.isData(v) && (NoData.isNoData(m) || v > m)) m = v; i += 1 }
    m
  }
  /** (dataCells, noDataCells, min, max, sum, sumSq) in one pass. */
  def statsAccum: (Long, Long, Double, Double, Double, Double) = {
    var c = 0L; var min = Double.NaN; var max = Double.NaN; var s = 0.0; var s2 = 0.0
    var i = 0; val n = size
    while (i < n) {
      val v = getDouble(i)
      if (NoData.isData(v)) {
        c += 1; s += v; s2 += v * v
        if (NoData.isNoData(min) || v < min) min = v
        if (NoData.isNoData(max) || v > max) max = v
      }
      i += 1
    }
    (c, n - c, min, max, s, s2)
  }
  def mean: Double = {
    val (c, _, _, _, s, _) = statsAccum
    if (c == 0) Double.NaN else s / c
  }
  def exists(p: Double => Boolean): Boolean = {
    var i = 0; val n = size
    while (i < n) { val v = getDouble(i); if (NoData.isData(v) && p(v)) return true; i += 1 }
    false
  }
  def forAll(p: Double => Boolean): Boolean = {
    var i = 0; val n = size
    while (i < n) { val v = getDouble(i); if (NoData.isNoData(v) || !p(v)) return false; i += 1 }
    true
  }
  def isNoDataTile: Boolean = {
    var i = 0; val n = size
    while (i < n) { if (NoData.isData(getDouble(i))) return false; i += 1 }
    true
  }

  def toArrayDouble: Array[Double] = {
    val n = size
    val out = new Array[Double](n)
    var i = 0
    while (i < n) { out(i) = getDouble(i); i += 1 }
    out
  }
  def toArrayInt: Array[Int] = {
    val n = size
    val out = new Array[Int](n)
    var i = 0
    while (i < n) { out(i) = get(i); i += 1 }
    out
  }

  override def equals(o: Any): Boolean = o match {
    case t: Tile =>
      t.cellType == cellType && t.cols == cols && t.rows == rows &&
        java.util.Arrays.equals(t.toBytes, toBytes)
    case _ => false
  }
  override def hashCode: Int =
    (cellType.name.hashCode * 31 + cols) * 31 + rows * 31 + java.util.Arrays.hashCode(toBytes)

  override def toString: String = s"Tile($cellType,$cols x $rows)"
}

/** A tile whose cells can be written in place. */
trait MutableTile extends Tile {
  /** Set from the double view; NaN writes the NoData sentinel (or 0 if the type has none). */
  def setDouble(i: Int, v: Double): Unit
  def set(i: Int, v: Int): Unit = setDouble(i, if (NoData.isData(v)) v.toDouble else Double.NaN)
  final def setDouble(col: Int, row: Int, v: Double): Unit = setDouble(row * cols + col, v)
}

object Tile {
  /** Allocate a tile of the given type filled with NoData (or zero for raw types). */
  def empty(ct: CellType, cols: Int, rows: Int): MutableTile = {
    val n = cols * rows
    ct.base match {
      case CellBase.Bit => new BitArrayTile(new Array[Byte]((n + 7) / 8), cols, rows, ct)
      case CellBase.Int8 | CellBase.UInt8 =>
        val t = new ByteArrayTile(new Array[Byte](n), cols, rows, ct); fill(t); t
      case CellBase.Int16 | CellBase.UInt16 =>
        val t = new ShortArrayTile(new Array[Short](n), cols, rows, ct); fill(t); t
      case CellBase.Int32 =>
        val t = new IntArrayTile(new Array[Int](n), cols, rows, ct); fill(t); t
      case CellBase.Float32 =>
        val t = new FloatArrayTile(new Array[Float](n), cols, rows, ct); fill(t); t
      case CellBase.Float64 =>
        val t = new DoubleArrayTile(new Array[Double](n), cols, rows, ct); fill(t); t
    }
  }
  private def fill(t: MutableTile): Unit =
    if (t.cellType.hasNoData) {
      var i = 0; val n = t.size
      while (i < n) { t.setDouble(i, Double.NaN); i += 1 }
    }

  def fromDoubles(values: Array[Double], ct: CellType, cols: Int, rows: Int): MutableTile = {
    val t = empty(ct, cols, rows)
    val n = math.min(values.length, cols * rows)
    var i = 0
    while (i < n) { t.setDouble(i, values(i)); i += 1 }
    t
  }

  def constant(value: Double, ct: CellType, cols: Int, rows: Int): Tile = {
    val t = empty(ct, cols, rows)
    var i = 0; val n = t.size
    while (i < n) { t.setDouble(i, value); i += 1 }
    t
  }

  /** Deserialize from the native little-endian payload. */
  def fromBytes(bytes: Array[Byte], ct: CellType, cols: Int, rows: Int): MutableTile = {
    val n = cols * rows
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    ct.base match {
      case CellBase.Bit =>
        new BitArrayTile(java.util.Arrays.copyOf(bytes, (n + 7) / 8), cols, rows, ct)
      case CellBase.Int8 | CellBase.UInt8 =>
        new ByteArrayTile(java.util.Arrays.copyOf(bytes, n), cols, rows, ct)
      case CellBase.Int16 | CellBase.UInt16 =>
        val a = new Array[Short](n); bb.asShortBuffer().get(a); new ShortArrayTile(a, cols, rows, ct)
      case CellBase.Int32 =>
        val a = new Array[Int](n); bb.asIntBuffer().get(a); new IntArrayTile(a, cols, rows, ct)
      case CellBase.Float32 =>
        val a = new Array[Float](n); bb.asFloatBuffer().get(a); new FloatArrayTile(a, cols, rows, ct)
      case CellBase.Float64 =>
        val a = new Array[Double](n); bb.asDoubleBuffer().get(a); new DoubleArrayTile(a, cols, rows, ct)
    }
  }
}

// ---------------- concrete array tiles ----------------

final class BitArrayTile(val array: Array[Byte], val cols: Int, val rows: Int, val cellType: CellType)
    extends MutableTile {
  @inline private def bit(i: Int): Int = (array(i >> 3) >> (i & 7)) & 1
  def get(i: Int): Int = bit(i)
  def getDouble(i: Int): Double = bit(i).toDouble
  def getRawDouble(i: Int): Double = bit(i).toDouble
  def setDouble(i: Int, v: Double): Unit = {
    val b = if (NoData.isData(v) && v != 0.0) 1 else 0
    val idx = i >> 3; val m = 1 << (i & 7)
    array(idx) = (if (b == 1) array(idx) | m else array(idx) & ~m).toByte
  }
  def toBytes: Array[Byte] = array.clone()
  def mutableCopy: MutableTile = new BitArrayTile(array.clone(), cols, rows, cellType)
}

final class ByteArrayTile(val array: Array[Byte], val cols: Int, val rows: Int, val cellType: CellType)
    extends MutableTile {
  private val unsigned = cellType.base == CellBase.UInt8
  private val hasND = cellType.hasNoData
  private val nd: Int = if (hasND) cellType.noDataValue.toInt else 0
  @inline private def raw(i: Int): Int = if (unsigned) array(i) & 0xff else array(i).toInt
  def get(i: Int): Int = { val v = raw(i); if (hasND && v == nd) Int.MinValue else v }
  def getDouble(i: Int): Double = { val v = raw(i); if (hasND && v == nd) Double.NaN else v.toDouble }
  def getRawDouble(i: Int): Double = raw(i).toDouble
  def setDouble(i: Int, v: Double): Unit =
    array(i) = if (NoData.isNoData(v)) (if (hasND) nd.toByte else 0) else v.toLong.toByte
  def toBytes: Array[Byte] = array.clone()
  def mutableCopy: MutableTile = new ByteArrayTile(array.clone(), cols, rows, cellType)
}

final class ShortArrayTile(val array: Array[Short], val cols: Int, val rows: Int, val cellType: CellType)
    extends MutableTile {
  private val unsigned = cellType.base == CellBase.UInt16
  private val hasND = cellType.hasNoData
  private val nd: Int = if (hasND) cellType.noDataValue.toInt else 0
  @inline private def raw(i: Int): Int = if (unsigned) array(i) & 0xffff else array(i).toInt
  def get(i: Int): Int = { val v = raw(i); if (hasND && v == nd) Int.MinValue else v }
  def getDouble(i: Int): Double = { val v = raw(i); if (hasND && v == nd) Double.NaN else v.toDouble }
  def getRawDouble(i: Int): Double = raw(i).toDouble
  def setDouble(i: Int, v: Double): Unit =
    array(i) = if (NoData.isNoData(v)) (if (hasND) nd.toShort else 0) else v.toLong.toShort
  def toBytes: Array[Byte] = {
    val bb = ByteBuffer.allocate(array.length * 2).order(ByteOrder.LITTLE_ENDIAN)
    bb.asShortBuffer().put(array); bb.array()
  }
  def mutableCopy: MutableTile = new ShortArrayTile(array.clone(), cols, rows, cellType)
}

final class IntArrayTile(val array: Array[Int], val cols: Int, val rows: Int, val cellType: CellType)
    extends MutableTile {
  private val hasND = cellType.hasNoData
  private val nd: Int = if (hasND) cellType.noDataValue.toInt else 0
  def get(i: Int): Int = { val v = array(i); if (hasND && v == nd) Int.MinValue else v }
  def getDouble(i: Int): Double = { val v = array(i); if (hasND && v == nd) Double.NaN else v.toDouble }
  def getRawDouble(i: Int): Double = array(i).toDouble
  def setDouble(i: Int, v: Double): Unit =
    array(i) = if (NoData.isNoData(v)) (if (hasND) nd else 0) else v.toLong.toInt
  def toBytes: Array[Byte] = {
    val bb = ByteBuffer.allocate(array.length * 4).order(ByteOrder.LITTLE_ENDIAN)
    bb.asIntBuffer().put(array); bb.array()
  }
  def mutableCopy: MutableTile = new IntArrayTile(array.clone(), cols, rows, cellType)
}

final class FloatArrayTile(val array: Array[Float], val cols: Int, val rows: Int, val cellType: CellType)
    extends MutableTile {
  private val hasND = cellType.hasNoData
  private val ndIsNaN = hasND && cellType.noDataValue != cellType.noDataValue
  private val nd: Float = if (hasND && !ndIsNaN) cellType.noDataValue.toFloat else Float.NaN
  def get(i: Int): Int = { val d = getDouble(i); if (NoData.isData(d)) d.toInt else Int.MinValue }
  def getDouble(i: Int): Double = {
    val v = array(i)
    if (hasND && (if (ndIsNaN) v != v else v == nd)) Double.NaN else v.toDouble
  }
  def getRawDouble(i: Int): Double = array(i).toDouble
  def setDouble(i: Int, v: Double): Unit =
    array(i) = if (NoData.isNoData(v)) (if (hasND) nd else Float.NaN) else v.toFloat
  def toBytes: Array[Byte] = {
    val bb = ByteBuffer.allocate(array.length * 4).order(ByteOrder.LITTLE_ENDIAN)
    bb.asFloatBuffer().put(array); bb.array()
  }
  def mutableCopy: MutableTile = new FloatArrayTile(array.clone(), cols, rows, cellType)
}

final class DoubleArrayTile(val array: Array[Double], val cols: Int, val rows: Int, val cellType: CellType)
    extends MutableTile {
  private val hasND = cellType.hasNoData
  private val ndIsNaN = hasND && cellType.noDataValue != cellType.noDataValue
  private val nd: Double = cellType.noDataValue
  def get(i: Int): Int = { val d = getDouble(i); if (NoData.isData(d)) d.toInt else Int.MinValue }
  def getDouble(i: Int): Double = {
    val v = array(i)
    if (hasND && (if (ndIsNaN) v != v else v == nd)) Double.NaN else v
  }
  def getRawDouble(i: Int): Double = array(i)
  def setDouble(i: Int, v: Double): Unit =
    array(i) = if (NoData.isNoData(v)) (if (hasND) nd else Double.NaN) else v
  def toBytes: Array[Byte] = {
    val bb = ByteBuffer.allocate(array.length * 8).order(ByteOrder.LITTLE_ENDIAN)
    bb.asDoubleBuffer().put(array); bb.array()
  }
  def mutableCopy: MutableTile = new DoubleArrayTile(array.clone(), cols, rows, cellType)
}
