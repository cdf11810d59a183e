package graft.expressions

import java.nio.{ByteBuffer, ByteOrder}

import graft.core._
import graft.udt.TileUDT
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._

/**
 * Local (cell-wise) aggregates: aggregate a column of aligned tiles into
 * one tile per group, cell by cell. NoData cells are the aggregation
 * identity ("biased" ops), per the reference's DataBiasedOp
 * (/root/reference/core/src/main/scala/org/locationtech/rasterframes/util/DataBiasedOp.scala)
 * and LocalStatsAggregate.scala:44-178. Buffers are primitive double/long
 * arrays → bounded size, spill-friendly, mergeable in any order.
 */
final class LocalAggBuf(var n: Int, val arrays: Array[Array[Double]])

abstract class LocalTileAggBase extends TypedImperativeAggregate[LocalAggBuf]
    with UnaryLike[Expression] {
  def child: Expression
  /** number of parallel accumulator arrays */
  protected def arity: Int
  /** fold one tile's cell (data cells only) into the accumulators at index i */
  protected def fold(buf: LocalAggBuf, i: Int, v: Double): Unit
  /** merge accumulators of two buffers at index i */
  protected def mergeAt(a: LocalAggBuf, b: LocalAggBuf, i: Int): Unit
  protected def init: Double = Double.NaN

  /** cols/rows captured at first update (all tiles must be aligned) */
  @transient private var dims: (Int, Int) = _
  @transient protected lazy val ext: Any => Tile = tileExtractor(child.dataType)

  override def createAggregationBuffer(): LocalAggBuf = new LocalAggBuf(0, Array.fill(arity)(null))

  private def ensure(buf: LocalAggBuf, size: Int): Unit =
    if (buf.n == 0) {
      buf.n = size
      var k = 0
      while (k < arity) { buf.arrays(k) = Array.fill(size)(init); k += 1 }
    }

  override def update(buf: LocalAggBuf, input: InternalRow): LocalAggBuf = {
    val v = child.eval(input)
    if (v != null) {
      val t = ext(v)
      if (dims == null) dims = (t.cols, t.rows)
      ensure(buf, t.size)
      require(t.size == buf.n, s"$prettyName: tiles in a group must share dimensions")
      var i = 0
      while (i < buf.n) {
        val d = t.getDouble(i)
        if (NoData.isData(d)) fold(buf, i, d)
        i += 1
      }
    }
    buf
  }
  override def merge(a: LocalAggBuf, b: LocalAggBuf): LocalAggBuf = {
    if (b.n == 0) a
    else if (a.n == 0) b
    else {
      var i = 0
      while (i < a.n) { mergeAt(a, b, i); i += 1 }
      a
    }
  }
  override def serialize(buf: LocalAggBuf): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + 8 + arity * buf.n * 8).order(ByteOrder.LITTLE_ENDIAN)
    // also persist dims (cols) so eval after shuffle knows the shape
    val (c, r) = if (dims != null) dims else (buf.n, 1)
    bb.putInt(c).putInt(r).putInt(buf.n).putInt(arity)
    var k = 0
    while (k < arity) {
      var i = 0
      while (i < buf.n) { bb.putDouble(if (buf.arrays(k) == null) init else buf.arrays(k)(i)); i += 1 }
      k += 1
    }
    bb.array()
  }
  override def deserialize(bytes: Array[Byte]): LocalAggBuf = {
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val c = bb.getInt; val r = bb.getInt
    if (dims == null && c * r > 0) dims = (c, r)
    val n = bb.getInt; val k = bb.getInt
    val buf = new LocalAggBuf(n, Array.ofDim[Array[Double]](k))
    var j = 0
    while (j < k) {
      val a = new Array[Double](n)
      var i = 0
      while (i < n) { a(i) = bb.getDouble; i += 1 }
      buf.arrays(j) = a; j += 1
    }
    buf
  }
  protected def resultDims(buf: LocalAggBuf): (Int, Int) =
    if (dims != null) dims else (buf.n, 1)

  protected def tileOf(values: Array[Double], cols: Int, rows: Int): InternalRow = {
    val t = Tile.empty(CellType.float64, cols, rows)
    var i = 0
    while (i < values.length) { t.setDouble(i, values(i)); i += 1 }
    tileResult(t)
  }
}

/** rf_agg_local_min / rf_agg_local_max (reference: LocalTileOpAggregate.scala:42-102). */
case class LocalTileOpAggregate(
    child: Expression,
    isMin: Boolean,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0) extends LocalTileAggBase {
  override def prettyName: String = if (isMin) "rf_agg_local_min" else "rf_agg_local_max"
  override def dataType: DataType = TileUDT.instance
  override def nullable: Boolean = true
  protected def arity = 1
  protected def fold(buf: LocalAggBuf, i: Int, v: Double): Unit = {
    val a = buf.arrays(0)
    if (NoData.isNoData(a(i)) || (if (isMin) v < a(i) else v > a(i))) a(i) = v
  }
  protected def mergeAt(a: LocalAggBuf, b: LocalAggBuf, i: Int): Unit = {
    val x = a.arrays(0); val y = b.arrays(0)
    if (NoData.isData(y(i)) && (NoData.isNoData(x(i)) || (if (isMin) y(i) < x(i) else y(i) > x(i))))
      x(i) = y(i)
  }
  override def eval(buf: LocalAggBuf): Any =
    if (buf.n == 0) null else {
      val (c, r) = resultDims(buf)
      tileOf(buf.arrays(0), c, r)
    }
  override def withNewMutableAggBufferOffset(o: Int) = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int) = copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** rf_agg_local_mean (reference: LocalMeanAggregate.scala:41-79). */
case class LocalMeanAggregate(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0) extends LocalTileAggBase {
  override def prettyName: String = "rf_agg_local_mean"
  override def dataType: DataType = TileUDT.instance
  override def nullable: Boolean = true
  protected def arity = 2 // sum, count
  override protected def init: Double = Double.NaN
  protected def fold(buf: LocalAggBuf, i: Int, v: Double): Unit = {
    val s = buf.arrays(0); val c = buf.arrays(1)
    if (NoData.isNoData(s(i))) { s(i) = v; c(i) = 1.0 }
    else { s(i) += v; c(i) += 1.0 }
  }
  protected def mergeAt(a: LocalAggBuf, b: LocalAggBuf, i: Int): Unit = {
    val s = a.arrays(0); val c = a.arrays(1)
    val s2 = b.arrays(0); val c2 = b.arrays(1)
    if (NoData.isData(s2(i))) {
      if (NoData.isNoData(s(i))) { s(i) = s2(i); c(i) = c2(i) }
      else { s(i) += s2(i); c(i) += c2(i) }
    }
  }
  override def eval(buf: LocalAggBuf): Any =
    if (buf.n == 0) null else {
      val (cls, rws) = resultDims(buf)
      val out = new Array[Double](buf.n)
      val s = buf.arrays(0); val c = buf.arrays(1)
      var i = 0
      while (i < buf.n) {
        out(i) = if (NoData.isData(s(i)) && c(i) > 0) s(i) / c(i) else Double.NaN
        i += 1
      }
      tileOf(out, cls, rws)
    }
  override def withNewMutableAggBufferOffset(o: Int) = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int) = copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** rf_agg_local_data_cells / rf_agg_local_no_data_cells (reference: LocalCountAggregate.scala:42-111). */
case class LocalCountAggregate(
    child: Expression,
    countData: Boolean,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0) extends LocalTileAggBase {
  override def prettyName: String =
    if (countData) "rf_agg_local_data_cells" else "rf_agg_local_no_data_cells"
  override def dataType: DataType = TileUDT.instance
  override def nullable: Boolean = true
  protected def arity = 1
  override protected def init: Double = 0.0
  // count ALL cells: fold only sees data cells, so we override update instead
  protected def fold(buf: LocalAggBuf, i: Int, v: Double): Unit = ()
  protected def mergeAt(a: LocalAggBuf, b: LocalAggBuf, i: Int): Unit =
    a.arrays(0)(i) += b.arrays(0)(i)
  override def update(buf: LocalAggBuf, input: InternalRow): LocalAggBuf = {
    val v = child.eval(input)
    if (v != null) {
      val t = ext(v)
      if (buf.n == 0) { buf.n = t.size; buf.arrays(0) = Array.fill(t.size)(0.0) }
      val a = buf.arrays(0)
      var i = 0
      while (i < buf.n) {
        val d = t.getDouble(i)
        if (NoData.isData(d) == countData) a(i) += 1.0
        i += 1
      }
    }
    buf
  }
  override def eval(buf: LocalAggBuf): Any =
    if (buf.n == 0) null else {
      val (c, r) = resultDims(buf)
      tileOf(buf.arrays(0), c, r)
    }
  override def withNewMutableAggBufferOffset(o: Int) = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int) = copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** rf_agg_local_stats → struct of 5 tiles {count,min,max,mean,variance}
  * (reference: LocalStatsAggregate.scala:44-178; sample variance like the scalar stats). */
case class LocalStatsAggregate(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0) extends LocalTileAggBase {
  override def prettyName: String = "rf_agg_local_stats"
  override def dataType: DataType = LocalStatsAggregate.schema
  override def nullable: Boolean = true
  protected def arity = 5 // count, min, max, sum, sumSq
  protected def fold(buf: LocalAggBuf, i: Int, v: Double): Unit = {
    val Array(cnt, mn, mx, s, s2) = buf.arrays
    if (NoData.isNoData(cnt(i)) || cnt(i) == 0) {
      cnt(i) = 1; mn(i) = v; mx(i) = v; s(i) = v; s2(i) = v * v
    } else {
      cnt(i) += 1
      if (v < mn(i)) mn(i) = v
      if (v > mx(i)) mx(i) = v
      s(i) += v; s2(i) += v * v
    }
  }
  protected def mergeAt(a: LocalAggBuf, b: LocalAggBuf, i: Int): Unit = {
    val Array(cnt, mn, mx, s, s2) = a.arrays
    val Array(cntB, mnB, mxB, sB, s2B) = b.arrays
    if (NoData.isData(cntB(i)) && cntB(i) > 0) {
      if (NoData.isNoData(cnt(i)) || cnt(i) == 0) {
        cnt(i) = cntB(i); mn(i) = mnB(i); mx(i) = mxB(i); s(i) = sB(i); s2(i) = s2B(i)
      } else {
        cnt(i) += cntB(i)
        if (mnB(i) < mn(i)) mn(i) = mnB(i)
        if (mxB(i) > mx(i)) mx(i) = mxB(i)
        s(i) += sB(i); s2(i) += s2B(i)
      }
    }
  }
  override protected def init: Double = 0.0
  override def eval(buf: LocalAggBuf): Any =
    if (buf.n == 0) null else {
      val (c, r) = resultDims(buf)
      val n = buf.n
      val Array(cnt, mn, mx, s, s2) = buf.arrays
      val mean = new Array[Double](n)
      val variance = new Array[Double](n)
      val minA = new Array[Double](n)
      val maxA = new Array[Double](n)
      var i = 0
      while (i < n) {
        if (cnt(i) > 0) {
          mean(i) = s(i) / cnt(i)
          variance(i) = if (cnt(i) < 2) Double.NaN else (s2(i) - s(i) * mean(i)) / (cnt(i) - 1)
          minA(i) = mn(i); maxA(i) = mx(i)
        } else {
          mean(i) = Double.NaN; variance(i) = Double.NaN
          minA(i) = Double.NaN; maxA(i) = Double.NaN
        }
        i += 1
      }
      InternalRow(
        tileOf(cnt, c, r), tileOf(minA, c, r), tileOf(maxA, c, r),
        tileOf(mean, c, r), tileOf(variance, c, r))
    }
  override def withNewMutableAggBufferOffset(o: Int) = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int) = copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}
object LocalStatsAggregate {
  val schema: StructType = StructType(Seq(
    StructField("count", TileUDT.instance, nullable = true),
    StructField("min", TileUDT.instance, nullable = true),
    StructField("max", TileUDT.instance, nullable = true),
    StructField("mean", TileUDT.instance, nullable = true),
    StructField("variance", TileUDT.instance, nullable = true)))
}
