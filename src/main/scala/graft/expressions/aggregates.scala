package graft.expressions

import java.nio.{ByteBuffer, ByteOrder}

import graft.core._
import graft.udt.TileUDT
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{DeclarativeAggregate, TypedImperativeAggregate}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{GenericArrayData, QuantileSummaries}
import org.apache.spark.sql.types._

/**
 * Columnar (all-cells-of-all-tiles) aggregates.
 * Reference family: /root/reference/core/src/main/scala/org/locationtech/rasterframes/expressions/aggregates/.
 *  - rf_agg_mean: DeclarativeAggregate over (sum, count) — codegen-friendly,
 *    mirrors CellMeanAggregate.scala:44-80.
 *  - rf_agg_stats: TypedImperativeAggregate with a 48-byte primitive buffer
 *    (the reference used the deprecated UDAF API; TypedImperative is the
 *    Spark-3+ idiom and avoids per-row row-codec overhead).
 *  - rf_agg_approx_quantiles: reuses Spark's QuantileSummaries, like
 *    ApproxCellQuantilesAggregate.scala:34-86.
 * All run as partial → shuffle → final, so they scale out like any Spark
 * aggregate (map-side combine keeps shuffle volume at O(groups), not O(rows)).
 */
case class CellMeanAggregate(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Double]] with UnaryLike[Expression] {
  override def prettyName: String = "rf_agg_mean"
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  @transient private lazy val ext = tileExtractor(child.dataType)
  // buf = (sum, count)
  override def createAggregationBuffer(): Array[Double] = Array(0.0, 0.0)
  override def update(buf: Array[Double], input: InternalRow): Array[Double] = {
    val v = child.eval(input)
    if (v != null) {
      val t = ext(v)
      var s = 0.0; var c = 0L
      var i = 0; val n = t.size
      while (i < n) {
        val d = t.getDouble(i)
        if (NoData.isData(d)) { s += d; c += 1 }
        i += 1
      }
      buf(0) += s; buf(1) += c
    }
    buf
  }
  override def merge(a: Array[Double], b: Array[Double]): Array[Double] = {
    a(0) += b(0); a(1) += b(1); a
  }
  override def eval(b: Array[Double]): Any =
    if (b(1) == 0.0) null else b(0) / b(1).toLong
  override def serialize(b: Array[Double]): Array[Byte] = {
    val bb = ByteBuffer.allocate(16).order(ByteOrder.LITTLE_ENDIAN)
    bb.putDouble(b(0)).putDouble(b(1)); bb.array()
  }
  override def deserialize(bytes: Array[Byte]): Array[Double] = {
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    Array(bb.getDouble, bb.getDouble)
  }
  override def withNewMutableAggBufferOffset(o: Int) = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int) = copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** rf_agg_data_cells / rf_agg_no_data_cells (reference: CellCountAggregate.scala:38-101). */
case class CellCountAggregate(
    child: Expression,
    countData: Boolean,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {
  override def prettyName: String = if (countData) "rf_agg_data_cells" else "rf_agg_no_data_cells"
  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  @transient private lazy val ext = tileExtractor(child.dataType)
  override def createAggregationBuffer(): Array[Long] = Array(0L)
  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val t = ext(v)
      buf(0) += (if (countData) t.dataCells else t.noDataCells)
    }
    buf
  }
  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = { a(0) += b(0); a }
  override def eval(b: Array[Long]): Any = b(0)
  override def serialize(b: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
    bb.putLong(b(0)); bb.array()
  }
  override def deserialize(bytes: Array[Byte]): Array[Long] =
    Array(ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN).getLong)
  override def withNewMutableAggBufferOffset(o: Int) = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int) = copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** Mutable accumulator for cell statistics. */
final class StatsBuf(
    var c: Long = 0L, var nd: Long = 0L,
    var min: Double = Double.NaN, var max: Double = Double.NaN,
    var s: Double = 0.0, var s2: Double = 0.0) {
  def add(t: Tile): Unit = {
    val (tc, tnd, tmin, tmax, ts, ts2) = t.statsAccum
    c += tc; nd += tnd; s += ts; s2 += ts2
    if (NoData.isNoData(min) || (NoData.isData(tmin) && tmin < min)) min = tmin
    if (NoData.isNoData(max) || (NoData.isData(tmax) && tmax > max)) max = tmax
  }
  def merge(o: StatsBuf): Unit = {
    c += o.c; nd += o.nd; s += o.s; s2 += o.s2
    if (NoData.isNoData(min) || (NoData.isData(o.min) && o.min < min)) min = o.min
    if (NoData.isNoData(max) || (NoData.isData(o.max) && o.max > max)) max = o.max
  }
  def toBytes: Array[Byte] = {
    val bb = ByteBuffer.allocate(48).order(ByteOrder.LITTLE_ENDIAN)
    bb.putLong(c).putLong(nd).putDouble(min).putDouble(max).putDouble(s).putDouble(s2)
    bb.array()
  }
}
object StatsBuf {
  def fromBytes(b: Array[Byte]): StatsBuf = {
    val bb = ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN)
    new StatsBuf(bb.getLong, bb.getLong, bb.getDouble, bb.getDouble, bb.getDouble, bb.getDouble)
  }
}

/** rf_agg_stats → struct{data_cells,no_data_cells,min,max,mean,variance}. */
case class CellStatsAggregate(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[StatsBuf] with UnaryLike[Expression] {
  override def prettyName: String = "rf_agg_stats"
  override def dataType: DataType = TileStats.statsSchema
  override def nullable: Boolean = true
  @transient private lazy val ext = tileExtractor(child.dataType)
  override def createAggregationBuffer(): StatsBuf = new StatsBuf()
  override def update(buf: StatsBuf, input: InternalRow): StatsBuf = {
    val v = child.eval(input)
    if (v != null) buf.add(ext(v))
    buf
  }
  override def merge(b: StatsBuf, o: StatsBuf): StatsBuf = { b.merge(o); b }
  override def eval(b: StatsBuf): Any = TileStats.toRow((b.c, b.nd, b.min, b.max, b.s, b.s2))
  override def serialize(b: StatsBuf): Array[Byte] = b.toBytes
  override def deserialize(bytes: Array[Byte]): StatsBuf = StatsBuf.fromBytes(bytes)
  override def withNewMutableAggBufferOffset(o: Int) = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int) = copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/**
 * rf_agg_approx_histogram: value→count histogram over all cells of all
 * tiles; exact while distinct values ≤ maxBins, then coarsened by
 * nearest-bin merging (streaming-histogram style, cf. the reference's
 * HistogramAggregate.scala:45-125 which uses GeoTrellis' StreamingHistogram).
 */
case class HistogramAggregate(
    child: Expression,
    maxBins: Int = 80,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.TreeMap[Double, Long]] with UnaryLike[Expression] {
  override def prettyName: String = "rf_agg_approx_histogram"
  override def dataType: DataType = TileHistogram.schema
  override def nullable: Boolean = false
  @transient private lazy val ext = tileExtractor(child.dataType)

  private def compact(m: java.util.TreeMap[Double, Long], target: Int): Unit = {
    while (m.size > target) {
      // merge the two closest adjacent bins into their weighted mean
      var it = m.navigableKeySet().iterator()
      var prev = it.next(); var bestA = prev; var bestB = prev; var bestGap = Double.MaxValue
      while (it.hasNext) {
        val cur = it.next()
        if (cur - prev < bestGap) { bestGap = cur - prev; bestA = prev; bestB = cur }
        prev = cur
      }
      val ca = m.remove(bestA); val cb = m.remove(bestB)
      val merged = (bestA * ca + bestB * cb) / (ca + cb)
      val c0 = m.get(merged)
      m.put(merged, (if (m.containsKey(merged)) c0 else 0L) + ca + cb)
    }
  }

  override def createAggregationBuffer() = new java.util.TreeMap[Double, Long]()
  override def update(m: java.util.TreeMap[Double, Long], input: InternalRow) = {
    val v = child.eval(input)
    if (v != null) {
      val t = ext(v)
      var i = 0; val n = t.size
      while (i < n) {
        val d = t.getDouble(i)
        if (NoData.isData(d)) {
          val c = m.get(d)
          m.put(d, (if (m.containsKey(d)) c else 0L) + 1L)
        }
        i += 1
      }
      if (m.size > maxBins * 4) compact(m, maxBins)
    }
    m
  }
  override def merge(a: java.util.TreeMap[Double, Long], b: java.util.TreeMap[Double, Long]) = {
    val it = b.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val c = a.get(e.getKey)
      a.put(e.getKey, (if (a.containsKey(e.getKey)) c else 0L) + e.getValue)
    }
    if (a.size > maxBins * 4) compact(a, maxBins)
    a
  }
  override def eval(m: java.util.TreeMap[Double, Long]): Any = {
    compact(m, maxBins)
    val bins = new Array[Any](m.size)
    var j = 0
    val it = m.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      bins(j) = InternalRow(e.getKey.doubleValue(), e.getValue.longValue()); j += 1
    }
    InternalRow(new GenericArrayData(bins))
  }
  override def serialize(m: java.util.TreeMap[Double, Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + m.size * 16).order(ByteOrder.LITTLE_ENDIAN)
    bb.putInt(m.size)
    val it = m.entrySet().iterator()
    while (it.hasNext) { val e = it.next(); bb.putDouble(e.getKey); bb.putLong(e.getValue) }
    bb.array()
  }
  override def deserialize(bytes: Array[Byte]) = {
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val n = bb.getInt
    val m = new java.util.TreeMap[Double, Long]()
    var i = 0
    while (i < n) { m.put(bb.getDouble, bb.getLong); i += 1 }
    m
  }
  override def withNewMutableAggBufferOffset(o: Int) = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int) = copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** rf_agg_approx_quantiles over all cells (reference: ApproxCellQuantilesAggregate.scala:34-86,
  * which also delegates to Spark's QuantileSummaries). */
case class ApproxCellQuantilesAggregate(
    child: Expression,
    probabilities: Seq[Double],
    relativeError: Double = 0.00001,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[QuantileSummaries] with UnaryLike[Expression] {
  override def prettyName: String = "rf_agg_approx_quantiles"
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = false
  @transient private lazy val ext = tileExtractor(child.dataType)
  override def createAggregationBuffer(): QuantileSummaries =
    new QuantileSummaries(QuantileSummaries.defaultCompressThreshold, relativeError)
  override def update(qs: QuantileSummaries, input: InternalRow): QuantileSummaries = {
    val v = child.eval(input)
    if (v == null) qs
    else {
      var acc = qs
      val t = ext(v)
      var i = 0; val n = t.size
      while (i < n) {
        val d = t.getDouble(i)
        if (NoData.isData(d)) acc = acc.insert(d)
        i += 1
      }
      acc
    }
  }
  override def merge(a: QuantileSummaries, b: QuantileSummaries): QuantileSummaries =
    a.compress().merge(b.compress())
  override def eval(qs: QuantileSummaries): Any = {
    val c = qs.compress()
    val vals = probabilities.map(p => c.query(p).getOrElse(Double.NaN))
    new GenericArrayData(vals.toArray)
  }
  override def serialize(qs: QuantileSummaries): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val oos = new java.io.ObjectOutputStream(bos)
    oos.writeObject(qs.compress()); oos.close()
    bos.toByteArray
  }
  override def deserialize(bytes: Array[Byte]): QuantileSummaries = {
    val ois = new java.io.ObjectInputStream(new java.io.ByteArrayInputStream(bytes))
    ois.readObject().asInstanceOf[QuantileSummaries]
  }
  override def withNewMutableAggBufferOffset(o: Int) = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int) = copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/**
 * rf_assemble_tile: aggregate (column_index, row_index, value) rows into
 * one tile. Mirror of the reference's TileAssembler
 * (/root/reference/core/src/main/scala/org/locationtech/rasterframes/expressions/TileAssembler.scala:60-200):
 * primitive double-array buffer, NaN-initialized, no boxing on the hot path.
 */
case class TileAssembler(
    colIndex: Expression,
    rowIndex: Expression,
    cellValue: Expression,
    tileCols: Expression,
    tileRows: Expression,
    cellTypeName: Option[String] = None,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Double]] {
  override def prettyName: String = "rf_assemble_tile"
  override def children: Seq[Expression] = Seq(colIndex, rowIndex, cellValue, tileCols, tileRows)
  override def dataType: DataType = TileUDT.instance
  override def nullable: Boolean = true

  // tile dims must be foldable
  @transient private lazy val cols: Int =
    tileCols.eval(null).asInstanceOf[Number].intValue()
  @transient private lazy val rows: Int =
    tileRows.eval(null).asInstanceOf[Number].intValue()
  @transient private lazy val colExt = doubleExtractor(colIndex.dataType)
  @transient private lazy val rowExt = doubleExtractor(rowIndex.dataType)
  @transient private lazy val valExt = doubleExtractor(cellValue.dataType)

  // At aggregation time the children are BoundReferences; reading the
  // primitive slots directly skips three boxed eval()s per CELL — this
  // loop runs once per cell of the whole dataset.
  @transient private lazy val fastUpdate: (Array[Double], InternalRow) => Unit = {
    def intGetter(e: Expression): Option[(InternalRow, Int) => Int] = e match {
      case b: BoundReference => b.dataType match {
        case IntegerType => Some((r, o) => r.getInt(o))
        case ShortType => Some((r, o) => r.getShort(o).toInt)
        case LongType => Some((r, o) => r.getLong(o).toInt)
        case _ => None
      }
      case _ => None
    }
    def dblGetter(e: Expression): Option[(InternalRow, Int) => Double] = e match {
      case b: BoundReference => b.dataType match {
        case DoubleType => Some((r, o) => r.getDouble(o))
        case FloatType => Some((r, o) => r.getFloat(o).toDouble)
        case IntegerType => Some((r, o) => r.getInt(o).toDouble)
        case LongType => Some((r, o) => r.getLong(o).toDouble)
        case _ => None
      }
      case _ => None
    }
    (colIndex, rowIndex, cellValue) match {
      case (cb: BoundReference, rb: BoundReference, vb: BoundReference) =>
        (intGetter(cb), intGetter(rb), dblGetter(vb)) match {
          case (Some(gc), Some(gr), Some(gv)) =>
            val (co, ro, vo) = (cb.ordinal, rb.ordinal, vb.ordinal)
            (buf, row) =>
              if (!row.isNullAt(co) && !row.isNullAt(ro) && !row.isNullAt(vo)) {
                val c = gc(row, co); val r = gr(row, ro)
                if (c >= 0 && c < cols && r >= 0 && r < rows)
                  buf(r * cols + c) = gv(row, vo)
              }
          case _ => genericUpdate
        }
      case _ => genericUpdate
    }
  }
  private def genericUpdate: (Array[Double], InternalRow) => Unit = (buf, input) => {
    val cv = colIndex.eval(input)
    val rv = rowIndex.eval(input)
    val vv = cellValue.eval(input)
    if (cv != null && rv != null && vv != null) {
      val c = colExt(cv).toInt
      val r = rowExt(rv).toInt
      if (c >= 0 && c < cols && r >= 0 && r < rows)
        buf(r * cols + c) = valExt(vv)
    }
  }

  override def createAggregationBuffer(): Array[Double] =
    Array.fill(cols * rows)(Double.NaN)
  override def update(buf: Array[Double], input: InternalRow): Array[Double] = {
    fastUpdate(buf, input)
    buf
  }
  override def merge(a: Array[Double], b: Array[Double]): Array[Double] = {
    var i = 0
    while (i < a.length) { if (NoData.isData(b(i))) a(i) = b(i); i += 1 }
    a
  }
  override def eval(buf: Array[Double]): Any = {
    val ct = cellTypeName.map(CellType.fromName).getOrElse(CellType.float64)
    val t = Tile.empty(ct, cols, rows)
    var i = 0
    while (i < buf.length) { t.setDouble(i, buf(i)); i += 1 }
    tileResult(t)
  }
  override def serialize(buf: Array[Double]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.length * 8).order(ByteOrder.LITTLE_ENDIAN)
    bb.asDoubleBuffer().put(buf)
    bb.array()
  }
  override def deserialize(bytes: Array[Byte]): Array[Double] = {
    val out = new Array[Double](bytes.length / 8)
    ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN).asDoubleBuffer().get(out)
    out
  }
  override def withNewMutableAggBufferOffset(o: Int) = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int) = copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]) =
    copy(cs(0), cs(1), cs(2), cs(3), cs(4))
}
