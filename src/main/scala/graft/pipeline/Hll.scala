package graft.pipeline

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * HyperLogLog: the MAX-mergeable distinct-count sketch — `m` one-byte
 * registers summarize any number of rows, partitions, days or
 * snapshots, and merging is elementwise max, so "distinct users per
 * day, rolled up to month/year/all-time" costs one tiny array per
 * group instead of a re-scan (the classic 100 TB reason Spark's own
 * `approx_count_distinct` keeps HLL±1 buffers; this one trades its
 * bias tables for bit-reproducibility — see Determinism).
 *
 * Layout: `h = splitmix64(key)`; register index = top `p = log2 m`
 * bits; the rank is `1 +` leading zeros of the LOW 32 bits (capped at
 * 33). Register width 32 instead of 58 costs nothing before ~2^32
 * distinct keys per register — 10^12+ keys at m ≥ 256 — and is what
 * keeps the oracle exact: 2^rho stays inside BIGINT and the rank is
 * re-derivable in SQL as `32 - floor(log2(w))` with w < 2^32 exactly
 * representable in a double.
 *
 * Estimator: the raw HLL harmonic mean — `est = α_m·m²/Σ 2^-M_j` —
 * computed ENTIRELY in integers: numerator `α_scaled·m²·2^33`
 * (α scaled by 10^4; `m ≤ 256` keeps it inside Long), denominator
 * `Σ 2^(33-M_j)` (≤ m·2^33), one integral division. No small-range
 * linear-counting branch (it needs `ln`, a float whose rounding an
 * oracle can't pin) — expect the documented raw-HLL bias when
 * n ≲ 2.5·m and size `m` for the regime of interest (σ ≈ 1.04/√m).
 *
 * Scale shape: [[TypedImperativeAggregate]] with an `Array[Long](m)`
 * buffer merged by MAX — map-side partials collapse every partition to
 * one m-long array before the exchange, the same contract as
 * [[CmsBuildAgg]] (ADD) and [[BloomBuildAgg]] (OR).
 *
 * Determinism: register contents and the estimate are pure integer
 * functions of the key set — independent of row order, partitioning
 * and merge shape — and the DuckDB oracle (q_hll) replays hash,
 * registers and division exactly.
 */
object HllSketch {
  /** α_m scaled by 10^4 — the canonical Flajolet–Fusy–Gandouet–Meunier
    * constants for m ∈ {16, 32, 64}, 0.7213/(1+1.079/m) above. */
  def alphaScaled(m: Int): Long = m match {
    case 16 => 6730L
    case 32 => 6970L
    case 64 => 7090L
    case _ => math.round(7213.0 / (1.0 + 1.079 / m))
  }

  def requireShape(m: Int): Unit =
    require(m >= 16 && m <= 256 && (m & (m - 1)) == 0,
      s"m must be a power of two in [16, 256], got $m")

  @inline def register(h: Long, m: Int): Int =
    (h >>> (64 - Integer.numberOfTrailingZeros(m))).toInt

  /** Rank of the low-32-bit window: 1 + leading zeros within 32 bits,
    * 33 when the window is all zero. */
  @inline def rho(h: Long): Int = {
    val w = h & 0xffffffffL
    if (w == 0L) 33 else 33 - (64 - java.lang.Long.numberOfLeadingZeros(w))
  }
}

/** `pl_hll_agg(keyHash, m)` — build the register array (`array<bigint>`
  * of length m, values in [0, 33]). */
case class HllBuildAgg(
    child: Expression,
    m: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {
  HllSketch.requireShape(m)
  override def prettyName: String = "pl_hll_agg"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | IntegerType => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects an integral key column (hash strings first, e.g. pl_fingerprint)")
  }
  override def createAggregationBuffer(): Array[Long] = new Array[Long](m)
  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val key = v match {
        case i: java.lang.Integer => i.toLong
        case l: java.lang.Long => l.longValue()
      }
      val h = Hashing.mix64(key)
      val reg = HllSketch.register(h, m)
      val r = HllSketch.rho(h)
      if (r > buf(reg)) buf(reg) = r.toLong
    }
    buf
  }
  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { if (b(i) > a(i)) a(i) = b(i); i += 1 }
    a
  }
  override def eval(b: Array[Long]): Any = new GenericArrayData(b)
  override def serialize(b: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(b.length * 8).order(ByteOrder.LITTLE_ENDIAN)
    bb.asLongBuffer().put(b)
    bb.array()
  }
  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val out = new Array[Long](bytes.length / 8)
    ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN).asLongBuffer().get(out)
    out
  }
  override def withNewMutableAggBufferOffset(o: Int): HllBuildAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): HllBuildAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): HllBuildAgg =
    copy(child = c)
}

/** `pl_hll_merge(sketch, m)` — roll finer-grained sketches up
  * (daily → monthly → all-time) by elementwise MAX, with the same
  * bounded `Array[Long](m)` state as the build aggregate — NOT a
  * `collect_list` + fold, which would hold every input sketch. */
case class HllMergeAgg(
    child: Expression,
    m: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {
  HllSketch.requireShape(m)
  override def prettyName: String = "pl_hll_merge"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects an array<bigint> sketch column")
  }
  override def createAggregationBuffer(): Array[Long] = new Array[Long](m)
  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      require(arr.numElements() == m,
        s"pl_hll_merge: sketch has ${arr.numElements()} registers, expected $m")
      var i = 0
      while (i < m) {
        val r = arr.getLong(i)
        if (r > buf(i)) buf(i) = r
        i += 1
      }
    }
    buf
  }
  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { if (b(i) > a(i)) a(i) = b(i); i += 1 }
    a
  }
  override def eval(b: Array[Long]): Any = new GenericArrayData(b)
  override def serialize(b: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(b.length * 8).order(ByteOrder.LITTLE_ENDIAN)
    bb.asLongBuffer().put(b)
    bb.array()
  }
  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val out = new Array[Long](bytes.length / 8)
    ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN).asLongBuffer().get(out)
    out
  }
  override def withNewMutableAggBufferOffset(o: Int): HllMergeAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): HllMergeAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): HllMergeAgg =
    copy(child = c)
}

/** Column surface for the HLL sketch. */
object Hll {
  import graft.expressions.{asColumn => c, asExpr}

  /** Aggregate a long/int key column into an m-register sketch. */
  def sketch(keyHash: Column, m: Int = 64): Column =
    c(HllBuildAgg(asExpr(keyHash), m).toAggregateExpression())

  /** Merge sketches from finer groups (daily → monthly → all-time):
    * elementwise MAX with bounded m-register state. */
  def merge(sketch: Column, m: Int = 64): Column =
    c(HllMergeAgg(asExpr(sketch), m).toAggregateExpression())

  /** Integer-exact raw-HLL estimate of a materialized register array.
    * `Σ 2^(33-M_j)` then one integral division — bit-identical on any
    * engine (see [[HllSketch]] scaladoc). */
  def estimate(sketch: Column, m: Int = 64): Column = {
    HllSketch.requireShape(m)
    val ssum = org.apache.spark.sql.functions.aggregate(sketch, lit(0L), (acc, r) =>
      acc + call_function("shiftleft", lit(1L), lit(33) - r.cast("int")))
    val num = lit(HllSketch.alphaScaled(m) * m.toLong * m.toLong * 8589934592L)
    call_function("div", num, ssum * lit(10000L))
  }
}
