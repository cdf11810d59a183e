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
 * Count-min sketch: a fixed-size, MERGEABLE frequency summary — the
 * standard heavy-hitters machinery for streams and shuffles that cannot
 * afford an exact per-key count. `depth × width` counters; every key
 * increments one counter per row (bucket = splitmix64 of
 * `key XOR row·golden` masked to the power-of-two width), and an
 * estimate reads the MINIMUM across rows — never an underestimate,
 * over by at most εN with probability 1−δ (ε ≈ e/width, δ ≈ e^−depth).
 *
 * Scale shape: the aggregate is a [[TypedImperativeAggregate]] with an
 * `Array[Long](depth·width)` buffer that merges by elementwise ADD —
 * map-side partials combine like any sum, so a 100 TB scan reduces to
 * one `depth·width` array per partition before the exchange (the same
 * contract as [[BloomBuildAgg]], which merges by OR). Estimation is a
 * pure column composition over the materialized sketch (built-in HOFs +
 * the codegen'd [[Mix64]]), so probing N candidate keys is a per-row
 * scalar — no shuffle, no UDF.
 *
 * Determinism: counters are exact integers and the hash recipe is the
 * repo-standard splitmix64 (`Hashing.mix64`), so the whole sketch —
 * and every estimate — is bit-reproducible and re-derivable in the
 * DuckDB oracle (q_heavy_hitters replays bucket assignment and the
 * min-over-rows in SQL with the same HUGEINT hash emulation).
 */
object CmsHash {
  /** Golden-ratio odd constant — the same per-row seed multiplier the
    * minhash permutations use. */
  val Gold = 0x9e3779b97f4a7c15L

  def requireShape(depth: Int, width: Int): Unit = {
    require(depth > 0 && depth <= 16, s"depth must be in [1,16], got $depth")
    require(width > 0 && (width & (width - 1)) == 0,
      s"width must be a positive power of two, got $width")
  }

  /** Row `r`'s counter index for `key`: unsigned-mod by the power-of-two
    * width is a mask, matching the oracle's `% width` on HUGEINT. */
  @inline def bucket(key: Long, r: Int, width: Int): Int =
    (Hashing.mix64(key ^ (r.toLong * Gold)) & (width - 1)).toInt
}

/** `pl_cms_agg(keyHash, depth, width)` — build the sketch as
  * `array<bigint>` of length depth·width (row-major). */
case class CmsBuildAgg(
    child: Expression,
    depth: Int,
    width: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {
  CmsHash.requireShape(depth, width)
  override def prettyName: String = "pl_cms_agg"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | IntegerType => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects an integral key column (hash strings first, e.g. pl_fingerprint)")
  }
  override def createAggregationBuffer(): Array[Long] = new Array[Long](depth * width)
  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val key = v match {
        case i: java.lang.Integer => i.toLong
        case l: java.lang.Long => l.longValue()
      }
      var r = 0
      while (r < depth) {
        buf(r * width + CmsHash.bucket(key, r, width)) += 1L
        r += 1
      }
    }
    buf
  }
  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
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
  override def withNewMutableAggBufferOffset(o: Int): CmsBuildAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): CmsBuildAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): CmsBuildAgg =
    copy(child = c)
}

/** Column surface for the count-min sketch. */
object Cms {
  import graft.expressions.{asColumn => c, asExpr}

  /** Aggregate a long/int key column into a depth×width sketch. */
  def sketch(keyHash: Column, depth: Int = 4, width: Int = 1024): Column =
    c(CmsBuildAgg(asExpr(keyHash), depth, width).toAggregateExpression())

  /** Point estimate for `keyHash` against a materialized `sketch`
    * column: min (`least`) across rows of the row's counter. The per-row
    * seeds `r·golden` are wrap-around products precomputed as literals
    * (depth is a plan-time constant — ANSI column math would overflow),
    * so the probe is a flat chain of codegen'd built-ins + [[Mix64]]. */
  def estimate(sketch: Column, keyHash: Column, depth: Int = 4,
      width: Int = 1024): Column = {
    CmsHash.requireShape(depth, width)
    val probes = (0 until depth).map { r =>
      val h = c(Mix64(asExpr(keyHash.bitwiseXOR(lit(r.toLong * CmsHash.Gold)))))
      element_at(sketch, lit(r * width) + (h.bitwiseAND(lit(width - 1L))).cast("int") + 1)
    }
    if (probes.size == 1) probes.head else least(probes: _*)
  }
}
