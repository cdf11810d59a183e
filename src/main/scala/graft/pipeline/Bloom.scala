package graft.pipeline

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Broadcast Bloom-filter membership for incremental (cross-batch) dedup:
 * "drop documents already present in a reference corpus" without joining
 * the new batch against the full corpus.
 *
 * The 100 TB shape: the reference corpus is reduced to an m-bit bitset by
 * a distributed aggregate (each task ORs into a local buffer, partials
 * merge tree-wise — the shuffle carries m/8 bytes per partition, not
 * rows), and the batch-side check is a per-row scalar probe against the
 * broadcast bitset — no shuffle, no join, arbitrarily large batch.
 * False positives are possible (classic Bloom trade-off: lose a duplicate
 * -looking novel doc with probability ~(1 - e^(-kn/m))^k); false
 * negatives are not. For reference corpora where even m bits outgrow a
 * single buffer (e.g. 10^10 docs at 10 bits/doc = 12.5 GB), shard the
 * filter by a hash prefix — `bloomBits` over `batch.where(prefix = p)`
 * per shard — the math below is unchanged.
 *
 * All hashing is derived from [[Hashing.mix64]] (splitmix64 finalizer)
 * so the DuckDB oracle can replay positions bit-exactly in HUGEINT
 * mod-2^64 arithmetic: double hashing per Kirsch–Mitzenmacher,
 * pos_i = (h + i * step) mod m with step forced odd, m a power of two.
 */
object BloomHash {
  /** Kirsch–Mitzenmacher step: odd, derived from the key hash. */
  @inline def step(h: Long): Long = Hashing.mix64(h ^ 0x9e3779b97f4a7c15L) | 1L

  /** i-th probe position (0 <= result < numBits; numBits a power of 2). */
  @inline def position(h: Long, st: Long, i: Int, mask: Long): Int =
    ((h + i.toLong * st) & mask).toInt

  def set(bits: Array[Long], h: Long, k: Int): Unit = {
    val mask = bits.length.toLong * 64L - 1L
    val st = step(h)
    var i = 0
    while (i < k) {
      val p = position(h, st, i, mask)
      bits(p >>> 6) |= (1L << (p & 63))
      i += 1
    }
  }

  def contains(bits: Array[Long], h: Long, k: Int): Boolean = {
    val mask = bits.length.toLong * 64L - 1L
    val st = step(h)
    var i = 0
    while (i < k) {
      val p = position(h, st, i, mask)
      if ((bits(p >>> 6) & (1L << (p & 63))) == 0L) return false
      i += 1
    }
    true
  }

  /** 2^28 bits = 32 MB per aggregation buffer — beyond this a single
    * buffer per task stops being "small"; shard the filter by hash
    * prefix instead (see [[BloomDedup]] scaladoc). */
  val MaxBits: Int = 1 << 28

  def requirePow2(numBits: Int): Unit =
    require(numBits >= 64 && numBits <= MaxBits && (numBits & (numBits - 1)) == 0,
      s"numBits must be a power of two in [64, $MaxBits], got $numBits" +
        " (shard the filter by hash prefix for larger reference corpora)")
}

/**
 * Aggregate a column of 64-bit key hashes into an m-bit Bloom bitset
 * (array&lt;bigint&gt; of m/64 words). Map-side partial aggregation ORs
 * locally; only the fixed-size buffer crosses the wire.
 */
case class BloomBuildAgg(
    child: Expression,
    numBits: Int,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {
  BloomHash.requirePow2(numBits)
  override def prettyName: String = "pl_bloom_agg"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | IntegerType => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(s"$prettyName expects an integral hash column")
  }
  override def createAggregationBuffer(): Array[Long] = new Array[Long](numBits / 64)
  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v match {
        case i: java.lang.Integer => i.toLong
        case l: java.lang.Long => l.longValue()
      }
      BloomHash.set(buf, h, k)
    }
    buf
  }
  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) |= b(i); i += 1 }
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
  override def withNewMutableAggBufferOffset(o: Int) = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int) = copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/**
 * Per-row Bloom membership probe. `bits` must be foldable (a literal
 * array&lt;bigint&gt; — the collected/broadcast filter); the bitset is
 * extracted once and referenced from generated code, so the probe stays
 * inside whole-stage codegen with zero per-row allocation.
 */
case class BloomContains(bits: Expression, hash: Expression, k: Int)
    extends BinaryExpression {
  override def left: Expression = bits
  override def right: Expression = hash
  override def prettyName: String = "pl_bloom_contains"
  override def dataType: DataType = BooleanType
  override def checkInputDataTypes(): TypeCheckResult =
    (bits.dataType, hash.dataType) match {
      case (ArrayType(LongType, _), LongType | IntegerType) if bits.foldable =>
        // The probe's mask math assumes the bitset length is a power of
        // two — the same invariant BloomBuildAgg enforces at build. A
        // truncated/sliced or wrong-numBits literal would otherwise make
        // the probe silently wrong (FALSE NEGATIVES, violating the
        // documented guarantee), so a mismatch fails analysis here.
        // checkInputDataTypes can run on every analysis pass, so the
        // (possibly large) foldable is evaluated once and memoized; an
        // eval-time throw becomes a TypeCheckFailure rather than an
        // exception escaping analysis.
        foldedWords match {
          case scala.util.Left(err) => TypeCheckResult.TypeCheckFailure(
            s"$prettyName bits literal failed to evaluate: $err")
          case scala.util.Right(null) =>
            TypeCheckResult.TypeCheckFailure(s"$prettyName bits must not be null")
          case scala.util.Right(words) =>
            val nWords = words.length
            val nBits = nWords.toLong * 64L
            if (nWords >= 1 && nBits <= BloomHash.MaxBits && (nWords & (nWords - 1)) == 0)
              TypeCheckResult.TypeCheckSuccess
            else TypeCheckResult.TypeCheckFailure(
              s"$prettyName bits length must be a power of two in [64, ${BloomHash.MaxBits}]" +
                s" bits, got $nBits bits ($nWords words) — was the bitset truncated or" +
                " built with a different numBits?")
        }
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (foldable array<bigint> bits, integral hash)")
    }
  /** One-shot evaluation of the foldable bits literal, shared by
    * analysis-time validation and runtime probing. */
  @transient private lazy val foldedWords: Either[String, Array[Long]] =
    try scala.util.Right(bits.eval(null) match {
      case null => null
      case a: org.apache.spark.sql.catalyst.util.ArrayData => a.toLongArray()
    })
    catch { case e: Exception => scala.util.Left(s"${e.getClass.getSimpleName}: ${e.getMessage}") }
  @transient private lazy val bitWords: Array[Long] = foldedWords match {
    case scala.util.Right(words) if words != null => words
    case other => throw new IllegalStateException(s"unvalidated bits literal: $other")
  }
  override def nullSafeEval(b: Any, h: Any): Any = {
    val hv = h match {
      case i: java.lang.Integer => i.toLong
      case l: java.lang.Long => l.longValue()
    }
    BloomHash.contains(bitWords, hv, k)
  }
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode) = {
    val words = ctx.addReferenceObj("bloomBits", bitWords, "long[]")
    nullSafeCodeGen(ctx, ev, (_, h) =>
      s"${ev.value} = graft.pipeline.BloomHash.contains($words, (long)($h), $k);")
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(bits = l, hash = r)
}

/** DataFrame-level entry points for Bloom-based incremental dedup. */
object BloomDedup {
  import graft.expressions.{asColumn => c, asExpr}

  /** Aggregate `hash` into an m-bit Bloom bitset column (one row). */
  def bloomAgg(hash: Column, numBits: Int, k: Int): Column =
    c(BloomBuildAgg(asExpr(hash), numBits, k).toAggregateExpression())

  /** Membership probe of `hash` against a collected bitset. */
  def bloomContains(bits: Column, hash: Column, k: Int): Column =
    c(BloomContains(asExpr(bits), asExpr(hash), k))

  /** Build the reference corpus's bitset (driver-side Array[Long] —
    * numBits/8 bytes, e.g. 2^20 bits = 128 KB; ships to executors as a
    * plan reference object exactly once per task, like IVF centroids). */
  def bloomBits(ref: DataFrame, textCol: String, numBits: Int, k: Int): Array[Long] = {
    val row = ref
      .select(bloomAgg(c(Fingerprint64(asExpr(col(textCol)))), numBits, k).as("bits"))
      .head()
    row.getSeq[Long](0).toArray
  }

  /** Annotate `batch` with `bloom_hit`: whether the document's content
    * fingerprint might be present in the reference corpus. Rows with
    * bloom_hit = false are certainly novel (no false negatives). The
    * probe keys on the text fingerprint only; all existing columns pass
    * through unchanged. */
  def annotate(batch: DataFrame, textCol: String,
               bits: Array[Long], k: Int): DataFrame = {
    val lit_bits = lit(bits)
    batch.withColumn("bloom_hit",
      bloomContains(lit_bits, c(Fingerprint64(asExpr(col(textCol)))), k))
  }
}
