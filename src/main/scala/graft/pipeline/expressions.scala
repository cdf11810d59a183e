package graft.pipeline

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Catalyst expressions for the training-data pipeline operators
 * (dedup / similarity / fingerprinting). These are the hot loops — a
 * native expression avoids per-element boxing that `zip_with` +
 * `aggregate` HOFs would pay on 64-dim embeddings and 32-perm
 * signatures at 100 TB scale.
 */
object Hashing {
  /** splitmix64 finalizer — stable across JVMs. */
  @inline def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }
  /** FNV-1a 64 over UTF-8 bytes, then mixed. */
  def hashBytes(b: Array[Byte], seed: Long): Long = {
    var h = 0xcbf29ce484222325L ^ seed
    var i = 0
    while (i < b.length) { h = (h ^ (b(i) & 0xffL)) * 0x100000001b3L; i += 1 }
    mix64(h)
  }
  def hashString(s: UTF8String, seed: Long): Long = hashBytes(s.getBytes, seed)
  /** Rolling polynomial hash (×1000003) then mixed — the
    * [[Fingerprint64]] hash, shared so other expressions can bucket
    * strings identically to `pl_fingerprint`. */
  def polyMix(b: Array[Byte]): Long = {
    var h = 0L
    var i = 0
    while (i < b.length) { h = h * 1000003L + (b(i) & 0xffL); i += 1 }
    mix64(h)
  }
}

/** Dot product of two float/double arrays, accumulated in double, index
  * order. Codegen'd (not CodegenFallback): these run once per candidate
  * PAIR in the ANN joins — millions of evaluations per query — so they
  * must stay inside whole-stage codegen with primitive accumulators. */
case class VectorDot(left: Expression, right: Expression) extends BinaryExpression {
  override def prettyName: String = "vec_dot"
  override def dataType: DataType = DoubleType
  @transient private lazy val lt = left.dataType.asInstanceOf[ArrayType].elementType
  @transient private lazy val rt = right.dataType.asInstanceOf[ArrayType].elementType
  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(FloatType | DoubleType, _), ArrayType(FloatType | DoubleType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(s"$prettyName expects array<float|double> args")
  }
  @inline private def get(a: ArrayData, et: DataType, i: Int): Double = et match {
    case FloatType => a.getFloat(i).toDouble
    case _ => a.getDouble(i)
  }
  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]; val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += get(a, lt, i) * get(b, rt, i); i += 1 }
    s
  }
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val (n, s, i) = (ctx.freshName("vdN"), ctx.freshName("vdS"), ctx.freshName("vdI"))
      val (gx, gy) = (VectorCodegen.elemGetter(lt, a, i), VectorCodegen.elemGetter(rt, b, i))
      s"""
      |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
      |double $s = 0.0;
      |for (int $i = 0; $i < $n; $i++) { $s += ($gx) * ($gy); }
      |${ev.value} = $s;
      """.stripMargin
    })
  override protected def withNewChildrenInternal(l: Expression, r: Expression) = copy(l, r)
}

private[pipeline] object VectorCodegen {
  /** Java source reading element `idx` of ArrayData `v` as double. */
  def elemGetter(et: DataType, v: String, idx: String): String = et match {
    case FloatType => s"(double) $v.getFloat($idx)"
    case _ => s"$v.getDouble($idx)"
  }
}

/** Cosine similarity of two vectors (0 when either norm is 0); codegen'd
  * for the same reason as [[VectorDot]]. */
case class CosineSimilarity(left: Expression, right: Expression) extends BinaryExpression {
  override def prettyName: String = "vec_cosine"
  override def dataType: DataType = DoubleType
  @transient private lazy val lt = left.dataType.asInstanceOf[ArrayType].elementType
  @transient private lazy val rt = right.dataType.asInstanceOf[ArrayType].elementType
  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(FloatType | DoubleType, _), ArrayType(FloatType | DoubleType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(s"$prettyName expects array<float|double> args")
  }
  @inline private def get(a: ArrayData, et: DataType, i: Int): Double = et match {
    case FloatType => a.getFloat(i).toDouble
    case _ => a.getDouble(i)
  }
  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]; val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = get(a, lt, i); val y = get(b, rt, i)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
  }
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("vcN")
      val i = ctx.freshName("vcI")
      val (dot, na, nb) = (ctx.freshName("vcDot"), ctx.freshName("vcNa"), ctx.freshName("vcNb"))
      val (x, y) = (ctx.freshName("vcX"), ctx.freshName("vcY"))
      val (gx, gy) = (VectorCodegen.elemGetter(lt, a, i), VectorCodegen.elemGetter(rt, b, i))
      s"""
      |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
      |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
      |for (int $i = 0; $i < $n; $i++) {
      |  double $x = $gx; double $y = $gy;
      |  $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
      |}
      |${ev.value} = ($na == 0.0 || $nb == 0.0) ? 0.0
      |  : $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
      """.stripMargin
    })
  override protected def withNewChildrenInternal(l: Expression, r: Expression) = copy(l, r)
}

/**
 * MinHash signature over word-shingles of a token array:
 * tokens → k-shingles → numHashes minimums of seeded 64-bit hashes.
 * (Shingle→minhash→band→bucket-join is assembled in [[Dedup]].)
 */
case class MinHashSignature(child: Expression, numHashes: Int, shingleSize: Int)
    extends UnaryExpression with CodegenFallback {
  override def prettyName: String = "minhash_signature"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(s"$prettyName expects array<string>")
  }
  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val sig = Array.fill(numHashes)(Long.MaxValue)
    if (n >= shingleSize) {
      val sb = new java.lang.StringBuilder()
      var i = 0
      while (i <= n - shingleSize) {
        sb.setLength(0)
        var j = 0
        while (j < shingleSize) {
          if (j > 0) sb.append(' ')
          sb.append(arr.getUTF8String(i + j).toString)
          j += 1
        }
        val base = Hashing.hashBytes(sb.toString.getBytes("UTF-8"), 0L)
        var k = 0
        while (k < numHashes) {
          val h = Hashing.mix64(base ^ (k * 0x9e3779b97f4a7c15L))
          if (h < sig(k)) sig(k) = h
          k += 1
        }
        i += 1
      }
    }
    new GenericArrayData(sig)
  }
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** 64-bit SimHash over a token array (token-frequency weighted). */
case class SimHash64(child: Expression) extends UnaryExpression with CodegenFallback {
  override def prettyName: String = "simhash64"
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val acc = new Array[Int](64)
    var i = 0
    while (i < n) {
      val h = Hashing.hashString(arr.getUTF8String(i), 7L)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) acc(b) += 1 else acc(b) -= 1
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (acc(b) > 0) out |= (1L << b); b += 1 }
    out
  }
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** Polynomial rolling-hash fingerprint of a string's UTF-8 bytes (base 1000003). */
case class Fingerprint64(child: Expression) extends UnaryExpression with CodegenFallback {
  override def prettyName: String = "fingerprint64"
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any =
    Hashing.polyMix(input.asInstanceOf[UTF8String].getBytes)
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/**
 * Per-document Unicode script composition: counts of codepoints in the
 * major script ranges a multilingual curation pipeline routes on
 * (latin letters, digits, CJK unified+ext A, cyrillic, arabic,
 * whitespace, other). Iterates CODEPOINTS (not UTF-16 units), so the
 * counts match any engine's character semantics — the DuckDB oracle
 * replays them from `ascii(text[i])` codepoints.
 */
case class ScriptCounts(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def prettyName: String = "pl_script_counts"
  override def dataType: DataType = StructType(Seq(
    StructField("latin", IntegerType, nullable = false),
    StructField("digit", IntegerType, nullable = false),
    StructField("cjk", IntegerType, nullable = false),
    StructField("cyrillic", IntegerType, nullable = false),
    StructField("arabic", IntegerType, nullable = false),
    StructField("space", IntegerType, nullable = false),
    StructField("other", IntegerType, nullable = false)))
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects string, got $other")
  }
  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    var latin, digit, cjk, cyr, ar, sp, other = 0
    val it = s.codePoints().iterator()
    while (it.hasNext) {
      val c = it.nextInt()
      if ((c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')) latin += 1
      else if (c >= '0' && c <= '9') digit += 1
      else if ((c >= 0x4E00 && c <= 0x9FFF) || (c >= 0x3400 && c <= 0x4DBF)) cjk += 1
      else if (c >= 0x0400 && c <= 0x04FF) cyr += 1
      else if (c >= 0x0600 && c <= 0x06FF) ar += 1
      else if (c == ' ' || c == '\t' || c == '\n' || c == '\r') sp += 1
      else other += 1
    }
    InternalRow(latin, digit, cjk, cyr, ar, sp, other)
  }
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/**
 * DSIR hashed-bucket importance score: Σ over the child's string
 * elements of `lam(polyMix(tok) & (lam.length-1))` — the per-document
 * importance weight of "Data Selection for Language Models via
 * Importance Resampling" (Xie et al. 2023, arXiv:2302.03169) with the
 * λ table pre-fit on the driver (bounded: one long per bucket) and
 * shipped inside the expression, so scoring runs inside the scan with
 * no join and no shuffle. λ is in integer micro-nats, making the score
 * exact under any accumulation order.
 */
case class BucketLogRatioScore(child: Expression, lam: Array[Long])
    extends UnaryExpression with CodegenFallback {
  require(Integer.bitCount(lam.length) == 1,
    s"lambda table length must be a power of two, got ${lam.length}")
  private val mask = lam.length - 1L
  override def prettyName: String = "bucket_log_ratio_score"
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bucket_log_ratio_score needs array<string>, got $other")
  }
  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    var s = 0L
    var i = 0
    while (i < arr.numElements()) {
      if (!arr.isNullAt(i)) {
        val h = Hashing.polyMix(arr.getUTF8String(i).getBytes)
        s += lam((h & mask).toInt)
      }
      i += 1
    }
    s
  }
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/**
 * Random-hyperplane LSH signature for cosine similarity: `planes`
 * pseudo-random (seeded, deterministic) hyperplanes per table; returns
 * the sign-bit bucket as an int. Plane components are generated on the
 * driver once and ship with the expression.
 */
case class HyperplaneBucket(child: Expression, dim: Int, planes: Int, seed: Long)
    extends UnaryExpression with CodegenFallback {
  override def prettyName: String = "lsh_bucket"
  override def dataType: DataType = IntegerType
  @transient private lazy val et = child.dataType.asInstanceOf[ArrayType].elementType
  @transient private lazy val mat: Array[Array[Double]] =
    Array.tabulate(planes, dim) { (p, d) =>
      // deterministic N(0,1)-ish via pairs of uniform mixes (Box-Muller not needed; sign test only)
      val u = Hashing.mix64(seed ^ (p * 1048583L + d))
      (u.toDouble / Long.MaxValue.toDouble)
    }
  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), dim)
    var bucket = 0
    var p = 0
    while (p < planes) {
      var s = 0.0
      val row = mat(p)
      var i = 0
      while (i < n) {
        val x = et match {
          case FloatType => a.getFloat(i).toDouble
          case _ => a.getDouble(i)
        }
        s += x * row(i)
        i += 1
      }
      if (s >= 0) bucket |= (1 << p)
      p += 1
    }
    bucket
  }
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** Bounded top-k buffer: (sim desc, id asc)-sorted parallel arrays of at
  * most k entries, deduplicated by id (duplicate candidates from several
  * LSH tables / IVF probes carry identical sims, so keep-first is exact). */
final class TopKBuffer(val k: Int) extends Serializable {
  var n: Int = 0
  val ids: Array[Long] = new Array[Long](k)
  val sims: Array[Double] = new Array[Double](k)
  @inline private def beats(s: Double, id: Long, i: Int): Boolean =
    s > sims(i) || (s == sims(i) && id < ids(i))
  def insert(id: Long, s: Double): Unit = {
    var i = 0
    while (i < n) { if (ids(i) == id) return; i += 1 } // dedup by payload
    if (n < k) {
      var pos = n
      while (pos > 0 && beats(s, id, pos - 1)) {
        ids(pos) = ids(pos - 1); sims(pos) = sims(pos - 1); pos -= 1
      }
      ids(pos) = id; sims(pos) = s; n += 1
    } else if (beats(s, id, n - 1)) {
      var pos = n - 1
      while (pos > 0 && beats(s, id, pos - 1)) {
        ids(pos) = ids(pos - 1); sims(pos) = sims(pos - 1); pos -= 1
      }
      ids(pos) = id; sims(pos) = s
    }
  }
}

/**
 * Bounded-heap top-k-by aggregate: the scale shape for per-group top-k.
 * A `row_number().over(Window.partitionBy(g).orderBy(sim desc))` sorts
 * EVERY candidate pair (the partial WindowGroupLimit still sorts each
 * map partition); this aggregate reduces each map partition to ≤ k
 * entries per group before the shuffle, so shuffle volume is
 * O(groups · k), not O(pairs). Returns array<struct<neighbor_id, sim>>
 * sorted by (sim desc, neighbor_id asc) — posexplode for ranks.
 */
case class TopKByAggregate(
    payload: Expression,
    order: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate[TopKBuffer] {
  require(k > 0, "topKBy requires k > 0")
  override def prettyName: String = "top_k_by"
  override def children: Seq[Expression] = Seq(payload, order)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("neighbor_id", LongType, nullable = false),
    StructField("sim", DoubleType, nullable = false))), containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult =
    if (payload.dataType == LongType && order.dataType == DoubleType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (bigint payload, double order), got " +
        s"${payload.dataType.simpleString} / ${order.dataType.simpleString}")
  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)
  override def update(buf: TopKBuffer, input: InternalRow): TopKBuffer = {
    val id = payload.eval(input)
    val s = order.eval(input)
    if (id != null && s != null)
      buf.insert(id.asInstanceOf[Long], s.asInstanceOf[Double])
    buf
  }
  override def merge(a: TopKBuffer, b: TopKBuffer): TopKBuffer = {
    var i = 0
    while (i < b.n) { a.insert(b.ids(i), b.sims(i)); i += 1 }
    a
  }
  override def eval(buf: TopKBuffer): Any = {
    val out = new Array[Any](buf.n)
    var i = 0
    while (i < buf.n) { out(i) = InternalRow(buf.ids(i), buf.sims(i)); i += 1 }
    new GenericArrayData(out)
  }
  override def serialize(buf: TopKBuffer): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 + buf.n * 16)
    bb.putInt(buf.k).putInt(buf.n)
    var i = 0
    while (i < buf.n) { bb.putLong(buf.ids(i)).putDouble(buf.sims(i)); i += 1 }
    bb.array()
  }
  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val buf = new TopKBuffer(bb.getInt())
    val n = bb.getInt()
    var i = 0
    while (i < n) { buf.ids(i) = bb.getLong(); buf.sims(i) = bb.getDouble(); i += 1 }
    buf.n = n
    buf
  }
  override def withNewMutableAggBufferOffset(o: Int): TopKByAggregate =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKByAggregate =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]) =
    copy(payload = cs(0), order = cs(1))
}

/** Exact second-moment state over integer-quantized d-dim vectors:
  * count, per-dimension sums, and the upper-triangle (i ≤ j, row-major)
  * pair-product sums. All longs, so merges are associative and
  * order-free — the property that makes the covariance bit-exact on any
  * partitioning. */
final class GramBuffer(val d: Int) extends Serializable {
  var n: Long = 0L
  val sums: Array[Long] = new Array[Long](d)
  val prods: Array[Long] = new Array[Long](d * (d + 1) / 2)
  def add(v: ArrayData): Unit = {
    // Fail-loud on null ELEMENTS (a null embedding component surviving
    // an upstream cast): getLong would silently read 0/garbage where a
    // SQL engine propagates NULL — a silent parity divergence. O(d)
    // pre-scan vs the O(d²) product loop: free.
    var c = 0
    while (c < d) {
      if (v.isNullAt(c)) throw new IllegalArgumentException(
        s"gram_matrix: null element at index $c — integer-quantize " +
          "with a null-free cast (e.g. coalesce before the round)")
      c += 1
    }
    n += 1L
    var i = 0
    var k = 0
    while (i < d) {
      val xi = v.getLong(i)
      sums(i) += xi
      var j = i
      while (j < d) { prods(k) += xi * v.getLong(j); k += 1; j += 1 }
      i += 1
    }
  }
}

/**
 * Distributed Gram/covariance moments over an integer-quantized
 * embedding column — the scale shape for covariance estimation and PCA
 * whitening: ONE TypedImperativeAggregate whose state is the d×d second
 * moment (d + d(d+1)/2 + 1 longs ≈ 8·d²/2 bytes — ~16 KiB at d = 64,
 * ~1 MiB at d = 512, **~67 MiB at the d = 4096 ceiling**), merged
 * associatively across partitions. MEMORY CONTRACT: every partial
 * holds one buffer and the final merge holds two, so at d = 4096 plan
 * for ~134 MiB per concurrently-merging task plus the serialized
 * partial rows crossing the shuffle — size executor memory (or lower
 * d via a projection) accordingly; dimensions ≤ 1024 (~4 MiB) need no
 * special handling. The
 * alternative — posexplode × self-join on the row id — shuffles
 * O(rows·d²) pair rows; this shuffles O(partitions·d²) state and the
 * corpus never leaves its scan.
 *
 * Input MUST be integer units (e.g. milli-units via
 * `cast(round(x*1000) as bigint)`): long sums are exact and
 * order-independent where float sums are neither. Overflow contract:
 * Σ|x_i·x_j| < 2^63 — at |x| ≤ 10⁴ units that is ~10¹¹ rows; the final
 * (n·Σxy − Σx·Σy) products belong in DECIMAL(38,0) downstream
 * ([[graft.pipeline.Stats.covarianceMatrix]] does).
 *
 * Returns struct(n, sums array<bigint>, prods array<bigint>) with prods
 * the upper triangle row-major: index(i,j) = i·d − i(i−1)/2 + (j − i).
 */
case class GramMatrixAggregate(
    child: Expression,
    d: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate[GramBuffer] {
  require(d > 0 && d <= 4096, s"gram_matrix dimension must be in [1, 4096], got $d")
  override def prettyName: String = "gram_matrix"
  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("sums", ArrayType(LongType, containsNull = false), nullable = false),
    StructField("prods", ArrayType(LongType, containsNull = false), nullable = false)))
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<bigint> (integer-quantized vector), got ${other.simpleString}")
  }
  override def createAggregationBuffer(): GramBuffer = new GramBuffer(d)
  override def update(buf: GramBuffer, input: InternalRow): GramBuffer = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      require(arr.numElements() == d,
        s"gram_matrix: expected $d-dim vector, got ${arr.numElements()}")
      buf.add(arr)
    }
    buf
  }
  override def merge(a: GramBuffer, b: GramBuffer): GramBuffer = {
    a.n += b.n
    var i = 0
    while (i < a.sums.length) { a.sums(i) += b.sums(i); i += 1 }
    var k = 0
    while (k < a.prods.length) { a.prods(k) += b.prods(k); k += 1 }
    a
  }
  override def eval(buf: GramBuffer): Any = InternalRow(
    buf.n, new GenericArrayData(buf.sums.map(x => x: Any)),
    new GenericArrayData(buf.prods.map(x => x: Any)))
  override def serialize(buf: GramBuffer): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + 8 + 8 * (buf.d + buf.prods.length))
    bb.putInt(buf.d).putLong(buf.n)
    var i = 0
    while (i < buf.d) { bb.putLong(buf.sums(i)); i += 1 }
    var k = 0
    while (k < buf.prods.length) { bb.putLong(buf.prods(k)); k += 1 }
    bb.array()
  }
  override def deserialize(bytes: Array[Byte]): GramBuffer = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val buf = new GramBuffer(bb.getInt())
    buf.n = bb.getLong()
    var i = 0
    while (i < buf.d) { buf.sums(i) = bb.getLong(); i += 1 }
    var k = 0
    while (k < buf.prods.length) { buf.prods(k) = bb.getLong(); k += 1 }
    buf
  }
  override def withNewMutableAggBufferOffset(o: Int): GramMatrixAggregate =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): GramMatrixAggregate =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]) =
    copy(child = cs(0))
}

/** Gopher-style repetition signal over a token array: 1 − distinct/total
  * n-grams. Same gram construction as the HOF formulation (windows
  * clipped at the end; short docs yield one short gram) but built in one
  * pass with a string set — no per-gram array slices or intermediate
  * gram arrays. */
case class RepetitionRatio(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {
  override def prettyName: String = "repetition_ratio"
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(s"$prettyName expects array<string>")
  }
  override def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[ArrayData]
    val sz = toks.numElements()
    val total = math.max(sz - n, 0) + 1
    val seen = new java.util.HashSet[String](total * 2)
    val sb = new java.lang.StringBuilder()
    var i = 0
    while (i < total) {
      sb.setLength(0)
      var j = i
      val end = math.min(i + n, sz)
      while (j < end) {
        if (j > i) sb.append(' ')
        sb.append(toks.getUTF8String(j).toString)
        j += 1
      }
      seen.add(sb.toString)
      i += 1
    }
    1.0 - seen.size.toDouble / total.toDouble
  }
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** Distinct n-grams of a token array as array<string>, first-occurrence
  * order (what array_distinct over the HOF gram build produced) — one
  * pass, one string set, no intermediate gram array of slices. */
case class DistinctNGrams(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {
  override def prettyName: String = "distinct_ngrams"
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(s"$prettyName expects array<string>")
  }
  override def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[ArrayData]
    val sz = toks.numElements()
    val total = math.max(sz - n, 0) + 1
    val seen = new java.util.LinkedHashSet[String](total * 2)
    val sb = new java.lang.StringBuilder()
    var i = 0
    while (i < total) {
      sb.setLength(0)
      var j = i
      val end = math.min(i + n, sz)
      while (j < end) {
        if (j > i) sb.append(' ')
        sb.append(toks.getUTF8String(j).toString)
        j += 1
      }
      seen.add(sb.toString)
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = UTF8String.fromString(it.next()); k += 1 }
    new GenericArrayData(out)
  }
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** splitmix64 finalizer of a long — the stable pseudo-random sort key
  * behind [[Mixture]]'s deterministic sampling. Codegen'd: a static call
  * into [[Hashing.mix64]], so it stays inside whole-stage codegen. */
case class Mix64(child: Expression) extends UnaryExpression {
  override def prettyName: String = "mix64"
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | IntegerType => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(s"$prettyName expects an integral argument")
  }
  override def nullSafeEval(input: Any): Any = input match {
    case i: java.lang.Integer => Hashing.mix64(i.toLong)
    case l: java.lang.Long => Hashing.mix64(l)
  }
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode) =
    defineCodeGen(ctx, ev, c => s"graft.pipeline.Hashing.mix64((long)($c))")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** Index of the nearest centroid (squared L2, ties to the lowest index),
  * centroids shipped with the expression like [[HyperplaneBucket]]'s
  * planes — the IVF assignment step as one codegen-free scalar pass. */
case class NearestCentroid(child: Expression, centroids: Array[Array[Double]])
    extends UnaryExpression with CodegenFallback {
  override def prettyName: String = "nearest_centroid"
  override def dataType: DataType = IntegerType
  @transient private lazy val et = child.dataType.asInstanceOf[ArrayType].elementType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(s"$prettyName expects array<float|double>")
  }
  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    var best = 0
    var bestD = Double.MaxValue
    var c = 0
    while (c < centroids.length) {
      val cen = centroids(c)
      val n = math.min(v.numElements(), cen.length)
      var d = 0.0
      var i = 0
      while (i < n) {
        val x = (et match {
          case FloatType => v.getFloat(i).toDouble
          case _ => v.getDouble(i)
        }) - cen(i)
        d += x * x
        i += 1
      }
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/**
 * The `nprobe` nearest IVF cells of a query vector by inner-product
 * score, ordered (-dot asc, cell asc) — the probe-selection window
 * ([[Pipeline.ivfTopK]]) collapsed into one scalar pass. At scale this
 * replaces an N×nlist cross-join row blow-up plus a per-id window
 * shuffle with zero extra rows and zero shuffle. Arithmetic mirrors
 * [[VectorDot]] (index-order double accumulation) so the probe SET is
 * bit-identical to the windowed formulation the DuckDB oracle replays.
 */
case class NearestCells(child: Expression, centroids: Array[Array[Double]], nprobe: Int)
    extends UnaryExpression with CodegenFallback {
  override def prettyName: String = "nearest_cells"
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  @transient private lazy val et = child.dataType.asInstanceOf[ArrayType].elementType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(s"$prettyName expects array<float|double>")
  }
  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val nCells = centroids.length
    val cdist = new Array[Double](nCells) // -dot, smaller = nearer
    var c = 0
    while (c < nCells) {
      val cen = centroids(c)
      val n = math.min(v.numElements(), cen.length)
      var s = 0.0
      var i = 0
      while (i < n) {
        s += (et match {
          case FloatType => v.getFloat(i).toDouble
          case _ => v.getDouble(i)
        }) * cen(i)
        i += 1
      }
      cdist(c) = -s
      c += 1
    }
    // selection of the nprobe smallest; strict < keeps the LOWEST cell
    // on ties — the (cdist asc, cell asc) window order
    val m = math.min(nprobe, nCells)
    val chosen = new Array[Int](m)
    val used = new Array[Boolean](nCells)
    var j = 0
    while (j < m) {
      var best = -1
      var bestD = Double.MaxValue
      var cc = 0
      while (cc < nCells) {
        if (!used(cc) && cdist(cc) < bestD) { bestD = cdist(cc); best = cc }
        cc += 1
      }
      if (best == -1) { // all-NaN remainder: NaN sorts last, ties → lowest cell
        var f = 0
        while (used(f)) f += 1
        best = f
      }
      used(best) = true
      chosen(j) = best
      j += 1
    }
    new GenericArrayData(chosen)
  }
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/**
 * Deterministic Lloyd's k-means for the IVF coarse quantizer, run on the
 * driver over a BOUNDED sorted-prefix sample. The sample (first
 * `sampleSize` vectors by id) and every arithmetic step (init = first k
 * vectors; assignment = squared-L2 argmin, ties to the lowest cell;
 * update = member mean accumulated in id order; empty cell keeps its
 * centroid; fixed iteration count) are pinned, so the centroids are
 * bit-reproducible by any engine — including the DuckDB oracle.
 * Spark ML's KMeans (seeded kmeans|| + per-iteration distributed jobs)
 * is the right tool once the SAMPLE itself no longer fits one machine;
 * for a quantizer fit that is bounded by design, driver Lloyd costs
 * milliseconds instead of 10+ scheduler round-trips.
 */
object QuantizerKMeans {
  def fit(vectors: Array[Array[Double]], k: Int, iters: Int): Array[Array[Double]] = {
    require(vectors.nonEmpty, "k-means needs at least one vector")
    val dim = vectors(0).length
    var cents = Array.tabulate(math.min(k, vectors.length))(i => vectors(i).clone())
    if (cents.length < k) cents = cents ++ Array.fill(k - cents.length)(vectors(0).clone())
    var it = 0
    while (it < iters) {
      val sums = Array.fill(k)(new Array[Double](dim))
      val counts = new Array[Int](k)
      var vi = 0
      while (vi < vectors.length) {
        val v = vectors(vi)
        var best = 0
        var bestD = Double.MaxValue
        var c = 0
        while (c < k) {
          var d = 0.0
          var i = 0
          while (i < dim) { val x = v(i) - cents(c)(i); d += x * x; i += 1 }
          if (d < bestD) { bestD = d; best = c }
          c += 1
        }
        val s = sums(best)
        var i = 0
        while (i < dim) { s(i) += v(i); i += 1 }
        counts(best) += 1
        vi += 1
      }
      cents = Array.tabulate(k) { c =>
        if (counts(c) == 0) cents(c)
        else {
          val s = sums(c)
          Array.tabulate(dim)(i => s(i) / counts(c))
        }
      }
      it += 1
    }
    cents
  }
}

/** ALL n-grams of a token array (with multiplicity, strict: only full
  * n-length windows, so a doc with fewer than n tokens yields an empty
  * array). The multiset counterpart of [[DistinctNGrams]] — the n-gram
  * language model ([[NGramLM]]) counts every occurrence, not presence. */
case class NGrams(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {
  override def prettyName: String = "ngrams"
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(s"$prettyName expects array<string>")
  }
  override def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[ArrayData]
    val sz = toks.numElements()
    val total = math.max(sz - n + 1, 0)
    val out = new Array[Any](total)
    val sb = new java.lang.StringBuilder()
    var i = 0
    while (i < total) {
      sb.setLength(0)
      var j = i
      while (j < i + n) {
        if (j > i) sb.append(' ')
        sb.append(toks.getUTF8String(j).toString)
        j += 1
      }
      out(i) = UTF8String.fromString(sb.toString)
      i += 1
    }
    new GenericArrayData(out)
  }
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/**
 * Product-quantization codes: the vector is cut into `centroids.length`
 * contiguous subspaces and each slice is assigned to its nearest
 * per-subspace centroid (squared L2, ties to the lowest code — the same
 * pinned argmin as [[NearestCentroid]]). Output: array<int> of one code
 * per subspace — a ~4-byte compressed representation of a 64-dim float
 * vector, which is what makes the PQ serving scan broadcast-able at
 * billion-vector scale. Runs once per CORPUS row (not per pair), so
 * CodegenFallback is fine.
 */
case class PQCodes(child: Expression, centroids: Array[Array[Array[Double]]])
    extends UnaryExpression with CodegenFallback {
  override def prettyName: String = "pq_codes"
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  @transient private lazy val et = child.dataType.asInstanceOf[ArrayType].elementType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(s"$prettyName expects array<float|double>")
  }
  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val m = centroids.length
    val out = new Array[Any](m)
    var j = 0
    var off = 0
    while (j < m) {
      val sub = centroids(j)
      val subDim = sub(0).length
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < sub.length) {
        val cen = sub(c)
        var d = 0.0
        var i = 0
        while (i < subDim) {
          val x = (if (off + i < v.numElements()) et match {
            case FloatType => v.getFloat(off + i).toDouble
            case _ => v.getDouble(off + i)
          } else 0.0) - cen(i)
          d += x * x
          i += 1
        }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      out(j) = best
      off += subDim
      j += 1
    }
    new GenericArrayData(out)
  }
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/**
 * ADC (asymmetric distance computation) table for one query vector:
 * dt[j*k + c] = <query subspace j, centroid c of subspace j>, inner
 * products accumulated in index order. Computed once per QUERY row; the
 * per-pair scan ([[PQAdc]]) then only does table lookups — the classic
 * PQ fast-scan split.
 */
case class PQDistTable(child: Expression, centroids: Array[Array[Array[Double]]])
    extends UnaryExpression with CodegenFallback {
  override def prettyName: String = "pq_dist_table"
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  @transient private lazy val et = child.dataType.asInstanceOf[ArrayType].elementType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(s"$prettyName expects array<float|double>")
  }
  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val m = centroids.length
    val k = centroids(0).length
    val out = new Array[Any](m * k)
    var j = 0
    var off = 0
    while (j < m) {
      val sub = centroids(j)
      val subDim = sub(0).length
      var c = 0
      while (c < k) {
        val cen = sub(c)
        var s = 0.0
        var i = 0
        while (i < subDim) {
          val x = if (off + i < v.numElements()) et match {
            case FloatType => v.getFloat(off + i).toDouble
            case _ => v.getDouble(off + i)
          } else 0.0
          s += x * cen(i)
          i += 1
        }
        out(j * k + c) = s
        c += 1
      }
      off += subDim
      j += 1
    }
    new GenericArrayData(out)
  }
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** The PQ per-pair score: sum over subspaces j (ascending, from 0.0 —
  * the pinned order the oracle replays) of dt[j*k + codes[j]]. This runs
  * once per (query, candidate) PAIR — millions of evaluations — so it is
  * codegen'd with primitive array lookups, like [[VectorDot]]. */
case class PQAdc(left: Expression, right: Expression, k: Int) extends BinaryExpression {
  override def prettyName: String = "pq_adc"
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(DoubleType, _), ArrayType(IntegerType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (array<double> dist table, array<int> codes)")
  }
  override def nullSafeEval(l: Any, r: Any): Any = {
    val dt = l.asInstanceOf[ArrayData]
    val codes = r.asInstanceOf[ArrayData]
    var s = 0.0
    var j = 0
    while (j < codes.numElements()) { s += dt.getDouble(j * k + codes.getInt(j)); j += 1 }
    s
  }
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode) =
    nullSafeCodeGen(ctx, ev, (dt, codes) => {
      val j = ctx.freshName("j")
      val s = ctx.freshName("s")
      s"""double $s = 0.0;
         |for (int $j = 0; $j < $codes.numElements(); $j++) {
         |  $s += $dt.getDouble($j * $k + $codes.getInt($j));
         |}
         |${ev.value} = $s;""".stripMargin
    })
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/**
 * MOSS-style winnowing fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD
 * 2003): hash every k-token gram (same FNV-1a + splitmix64 gram hash as
 * [[MinHashSignature]]), slide a window of `w` consecutive hashes, and
 * select each window's minimum — rightmost on ties, recording a
 * position at most once. Guarantees every shared substring of at least
 * w + k - 1 tokens contributes a common fingerprint, with a ~2/(w+1)
 * sampling rate — the local-guarantee alternative to MinHash when
 * POSITIONS of matches matter (plagiarism spans, overlap localization).
 * Output: array<struct<pos:int, fp:bigint>> of selected (0-based gram
 * start, gram hash). Per-row O(n) via a monotonic deque;
 * CodegenFallback is fine (one eval per document, like the other
 * signature expressions).
 */
case class Winnow(child: Expression, k: Int, w: Int)
    extends UnaryExpression with CodegenFallback {
  require(k > 0 && w > 0, "winnow expects k > 0 and w > 0")
  override def prettyName: String = "winnow"
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("pos", IntegerType, nullable = false),
      StructField("fp", LongType, nullable = false))), containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(s"$prettyName expects array<string>")
  }
  override def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[ArrayData]
    val nTok = toks.numElements()
    val n = math.max(nTok - k + 1, 0)
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    val hs = new Array[Long](n)
    val sb = new java.lang.StringBuilder()
    var i = 0
    while (i < n) {
      sb.setLength(0)
      var j = 0
      while (j < k) {
        if (j > 0) sb.append(' ')
        sb.append(toks.getUTF8String(i + j).toString)
        j += 1
      }
      hs(i) = Hashing.hashBytes(sb.toString.getBytes("UTF-8"), 0L)
      i += 1
    }
    // monotonic deque of indices with strictly increasing hash; equal
    // hashes pop (>=) so the front is always the RIGHTMOST minimum
    val deque = new Array[Int](n)
    var head = 0
    var tail = 0 // exclusive
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var prevSel = -1
    var e = 0
    val firstEnd = math.min(w, n) - 1
    while (e < n) {
      while (tail > head && hs(deque(tail - 1)) >= hs(e)) tail -= 1
      deque(tail) = e; tail += 1
      while (deque(head) < e - w + 1) head += 1
      if (e >= firstEnd) {
        val sel = deque(head)
        if (sel != prevSel) {
          out += InternalRow(sel, hs(sel))
          prevSel = sel
        }
      }
      e += 1
    }
    new GenericArrayData(out.toArray)
  }
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/**
 * Scalar form of [[Chunking.chunk]] for the SQL/Python surface:
 * fixed-size token windows with overlap as one array of structs, so
 * `SELECT inline(pl_chunks(text, 8, 4))` chunkifies without the
 * DataFrame helper. Single pass over the staged token array (no
 * re-tokenization per window); one eval per document, CodegenFallback
 * like the other signature expressions.
 */
/**
 * Greedy longest-match subword tokenization stats (the WordPiece /
 * BPE-inference shape): for each word in the child array, repeatedly
 * take the longest `vocab` piece prefixing the remainder, emitting one
 * `<unk>` and advancing one char when nothing matches. Returns
 * struct(n_pieces, n_unk) summed over the array — the per-doc token
 * count a training-data pipeline budgets with. The vocab ships inside
 * the expression (bounded driver fit, like the ANN quantizers), so the
 * stats compute inside the scan: no join, no shuffle.
 */
case class GreedyPieceStats(child: Expression, vocab: Array[String])
    extends UnaryExpression with CodegenFallback {
  require(vocab.nonEmpty, "vocab must be non-empty")
  private val pieces: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String](vocab.length * 2)
    vocab.foreach(s.add)
    s
  }
  private val maxLen = vocab.iterator.map(_.length).max
  override def prettyName: String = "pl_greedy_piece_stats"
  override def dataType: DataType = StructType(Seq(
    StructField("n_pieces", IntegerType, nullable = false),
    StructField("n_unk", IntegerType, nullable = false)))
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(s"$prettyName expects array<string>")
  }
  override def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[ArrayData]
    var np = 0
    var nu = 0
    var w = 0
    while (w < toks.numElements()) {
      if (!toks.isNullAt(w)) {
        val word = toks.getUTF8String(w).toString
        var i = 0
        while (i < word.length) {
          var l = math.min(maxLen, word.length - i)
          var hit = 0
          while (l >= 1 && hit == 0) {
            if (pieces.contains(word.substring(i, i + l))) hit = l else l -= 1
          }
          if (hit > 0) { np += 1; i += hit }
          else { np += 1; nu += 1; i += 1 }
        }
      }
      w += 1
    }
    InternalRow(np, nu)
  }
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

case class Chunks(child: Expression, sizeTokens: Int, overlap: Int)
    extends UnaryExpression with CodegenFallback {
  require(sizeTokens > 0, "pl_chunks expects size_tokens > 0")
  require(overlap >= 0 && overlap < sizeTokens,
    "pl_chunks expects overlap in [0, size_tokens)")
  override def prettyName: String = "pl_chunks"
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("chunk_idx", IntegerType, nullable = false),
      StructField("start_token", IntegerType, nullable = false),
      StructField("chunk_text", StringType, nullable = false),
      StructField("n_chunk_tokens", IntegerType, nullable = false))),
    containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(s"$prettyName expects array<string>")
  }
  override def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[ArrayData]
    val n = toks.numElements()
    val stride = sizeTokens - overlap
    val nChunks = if (n == 0) 0 else (n - 1) / stride + 1
    val out = new Array[Any](nChunks)
    val sb = new java.lang.StringBuilder()
    var ci = 0
    while (ci < nChunks) {
      val start = ci * stride
      val len = math.min(sizeTokens, n - start)
      sb.setLength(0)
      var j = 0
      while (j < len) {
        if (j > 0) sb.append(' ')
        sb.append(toks.getUTF8String(start + j).toString)
        j += 1
      }
      out(ci) = InternalRow(ci, start, UTF8String.fromString(sb.toString), len)
      ci += 1
    }
    new GenericArrayData(out)
  }
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/**
 * Counts ALL occurrences — including overlapping ones — of each of a
 * FIXED pattern list inside `text`, in ONE left-to-right pass over the
 * string via an Aho–Corasick automaton (goto/fail/dict-suffix links).
 * Returns `array<long>` aligned with the pattern array. The pattern
 * argument must be foldable (a literal blocklist): the automaton is
 * built once per executor from it (transient lazy), so a million-row
 * partition pays the build exactly once and each row costs
 * O(len + matches) — independent of the pattern count, which is the
 * whole point versus k separate `contains`/`regexp` probes at O(k·len).
 *
 * Overlap semantics (unlike `replace`-based counting, which is
 * non-overlapping): "banana" vs ["ana"] counts 2. Empty patterns are
 * rejected at analysis; an empty pattern ARRAY yields an empty counts
 * array.
 */
case class MultiMatchCounts(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def prettyName: String = "multi_match_counts"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, ArrayType(StringType, _)) if right.foldable =>
        val arr = right.eval(null)
        if (arr == null) TypeCheckResult.TypeCheckFailure(
          s"$prettyName pattern array must not be null")
        else {
          val ad = arr.asInstanceOf[ArrayData]
          val bad = (0 until ad.numElements()).exists(i =>
            ad.isNullAt(i) || ad.getUTF8String(i).numChars() == 0)
          if (bad) TypeCheckResult.TypeCheckFailure(
            s"$prettyName patterns must be non-null and non-empty")
          else TypeCheckResult.TypeCheckSuccess
        }
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (string, foldable array<string>)")
    }

  @transient private lazy val patterns: Array[String] = {
    val ad = right.eval(null).asInstanceOf[ArrayData]
    Array.tabulate(ad.numElements())(i => ad.getUTF8String(i).toString)
  }

  // Automaton arrays: per node a char->child map, a fail link, and the
  // pattern indexes ending exactly at the node; dictLink jumps to the
  // nearest fail-ancestor that ends some pattern, so per-position match
  // reporting walks only genuine hits.
  @transient private lazy val automaton: (Array[scala.collection.mutable.LongMap[Int]],
      Array[Int], Array[List[Int]], Array[Int]) = {
    import scala.collection.mutable
    val next = mutable.ArrayBuffer(mutable.LongMap.empty[Int])
    val ends = mutable.ArrayBuffer[List[Int]](Nil)
    for ((p, pi) <- patterns.zipWithIndex) {
      var cur = 0
      for (ch <- p) {
        val key = ch.toLong
        cur = next(cur).getOrElse(key, {
          next += mutable.LongMap.empty[Int]
          ends += Nil
          val id = next.size - 1
          next(cur)(key) = id
          id
        })
      }
      ends(cur) = pi :: ends(cur)
    }
    val n = next.size
    val fail = new Array[Int](n)
    val dict = new Array[Int](n)
    val queue = mutable.Queue.empty[Int]
    for ((_, c) <- next(0)) { fail(c) = 0; dict(c) = 0; queue += c }
    while (queue.nonEmpty) {
      val u = queue.dequeue()
      dict(u) = if (ends(fail(u)).nonEmpty) fail(u) else dict(fail(u))
      for ((ch, c) <- next(u)) {
        var f = fail(u)
        while (f != 0 && !next(f).contains(ch)) f = fail(f)
        fail(c) = next(f).getOrElse(ch, 0) match {
          case `c` => 0
          case x => x
        }
        queue += c
      }
    }
    (next.toArray, fail, ends.toArray, dict)
  }

  override def nullSafeEval(t: Any, ps: Any): Any = {
    val (next, fail, ends, dict) = automaton
    val counts = new Array[Long](patterns.length)
    val s = t.asInstanceOf[UTF8String].toString
    var node = 0
    var i = 0
    while (i < s.length) {
      val ch = s.charAt(i).toLong
      while (node != 0 && !next(node).contains(ch)) node = fail(node)
      node = next(node).getOrElse(ch, 0)
      var m = if (ends(node).nonEmpty) node else dict(node)
      while (m != 0) {
        ends(m).foreach(pi => counts(pi) += 1)
        m = dict(m)
      }
      i += 1
    }
    new GenericArrayData(counts.map(x => x: Any))
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/**
 * Clipped multiset intersection size of two string arrays —
 * `Σ_g min(count_left(g), count_right(g))` over the distinct elements,
 * the ROUGE-N / clipped-precision kernel. One hash-count pass per side,
 * O(|left| + |right|) per row, where the equivalent higher-order-
 * function fold (`aggregate(array_distinct(r), filter×2)`) is
 * O(distinct · (|left| + |right|)) — measured 3.9× end-to-end on
 * 300-gram documents (q_rouge 3.15 s → 0.82 s at sf0.1).
 */
case class ClippedOverlap(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def prettyName: String = "clipped_overlap"
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects two array<string> arguments")
    }
  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val counts = new java.util.HashMap[UTF8String, Long]()
    var i = 0
    while (i < a.numElements()) {
      if (!a.isNullAt(i)) counts.merge(a.getUTF8String(i), 1L, _ + _)
      i += 1
    }
    var m = 0L
    i = 0
    while (i < b.numElements()) {
      if (!b.isNullAt(i)) {
        val g = b.getUTF8String(i)
        val c = counts.get(g)
        if (c != null && c > 0L) { m += 1L; counts.put(g, c - 1L) }
      }
      i += 1
    }
    m
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/**
 * Johnson–Lindenstrauss random projection of an embedding to `outDim`
 * integer components, cleared to EXACT integers: component j is
 * `Σ_i floor(v_i·1024) · s_ij` with sign `s_ij = ±1` from bit 0 of
 * `mix64(seed + i·outDim + j)`. Achlioptas (JCSS '03) shows ±1 entries
 * satisfy the JL lemma, so inner products / distances on the sketch
 * concentrate around the originals at dimension O(ln n / ε²) — the
 * cheap pre-filter in front of exact cosine refine when 64-dim floats
 * are still too wide to shuffle at corpus scale.
 *
 * The ×1024 quantization is a POWER OF TWO on purpose: float32·1024 is
 * exact in double on any IEEE engine, so there is no round-mode
 * dependence anywhere and external engines replay the sketch
 * bit-for-bit (contrast round(v·1000), whose half-way cases differ by
 * libm). Per-row, zero shuffles; the sign matrix derives from the seed
 * inside the expression — nothing ships with the plan but two ints.
 */
case class RandomProjection(child: Expression, outDim: Int, seed: Long)
    extends UnaryExpression with CodegenFallback {
  override def prettyName: String = "rand_proj"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) if outDim >= 1 =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (array<float|double>, out_dim >= 1)")
  }
  @transient private lazy val isFloat =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType
  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val n = a.numElements()
    val out = new Array[Long](outDim)
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i)) {
        val v = if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)
        val q = math.floor(v * 1024.0).toLong
        if (q != 0L) {
          var j = 0
          while (j < outDim) {
            val s = Hashing.mix64(seed + i.toLong * outDim + j)
            if ((s & 1L) == 0L) out(j) += q else out(j) -= q
            j += 1
          }
        }
      }
      i += 1
    }
    new GenericArrayData(out.map(x => x: Any))
  }
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/**
 * Signed feature hashing (the "hashing trick", Weinberger et al.
 * ICML'09) of a token array into a fixed `dim`-bucket integer vector:
 * each token adds ±1 to bucket `mix64(fnv(token) + seed) mod dim`, the
 * sign drawn from the NEXT bit of the same hash — the unbiased
 * estimator variant (E[x·x'] preserves inner products). The
 * vocabulary-free vectorizer for cheap linear probes/classifiers at
 * corpus scale: no fit, no dictionary, no shuffle — pure per-row.
 * All-integer output, replayable by any engine with the same fnv+mix64
 * (the q_fingerprint oracle machinery).
 */
/**
 * One-pass BPE tokenizer against a LEARNED merge list — the native
 * kernel behind [[Bpe.applyMerges]] (the ROUGE/[[ClippedOverlap]]
 * rewrite applied to the merge rewrite): the whole merge table rides
 * inside ONE expression node and each word tokenizes in a single
 * greedy loop, where the previous `transform(replace(...))` chain was
 * one plan node and one full string copy of the corpus PER MERGE —
 * plan-size explosion and O(merges) passes at a real (thousands-of-
 * rows) vocabulary.
 *
 * Semantics are EXACTLY the delimiter-replace chain the DuckDB oracle
 * replays (see [[Bpe.learn]]'s doc): merges apply in list order, each
 * as one left-to-right non-overlapping fuse pass. The kernel runs the
 * equivalent min-rank iteration (repeatedly fuse the lowest-ranked
 * pair present — the standard BPE encoder loop): for a merge list in
 * LEARNED order the two are identical, because a merge's output unit
 * can only appear in later merges (the Sennrich invariant — pair
 * (x,y) is only countable after x and y exist), so when sequential
 * application reaches rank r no pair of rank < r survives, and a fuse
 * pass only creates pairs involving its own output. BpeSpec pins
 * kernel ≡ sequential-replace on a genuinely learned 64+-merge table.
 *
 * Contract: the merge list must be in learned order (ranks respect
 * production order) — [[Bpe.learn]] output always is. Per-word cost is
 * O(len · merges_applied), INDEPENDENT of the merge-table size; the
 * table itself is one shared hash map built once per executor.
 * Output: the word-by-word flattened subword stream, array<string>.
 */
case class BpeApplyMerges(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression with CodegenFallback {
  require(merges.nonEmpty, "merges must not be empty")
  override def prettyName: String = "pl_bpe_apply"
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(s"$prettyName expects array<string>")
  }
  // rank map keyed x + NUL + y (the u0000 escape below; NUL cannot
  // appear inside a unit: units derive from whitespace-split corpus
  // tokens)
  @transient private lazy val rank: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](merges.length * 2)
    merges.zipWithIndex.foreach { case ((x, y), i) =>
      // first occurrence wins, like the replace chain (a duplicate
      // later merge finds nothing left to fuse)
      m.putIfAbsent(x + "\u0000" + y, i)
    }
    m
  }
  @transient private lazy val mergeArr: Array[(String, String)] = merges.toArray
  override def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[ArrayData]
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var w = 0
    while (w < toks.numElements()) {
      if (!toks.isNullAt(w)) {
        val word = toks.getUTF8String(w).toString
        // initial units: one per code point — line terminators
        // included, matching the DOTALL '(?s)(.)' split of the
        // learn/oracle replace-chain init
        var units = new Array[String](word.codePointCount(0, word.length))
        var ci = 0
        var ui = 0
        while (ci < word.length) {
          val cp = word.codePointAt(ci)
          val n = Character.charCount(cp)
          units(ui) = word.substring(ci, ci + n)
          ci += n
          ui += 1
        }
        // min-rank iteration: each applied rank fuses >=1 pair, so the
        // loop runs at most len-1 times
        var done = units.length < 2
        while (!done) {
          var best = Int.MaxValue
          var i = 0
          while (i < units.length - 1) {
            val r = rank.get(units(i) + "\u0000" + units(i + 1))
            if (r != null && r < best) best = r
            i += 1
          }
          if (best == Int.MaxValue) done = true
          else {
            val (x, y) = mergeArr(best)
            val next = new Array[String](units.length)
            var src = 0
            var dst = 0
            while (src < units.length) {
              if (src < units.length - 1 && units(src) == x && units(src + 1) == y) {
                next(dst) = x + y
                src += 2
              } else {
                next(dst) = units(src)
                src += 1
              }
              dst += 1
            }
            units = java.util.Arrays.copyOf(next, dst)
            done = units.length < 2
          }
        }
        var k = 0
        while (k < units.length) {
          out += UTF8String.fromString(units(k))
          k += 1
        }
      }
      w += 1
    }
    new GenericArrayData(out.toArray)
  }
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/**
 * Viterbi segmentation under a unigram LM vocabulary — the decode half
 * of the SentencePiece tokenizer family (Kudo '18), completing the
 * BPE ([[BpeApplyMerges]]) / WordPiece / Unigram trio. The whole vocab
 * (pieces + integer micro-nat costs) ships in THIS ONE expression node
 * (per-executor hash map, same discipline as the BPE kernel); each
 * word runs an O(len · maxPieceLen) DP entirely in exact longs, so the
 * best segmentation is bit-reproducible on any engine — the DuckDB
 * oracle replays the identical DP with a sliding-window recursive CTE.
 *
 * Tie-break contract (pinned in both engines): equal path cost prefers
 * the LONGER last piece (ascending-length loop with `<=`, i.e. the
 * smallest predecessor index wins). Words decompose per CODE POINT;
 * every single-code-point piece of the corpus must be in the vocab
 * (guaranteed when the vocab was learned from the same corpus —
 * [[graft.pipeline.Unigram.learn]] always keeps all chars), else the
 * word is unsegmentable and evaluation fails loudly.
 *
 * Input: array<string> words; output: their pieces, concatenated in
 * word order. Per-row scalar — zero shuffles, tokenization rides the
 * scan at any corpus size.
 */
case class UnigramViterbi(child: Expression, pieces: Seq[String],
    costs: Seq[Long], maxPieceLen: Int)
    extends UnaryExpression with CodegenFallback {
  require(pieces.nonEmpty && pieces.length == costs.length,
    "pieces/costs must be non-empty and aligned")
  require(maxPieceLen >= 1 && maxPieceLen <= 16,
    s"maxPieceLen must be in [1,16], got $maxPieceLen")
  override def prettyName: String = "pl_unigram_segment"
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(s"$prettyName expects array<string>")
  }
  @transient private lazy val cost: java.util.HashMap[String, java.lang.Long] = {
    val m = new java.util.HashMap[String, java.lang.Long](pieces.length * 2)
    pieces.iterator.zip(costs.iterator).foreach { case (p, c) => m.put(p, c) }
    m
  }
  private val INF = Long.MaxValue / 4
  override def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[ArrayData]
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var w = 0
    while (w < toks.numElements()) {
      if (!toks.isNullAt(w)) {
        val word = toks.getUTF8String(w).toString
        // code-point units, like the BPE kernel's init
        val n = word.codePointCount(0, word.length)
        val cps = new Array[String](n)
        var ci = 0
        var ui = 0
        while (ci < word.length) {
          val cc = Character.charCount(word.codePointAt(ci))
          cps(ui) = word.substring(ci, ci + cc)
          ci += cc
          ui += 1
        }
        if (n > 0) {
          val best = Array.fill(n + 1)(INF)
          val bp = new Array[Int](n + 1)
          best(0) = 0L
          var pos = 1
          while (pos <= n) {
            var l = 1
            val lMax = math.min(maxPieceLen, pos)
            while (l <= lMax) {
              if (best(pos - l) < INF) {
                val piece = cps.slice(pos - l, pos).mkString
                val c = cost.get(piece)
                // `<=`: later (larger) l wins ties — the pinned
                // prefer-longer-last-piece contract
                if (c != null && best(pos - l) + c.longValue() <= best(pos))
                  { best(pos) = best(pos - l) + c.longValue(); bp(pos) = l }
              }
              l += 1
            }
            pos += 1
          }
          if (best(n) >= INF)
            throw new IllegalStateException(
              s"$prettyName: word '$word' is unsegmentable under the vocab " +
                "(a single-code-point piece is missing)")
          val rev = scala.collection.mutable.ArrayBuffer.empty[Any]
          var p = n
          while (p > 0) {
            val l = bp(p)
            rev += UTF8String.fromString(cps.slice(p - l, p).mkString)
            p -= l
          }
          out ++= rev.reverseIterator
        }
      }
      w += 1
    }
    new GenericArrayData(out.toArray)
  }
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

case class FeatureHash(child: Expression, dim: Int, seed: Long)
    extends UnaryExpression with CodegenFallback {
  override def prettyName: String = "feature_hash"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if dim >= 2 => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (array<string>, dim >= 2)")
  }
  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val out = new Array[Long](dim)
    var i = 0
    while (i < a.numElements()) {
      if (!a.isNullAt(i)) {
        val h = Hashing.mix64(
          Hashing.hashBytes(a.getUTF8String(i).getBytes, 0L) + seed)
        // non-negative bucket from the low bits; sign from the next bit
        val b = (((h % dim) + dim) % dim).toInt
        if (((h >>> 62) & 1L) == 0L) out(b) += 1L else out(b) -= 1L
      }
      i += 1
    }
    new GenericArrayData(out.map(x => x: Any))
  }
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}
