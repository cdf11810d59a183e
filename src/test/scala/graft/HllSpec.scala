package graft

import graft.pipeline.{Hashing, Hll, HllSketch}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class HllSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  /** Scalar reference: registers computed row-at-a-time on the driver. */
  private def refRegisters(keys: Seq[Long], m: Int): Array[Long] = {
    val regs = new Array[Long](m)
    keys.foreach { k =>
      val h = Hashing.mix64(k)
      val r = HllSketch.register(h, m)
      val rho = HllSketch.rho(h).toLong
      if (rho > regs(r)) regs(r) = rho
    }
    regs
  }

  private def refEstimate(regs: Array[Long], m: Int): Long = {
    val ssum = regs.map(r => 1L << (33 - r.toInt)).sum
    HllSketch.alphaScaled(m) * m * m * 8589934592L / (ssum * 10000L)
  }

  test("sketch registers match the scalar reference, any partitioning") {
    val keys = (1L to 5000L).map(_ * 7919L)
    val want = refRegisters(keys, 64).toSeq
    for (parts <- Seq(1, 7, 32)) {
      val got = keys.toDF("k").repartition(parts)
        .agg(Hll.sketch(col("k"), 64).as("sk"))
        .collect()(0).getSeq[Long](0)
      assert(got == want, s"parts=$parts")
    }
  }

  test("estimate is the integer-exact reference division") {
    val keys = (1L to 3000L).map(_ * 104729L)
    val got = keys.toDF("k")
      .agg(Hll.sketch(col("k"), 64).as("sk"))
      .select(Hll.estimate(col("sk"), 64).as("est"))
      .collect()(0).getLong(0)
    assert(got == refEstimate(refRegisters(keys, 64), 64))
  }

  test("estimate error is inside 3 sigma (1.04/sqrt(m)) at n >> m") {
    for (m <- Seq(64, 256)) {
      val n = 100000
      val keys = (1 to n).map(i => i.toLong * 2654435761L)
      val est = refEstimate(refRegisters(keys, m), m).toDouble
      val relErr = math.abs(est - n) / n
      val bound = 3.0 * 1.04 / math.sqrt(m)
      assert(relErr < bound, s"m=$m est=$est relErr=$relErr bound=$bound")
    }
  }

  test("merge of daily sketches equals the sketch of the union") {
    val all = (1L to 2000L).map(_ * 31L)
    val df = all.toDF("k").withColumn("day", col("k") % 5)
    val daily = df.groupBy("day").agg(Hll.sketch(col("k"), 64).as("sk"))
    val merged = daily.agg(Hll.merge(col("sk"), 64).as("sk"))
      .collect()(0).getSeq[Long](0)
    assert(merged == refRegisters(all, 64).toSeq)
  }

  test("sketch is duplicate-insensitive") {
    val base = (1L to 500L).map(_ * 13L)
    val dup = base ++ base ++ base
    val a = base.toDF("k").agg(Hll.sketch(col("k"), 64)).collect()(0).getSeq[Long](0)
    val b = dup.toDF("k").agg(Hll.sketch(col("k"), 64)).collect()(0).getSeq[Long](0)
    assert(a == b)
  }

  test("shape validation: m must be a power of two in [16, 256]") {
    intercept[IllegalArgumentException](HllSketch.requireShape(8))
    intercept[IllegalArgumentException](HllSketch.requireShape(512))
    intercept[IllegalArgumentException](HllSketch.requireShape(48))
  }

  test("rho matches the low-32-bit leading-zero definition") {
    assert(HllSketch.rho(0x00000000ffffffffL) == 1)  // bit 31 set
    assert(HllSketch.rho(0x0000000000000001L) == 32) // only bit 0
    assert(HllSketch.rho(0xffffffff00000000L) == 33) // window all zero
    assert(HllSketch.rho(0x0000000080000000L) == 1)
    assert(HllSketch.rho(0x0000000000010000L) == 16)
  }

  test("inclusion-exclusion intersection estimate tracks the exact overlap") {
    import spark.implicits._
    // A = 1..2000, B = 1001..3000 -> |A∩B| = 1000, |A∪B| = 3000
    val a = (1L to 2000L).map(Tuple1(_)).toDF("k")
    val b = (1001L to 3000L).map(Tuple1(_)).toDF("k")
    def est(df: org.apache.spark.sql.DataFrame): Long =
      df.agg(Hll.estimate(Hll.sketch(col("k"), 64), 64)).collect().head.getLong(0)
    val inter = est(a) + est(b) - est(a.union(b))
    // m=64 -> ~13% per-estimate error; the inclusion-exclusion difference
    // compounds, so accept a generous band around 1000
    assert(inter > 300 && inter < 1900, s"est intersect $inter vs exact 1000")
  }
}
