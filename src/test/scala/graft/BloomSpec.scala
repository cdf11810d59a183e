package graft

import graft.pipeline.{BloomDedup, BloomHash, Hashing}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class BloomSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  test("no false negatives: every reference doc hits its own filter") {
    val docs = (0L until 200L).map(i => (i, s"document number $i with body %d".format(i * 7)))
      .toDF("doc_id", "text")
    val bits = BloomDedup.bloomBits(docs, "text", numBits = 4096, k = 4)
    val out = BloomDedup.annotate(docs, "text", bits, k = 4)
      .where(!col("bloom_hit")).count()
    assert(out == 0L)
  }

  test("novel docs mostly miss at low fill; hits match a brute-force probe") {
    val ref = (0L until 100L).map(i => (i, s"ref doc $i")).toDF("doc_id", "text")
    val bits = BloomDedup.bloomBits(ref, "text", numBits = 16384, k = 4)
    val batch = (1000L until 1500L).map(i => (i, s"novel doc $i")).toDF("doc_id", "text")
    val hits = BloomDedup.annotate(batch, "text", bits, k = 4)
      .where(col("bloom_hit")).collect().map(_.getLong(0)).toSet
    // fill = 100*4/16384 ~ 2.4% -> FP rate ~ (0.024)^4 ~ 3e-7; expect zero
    assert(hits.isEmpty, s"unexpected bloom hits: $hits")
    // cross-check the expression against a driver-side probe of same bits
    val probed = (1000L until 1500L).filter { i =>
      val h = fingerprintOf(s"novel doc $i")
      BloomHash.contains(bits, h, 4)
    }.toSet
    assert(hits == probed)
  }

  test("distributed build (many partitions) ORs to the same bitset as one") {
    val texts = (0L until 500L).map(i => (i, s"part doc $i"))
    val one = BloomDedup.bloomBits(texts.toDF("doc_id", "text").coalesce(1), "text", 8192, 3)
    val many = BloomDedup.bloomBits(texts.toDF("doc_id", "text").repartition(13), "text", 8192, 3)
    assert(java.util.Arrays.equals(one, many))
  }

  test("position math matches the documented Kirsch-Mitzenmacher formula") {
    val h = fingerprintOf("some doc")
    val st = Hashing.mix64(h ^ 0x9e3779b97f4a7c15L) | 1L
    val mask = 16384L - 1L
    val expected = (0 until 4).map(i => ((h + i.toLong * st) & mask).toInt)
    val bits = new Array[Long](16384 / 64)
    BloomHash.set(bits, h, 4)
    val setPositions = (0 until 16384).filter(p => (bits(p >>> 6) & (1L << (p & 63))) != 0L)
    assert(setPositions.toSet == expected.toSet)
    assert(BloomHash.contains(bits, h, 4))
  }

  /** Fingerprint64 semantics, driver-side (polynomial * 1000003 + mix64). */
  private def fingerprintOf(s: String): Long = {
    var h = 0L
    for (b <- s.getBytes("UTF-8")) h = h * 1000003L + (b & 0xffL)
    Hashing.mix64(h)
  }

  test("oversized or non-power-of-two bitsets are rejected with guidance") {
    val df = Seq((1L, "x")).toDF("doc_id", "text")
    val e1 = intercept[IllegalArgumentException] {
      BloomDedup.bloomBits(df, "text", numBits = 1 << 29, k = 4)
    }
    assert(e1.getMessage.contains("shard the filter"))
    intercept[IllegalArgumentException] {
      BloomDedup.bloomBits(df, "text", numBits = 1000, k = 4)
    }
  }
}
