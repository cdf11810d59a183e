package graft

import graft.pipeline.Chunking
import org.scalatest.funsuite.AnyFunSuite

class ChunkingSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  test("overlapping windows cover every token; boundaries are exact") {
    val df = Seq((1L, (1 to 10).map(i => s"t$i").mkString(" "))).toDF("id", "text")
    val out = Chunking.chunk(df, "id", "text", sizeTokens = 8, overlap = 4)
      .orderBy("chunk_idx")
      .collect().map(r => (r.getInt(1), r.getInt(2), r.getString(3), r.getInt(4)))
    // stride 4, n=10 -> starts 0, 4, 8
    assert(out.length == 3)
    assert(out(0) == ((0, 0, "t1 t2 t3 t4 t5 t6 t7 t8", 8)))
    assert(out(1) == ((1, 4, "t5 t6 t7 t8 t9 t10", 6)))
    assert(out(2) == ((2, 8, "t9 t10", 2)))
  }

  test("short docs yield a single short chunk; no overlap means disjoint") {
    val df = Seq((1L, "a b c"), (2L, "x")).toDF("id", "text")
    val out = Chunking.chunk(df, "id", "text", sizeTokens = 8, overlap = 0)
      .collect().map(r => (r.getLong(0), r.getString(3))).toMap
    assert(out == Map(1L -> "a b c", 2L -> "x"))

    val dj = Chunking.chunk(
      Seq((1L, (1 to 9).map("w" + _).mkString(" "))).toDF("id", "text"),
      "id", "text", sizeTokens = 4, overlap = 0)
      .orderBy("chunk_idx").collect().map(_.getString(3))
    assert(dj.toSeq == Seq("w1 w2 w3 w4", "w5 w6 w7 w8", "w9"))
  }

  test("invalid parameters are rejected") {
    val df = Seq((1L, "a")).toDF("id", "text")
    assertThrows[IllegalArgumentException] {
      Chunking.chunk(df, "id", "text", sizeTokens = 0)
    }
    assertThrows[IllegalArgumentException] {
      Chunking.chunk(df, "id", "text", sizeTokens = 4, overlap = 4)
    }
  }

  test("pl_chunks SQL scalar agrees with the DataFrame op") {
    val rows = spark.sql(
      "SELECT inline(pl_chunks('t1 t2 t3 t4 t5 t6 t7 t8 t9 t10', 8, 4))").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getString(2), r.getInt(3)))
    assert(rows.toSeq == Seq(
      (0, 0, "t1 t2 t3 t4 t5 t6 t7 t8", 8),
      (1, 4, "t5 t6 t7 t8 t9 t10", 6),
      (2, 8, "t9 t10", 2)))
  }
}
