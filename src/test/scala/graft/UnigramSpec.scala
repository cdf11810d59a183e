package graft

import graft.expressions.{asColumn, asExpr}
import graft.pipeline.{Unigram, UnigramViterbi}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class UnigramSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  test("Unigram.learn runs hand-computable hard-EM on a 3-piece vocab") {
    // corpus "ab ab b": words ab(2), b(1); candidate pieces a:2, b:3, ab:2
    // seed total 7 -> costs a/ab 1252763, b 847298
    // Viterbi 'ab': ab (1252763) beats a+b (2100061) -> recount ab:2, b:1, a:0
    // smoothed (cnt+1)/6 -> costs a 1791759, b 1098612, ab 693147; iter 2 idempotent
    val docs = Seq((1L, "ab ab b")).toDF("doc_id", "text")
    val out = Unigram.learn(docs, "text", vocabSize = 4, iters = 2, maxPieceLen = 4)
      .orderBy("piece").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq(
      ("a", 0L, 1791759L), ("ab", 2L, 693147L), ("b", 1L, 1098612L)))
  }

  test("Unigram.segment scores docs under a learned model") {
    val docs = Seq((1L, "ab ab b")).toDF("doc_id", "text")
    val model = Unigram.learn(docs, "text", vocabSize = 4, iters = 2)
      .select("piece", "cost_unats").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    val seg = Unigram.segment(
        Seq((1L, "ab b"), (2L, "")).toDF("doc_id", "text"),
        "doc_id", "text", model)
      .orderBy("id").collect()
    assert(seg(0).getLong(1) == 2L)                      // pieces: ab, b
    assert(seg(0).getLong(2) == 693147L + 1098612L)      // exact cost sum
    assert(seg(0).getString(3) == "ab b")
    assert(seg(1).getLong(1) == 0L && seg(1).getString(3) == "") // empty doc
  }

  test("UnigramViterbi prefers the longer last piece on cost ties") {
    // a+b = 100+100 = ab = 200: the pinned tie-break picks [ab]
    val df = Seq(Tuple1(Seq("ab"))).toDF("w")
    val out = df.select(asColumn(UnigramViterbi(asExpr(col("w")),
        Seq("a", "b", "ab"), Seq(100L, 100L, 200L), 4)).as("p"))
      .collect()(0).getSeq[String](0)
    assert(out == Seq("ab"))
    // but a strictly cheaper split wins: ab=300 > a+b=200 -> [a, b]
    val out2 = df.select(asColumn(UnigramViterbi(asExpr(col("w")),
        Seq("a", "b", "ab"), Seq(100L, 100L, 300L), 4)).as("p"))
      .collect()(0).getSeq[String](0)
    assert(out2 == Seq("a", "b"))
  }

  test("UnigramViterbi fails loudly on an unsegmentable word") {
    val df = Seq(Tuple1(Seq("ax"))).toDF("w")
    val e = intercept[Exception] {
      df.select(asColumn(UnigramViterbi(asExpr(col("w")),
        Seq("a"), Seq(100L), 4)).as("p")).collect()
    }
    assert(e.getMessage != null)
  }
}
