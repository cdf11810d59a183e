package graft

import graft.pipeline.{Hashing, TextFunctions}
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class WinnowSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  private def selections(text: String, k: Int = 3, w: Int = 4): Seq[(Int, Long)] =
    Seq(Tuple1(text)).toDF("text")
      .select(explode(TextFunctions.winnow(col("text"), k, w)).as("s"))
      .select("s.pos", "s.fp").collect()
      .map(r => (r.getInt(0), r.getLong(1))).toSeq

  private def gramHash(toks: Seq[String]): Long =
    Hashing.hashBytes(toks.mkString(" ").getBytes("UTF-8"), 0L)

  test("brute-force reference agreement on random token streams") {
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 20) {
      val n = 1 + rnd.nextInt(30)
      val toks = Seq.fill(n)("t" + rnd.nextInt(6)) // small alphabet -> ties
      val k = 2; val w = 3
      val hs = (0 to n - k).map(i => gramHash(toks.slice(i, i + k)))
      val expected = scala.collection.mutable.LinkedHashSet.empty[Int]
      if (hs.nonEmpty) {
        val firstEnd = math.min(w, hs.length) - 1
        for (e <- firstEnd until hs.length) {
          val start = math.max(0, e - w + 1)
          // rightmost minimum in [start, e]
          val sel = (start to e).minBy(i => (hs(i), -i))
          expected += sel
        }
      }
      val got = selections(toks.mkString(" "), k, w)
      assert(got.map(_._1) == expected.toSeq.sorted, s"toks=$toks")
      got.foreach { case (p, f) => assert(f == hs(p)) }
    }
  }

  test("local guarantee: shared substrings of w+k-1 tokens share a fingerprint") {
    val shared = "alpha beta gamma delta epsilon zeta" // 6 tokens = w+k-1 with k=3,w=4
    val a = selections(s"one two $shared three four")
    val b = selections(s"nine $shared eight seven six five")
    assert(a.map(_._2).toSet.intersect(b.map(_._2).toSet).nonEmpty)
  }

  test("short docs: fewer grams than the window still fingerprint") {
    val s = selections("a b c d", 3, 4) // 2 grams < w -> single window
    assert(s.length == 1)
    val none = selections("a b", 3, 4) // fewer than k tokens -> no grams
    assert(none.isEmpty)
  }

  test("SQL surface: pl_winnow returns (pos, fp) structs") {
    val rows = spark.sql(
      "SELECT inline(pl_winnow('a b c d e f g h', 3, 4))").collect()
    assert(rows.nonEmpty)
    assert(rows.forall { case Row(p: Int, f: Long) => p >= 0 })
  }

  test("winnowPairs finds planted near-dups; hot fingerprints are cut") {
    import graft.pipeline.Dedup
    val shared = (1 to 12).map("s" + _).mkString(" ")
    val boiler = "b1 b2 b3 b4 b5 b6"
    val docs = (
      Seq((1L, s"$shared tail one two"), (2L, s"head $shared end")) ++  // near-dups
      (10L to 40L).map(i => (i, s"$boiler unique$i filler${i * 7} pad${i % 5}"))
    ).toDF("doc_id", "text")
    val pairs = Dedup.winnowPairs(docs, "doc_id", "text",
      k = 3, w = 4, minShared = 2, maxDocFreq = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(pairs.exists(p => p._1 == 1L && p._2 == 2L && p._3 >= 2),
      pairs.mkString(","))
    // the 31 boilerplate docs share only hot fingerprints (df=31 > 5):
    // no pair among them may survive on boilerplate alone
    val boilerPairs = pairs.filter(p => p._1 >= 10L && p._2 >= 10L)
    assert(boilerPairs.isEmpty, boilerPairs.mkString(","))
  }
}
