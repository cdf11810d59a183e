package graft

import graft.pipeline.Baskets
import org.scalatest.funsuite.AnyFunSuite

class BasketsSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  test("frequentPairs: support, confidence and lift on a hand case") {
    // baskets: {A,B}, {A,B}, {A,C}, {B}, duplicate (4,B) row collapses
    val df = Seq((1L, "A"), (1L, "B"), (2L, "A"), (2L, "B"),
      (3L, "A"), (3L, "C"), (4L, "B"), (4L, "B")).toDF("bid", "item")
    val out = Baskets.frequentPairs(df, "bid", "item", minSupport = 1L)
      .orderBy("item_a", "item_b").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    // A appears in 3 baskets, B in 3, C in 1, N=4
    // (A,B): support 2, conf 2000/3=666, lift 2*4*1000/(3*3)=888
    // (A,C): support 1, conf 333, lift 1*4*1000/(3*1)=1333
    assert(out.toSeq == Seq(
      ("A", "B", 2L, 666L, 888L),
      ("A", "C", 1L, 333L, 1333L)))
  }

  test("frequentPairs: minSupport prunes; each unordered pair appears once") {
    val df = Seq((1L, "A"), (1L, "B"), (2L, "B"), (2L, "A")).toDF("bid", "item")
    val out = Baskets.frequentPairs(df, "bid", "item", minSupport = 2L).collect()
    assert(out.length == 1)
    assert(out.head.getString(0) == "A" && out.head.getString(1) == "B")
    assert(out.head.getLong(2) == 2L)
    assert(Baskets.frequentPairs(df, "bid", "item", minSupport = 3L).count() == 0)
  }
}
