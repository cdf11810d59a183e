package graft

import graft.pipeline.Graph
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class GraphSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  test("pageRank: hand-computed fixed-point iteration on a 3-node chain") {
    // A→B, A→C, B→C; C dangling (leaks mass, documented simple variant)
    val e = Seq((1L, 2L), (1L, 3L), (2L, 3L)).toDF("s", "d")
    val r = Graph.pageRank(e, "s", "d", iterations = 2)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    // iter1: A=150000, B=(150e6+850*500000)//1000=575000,
    //        C=(150e6+850*1500000)//1000=1425000
    // iter2: A=150000, B=(150e6+850*(150000 div 2))//1000=213750,
    //        C=(150e6+850*(75000+575000))//1000=702500
    assert(r == Map(1L -> 150000L, 2L -> 213750L, 3L -> 702500L))
  }

  test("pageRank: star hub outranks leaves; parallel edges dedupe") {
    val leaves = (2L to 21L)
    val e = (leaves.map(l => (l, 1L)) ++ leaves.take(5).map(l => (l, 1L)) // dups
      ++ leaves.map(l => (1L, l))).toDF("s", "d")
    val r = Graph.pageRank(e, "s", "d", iterations = 3)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(leaves.forall(l => r(1L) > r(l)))
    // dedup: the duplicated edges must not double leaf contributions —
    // all leaves have identical structure, so identical rank
    assert(leaves.map(r).toSet.size == 1)
  }

  test("pageRank is partitioning-invariant (integer sums are associative)") {
    val rnd = new scala.util.Random(41)
    val e = (1 to 2000).map(_ => (rnd.nextInt(80).toLong, rnd.nextInt(80).toLong))
      .filter(p => p._1 != p._2).toDF("s", "d")
    val a = Graph.pageRank(e.repartition(1), "s", "d", 3)
      .orderBy("node").collect().map(_.toSeq).toSeq
    val b = Graph.pageRank(e.repartition(17), "s", "d", 3)
      .orderBy("node").collect().map(_.toSeq).toSeq
    assert(a == b)
  }

  test("pageRank validates its parameters") {
    val e = Seq((1L, 2L)).toDF("s", "d")
    intercept[IllegalArgumentException](Graph.pageRank(e, "s", "d", iterations = 0))
    intercept[IllegalArgumentException](Graph.pageRank(e, "s", "d", dampingPermille = 1500))
  }
}
