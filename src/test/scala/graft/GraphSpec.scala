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

  test("triangles: K4 has exactly its four sorted triangles") {
    val e = (for { a <- 1L to 4L; b <- 1L to 4L if a < b } yield (a, b)).toDF("s", "d")
    val got = Graph.triangles(e, "s", "d").orderBy("a", "b", "c")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq((1L, 2L, 3L), (1L, 2L, 4L), (1L, 3L, 4L), (2L, 3L, 4L)))
  }

  test("triangles: direction, parallel edges and self-loops are ignored") {
    val e = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 1L), (1L, 1L), (2L, 3L))
      .toDF("s", "d")
    val got = Graph.triangles(e, "s", "d").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq((1L, 2L, 3L)))
  }

  test("triangles: general (non-packable id) path matches the packed one") {
    // ids >= 2^32 disable the r20 packed closing key; the shifted K4
    // must close the same four triangles, shifted
    val base = 1L << 32
    val e = (for { a <- 1L to 4L; b <- 1L to 4L if a < b }
      yield (base + a, base + b)).toDF("s", "d")
    val got = Graph.triangles(e, "s", "d").orderBy("a", "b", "c")
      .collect().map(r => (r.getLong(0) - base, r.getLong(1) - base,
        r.getLong(2) - base)).toSeq
    assert(got == Seq((1L, 2L, 3L), (1L, 2L, 4L), (1L, 3L, 4L), (2L, 3L, 4L)))
  }

  test("triangles matches the brute 3-way self-join on a random graph") {
    val rnd = new scala.util.Random(42)
    val edges = (1 to 3000)
      .map(_ => (rnd.nextInt(60).toLong, rnd.nextInt(60).toLong))
      .filter(p => p._1 != p._2).distinct
    val e = edges.toDF("s", "d")
    // brute: canonical edge set, all (a<b<c) with the three edges present
    val canon = edges.map(p => (math.min(p._1, p._2), math.max(p._1, p._2))).toSet
    val nodes = canon.flatMap(p => Seq(p._1, p._2)).toSeq.sorted
    val brute = for {
      a <- nodes; b <- nodes if a < b && canon((a, b))
      c <- nodes if b < c && canon((b, c)) && canon((a, c))
    } yield (a, b, c)
    val got = Graph.triangles(e, "s", "d").orderBy("a", "b", "c")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == brute.sorted)
    // each triangle exactly once — no dedup pass hides double counting
    assert(got.distinct.size == got.size)
  }

  test("hits: hand-computed two-iteration scores on a 2x2 bipartite graph") {
    // hubs 1, 2; authorities 101, 102; 2 cites both
    val e = Seq((1L, 101L), (2L, 101L), (2L, 102L)).toDF("s", "d")
    val r = Graph.hits(e, "s", "d", iterations = 2).collect()
      .map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2))).toMap
    // iter1: a_raw=(2e6,1e6) -> a=(1e6,5e5); h_raw=(1e6,1.5e6) -> h=(666666,1e6)
    // iter2: a_raw=(1666666,1e6) -> a=(1e6,600000);
    //        h_raw=(1e6,1600000) -> h=(625000,1e6)
    assert(r == Map(1L -> (625000L, 0L), 2L -> (1000000L, 0L),
      101L -> (0L, 1000000L), 102L -> (0L, 600000L)))
  }

  test("hits is partitioning-invariant and max-normalized") {
    val rnd = new scala.util.Random(43)
    val e = (1 to 2000).map(_ => (rnd.nextInt(80).toLong, rnd.nextInt(80).toLong))
      .filter(p => p._1 != p._2).toDF("s", "d")
    val a = Graph.hits(e.repartition(1), "s", "d", 2)
      .orderBy("node").collect().map(_.toSeq).toSeq
    val b = Graph.hits(e.repartition(17), "s", "d", 2)
      .orderBy("node").collect().map(_.toSeq).toSeq
    assert(a == b)
    assert(a.map(_(1).asInstanceOf[Long]).max == 1000000L)
    assert(a.map(_(2).asInstanceOf[Long]).max == 1000000L)
  }

  test("labelPropagation: two cliques joined by one bridge separate") {
    import spark.implicits._
    // clique {1,2,3}, clique {10,11,12}, bridge 3-10
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L),
      (10L, 11L), (10L, 12L), (11L, 12L), (3L, 10L)).toDF("s", "d")
    val out = Graph.labelPropagation(edges, "s", "d", iterations = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // min-tie synchronous LPA pulls both cliques toward their smallest
    // ids; the two cliques must not share one community
    assert(out(1L) == out(2L))
    assert(out(11L) == out(12L))
    assert(out(1L) != out(11L), out.toString)
  }

  test("labelPropagation: deterministic across runs; isolated self-label") {
    import spark.implicits._
    val rnd = new scala.util.Random(5)
    val edges = (1 to 300).map(_ =>
      (rnd.nextInt(40).toLong, rnd.nextInt(40).toLong)).toDF("s", "d")
    def run() = Graph.labelPropagation(edges, "s", "d", 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(run() == run())
    // a self-loop-only node is dropped by canonicalization; a node
    // with one neighbor adopts that neighbor's (initial) label
    val pair = Seq((100L, 200L)).toDF("s", "d")
    val got = Graph.labelPropagation(pair, "s", "d", 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(100L -> 200L, 200L -> 100L))
  }

  test("kCore: tendrils fall off, the dense core survives with degrees") {
    import spark.implicits._
    // 4-clique (1,2,3,4) + a chain 4-10-11: the chain nodes die at k=2
    val clique = for (a <- 1L to 4L; b <- (a + 1) to 4L) yield (a, b)
    val edges = (clique ++ Seq((4L, 10L), (10L, 11L))).toDF("s", "d")
    val out = Graph.kCore(edges, "s", "d", k = 2, rounds = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
    // k above the clique degree empties the graph
    assert(Graph.kCore(edges, "s", "d", k = 4, rounds = 2).count() == 0L)
    // fixed rounds: a long chain needs more rounds than it gets
    val chain = (1L to 6L).sliding(2).map(w => (w(0), w(1))).toSeq.toDF("s", "d")
    val after1 = Graph.kCore(chain, "s", "d", k = 2, rounds = 1).count()
    val after2 = Graph.kCore(chain, "s", "d", k = 2, rounds = 2).count()
    assert(after1 > after2) // each round peels one layer of endpoints
  }

  test("adamicAdar: path wedge, triangle exclusion, hub cap") {
    // path a-b-c: one wedge at center b (deg 2) -> (a, c) scored
    val path = Seq((1L, 2L), (2L, 3L)).toDF("s", "d")
    val p = Graph.adamicAdar(path, "s", "d").collect()
    assert(p.length == 1)
    val row = p.head
    assert(row.getLong(0) == 1L && row.getLong(1) == 3L)
    assert(row.getLong(2) == 1L)
    assert(row.getLong(3) == math.round(1e6 / math.log(2.0)))
    // triangle: every candidate pair is an existing edge -> anti-joined away
    val tri = Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("s", "d")
    assert(Graph.adamicAdar(tri, "s", "d").count() == 0L)
    // 5-leaf star: center deg 5; cap 4 excludes it (leaves can't pair)
    val star = (2L to 6L).map(l => (1L, l)).toDF("s", "d")
    assert(Graph.adamicAdar(star, "s", "d", maxDegree = 4).count() == 0L)
    val full = Graph.adamicAdar(star, "s", "d", maxDegree = 5).collect()
    assert(full.length == 10) // C(5,2) leaf pairs, each common=1
    assert(full.forall(_.getLong(3) == math.round(1e6 / math.log(5.0))))
  }

  test("adamicAdar: packed and general pair keys agree (id-range paths)") {
    // the r20 packed-pair-key fast path fires only for integral ids in
    // [0, 2^31); shifting the same wedge out of range must take the
    // general path and score the shifted pair identically
    val base = 1L << 32 // beyond the packable bound
    val path = Seq((1L, 2L), (2L, 3L)).toDF("s", "d")
    val big = Seq((base + 1L, base + 2L), (base + 2L, base + 3L)).toDF("s", "d")
    val p = Graph.adamicAdar(path, "s", "d").collect().head
    val b = Graph.adamicAdar(big, "s", "d").collect().head
    assert(b.getLong(0) == base + 1L && b.getLong(1) == base + 3L)
    assert(b.getLong(2) == p.getLong(2) && b.getLong(3) == p.getLong(3))
    // negative ids are not packable either; same wedge, same score
    val neg = Seq((-3L, -2L), (-2L, -1L)).toDF("s", "d")
    val n = Graph.adamicAdar(neg, "s", "d").collect().head
    assert(n.getLong(0) == -3L && n.getLong(1) == -1L)
    assert(n.getLong(2) == p.getLong(2) && n.getLong(3) == p.getLong(3))
    // boundary: the largest packable pair round-trips through the pack
    val edge = (1L << 31) - 1L
    val wide = Seq((0L, edge - 1L), (edge - 1L, edge)).toDF("s", "d")
    val w = Graph.adamicAdar(wide, "s", "d").collect().head
    assert(w.getLong(0) == 0L && w.getLong(1) == edge)
  }

  test("coMembership: pair counts, hub-user cap, minUsers prune") {
    val rows = Seq(
      (1L, "x"), (1L, "y"), (1L, "z"),
      (2L, "x"), (2L, "y"), (2L, "y"), // duplicate interaction collapses
      (3L, "x"), (3L, "y"), (3L, "z"), (3L, "w")).toDF("u", "i")
    // maxItems=3 drops user 3; (x,y) seen by users 1 and 2
    val got = Graph.coMembership(rows, "u", "i", maxItems = 3, minUsers = 1L)
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    assert(got == Map(("x", "y") -> 2L, ("x", "z") -> 1L, ("y", "z") -> 1L))
    val pruned = Graph.coMembership(rows, "u", "i", maxItems = 3, minUsers = 2L)
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(pruned == Seq(("x", "y")))
    // raising the cap admits user 3's pairs (w enters)
    val wide = Graph.coMembership(rows, "u", "i", maxItems = 4, minUsers = 1L)
    assert(wide.count() == 6L) // C(4,2) over {w,x,y,z} for u3 ∪ previous
  }

  test("modularity: two triangles and a bridge score the textbook 5/14") {
    // edges: triangle {1,2,3}, triangle {4,5,6}, bridge 3-4; m = 7.
    // With labels A={1,2,3}, B={4,5,6}:
    // Q = 2*(3/7 - (7/14)^2) = 5/14 = 0.357142857... -> 357143 ppm
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L),
      (4L, 5L), (5L, 6L), (4L, 6L), (3L, 4L)).toDF("src", "dst")
    val labels = Seq((1L, 1L), (2L, 1L), (3L, 1L),
      (4L, 4L), (5L, 4L), (6L, 4L)).toDF("node", "community")
    val out = Graph.modularity(labels, edges, "src", "dst").collect()(0)
    assert(out.getLong(0) == 2L && out.getLong(1) == 7L)
    assert(out.getLong(2) == 357143L)
    // one community holding everything scores exactly 0
    val one = Seq((1L, 9L), (2L, 9L), (3L, 9L), (4L, 9L), (5L, 9L), (6L, 9L))
      .toDF("node", "community")
    assert(Graph.modularity(one, edges, "src", "dst").collect()(0).getLong(2) == 0L)
  }

  test("modularity fails loudly when labels miss an edge endpoint") {
    // node 6 unlabeled: an inner join would silently drop edges 5-6 and
    // 4-6 and skew Q; the coverage guard must abort instead
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L),
      (4L, 5L), (5L, 6L), (4L, 6L), (3L, 4L)).toDF("src", "dst")
    val partial = Seq((1L, 1L), (2L, 1L), (3L, 1L),
      (4L, 4L), (5L, 4L)).toDF("node", "community")
    val ex = intercept[Exception] {
      Graph.modularity(partial, edges, "src", "dst").collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++
        messages(e.getCause))
    assert(messages(ex).exists(_.contains("no community label")))
  }
}
