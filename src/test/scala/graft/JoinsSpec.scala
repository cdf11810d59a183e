package graft

import graft.pipeline.Joins
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class JoinsSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  private def big = Seq(
    // hot key 1 dominates, key 3 absent from small side
    (1L, 10), (1L, 11), (1L, 12), (1L, 13), (1L, 14),
    (2L, 20), (2L, 21), (3L, 30)).toDF("k", "bv")

  private def small = Seq(
    (1L, "a"), (2L, "b"), (4L, "d")).toDF("k", "sv")

  test("saltedJoin is row-identical to the plain inner join") {
    for (salts <- Seq(1, 3, 8)) {
      val got = Joins.saltedJoin(big, small, "k", salts)
        .orderBy("k", "bv").collect().map(r =>
          (r.getLong(0), r.getInt(1), r.getString(2))).toSeq
      val want = big.join(small, Seq("k"))
        .orderBy("k", "bv").collect().map(r =>
          (r.getLong(0), r.getInt(1), r.getString(2))).toSeq
      assert(got == want, s"salts=$salts")
    }
  }

  test("saltedJoin handles duplicate keys on BOTH sides (pair multiplicity)") {
    val b = Seq((1L, "x"), (1L, "y")).toDF("k", "bv")
    val s = Seq((1L, "p"), (1L, "q")).toDF("k", "sv")
    val got = Joins.saltedJoin(b, s, "k", 4).collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq.sorted
    assert(got == Seq(("x", "p"), ("x", "q"), ("y", "p"), ("y", "q")))
  }

  test("saltedJoin spreads a hot key across salt buckets") {
    // with the row-hash salt, 5 distinct rows of key 1 should not all
    // land in one of 8 buckets (probability 8^-4 per layout; the data
    // is fixed so this is a deterministic regression pin, not a flake)
    val salted = big.withColumn("salt",
      pmod(xxhash64(struct(col("k"), col("bv"))), lit(8L)))
    val n = salted.where(col("k") === 1).select("salt").distinct().count()
    assert(n > 1, "hot key collapsed into a single salt bucket")
  }

  test("saltedJoin validates salts") {
    intercept[IllegalArgumentException](Joins.saltedJoin(big, small, "k", 0))
  }

  private def changelog = Seq(
    // key, ver, uniq, payload
    ("u1", 1L, 1L, "a"), ("u1", 3L, 2L, "c"), ("u1", 2L, 3L, "b"),
    ("u2", 5L, 4L, "x"),
    ("u3", 7L, 5L, "t"), ("u3", 7L, 6L, "s") // tie on ver -> uniq 6 wins
  ).toDF("k", "ver", "uniq", "v")

  test("compactLatest keeps the lexicographically greatest orderCols row") {
    val got = Joins.compactLatest(changelog, Seq("k"), Seq("ver", "uniq"))
      .orderBy("k").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(3))).toSeq
    assert(got == Seq(("u1", 3L, "c"), ("u2", 5L, "x"), ("u3", 7L, "s")))
  }

  test("compactLatest agrees with the window row_number formulation") {
    val rnd = new scala.util.Random(11)
    val rows = (1 to 400).map(i =>
      (s"k${rnd.nextInt(20)}", rnd.nextInt(50).toLong, i.toLong, s"p$i"))
    val df = rows.toDF("k", "ver", "uniq", "v")
    val got = Joins.compactLatest(df, Seq("k"), Seq("ver", "uniq"))
      .orderBy("k").collect().map(_.toSeq).toSeq
    val w = org.apache.spark.sql.expressions.Window.partitionBy("k")
      .orderBy(col("ver").desc, col("uniq").desc)
    val want = df.withColumn("rn", row_number().over(w)).where(col("rn") === 1)
      .drop("rn").orderBy("k").collect().map(_.toSeq).toSeq
    assert(got == want)
  }

  test("deletion_variants and char_pairs: hand cases and length guards") {
    import graft.pipeline.TextFunctions
    val df = Seq("cat", "ab", "x", "").toDF("t")
    val vars = df.select(TextFunctions.deletion_variants(col("t")))
      .collect().map(_.getSeq[String](0)).toSeq
    assert(vars == Seq(
      Seq("cat", "at", "ct", "ca"), Seq("ab", "b", "a"), Seq("x", ""), Seq("")))
    val pairs = df.select(TextFunctions.char_pairs(col("t")))
      .collect().map(_.getSeq[String](0)).toSeq
    assert(pairs == Seq(Seq("ca", "at"), Seq("ab"), Seq(), Seq()))
  }

  test("fuzzyJoin matches a brute-force Levenshtein join") {
    val vocab = Seq("batch", "match", "latch", "hash", "hatch", "spark",
      "sparks", "park", "data", "date").toDF("tok")
    val noisy = Seq("batch", "bratch", "hach", "sprk", "daat", "zzz")
      .toDF("q")
    val got = Joins.fuzzyJoin(noisy, vocab, "q", "tok")
      .orderBy("q", "tok").collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq
    // brute reference via Spark's own levenshtein over the cross product
    val want = noisy.crossJoin(vocab)
      .where(levenshtein(col("q"), col("tok")) <= 1)
      .orderBy("q", "tok").collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq
    assert(got == want && want.nonEmpty)
    assert(got.contains(("bratch", "batch")) && got.contains(("batch", "batch")))
    assert(!got.exists(_._1 == "zzz"))
  }

  test("fuzzyJoin plans an equi-join on variants, not a nested loop") {
    val vocab = Seq("abc", "abd").toDF("tok")
    val noisy = Seq("abx").toDF("q")
    val plan = Joins.fuzzyJoin(noisy, vocab, "q", "tok")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"fuzzy join degenerated to a product:\n$plan")
  }

  test("fuzzyJoin rejects colliding column names") {
    val a = Seq("x").toDF("tok"); val b = Seq("y").toDF("tok")
    intercept[IllegalArgumentException](Joins.fuzzyJoin(a, b, "tok", "tok"))
  }

  test("compactLatest plans a partial aggregate, not a window sort") {
    val plan = Joins.compactLatest(changelog, Seq("k"), Seq("ver", "uniq"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"expected aggregate, got:\n$plan")
    assert(plan.contains("partial_max_by") || plan.contains("HashAggregate")
      || plan.contains("SortAggregate"), s"no aggregate in:\n$plan")
  }

  test("bloomJoin is row-identical to the plain inner join") {
    val got = Joins.bloomJoin(big, small, "k", numBits = 1 << 10, k = 3)
      .orderBy("k", "bv").collect().map(r =>
        (r.getLong(0), r.getInt(1), r.getString(2))).toSeq
    val want = big.join(small, Seq("k"))
      .orderBy("k", "bv").collect().map(r =>
        (r.getLong(0), r.getInt(1), r.getString(2))).toSeq
    assert(got == want && want.nonEmpty)
  }

  test("bloomJoin prunes big-side rows whose key misses the filter") {
    // key 3 is absent from the small side: at 2^10 bits over 3 keys the
    // false-positive odds are negligible, so the pre-join filter should
    // drop its row before the join (count the filtered scan's output)
    val bits = small.select(graft.pipeline.BloomDedup
        .bloomAgg(xxhash64(col("k")), 1 << 10, 3).as("bits"))
      .head().getSeq[Long](0).toArray
    val kept = big.where(graft.pipeline.BloomDedup
        .bloomContains(lit(bits), xxhash64(col("k")), 3))
    assert(kept.count() == 7, "expected key 3's row pruned pre-join")
  }

  private def dupDocs = Seq(
    (0L, "the quick brown fox jumps over the lazy dog"),
    (1L, "the quick brown fox jumps over the lazy cat"), // 3 edits from 0
    (2L, "the quick brown fox leaps over a sleepy dog"), // shares prefix, far
    (3L, "completely different text with no shared prefix"),
    (4L, "the quick brown fox jumps over the lazy dog")  // exact dup of 0
  ).toDF("doc_id", "text")

  test("editDistancePairs matches the brute blocked Levenshtein") {
    val got = Joins.editDistancePairs(dupDocs, "doc_id", "text",
        prefixLen = 16, maxDist = 5, hotCap = 64)
      .orderBy("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    // brute: all a<b pairs sharing the 16-char prefix, exact distance
    val d = dupDocs.select(col("doc_id"), col("text"),
      substring(col("text"), 1, 16).as("blk"))
    val want = d.alias("a").join(d.alias("b"),
        col("a.blk") === col("b.blk") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"),
        levenshtein(col("a.text"), col("b.text")).cast("int").as("dist"))
      .where(col("dist") <= 5)
      .orderBy("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    assert(got == want)
    assert(got.contains((0L, 1L, 3)) && got.contains((0L, 4L, 0)))
    assert(!got.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("editDistancePairs hot-block guard excludes oversized blocks") {
    val boiler = (0L to 9L).map(i => (i, s"boilerplate header $i")).toDF("doc_id", "text")
    val n = Joins.editDistancePairs(boiler, "doc_id", "text",
      prefixLen = 16, maxDist = 10, hotCap = 4).count()
    assert(n == 0, "block of 10 > hotCap 4 must be excluded entirely")
    val kept = Joins.editDistancePairs(boiler, "doc_id", "text",
      prefixLen = 16, maxDist = 10, hotCap = 100).count()
    assert(kept == 45, "under the cap all 10*9/2 pairs refine")
  }

  private def randomIntervals(seed: Int, n: Int, tag: String) = {
    val rnd = new scala.util.Random(seed)
    (1 to n).map { i =>
      val s = rnd.nextInt(1000).toLong
      (rnd.nextInt(5).toLong, i.toLong, s, s + rnd.nextInt(120).toLong)
    }.toDF("k", s"id_$tag", s"s_$tag", s"e_$tag")
  }

  test("overlapJoin matches the theta join for any bucket width") {
    val a = randomIntervals(7, 300, "a")
    val b = randomIntervals(13, 300, "b")
    val want = a.join(b, a("k") === b("k") &&
        col("s_a") <= col("e_b") && col("s_b") <= col("e_a"))
      .select(a("k"), col("id_a"), col("id_b"))
      .orderBy("k", "id_a", "id_b").collect().map(_.toSeq).toSeq
    for (w <- Seq(1L, 7L, 64L, 1000L, 100000L)) {
      val got = Joins.overlapJoin(a, b, "k", "s_a", "e_a", "s_b", "e_b", w)
        .select(col("k"), col("id_a"), col("id_b"))
        .orderBy("k", "id_a", "id_b").collect().map(_.toSeq).toSeq
      assert(got == want, s"bucketWidth=$w")
      // exactly-once: no hidden distinct — duplicates would surface here
      assert(got.distinct.size == got.size, s"bucketWidth=$w emitted dups")
    }
  }

  test("overlapJoin: touching endpoints overlap, disjoint spans do not") {
    val a = Seq((1L, 10L, 0L, 5L)).toDF("k", "id_a", "s_a", "e_a")
    val b = Seq((1L, 20L, 5L, 9L), (1L, 21L, 6L, 9L))
      .toDF("k", "id_b", "s_b", "e_b")
    val got = Joins.overlapJoin(a, b, "k", "s_a", "e_a", "s_b", "e_b", 4L)
      .select("id_b").collect().map(_.getLong(0)).toSeq
    assert(got == Seq(20L), "closed intervals: [0,5] meets [5,9], not [6,9]")
  }

  test("overlapJoin plans bucket equi-joins, not a nested loop") {
    val a = randomIntervals(7, 50, "a")
    val b = randomIntervals(13, 50, "b")
    val plan = Joins.overlapJoin(a, b, "k", "s_a", "e_a", "s_b", "e_b", 64L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("applyChangelog: upsert, insert, delete and passthrough in one merge") {
    val snap = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "pay")
    val changes = Seq(
      (1L, "a2", "U", 10L, 1L),  // update existing
      (4L, "d", "U", 10L, 2L),   // insert new key
      (2L, "x", "D", 10L, 3L),   // tombstone
      (2L, "stale", "U", 5L, 4L) // older than the tombstone: ignored
    ).toDF("k", "pay", "op", "ver", "id")
    val got = Joins.applyChangelog(snap, changes, Seq("k"), Seq("ver", "id"), "op")
      .orderBy("k").collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got == Seq((1L, "a2"), (3L, "c"), (4L, "d")))
  }

  test("applyChangelog: a delete-then-reinsert keeps the latest insert") {
    val snap = Seq((1L, "a")).toDF("k", "pay")
    val changes = Seq((1L, "x", "D", 1L, 1L), (1L, "re", "U", 2L, 2L))
      .toDF("k", "pay", "op", "ver", "id")
    val got = Joins.applyChangelog(snap, changes, Seq("k"), Seq("ver", "id"), "op")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got == Seq((1L, "re")))
  }

  test("applyChangelog validates required change columns") {
    val snap = Seq((1L, "a")).toDF("k", "pay")
    val bad = Seq((1L, "U", 1L)).toDF("k", "op", "ver")
    intercept[IllegalArgumentException](
      Joins.applyChangelog(snap, bad, Seq("k"), Seq("ver"), "op"))
  }

  test("bandJoin matches the theta join, exactly once, including negatives") {
    val rnd = new scala.util.Random(17)
    val mk = (seed: Int, tag: String) => {
      val r = new scala.util.Random(seed)
      (1 to 300).map(i => (r.nextInt(4).toLong, i.toLong,
        r.nextInt(400).toLong - 200L)).toDF("k", s"id_$tag", s"v_$tag")
    }
    val a = mk(3, "a"); val b = mk(11, "b")
    for (eps <- Seq(1L, 7L, 50L, 1000L)) {
      val want = a.join(b, a("k") === b("k") &&
          abs(col("v_a") - col("v_b")) <= eps)
        .select(a("k"), col("id_a"), col("id_b"))
        .orderBy("k", "id_a", "id_b").collect().map(_.toSeq).toSeq
      val got = Joins.bandJoin(a, b, "k", "v_a", "v_b", eps)
        .select(col("k"), col("id_a"), col("id_b"))
        .orderBy("k", "id_a", "id_b").collect().map(_.toSeq).toSeq
      assert(got == want, s"eps=$eps")
      assert(got.distinct.size == got.size, s"eps=$eps emitted dups")
    }
    val plan = Joins.bandJoin(a, b, "k", "v_a", "v_b", 50L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan)
    intercept[IllegalArgumentException](Joins.bandJoin(a, b, "k", "v_a", "v_b", 0L))
  }

  test("overlapJoin validates width and rejects colliding columns") {
    val a = randomIntervals(7, 5, "a")
    intercept[IllegalArgumentException](
      Joins.overlapJoin(a, a, "k", "s_a", "e_a", "s_a", "e_a", 64L))
    intercept[IllegalArgumentException](
      Joins.overlapJoin(a, randomIntervals(13, 5, "b"), "k",
        "s_a", "e_a", "s_b", "e_b", 0L))
  }

  test("longestPrefixJoin: longest match wins, left outer, payload rides") {
    import spark.implicits._
    // ip 0xC0A80105 = 192.168.1.5; rules at /8 (192.*), /16 (192.168.*),
    // /24 (192.168.1.*) — the /24 must win; 10.0.0.1 matches only /8=10;
    // 8.8.8.8 matches nothing
    val ips = Seq(
      (1L, 0xC0A80105L), (2L, 0x0A000001L), (3L, 0x08080808L)
    ).toDF("id", "ip")
    val rules = Seq(
      (8, 0xC0L, "r8"), (16, 0xC0A8L, "r16"), (24, 0xC0A801L, "r24"),
      (8, 0x0AL, "r10")
    ).toDF("plen", "prefix", "action")
    val out = Joins.longestPrefixJoin(ips, "ip", "id", rules, "plen", "prefix")
      .orderBy("id").collect()
    assert(out.length == 3)
    assert(out(0).getInt(2) == 24 && out(0).getString(3) == "r24")
    assert(out(1).getInt(2) == 8 && out(1).getString(3) == "r10")
    assert(out(2).isNullAt(2) && out(2).isNullAt(3))
  }

  test("longestPrefixJoin plans equi-joins only (no nested loop)") {
    import spark.implicits._
    val ips = Seq((1L, 42L)).toDF("id", "ip")
    val rules = Seq((8, 0L, "r")).toDF("plen", "prefix", "action")
    val plan = Joins.longestPrefixJoin(ips, "ip", "id", rules, "plen", "prefix")
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), plan)
  }

  test("pathPrefixJoin: deepest rule wins, segment boundaries respected") {
    import spark.implicits._
    val urls = Seq((1L, "/a/b/c"), (2L, "/a/x"), (3L, "/ab/c"), (4L, "/z"))
      .toDF("id", "path")
    val rules = Seq(("/a", "r-a"), ("/a/b", "r-ab")).toDF("prefix", "action")
    val out = Joins.pathPrefixJoin(urls, "path", "id", rules, "prefix")
      .orderBy("id").collect()
    assert(out(0).getInt(2) == 2 && out(0).getString(3) == "r-ab") // /a/b/c
    assert(out(1).getInt(2) == 1 && out(1).getString(3) == "r-a")  // /a/x
    // /ab/c must NOT match /a — the LIKE-prefix bug this join avoids
    assert(out(2).isNullAt(2) && out(2).isNullAt(3))
    assert(out(3).isNullAt(2))
  }

  test("pathPrefixJoin plans equi-joins only") {
    import spark.implicits._
    val urls = Seq((1L, "/a/b")).toDF("id", "path")
    val rules = Seq(("/a", "r")).toDF("prefix", "action")
    val plan = Joins.pathPrefixJoin(urls, "path", "id", rules, "prefix")
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), plan)
  }

  test("longestPrefixJoin rejects out-of-range prefix lengths") {
    import spark.implicits._
    val ips = Seq((1L, 42L)).toDF("id", "ip")
    val rules = Seq((40, 0L, "r")).toDF("plen", "prefix", "action")
    intercept[IllegalArgumentException](
      Joins.longestPrefixJoin(ips, "ip", "id", rules, "plen", "prefix"))
  }

  test("conservationAudit: matches, mismatches and orphan headers") {
    import spark.implicits._
    val parent = Seq((1L, 100L), (2L, 50L), (3L, 70L)).toDF("k", "v")
    val child = Seq((1L, 60L), (1L, 40L), (2L, 49L)).toDF("ck", "cv")
    val out = graft.pipeline.Joins.conservationAudit(
        parent, "k", "v", child, "ck", "cv")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(out(1L) == ((100L, 100L, 2L, 0L)))   // conserved
    assert(out(2L) == ((50L, 49L, 1L, 1L)))     // off by one cent
    assert(out(3L) == ((70L, 0L, 0L, 70L)))     // orphan header surfaces
  }
}
