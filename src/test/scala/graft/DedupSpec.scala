package graft

import graft.pipeline.{Dedup, Dedup2}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class DedupSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  test("connectedComponents resolves chains and stars to one label") {
    // chain 1-2-3-4 (depth 4), star 10-{11,12,13}, singleton 20
    val nodes = Seq(1L, 2L, 3L, 4L, 10L, 11L, 12L, 13L, 20L).toDF("id")
    val edges = Seq((2L, 1L), (3L, 2L), (4L, 3L), (11L, 10L), (12L, 10L), (13L, 10L))
      .toDF("src", "dst")
    val labels = Dedup2.connectedComponents(nodes, edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(Seq(1L, 2L, 3L, 4L).forall(labels(_) == 1L), s"chain: $labels")
    assert(Seq(10L, 11L, 12L, 13L).forall(labels(_) == 10L), s"star: $labels")
    assert(labels(20L) == 20L)
  }

  test("segmentDedup drops corpus-repeated segments, keeps order, keeps empty docs") {
    // boilerplate "c1 c2 c3 c4" opens docs 1-3; the rest is unique prose.
    // doc 4 is ONLY boilerplate -> survives with empty text.
    val docs = Seq(
      (1L, "c1 c2 c3 c4 a1 a2 a3 a4 a5 a6"),
      (2L, "c1 c2 c3 c4 b1 b2 b3 b4"),
      (3L, "c1 c2 c3 c4 d1 d2 d3 d4 d5"),
      (4L, "c1 c2 c3 c4"),
      (5L, "e1 e2 e3 e4 e5")).toDF("doc_id", "text")
    val out = Dedup.segmentDedup(docs, "doc_id", "text", segTokens = 4, maxDf = 1)
      .orderBy("id").collect()
    val byId = out.map(r => r.getLong(0) ->
      (r.getString(1), r.getInt(2), r.getInt(3))).toMap
    // trailing partial segments ("a5 a6", "d5") are unique -> kept
    assert(byId(1L) == (("a1 a2 a3 a4 a5 a6", 3, 1)))
    assert(byId(2L) == (("b1 b2 b3 b4", 2, 1)))
    assert(byId(3L) == (("d1 d2 d3 d4 d5", 3, 1)))
    assert(byId(4L) == (("", 1, 1)))           // fully-boilerplate doc survives
    assert(byId(5L) == (("e1 e2 e3 e4 e5", 2, 0)))
    // order preservation: multi-segment doc reassembles in original order
    val long = Seq((9L, (1 to 20).map(i => s"w$i").mkString(" "))).toDF("doc_id", "text")
    val kept = Dedup.segmentDedup(long, "doc_id", "text", segTokens = 4, maxDf = 1)
      .head().getString(1)
    assert(kept == (1 to 20).map(i => s"w$i").mkString(" "))
  }

  test("LSH keepDecisions collapses a depth-3 near-dup chain transitively") {
    // base text + two successive small edits: consecutive pairs are
    // near-dups; ends are farther apart. One-hop propagation would split
    // this; connected components must not.
    val base = (1 to 60).map(i => s"tok$i").mkString(" ")
    val v1 = (1 to 54).map(i => s"tok$i").mkString(" ") + " alt55 alt56 alt57 alt58 alt59 alt60"
    val v2 = (1 to 48).map(i => s"tok$i").mkString(" ") +
      " alt49 alt50 alt51 alt52 alt53 alt54 alt55 alt56 alt57 alt58 alt59 alt60"
    val other = (1 to 60).map(i => s"zzz$i").mkString(" ")
    val df = Seq((1L, base), (2L, v1), (3L, v2), (4L, other)).toDF("doc_id", "text")
    val out = Dedup2.keepDecisions(df, "doc_id", "text", jaccardThreshold = 0.7)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // if 1-2 and 2-3 are accepted near-dups, 3 must reach keep_id 1
    assert(out(1L) == 1L)
    assert(out(2L) == 1L, s"direct near-dup: $out")
    assert(out(3L) == 1L, s"chained near-dup must collapse transitively: $out")
    assert(out(4L) == 4L)
  }

  test("keepDecisionsBy retains the highest-priority member, not the min id") {
    // full doc carries the LARGEST id — a min-id keeper would retain
    // the truncation; the priority keeper must retain the full text
    val full = (1 to 60).map(i => s"tok$i").mkString(" ")
    val cut = (1 to 48).map(i => s"tok$i").mkString(" ")
    val other = (1 to 60).map(i => s"zzz$i").mkString(" ")
    val df = Seq((1L, cut, "s"), (2L, full, "s"), (3L, other, "s"))
      .toDF("doc_id", "text", "source")
      .withColumn("p", org.apache.spark.sql.functions.size(
        org.apache.spark.sql.functions.split(col("text"), " ")).cast("bigint"))
    val out = Dedup2.keepDecisionsBy(df, "doc_id", "text", "p", "source",
        jaccardThreshold = 0.7)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(out(1L) == (2L, true), s"truncation must defer to the full doc: $out")
    assert(out(2L) == (2L, false))
    assert(out(3L) == (3L, false))
  }

  test("ngramJaccard maxDocFreq bounds the gram-skew join blowup") {
    // 100 docs in one block all sharing one ubiquitous stop-gram — the
    // (blk, gram) self-join on that gram alone is 100·99/2 = 4950 pairs.
    // Docs 1 and 2 additionally share distinctive content (real near-dups).
    val shared = (1 to 30).map(i => s"c$i").mkString(" ")
    val docs = (3 to 100).map(i =>
      (i.toLong, s"of the and u${i}a u${i}b u${i}c u${i}d u${i}e u${i}f u${i}g u${i}h", "s1")) ++
      Seq((1L, s"of the and $shared one extra", "s1"),
          (2L, s"of the and $shared two extra", "s1"))
    val df = docs.toDF("doc_id", "text", "source")

    def shuffleRecords(body: => Unit): Long = {
      val total = new java.util.concurrent.atomic.AtomicLong
      val listener = new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          val m = t.taskMetrics
          if (m != null) total.addAndGet(m.shuffleWriteMetrics.recordsWritten)
        }
      }
      spark.sparkContext.addSparkListener(listener)
      try {
        body
        // Drain the listener bus: the job is done but task-end events are
        // delivered async. A fixed sleep undercounts on a loaded box, so
        // poll until the count holds still, bounded at 15 s.
        val deadline = System.nanoTime() + 15L * 1000 * 1000 * 1000
        var prev = -1L
        var stable = 0
        while (stable < 3 && System.nanoTime() < deadline) {
          Thread.sleep(200)
          val cur = total.get()
          if (cur == prev) stable += 1 else { stable = 0; prev = cur }
        }
      }
      finally spark.sparkContext.removeSparkListener(listener)
      total.get()
    }

    def pairs(cutoff: Int): Set[(Long, Long)] =
      Dedup.ngramJaccard(df, "doc_id", "text", "source", threshold = 0.5, maxDocFreq = cutoff)
        .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    // same accepted pairs either way: the stop-gram carries no signal
    assert(pairs(Int.MaxValue) == Set((1L, 2L)))
    assert(pairs(10) == Set((1L, 2L)))

    val unbounded = shuffleRecords {
      Dedup.ngramJaccard(df, "doc_id", "text", "source", threshold = 0.5)
        .write.mode("overwrite").format("noop").save()
    }
    val bounded = shuffleRecords {
      Dedup.ngramJaccard(df, "doc_id", "text", "source", threshold = 0.5, maxDocFreq = 10)
        .write.mode("overwrite").format("noop").save()
    }
    info(s"shuffle records: unbounded=$unbounded bounded=$bounded")
    assert(bounded < unbounded / 2,
      s"doc-frequency cutoff should eliminate the hot-gram pair blowup: $bounded vs $unbounded")
  }

  test("exact keepDecisions merges exact dups through a bridge doc") {
    val a = (1 to 40).map(i => s"w$i").mkString(" ")
    val df = Seq(
      (1L, a, "s1"), (2L, a, "s1"),                       // exact dups
      (3L, (1 to 36).map(i => s"w$i").mkString(" ") + " x37 x38 x39 x40", "s1"), // near-dup of a
      (7L, "totally different content here entirely", "s1"))
      .toDF("doc_id", "text", "source")
    val out = Dedup2.keepDecisionsExact(df, "doc_id", "text", "source", jaccardThreshold = 0.7)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(1L) == 1L && out(2L) == 1L)
    assert(out(3L) == 1L, s"near edge into exact group: $out")
    assert(out(7L) == 7L)
  }

  test("dedupeWithinDoc collapses repeated segments to first occurrence, in order") {
    val docs = Seq(
      (1L, "a b c d a b e f"),   // seg(2): [a b][c d][a b][e f] -> drop 3rd
      (2L, "x y x y x y"),       // [x y]x3 -> one kept
      (3L, "p q r"),             // [p q][r] -> nothing repeated (odd tail)
      (4L, "")).toDF("doc_id", "text")
    val out = Dedup.dedupeWithinDoc(docs, "doc_id", "text", segTokens = 2)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getInt(3))).toSeq
    assert(out(0) == ((1L, "a b c d e f", 4, 1)))
    assert(out(1) == ((2L, "x y", 3, 2)))
    assert(out(2) == ((3L, "p q r", 2, 0)))
    assert(out(3) == ((4L, "", 1, 0))) // split("") -> [""], one empty segment
  }

  test("substringDedup removes corpus-duplicated >=k-token runs, merges spans") {
    import spark.implicits._
    val docs = Seq(
      // 10-token prefix shared by docs 1 and 2: windows at pos 0..2 are
      // corpus-duplicated, merging to one span [0, 10)
      (1L, "a b c d e f g h i j unique1 tail1"),
      (2L, "a b c d e f g h i j unique2 tail2"),
      (3L, "short doc nothing here"), // < k tokens: no windows, untouched
      // within-doc repetition: every window identical -> whole doc removed
      (4L, "z z z z z z z z z z z z z z z z")
    ).toDF("doc_id", "text")
    val out = graft.pipeline.Dedup.substringDedup(docs, "doc_id", "text", k = 8)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
    assert(out(0) == ((1L, 12L, 1L, 10L, "unique1 tail1")))
    assert(out(1) == ((2L, 12L, 1L, 10L, "unique2 tail2")))
    assert(out(2) == ((3L, 4L, 0L, 0L, "short doc nothing here")))
    assert(out(3) == ((4L, 16L, 1L, 16L, "")))
  }

  test("substringDedup plans only equi-joins (semi on fp, left on id)") {
    import spark.implicits._
    val docs = Seq((1L, "a b c d e f g h i")).toDF("doc_id", "text")
    val plan = graft.pipeline.Dedup.substringDedup(docs, "doc_id", "text")
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), plan)
  }

  test("minhashPairs shuffles id pairs, not duplicated signature payloads") {
    import graft.pipeline.TextFunctions

    def measureShuffle(body: => Unit): Long = {
      val total = new java.util.concurrent.atomic.AtomicLong
      val listener = new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          val m = t.taskMetrics
          if (m != null) total.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        }
      }
      spark.sparkContext.addSparkListener(listener)
      // drain ALL pending listener events (a fixed sleep undercounts
      // stragglers on a loaded box and flakes the comparison)
      try { body; org.apache.spark.sql.graft.shims.waitForListenerBus(spark.sparkContext) }
      finally spark.sparkContext.removeSparkListener(listener)
      total.get()
    }

    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    // planted exact duplicates collide in every band → worst-case pair dup
    val dupes = docs.limit(50)
      .select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
    val corpus = docs.select(col("doc_id"), col("text")).union(dupes)

    // the pre-fix shape: 32-long signatures ride through the band join
    // and the distinct runs over wide (a_id, b_id, est_jaccard) rows
    def oldShape(): Unit = {
      val numHashes = 32; val bands = 8; val rows = numHashes / bands
      val sigs = corpus.select(col("doc_id").as("id"),
        TextFunctions.minhash(col("text"), numHashes).as("sig"))
      val banded = sigs.select(col("id"), col("sig"),
        posexplode(transform(sequence(lit(0), lit(bands - 1)),
          b => xxhash64(slice(col("sig"), b * rows + 1, lit(rows)), b)))
          .as(Seq("band_idx", "band_hash")))
      val a = banded.select(col("id").as("a_id"), col("sig").as("a_sig"),
        col("band_idx"), col("band_hash"))
      val b = banded.select(col("id").as("b_id"), col("sig").as("b_sig"),
        col("band_idx"), col("band_hash"))
      a.join(b, Seq("band_idx", "band_hash"))
        .where(col("a_id") < col("b_id"))
        .select(col("a_id"), col("b_id"),
          (size(filter(zip_with(col("a_sig"), col("b_sig"), (x, y) => x === y), x => x))
            .cast("double") / lit(numHashes.toDouble)).as("est_jaccard"))
        .distinct()
        .where(col("est_jaccard") >= 0.2)
        .write.mode("overwrite").format("noop").save()
    }

    val newBytes = measureShuffle {
      Dedup.minhashPairs(corpus, "doc_id", "text", threshold = 0.2)
        .write.mode("overwrite").format("noop").save()
    }
    val oldBytes = measureShuffle(oldShape())
    info(s"shuffle bytes: new=$newBytes old=$oldBytes")
    assert(newBytes < oldBytes,
      s"id-pair band join should shuffle less than payload band join: $newBytes vs $oldBytes")
  }

  test("snapshotDiff classifies added/removed/changed/unchanged") {
    val old = Seq((1L, "alpha"), (2L, "beta"), (3L, "gamma")).toDF("doc_id", "text")
    val newer = Seq((1L, "alpha"), (2L, "beta prime"), (4L, "delta")).toDF("doc_id", "text")
    val got = Dedup.snapshotDiff(old, newer, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "unchanged", 2L -> "changed",
      3L -> "removed", 4L -> "added"))
    // fp nullability mirrors presence
    val rows = Dedup.snapshotDiff(old, newer, "doc_id", "text")
      .where(col("status") === "added").collect()
    assert(rows.forall(r => r.isNullAt(2) && !r.isNullAt(3)))
  }

  test("diversityReport computes exact type-token ratios per source") {
    val df = Seq(("a", "x y x"), ("a", "x y z"), ("b", "q q q q"))
      .toDF("source", "text")
    val r = Dedup.diversityReport(df, "source", "text")
      .collect().map(x => x.getString(0) -> x).toMap
    assert(r("a").getLong(1) == 2 && r("a").getLong(2) == 6)      // docs, tokens
    assert(r("a").getLong(3) == 3 && r("a").getDouble(4) == 0.5)  // distinct, ttr
    // source a bigrams: "x y","y x","x y","y z" -> 4 total, 3 distinct
    assert(r("a").getLong(5) == 4 && r("a").getLong(6) == 3)
    assert(r("b").getLong(5) == 3 && r("b").getLong(6) == 1)      // q q x3, 1 distinct
  }

  test("jaccardPrefixPairs finds planted shingle near-dups, nothing else") {
    import spark.implicits._
    val base = (1 to 30).map(i => s"w${i % 7} x$i y${i + 1} z${i * 3 % 11}").mkString(" ")
    val docs = Seq(
      (1L, base),
      (2L, base + " tail1"),            // near-dup of 1 (one extra shingle run)
      (3L, (100 to 135).map(i => s"q$i").mkString(" "))) // unrelated
      .toDF("id", "text")
    val out = graft.pipeline.Dedup.jaccardPrefixPairs(docs, "id", "text", 800)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(5)))
    assert(out.length == 1)
    assert(out.head._1 == 1L && out.head._2 == 2L && out.head._3 >= 800L)
    // threshold above the planted pair's similarity (991) returns nothing
    assert(graft.pipeline.Dedup.jaccardPrefixPairs(docs, "id", "text", 995)
      .count() == 0L)
  }

  test("jaccardPrefixPairs shingling is strict: sub-shingle docs never pair") {
    import spark.implicits._
    // Two identical 2-token docs have no 3-gram window: with strict
    // shingling (matching the DuckDB oracle's range-based gram build)
    // they contribute no set elements and must not pair.
    val docs = Seq((1L, "a b"), (2L, "a b"), (3L, "x y z p q r"))
      .toDF("id", "text")
    assert(graft.pipeline.Dedup.jaccardPrefixPairs(docs, "id", "text", 500)
      .count() == 0L)
  }

  test("containmentPrefixPairs: substring doc contained one-way only") {
    import spark.implicits._
    val big = (1 to 40).map(i => s"t$i").mkString(" ")          // 38 shingles
    val sub = (5 to 20).map(i => s"t$i").mkString(" ")          // 14, all in big
    val docs = Seq((1L, sub), (2L, big),
      (3L, (100 to 140).map(i => s"q$i").mkString(" "))).toDF("id", "text")
    val out = graft.pipeline.Dedup
      .containmentPrefixPairs(docs, "id", "text", 800)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    // sub ⊂ big at 1000 permille; big→sub is 14/38 = 368 and never emits
    assert(out.toSeq == Seq((1L, 2L, 14L, 38L, 14L, 1000L)))
  }

  test("containmentPrefixPairs: identical twins pair in both directions") {
    import spark.implicits._
    val txt = (1 to 12).map(i => s"p$i").mkString(" ")
    val docs = Seq((1L, txt), (2L, txt)).toDF("id", "text")
    val out = graft.pipeline.Dedup
      .containmentPrefixPairs(docs, "id", "text", 900)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(5))).sorted
    assert(out.toSeq == Seq((1L, 2L, 1000L), (2L, 1L, 1000L)))
    // strict shingling: sub-3-token docs never pair even when identical
    val shorts = Seq((1L, "a b"), (2L, "a b")).toDF("id", "text")
    assert(graft.pipeline.Dedup
      .containmentPrefixPairs(shorts, "id", "text", 500).count() == 0L)
  }

  test("containmentPrefixPairs hotCap bounds a hot index shingle") {
    import spark.implicits._
    // every doc shares "hot1 hot2 hot3"; low threshold 250 -> the 3-token
    // probe prefix includes the hot shingle for the 4-shingle docs
    val docs = (1 to 20).map(i => (i.toLong, s"hot1 hot2 hot3 u$i v$i w$i"))
      .toDF("id", "text")
    // 6-token docs: 4 shingles each; shared shingle gives inter=1,
    // 1000/4 = 250 -> every ordered pair qualifies at t=250
    assert(graft.pipeline.Dedup.containmentPrefixPairs(docs, "id", "text", 250)
      .count() == 380L)
    // hotCap=8 removes the 20-doc hot block from probe AND index sides
    assert(graft.pipeline.Dedup
      .containmentPrefixPairs(docs, "id", "text", 250, hotCap = 8)
      .count() == 0L)
  }

  test("jaccardPrefixPairs hotCap bounds a deliberately hot prefix shingle") {
    import spark.implicits._
    // 20 docs all share the boilerplate shingle "hot1 hot2 hot3"; at a low
    // threshold the prefix covers every shingle, so that one block alone
    // would fan out C(20,2)=190 candidates.
    val docs = (1 to 20).map(i => (i.toLong, s"hot1 hot2 hot3 u$i v$i w$i"))
      .toDF("id", "text")
    // Default cap (1024) leaves the block intact: every pair shares only
    // the hot shingle, J = 1/7 = 142 permille >= 100.
    assert(graft.pipeline.Dedup.jaccardPrefixPairs(docs, "id", "text", 100)
      .count() == 190L)
    // hotCap = 8 anti-joins the 20-doc block away before the self-join;
    // the remaining per-doc-unique shingles generate zero candidates.
    assert(graft.pipeline.Dedup
      .jaccardPrefixPairs(docs, "id", "text", 100, hotCap = 8)
      .count() == 0L)
  }

  test("cosineSimJoin: identical docs score 1e6 ppm; zero-idf terms drop; dfCap guards") {
    import graft.pipeline.Dedup
    // x appears in all 3 docs -> idf 0 -> x carries no weight, so A and
    // B share nothing; A and C are identical on the weighted view
    val df = Seq((1L, "x y"), (2L, "x z"), (3L, "x y")).toDF("id", "text")
    val got = Dedup.cosineSimJoin(df, "id", "text", thresholdPermille = 500)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    assert(got == Map((1L, 3L) -> ((1L, 1000000L))))
    // dfCap = 1 removes y (df 2) -> no candidate pairs at all
    assert(Dedup.cosineSimJoin(df, "id", "text", 500, dfCap = 1L).count() == 0L)
    // partial overlap scores strictly between 0 and 1e6 and is symmetric
    val p = Seq((1L, "a b c"), (2L, "a b d"), (3L, "q r s")).toDF("id", "text")
    val rows = Dedup.cosineSimJoin(p, "id", "text", 1).collect()
    assert(rows.length == 1)
    val r0 = rows.head
    assert(r0.getLong(0) == 1L && r0.getLong(1) == 2L && r0.getLong(2) == 2L)
    assert(r0.getLong(3) > 0L && r0.getLong(3) < 1000000L)
  }
}
