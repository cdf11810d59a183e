package graft

import graft.pipeline.{NGramLM, Packing, Similarity, Splits, TextFunctions}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TrainingSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  test("NGramLM.score counts rarity against the corpus gram table") {
    // "a b" appears in docs 1 and 2 (freq 2), every other bigram is a hapax
    val docs = Seq(
      (1L, "a b c"),   // grams: "a b"(2), "b c"(1)
      (2L, "a b d"),   // grams: "a b"(2), "b d"(1)
      (3L, "x"),       // no bigrams
      (4L, "p q"))     // grams: "p q"(1)
      .toDF("doc_id", "text")
    val out = NGramLM.score(docs, "doc_id", "text")
      .orderBy("id").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L, 4L))
    val r1 = out(0)
    assert(r1.getInt(1) == 2 && r1.getInt(2) == 1)       // 2 grams, 1 hapax
    assert(r1.getLong(3) == 3L)                          // freqs 2 + 1
    assert(r1.getDouble(4) == 0.5 && r1.getDouble(5) == 1.5)
    val r3 = out(2)
    assert(r3.getInt(1) == 0 && r3.isNullAt(4) && r3.isNullAt(5))
    val r4 = out(3)
    assert(r4.getInt(2) == 1 && r4.getDouble(4) == 1.0)  // pure hapax doc
  }

  test("NGramLM.knScore matches hand-computed interpolated Kneser-Ney") {
    // corpus grams: "a b"(2), "b c"(1), "b d"(1); V2 = 3 types
    // ctx a: c1=2, N1+(a.)=1;  ctx b: c1=2, N1+(b.)=2
    // Pcont = 1/3 for each of b, c, d (one predecessor each)
    // P(b|a) = (max(2-.75,0) + .75*1*(1/3)) / 2 = 0.75
    // P(c|b) = P(d|b) = (max(1-.75,0) + .75*2*(1/3)) / 2 = 0.375
    // (sanity: given context b the vocab sums to 1: P(b|b)=0.25 +
    //  P(c|b)+P(d|b)=0.75)
    val docs = Seq(
      (1L, "a b c"), (2L, "a b d"), (3L, "x")).toDF("doc_id", "text")
    val out = NGramLM.knScore(docs, "doc_id", "text")
      .orderBy("id").collect()
    val lpAB = math.round(1e6 * math.log(0.75))    // -287682
    val lpBC = math.round(1e6 * math.log(0.375))   // -980829
    assert(lpAB == -287682L && lpBC == -980829L)
    val r1 = out(0)
    assert(r1.getInt(1) == 2 && r1.getLong(2) == lpAB + lpBC)
    assert(r1.getDouble(3) == -(lpAB + lpBC).toDouble / 2)
    val r2 = out(1)
    assert(r2.getLong(2) == r1.getLong(2)) // same probabilities, d ≡ c by symmetry
    val r3 = out(2)                        // <2 tokens: zero counts, NULL average
    assert(r3.getInt(1) == 0 && r3.getLong(2) == 0L && r3.isNullAt(3))
  }

  test("Packing fills bins contiguously and never splits the shard order") {
    val docs = (0L until 40L).map(i => (i, "tok " * 600)).toDF("doc_id", "text")
    val packed = Packing.packBins(docs, "doc_id",
        TextFunctions.token_count($"text"), capacity = 2048L, numShards = 4)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    assert(packed.length == 40)
    // bin is exactly start_offset div capacity, offsets are per-shard cumsums
    assert(packed.forall { case (_, _, bin, off) => bin == off / 2048 })
    val byShard = packed.groupBy(_._2)
    byShard.foreach { case (_, rows) =>
      val offsets = rows.map(_._4).sorted
      // consecutive offsets differ by exactly one doc's token count (601:
      // "tok " * 600 splits into 600 "tok" + 1 trailing empty token)
      offsets.zip(offsets.tail).foreach { case (a, b) => assert(b - a == 601L) }
    }
    val stats = Packing.binStats(docs, "doc_id",
        TextFunctions.token_count($"text"), capacity = 2048L, numShards = 4)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getInt(2), r.getLong(3)))
    assert(stats.map(_._3).sum == 40)
    assert(stats.map(_._4).sum == 40L * 601L)
    // contiguous fill: at most 4 starts (0,601,1202,1803) fit in one
    // 2048-token bin window at 601 tokens per doc
    assert(stats.forall(_._3 <= 4))
  }

  test("Splits.assign is deterministic, complete and ~98/1/1") {
    val docs = (0L until 2000L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val a = Splits.assign(docs, "doc_id").select($"doc_id", $"split")
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    val b = Splits.assign(docs.repartition(13), "doc_id").select($"doc_id", $"split")
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(a == b, "split assignment changed under repartition")
    val n = a.values.groupBy(identity).view.mapValues(_.size).toMap
    assert(n.keySet == Set("train", "val", "test"))
    assert(n("train") > 1900 && n("val") < 50 && n("test") < 50)
  }

  test("prioritySample is deterministic and leans toward heavy weights") {
    // two weight classes: heavy items (w=1000) vs light (w=10) — the
    // heavy class should dominate the sample ~100:1 in expectation
    val items = (0L until 2000L).map(i =>
      (i, if (i < 1000) 1000L else 10L)).toDF("id", "w")
    val a = Splits.prioritySample(items, "id", "w", 100)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSeq
    val b = Splits.prioritySample(items.repartition(13), "id", "w", 100)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSeq
    assert(a == b, "sample changed under repartition")
    assert(a.size == 100)
    val heavy = a.count(_._1 < 1000)
    assert(heavy >= 90, s"heavy class should dominate, got $heavy/100")
    // priorities are sorted, non-negative (sign bit cleared), exact ints
    assert(a.map(_._2) == a.map(_._2).sorted && a.forall(_._2 >= 0))
    intercept[IllegalArgumentException](Splits.prioritySample(items, "id", "w", 0))
  }

  test("pqTopK ranks exact self-duplicates first") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val dupes = emb.limit(8)
      .select(($"vec_id" + 100000L).as("vec_id"), $"embedding", $"label")
    val out = Similarity.pqTopK(emb.union(dupes), "vec_id", "embedding", 3)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(3)))
    // a planted exact duplicate shares all m codes with its original, so
    // ADC gives it the maximal score for that query: rank 1 (ties to the
    // lower id are impossible here — the duplicate ids are far higher)
    for (i <- 0L until 8L) {
      val top = out.filter(t => t._1 == i && t._3 == 1).map(_._2)
      assert(top.length == 1)
      // top neighbor carries the same PQ codes; with 500 vectors in 16^4
      // code space, collisions with a DIFFERENT vector are possible but
      // the planted copy must be among the maximal-score neighbors
      val topSimRows = out.filter(t => t._1 == i).map(_._2)
      assert(topSimRows.contains(i + 100000L),
        s"query $i: planted duplicate not in top-3 ${topSimRows.toSeq}")
    }
  }
}
