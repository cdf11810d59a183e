package graft

import graft.pipeline.{Decontaminate, Mixture, PII, QuantileFilter}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class CurationSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  test("PII detection extracts emails, IPv4s, and phone numbers") {
    val df = Seq(
      (1L, "write to alice.smith+dev@mail.example.org from 192.168.0.1 or call 415-555-0134"),
      (2L, "no pii here at all"),
      (3L, "two mails a@b.io c@d.co one ip 10.0.0.255")).toDF("id", "text")
    val out = df.select(col("id"), PII.emails(col("text")).as("e"),
        PII.ipv4s(col("text")).as("i"), PII.phones(col("text")).as("p"),
        PII.piiCount(col("text")).as("n"))
      .collect().map(r => r.getLong(0) ->
        ((r.getSeq[String](1), r.getSeq[String](2), r.getSeq[String](3), r.getInt(4)))).toMap
    assert(out(1L) == ((Seq("alice.smith+dev@mail.example.org"), Seq("192.168.0.1"), Seq("415-555-0134"), 3)))
    assert(out(2L) == ((Seq(), Seq(), Seq(), 0)))
    assert(out(3L) == ((Seq("a@b.io", "c@d.co"), Seq("10.0.0.255"), Seq(), 3)))
  }

  test("PII redaction replaces every span with a typed placeholder") {
    val df = Seq((1L, "mail bob@x.org twice bob@x.org ip 8.8.8.8 tel 212-555-9876 end"))
      .toDF("id", "text")
    val red = df.select(PII.redact(col("text"))).as[String].head()
    assert(red == "mail <EMAIL> twice <EMAIL> ip <IP> tel <PHONE> end")
  }

  test("contamination flags docs sharing n-grams with the benchmark") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"), // contains bench 5-gram
      (2L, "completely unrelated words with zero overlap here"),
      (3L, "quick brown fox jumps over something else entirely today")).toDF("doc_id", "text")
    val bench = Seq("benchmark says the quick brown fox jumps over fences").toDF("q")
    val out = Decontaminate.contamination(docs, "doc_id", "text", bench, "q", n = 5)
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getBoolean(4)))).toMap
    // doc 1: grams "the quick brown fox jumps" + "quick brown fox jumps over" hit
    assert(out(1L)._2 == 2 && out(1L)._3, s"doc1: $out")
    assert(out(2L)._2 == 0 && !out(2L)._3)
    assert(out(3L)._2 == 1 && out(3L)._3) // "quick brown fox jumps over"
    assert(out(1L)._1 == 5) // 9 tokens -> 5 distinct 5-grams
  }

  test("sampleByQuota is row-identical to the naive per-source window spec") {
    // skewed: src_a has 400 rows, src_b 30, src_c 3 (below quota)
    val rows = ((1 to 400).map(i => (i.toLong, "src_a")) ++
      (401 to 430).map(i => (i.toLong, "src_b")) ++
      (431 to 433).map(i => (i.toLong, "src_c"))).toDF("doc_id", "src")
    val quota = 25L
    val got = Mixture.sampleByQuota(rows, "doc_id", "src", quota)
      .select("doc_id").as[Long].collect().toSet
    val naive = rows.withColumn("h", Mixture.hashOrder(col("doc_id")))
      .withColumn("rn", row_number().over(
        Window.partitionBy("src").orderBy(col("h"), col("doc_id"))))
      .where(col("rn") <= quota).select("doc_id").as[Long].collect().toSet
    assert(naive.size == 25 + 25 + 3)
    assert(got == naive)
  }

  test("sampleByTokenBudget is row-identical to the naive running-sum spec") {
    val rows = ((1 to 300).map(i => (i.toLong, "src_a", 10L + i % 37)) ++
      (301 to 320).map(i => (i.toLong, "src_b", 5L))).toDF("doc_id", "src", "ntok")
    val budget = 900L
    val got = Mixture.sampleByTokenBudget(rows, "doc_id", "src", col("ntok"), budget)
      .select("doc_id").as[Long].collect().toSet
    val naive = rows.withColumn("h", Mixture.hashOrder(col("doc_id")))
      .withColumn("cum", sum(col("ntok")).over(
        Window.partitionBy("src").orderBy(col("h"), col("doc_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .where(col("cum") <= budget).select("doc_id").as[Long].collect().toSet
    assert(got == naive)
    assert(naive.nonEmpty && naive.size < 320)
  }

  test("sampleByQuota keeps everything when the quota exceeds the source") {
    val rows = (1 to 8).map(i => (i.toLong, "only")).toDF("doc_id", "src")
    val got = Mixture.sampleByQuota(rows, "doc_id", "src", 100L)
      .select("doc_id").as[Long].collect().toSet
    assert(got == (1 to 8).map(_.toLong).toSet)
  }

  test("QuantileFilter: integer-exact discrete quantile, ties kept") {
    import graft.pipeline.QuantileFilter
    // scores: 1x10, 2x10, 3x10, 4x10 -> n=40; permille=250 -> target 10
    // cumulative: score 1 reaches 10 -> threshold = 1 (everything kept)
    val df = (1 to 40).map(i => (i.toLong, (i - 1) / 10 + 1)).toDF("id", "score")
    val t1 = QuantileFilter.threshold(df, col("score"), 250).head().getLong(0)
    assert(t1 == 1L)
    // permille=500 -> target 20; cume(1)=10 < 20, cume(2)=20 -> threshold 2
    val t2 = QuantileFilter.threshold(df, col("score"), 500).head().getLong(0)
    assert(t2 == 2L)
    val kept = QuantileFilter.keepAbove(df, col("score"), 500)
      .select("id").as[Long].collect().toSet
    assert(kept == (11 to 40).map(_.toLong).toSet) // score >= 2, ties kept
    // permille=1000 -> threshold = max score; only the top tie-group stays
    val t3 = QuantileFilter.threshold(df, col("score"), 1000).head().getLong(0)
    assert(t3 == 4L)
  }

  test("GopherRules: each rule gates independently") {
    import graft.pipeline.GopherRules
    val docs = Seq(
      (1L, "the quick brown fox jumps over a lazy dog in town"), // passes
      (2L, "a b"),                                        // too few words
      (3L, "the ### ##### #### of ### every #### word"),  // symbol-heavy
      (4L, "one two three four five six seven"),          // no 2 stopwords
      (5L, "the supercalifragilistic expialidocious pneumonoultramicroscopic " +
        "words of excessive lengthiness extraordinary")   // mean len > 10
    ).toDF("doc_id", "text")
    val m = GopherRules.metrics(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(m(0).getAs[Boolean]("gopher_pass"))
    assert(!m(1).getAs[Boolean]("gopher_pass") && m(1).getAs[Int]("n_words") == 2)
    assert(!m(2).getAs[Boolean]("gopher_pass") &&
      m(2).getAs[Double]("symbol_ratio") > 0.1)
    assert(!m(3).getAs[Boolean]("gopher_pass") && m(3).getAs[Int]("stop_hits") < 2)
    assert(!m(4).getAs[Boolean]("gopher_pass") &&
      m(4).getAs[Double]("mean_word_len") > 10.0)
  }

  test("segmentLmFilter drops gibberish segments, keeps shared prose") {
    // docs 1-3 share the same 8-token prose segment (its bigrams have
    // corpus count 3); doc 3 carries an extra all-unique gibberish
    // segment that must drop; doc 4 is a 1-token doc (no bigrams -> kept)
    val prose = "the quick brown fox jumps over the lazy"
    val docs = Seq(
      (1L, prose), (2L, prose),
      (3L, prose + " zq1 zq2 zq3 zq4 zq5 zq6 zq7 zq8"),
      (4L, "solo")).toDF("doc_id", "text")
    val got = graft.pipeline.SegmentLm.segmentLmFilter(
        docs, "doc_id", "text", segTokens = 8, maxRarePermille = 500)
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getInt(2), r.getInt(3))).toMap
    assert(got(1L) == ((prose, 1, 0)))
    assert(got(2L) == ((prose, 1, 0)))
    assert(got(3L) == ((prose, 2, 1)), s"gibberish segment must drop: ${got(3L)}")
    assert(got(4L) == (("solo", 1, 0)), "no-bigram segment carries no evidence")
  }

  test("kAnonymity audit: risky combos flagged, coarse remediation checked") {
    import spark.implicits._
    // (seg, nation, band): A/1 has bands {0 x5, 1 x1} -> band 1 risky but
    // coarse (A,1) has 6 rows -> generalization clears it; B/2 has 3 rows
    // in one band -> risky AND coarse-risky
    val rows = Seq.fill(5)(("A", 1, 0L)) ++ Seq(("A", 1, 1L)) ++
      Seq.fill(3)(("B", 2, 0L))
    val df = rows.toDF("seg", "nation", "band")
    val out = graft.pipeline.KAnonymity.audit(df, Seq("seg", "nation", "band"), 5L)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2)) ->
        (r.getLong(3), r.getLong(4), r.getBoolean(5), r.getBoolean(6))).toMap
    assert(out(("A", 1, 0L)) == ((5L, 6L, false, true)))
    assert(out(("A", 1, 1L)) == ((1L, 6L, true, true)))
    assert(out(("B", 2, 0L)) == ((3L, 3L, true, false)))
  }

  test("lDiversity: k-anonymous but homogeneous combo flags, diverse doesn't") {
    import spark.implicits._
    // (A,1): 6 rows but every sensitive value is 0 -> homogeneity leak;
    // (B,2): 3 rows across 3 distinct values -> diverse, not risky
    val rows = Seq.fill(6)(("A", 1, 0L)) ++
      Seq(("B", 2, 0L), ("B", 2, 1L), ("B", 2, 2L))
    val df = rows.toDF("seg", "nation", "band")
    val out = graft.pipeline.KAnonymity.lDiversity(df, Seq("seg", "nation"),
        "band", l = 3L)
      .collect().map(r => (r.getString(0), r.getInt(1)) ->
        (r.getLong(2), r.getLong(3), r.getBoolean(4))).toMap
    assert(out(("A", 1)) == ((6L, 1L, true)))
    assert(out(("B", 2)) == ((3L, 3L, false)))
  }

  test("calibrate: per-group strictly-below permille, ties share a value") {
    import spark.implicits._
    val df = Seq(("s1", 1L, 10L), ("s1", 2L, 20L), ("s1", 3L, 20L),
      ("s1", 4L, 30L), ("s2", 5L, 99L)).toDF("src", "id", "score")
    val out = graft.pipeline.QuantileFilter.calibrate(df, "src", "score")
      .collect().map(r => r.getLong(1) -> r.getLong(3)).toMap
    // s1: below(10)=0 -> 0; below(20)=1 -> 250; below(30)=3 -> 750
    assert(out == Map(1L -> 0L, 2L -> 250L, 3L -> 250L, 4L -> 750L, 5L -> 0L))
  }

  test("Blocklist: overlapping Aho-Corasick counts, nested patterns, hits shape") {
    import graft.pipeline.Blocklist
    val df = Seq((1L, "banana bandana"), (2L, "pure prose")).toDF("id", "text")
    val got = Blocklist.hits(df, "id", "text", Seq("an", "ana", "na", "band"))
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    // banana: an 2, ana 2 (overlap!), na 2; bandana: an 2, ana 1, na 1, band 1
    assert(got == Map((1L, "an") -> 4L, (1L, "ana") -> 3L,
      (1L, "na") -> 3L, (1L, "band") -> 1L))
    // nested patterns both count; pure overlap "aaa" vs "aa" is 2
    val nested = Seq((1L, "aaa")).toDF("id", "text")
    val n = Blocklist.hits(nested, "id", "text", Seq("a", "aa"))
      .collect().map(r => r.getString(1) -> r.getLong(2)).toMap
    assert(n == Map("a" -> 3L, "aa" -> 2L))
    // no-hit rows emit nothing
    assert(Blocklist.hits(df, "id", "text", Seq("zzz")).count() == 0L)
  }

  test("tCloseness: hand-computed EMD, balanced combo scores 0") {
    import graft.pipeline.KAnonymity
    // global bands: three 0s, three 1s (k=2, n=6); combo a has all mass
    // at band 0 -> EMD 0.5; combo b all at 1 -> 0.5; combo c balanced -> 0
    val rows = Seq(
      ("a", 1L, 0L), ("a", 1L, 0L), ("a", 1L, 0L),
      ("b", 1L, 1L), ("b", 1L, 1L),
      ("c", 1L, 0L), ("c", 1L, 1L)).toDF("seg", "nat", "band")
    val got = KAnonymity.tCloseness(rows, Seq("seg", "nat"), "band", 300L)
      .collect().map(r => r.getString(0) -> (r.getLong(2), r.getLong(3),
        r.getBoolean(4))).toMap
    // global: band0 x4, band1 x3 (n=7, k=2)
    // a: n=3, cum0 |3*7-4*3|=9 -> 9*1000 div (3*7*1) = 428
    // b: n=2, cum0 |0*7-4*2|=8 -> 8*1000 div (2*7) = 571
    // c: n=2, cum0 |1*7-4*2|=1 -> 1*1000 div 14 = 71
    assert(got("a") == ((3L, 428L, true)))
    assert(got("b") == ((2L, 571L, true)))
    assert(got("c") == ((2L, 71L, false)))
  }

  test("Readability.flesch: hand case, syllable groups, empty-text NULL") {
    import graft.pipeline.Readability
    val df = Seq(
      (1L, "the cat sat\non a mat"),   // 2 sentences, 6 words, 6 syllables
      (2L, "banana banana"),            // 1 sentence, 2 words, 6 syllables
      (3L, "")).toDF("id", "text")
    val got = Readability.flesch(df, "id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(got(1L).getLong(1) == 2L && got(1L).getLong(2) == 6L &&
      got(1L).getLong(3) == 6L)
    // 206835 - 1015*(6/2) - 84600*(6/6) = 119190
    assert(got(1L).getLong(4) == 119190L)
    // banana = 3 vowel groups; 206835 - 1015*2 - 84600*3 = -48995
    assert(got(2L).getLong(3) == 6L && got(2L).getLong(4) == -48995L)
    assert(got(3L).getLong(2) == 0L && got(3L).isNullAt(4))
  }

  test("neymanSample allocates by N_h*sigma_h and takes in mix64 order") {
    // src hi: 100 rows alternating 0/1000 (huge variance);
    // src lo: 100 rows constant 500 (zero variance -> alloc 0);
    // src md: 10 rows alternating 400/600 (small n, small sigma)
    val rows = ((1 to 100).map(i => (i.toLong, "hi", if (i % 2 == 0) 1000L else 0L)) ++
      (101 to 200).map(i => (i.toLong, "lo", 500L)) ++
      (201 to 210).map(i => (i.toLong, "md", if (i % 2 == 0) 600L else 400L)))
      .toDF("doc_id", "src", "v")
    val out = Mixture.neymanSample(rows, "doc_id", "src", col("v"), budget = 30L)
    val bySrc = out.groupBy("src").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // w_hi = round(sqrt(100*100*1000^2/4... )) exact: n*ssq - s^2 =
    // 100*50*1e6 - (50000)^2 = 5e9 - 2.5e9 = 2.5e9 -> w = 50000
    // w_md = sqrt(10*(5*360000+5*160000) - 5000^2) = sqrt(26e6-25e6) = 1000
    // w_lo = 0; tw = 51000
    // alloc_hi = 30*50000 div 51000 = 29; alloc_md = 30*1000 div 51000 = 0
    assert(bySrc.getOrElse("hi", 0L) == 29L, bySrc.toString)
    assert(!bySrc.contains("lo") && !bySrc.contains("md"), bySrc.toString)
    // the take follows mix64(id) order exactly (row-identity vs naive)
    import org.apache.spark.sql.expressions.Window
    val naive = rows.where(col("src") === "hi")
      .withColumn("h", Mixture.hashOrder(col("doc_id")))
      .withColumn("rn", row_number().over(
        Window.partitionBy("src").orderBy(col("h"), col("doc_id"))))
      .where(col("rn") <= 29).select("doc_id").as[Long].collect().toSet
    assert(out.select("doc_id").as[Long].collect().toSet == naive)
    // alloc is capped at the stratum size
    val tiny = Mixture.neymanSample(rows, "doc_id", "src", col("v"),
      budget = 100000L)
    assert(tiny.where(col("src") === "hi").count() == 100L)
  }

  test("quantileNormalize maps group quantiles onto the pooled scale") {
    // group a scores 10,20,30,40; group b scores 1000,2000,3000,4000 —
    // after normalization the same within-group position gets the SAME
    // pooled value in both groups
    val rows = Seq((1L, "a", 10L), (2L, "a", 20L), (3L, "a", 30L),
      (4L, "a", 40L), (5L, "b", 1000L), (6L, "b", 2000L),
      (7L, "b", 3000L), (8L, "b", 4000L)).toDF("id", "g", "s")
    val got = QuantileFilter.quantileNormalize(rows, "g", "s")
      .collect().map(r => r.getLong(0) ->
        (r.getAs[Long]("src_permille"), r.getAs[Long]("norm_score"))).toMap
    // within-group permilles: 250, 500, 750, 1000 in both groups
    assert(got(1L)._1 == 250L && got(5L)._1 == 250L)
    assert(got(4L)._1 == 1000L && got(8L)._1 == 1000L)
    // pooled sorted: 10,20,30,40,1000,2000,3000,4000 -> the 250th
    // permille is the ceil(8*250/1000)=2nd value = 20; 1000th = 4000
    assert(got(1L)._2 == 20L && got(5L)._2 == 20L)
    assert(got(4L)._2 == 4000L && got(8L)._2 == 4000L)
    // mid positions land on the pooled mid values identically
    assert(got(2L)._2 == got(6L)._2 && got(3L)._2 == got(7L)._2)
    // ties inside a group share one permille and one normalized value
    val tied = Seq((1L, "a", 5L), (2L, "a", 5L), (3L, "a", 9L),
      (4L, "b", 7L)).toDF("id", "g", "s")
    val t = QuantileFilter.quantileNormalize(tied, "g", "s")
      .collect().map(r => r.getLong(0) ->
        (r.getAs[Long]("src_permille"), r.getAs[Long]("norm_score"))).toMap
    assert(t(1L) == t(2L))
  }

  test("quantileNormalize: ceiling permille keeps rare low values; NULLs excluded") {
    // a >1000-row group with ONE unique minimum: floor permille would
    // map cum=1 to 0 and silently drop the row at the 1..1000 grid join
    val big = spark.range(2000)
      .select(lit("g1").as("g"), (col("id") + 10L).as("s"))
      .unionByName(spark.range(1)
        .select(lit("g1").as("g"), lit(1L).as("s")))
    val out = QuantileFilter.quantileNormalize(big, "g", "s")
    assert(out.count() == 2001L, "ceiling permille must keep every row")
    val minPm = out.where(col("s") === 1L)
      .select("src_permille").collect().map(_.getLong(0)).toSeq
    assert(minPm == Seq(1L), s"cum=1 of 2001 must land on permille 1, got $minPm")
    // NULL group or score rows are excluded by contract, everything
    // else is unchanged
    val nulls = Seq((Option.empty[String], Option(5L)),
      (Option("g1"), Option.empty[Long])).toDF("g", "s")
    val withNulls = QuantileFilter.quantileNormalize(
      big.unionByName(nulls), "g", "s")
    assert(withNulls.count() == 2001L)
    val a = out.orderBy("s", "src_permille").collect().toSeq
    val b = withNulls.orderBy("s", "src_permille").collect().toSeq
    assert(a == b, "NULL rows must not perturb the non-null result")
  }
}
