package graft

import graft.pipeline.{GreedyPieceStats, Wordpiece}
import graft.expressions.{asColumn, asExpr}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class WordpieceSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  private def stats(words: Seq[String], vocab: Seq[String]): (Int, Int) = {
    val df = Seq(Tuple1(words)).toDF("w")
      .select(asColumn(GreedyPieceStats(asExpr(col("w")), vocab.toArray)).as("s"))
      .select("s.n_pieces", "s.n_unk").collect().head
    (df.getInt(0), df.getInt(1))
  }

  test("greedy longest-match: longest piece wins at every offset") {
    // "unhappy": vocab has un, unhap? no — pieces: "unhappy"? use
    // vocab {un, happy, h, a, p, y}: un + happy = 2 pieces
    assert(stats(Seq("unhappy"), Seq("un", "happy", "h", "a", "p", "y")) == (2, 0))
    // longest-first: "the" beats "t"+"he" when both available
    assert(stats(Seq("the"), Seq("t", "he", "the")) == (1, 0))
    // fallback: chars absent from vocab emit <unk> one char at a time
    assert(stats(Seq("xy"), Seq("a")) == (2, 2))
    // mixed: "abxab" with {ab} -> ab, unk(x), ab = 3 pieces 1 unk
    assert(stats(Seq("abxab"), Seq("ab")) == (3, 1))
    // multiple words sum
    assert(stats(Seq("ab", "ab", "x"), Seq("ab")) == (3, 1))
  }

  test("pieceStats fits vocab on the corpus and counts per doc") {
    val docs = Seq(
      (1L, "the cat the cat the"),
      (2L, "the dog"),
      (3L, "")).toDF("doc_id", "text")
    val out = Wordpiece.pieceStats(docs, "doc_id", "text", vocabSize = 2)
      .orderBy("id").collect()
    // vocab = {the, cat} (+ single chars); doc 1: 5 words, 5 pieces
    assert(out(0).getInt(1) == 5 && out(0).getInt(2) == 5 && out(0).getInt(3) == 0)
    // doc 2: "the"=1 piece, "dog"= d+o+g single chars = 3 pieces, 0 unk
    assert(out(1).getInt(1) == 2 && out(1).getInt(2) == 4 && out(1).getInt(3) == 0)
    // empty doc: zeros
    assert(out(2).getInt(1) == 0 && out(2).getInt(2) == 0 && out(2).getInt(3) == 0)
  }

  test("pieceStats plan is scan-only: no join, no token shuffle") {
    val docs = Seq((1L, "a b c")).toDF("doc_id", "text")
    val plan = Wordpiece.pieceStats(docs, "doc_id", "text", 4)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(!plan.contains("Join"), plan)
    assert(!plan.contains("Exchange"), plan)
  }

  test("Bpe.learn: greedy merges, lexicographic tie-break, exhaustion") {
    import graft.pipeline.Bpe
    // r1: "a b" x3 (abab: 2, ab: 1) beats "a a" x2 (aaa) -> merge "ab"
    // r2: "a a" x2 beats "ab ab" x1 -> merge "aa" (aaa -> [aa, a])
    // r3: tie at 1 between "aa a" and "ab ab" -> lexicographic "aa a"
    val df = Seq("abab ab", "aaa").toDF("text")
    val got = Bpe.learn(df, "text", rounds = 3)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getLong(3))).toSeq.sortBy(_._1)
    assert(got == Seq((1, "a b", "ab", 3L), (2, "a a", "aa", 2L),
      (3, "aa a", "aaa", 1L)))
    // "aaa" with pair (a,a) merges ONCE (greedy non-overlap): after r2
    // the word is [aa, a], never [aa, aa]-impossible or [a, aa]
    // exhaustion: single 2-char word runs dry after one merge
    val tiny = Seq("xy").toDF("text")
    val rows = Bpe.learn(tiny, "text", rounds = 4).collect()
    assert(rows.length == 1 && rows.head.getString(2) == "xy")
  }

  test("Bpe.applyMerges: learned merges tokenize; unseen units survive") {
    import graft.pipeline.Bpe
    val df = Seq((1L, "abab ab"), (2L, "aaa"), (3L, "zq")).toDF("id", "text")
    // merges from the learn test's corpus: ab, aa, aaa
    val merges = Seq(("a", "b"), ("a", "a"), ("aa", "a"))
    val got = Bpe.applyMerges(df, "id", "text", merges)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
    // "abab" -> a b a b -> ab ab; "ab" -> ab
    assert(got(1L) == ((3L, "ab ab ab")))
    // "aaa" -> a a a -> (a,a) greedy left-to-right ONCE -> aa a -> (aa,a) -> aaa
    assert(got(2L) == ((1L, "aaa")))
    // untouched word decomposes to characters
    assert(got(3L) == ((2L, "z q")))
    // zero shuffles: the apply pass is scan-local
    val plan = Bpe.applyMerges(df, "id", "text", merges)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(!plan.contains("Exchange"), plan)
  }

  // ---- pure-Scala reference: the documented sequential replace-chain
  // semantics (one left-to-right non-overlapping fuse pass per merge,
  // in list order) — what the pre-kernel transform(replace()) chain and
  // the DuckDB oracle compute ----
  private def onePass(units: Array[String], x: String, y: String): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < units.length) {
      if (i < units.length - 1 && units(i) == x && units(i + 1) == y) {
        out += x + y; i += 2
      } else { out += units(i); i += 1 }
    }
    out.toArray
  }
  private def sequentialApply(word: String, merges: Seq[(String, String)]): Array[String] = {
    var units = word.map(_.toString).toArray
    for ((x, y) <- merges) units = onePass(units, x, y)
    units
  }
  /** Reference learner with Bpe.learn's exact argmax ((cnt DESC, pair
    * ASC) over within-word adjacent pairs) — produces a genuinely
    * LEARNED (well-formed) merge table of arbitrary length. */
  private def learnRef(corpus: Seq[String], rounds: Int): Seq[(String, String)] = {
    var words: Seq[Array[String]] = corpus.flatMap(_.split(" "))
      .filter(_.nonEmpty).map(_.map(_.toString).toArray)
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var r = 0
    var dry = false
    while (r < rounds && !dry) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      for (w <- words; i <- 0 until w.length - 1)
        counts((w(i), w(i + 1))) = counts.getOrElse((w(i), w(i + 1)), 0L) + 1L
      if (counts.isEmpty) dry = true
      else {
        val best = counts.toSeq
          .minBy { case ((x, y), c) => (-c, x + " " + y) }._1
        merges += best
        words = words.map(w => onePass(w, best._1, best._2))
        r += 1
      }
    }
    merges.toSeq
  }

  test("newline-bearing tokens: learn, kernel, and replace chain agree") {
    import graft.pipeline.Bpe
    // "a\nb" is ONE token (the word split is on single spaces), so a
    // line terminator can sit INSIDE a word. The DOTALL '(?s)(.)' init
    // makes \n / \r its own unit in learn — exactly the kernel's
    // per-code-point decomposition. (Pre-r16, '(.)' skipped line
    // terminators and learn saw the glued unit "\nb" while the kernel
    // saw [\n, b], breaking learn/apply parity on any newline corpus.)
    val corpus = Seq("a\nb a\nb ab", "b\r\nb aa\nb", "a\nb b\r\nb")
    val df = corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
    val refMerges = learnRef(corpus, 10)
    val sparkMerges = Bpe.learn(df, "text", rounds = 10)
      .collect().sortBy(_.getInt(0))
      .map(r => { val p = r.getString(1).split(" ", 2); (p(0), p(1)) }).toSeq
    assert(sparkMerges == refMerges,
      s"learn decomposition diverged: spark=$sparkMerges ref=$refMerges")
    val got = Bpe.applyMerges(df, "id", "text", refMerges).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
    for ((t, i) <- corpus.zipWithIndex) {
      val exp = t.split(" ").filter(_.nonEmpty)
        .flatMap(w => sequentialApply(w, refMerges))
      assert(got(i.toLong) == ((exp.length.toLong, exp.mkString(" "))),
        s"doc $i diverged from the sequential reference")
    }
  }

  test("BpeApplyMerges kernel == sequential replace chain at 100+ learned merges") {
    import graft.pipeline.Bpe
    // deterministic pseudo-corpus over a 6-letter alphabet: enough pair
    // diversity for a three-digit learned merge table — the
    // "thousands of merges" claim exercised well past the rounds<=16
    // learn cap (the kernel's cost is merge-table-size free)
    val rnd = new scala.util.Random(42)
    val alphabet = "abcdef"
    val words = (1 to 240).map(_ =>
      (1 to (3 + rnd.nextInt(8))).map(_ => alphabet(rnd.nextInt(6))).mkString)
    val corpus = words.grouped(6).map(_.mkString(" ")).toSeq
    val merges = learnRef(corpus, 160)
    assert(merges.length >= 100, s"fixture learned only ${merges.length} merges")
    val df = corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
    val got = Bpe.applyMerges(df, "id", "text", merges).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
    for ((t, i) <- corpus.zipWithIndex) {
      val exp = t.split(" ").filter(_.nonEmpty)
        .flatMap(w => sequentialApply(w, merges))
      assert(got(i.toLong) == ((exp.length.toLong, exp.mkString(" "))),
        s"doc $i diverged from the sequential reference")
    }
    // the merge table rides in ONE expression node: no per-merge
    // replace chain in the plan, no Exchange (analyzed plan — the
    // optimizer folds this local fixture into a LocalRelation)
    val qe = Bpe.applyMerges(df, "id", "text", merges).queryExecution
    val analyzed = qe.analyzed.toString
    assert(analyzed.contains("pl_bpe_apply"), analyzed.take(2000))
    assert(!analyzed.contains("replace("), analyzed.take(2000))
    assert(!qe.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      .contains("Exchange"))
  }
}
