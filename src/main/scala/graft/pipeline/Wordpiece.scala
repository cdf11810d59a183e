package graft.pipeline

import graft.expressions.{asColumn, asExpr}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Greedy longest-match subword tokenization (the WordPiece / BPE-
 * inference shape) with a corpus-fit vocabulary — the token-counting
 * primitive a training-data pipeline budgets corpora with when the
 * real tokenizer's merges table isn't on the cluster.
 *
 * Two passes, both scale-shaped:
 *  1. vocab fit: word frequencies (map-side combined groupBy) → top
 *     `vocabSize` by (count desc, word asc) — a bounded driver collect
 *     — plus the 36 single ASCII-alnum chars as fallback pieces;
 *  2. stats: [[GreedyPieceStats]] ships the vocab inside the
 *     expression, so per-doc (n_pieces, n_unk) computes INSIDE the
 *     scan — no join, no shuffle, like the DSIR scorer.
 *
 * Greedy longest-match is deterministic given the vocab; ties cannot
 * occur (equal-length prefixes at one offset are the same string).
 */
object Wordpiece {
  private val singleChars: Seq[String] =
    (('a' to 'z') ++ ('0' to '9')).map(_.toString)

  /** Top-`vocabSize` corpus words by (count desc, word asc), plus the
    * single-char fallback pieces. Bounded driver collect. */
  def fitVocab(docs: DataFrame, textCol: String, vocabSize: Int): Array[String] = {
    require(vocabSize > 0, s"vocabSize must be positive, got $vocabSize")
    val top = docs
      .select(explode(Dsir.toks(textCol)).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("tok"))
      .limit(vocabSize)
      .collect().map(_.getString(0)) // bounded: vocabSize rows
    (top ++ singleChars).distinct.toArray
  }

  /** Per-doc subword stats against a vocab fit on the same corpus:
    * (id, n_words, n_pieces, n_unk). */
  def pieceStats(docs: DataFrame, idCol: String, textCol: String,
      vocabSize: Int = 200): DataFrame = {
    val vocab = fitVocab(docs, textCol, vocabSize)
    val t = Dsir.toks(textCol)
    docs.select(col(idCol).as("id"),
        size(t).as("n_words"),
        asColumn(GreedyPieceStats(asExpr(t), vocab)).as("__graft_s"))
      .select(col("id"), col("n_words"),
        col("__graft_s.n_pieces").as("n_pieces"),
        col("__graft_s.n_unk").as("n_unk"))
  }
}

/**
 * BPE merge LEARNING — the iterative half of byte-pair encoding that
 * [[graft.SparkEntry]]'s q_bpe_pairs (single-iteration pair counts)
 * stops short of: each round counts adjacent unit pairs WITHIN words
 * across the corpus, adopts the most frequent pair (ties break to the
 * lexicographically smallest — deterministic on any engine), and
 * rewrites every word with the pair fused into one unit, exactly the
 * Sennrich et al. 2016 greedy loop.
 *
 * The merge REWRITE is the part folklore says needs a per-word UDF
 * loop; it doesn't. Words are carried as `¦¦`-delimited unit strings
 * (`"the"` → `"¦¦t¦¦h¦¦e¦¦"`), and fusing pair (x, y) is ONE
 * `replace(w, "¦x¦¦y¦", "¦xy¦")`: each match consumes one delimiter
 * from each side's pair, so back-to-back occurrences stay matchable
 * and the builtin's left-to-right non-overlapping semantics IS the
 * BPE greedy scan ("a a a" with pair (a,a) merges once). `replace`
 * behaves identically in DuckDB, which makes the whole loop — counts,
 * argmax, rewrite — SQL-replayable (q_bpe_learn unrolls it).
 *
 * Scale shape per round: one map-side-combinable pair-count groupBy,
 * a one-row argmax (TakeOrdered — never a driver collect) pinned flat
 * with an eager localCheckpoint, then a broadcast crossJoin carrying
 * (x, y) into the per-row rewrite. `rounds` is small by nature (real
 * vocabs run the loop offline; the shape is identical at any corpus
 * size). Output: one row per round — `round, pair, merged, cnt`.
 */
object Bpe {
  private val D = "¦" // '¦' — not a corpus character (ASCII text)

  def learn(df: DataFrame, textCol: String, rounds: Int): DataFrame = {
    require(rounds >= 1 && rounds <= 16, s"rounds must be in [1,16], got $rounds")
    def unitsOf(w: Column): Column =
      filter(split(w, s"$D+"), u => u =!= "")
    // Learn on the DISTINCT-WORD frequency table, not the corpus: pair
    // counts are Σ wcnt · (in-word pairs) — identical numbers (the
    // oracle still derives them per-occurrence), but each round's
    // count + rewrite touches a VOCABULARY-sized table, so `rounds`
    // rounds cost `rounds` vocab passes instead of `rounds` corpus
    // passes — the shape real BPE trainers use, and the difference
    // between O(rounds·corpus) and O(corpus + rounds·vocab) at 100 TB.
    // The corpus is scanned exactly once (the word groupBy). Measured
    // at sf0.1 (README r16 notes): q_bpe_apply 16 s → ~3 s.
    var work = df.select(explode(
        filter(split(col(textCol), " "), t => t =!= "")).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("wcnt"))
      // DOTALL so line terminators are units too — keeps learn, the
      // BpeApplyMerges kernel (one unit per code point), and the DuckDB
      // oracle on the same initial decomposition
      .select(concat(lit(D + D),
          regexp_replace(col("tok"), "(?s)(.)", "$1" + D + D)).as("w"),
        col("wcnt"))
      // vocab-bounded eager pin (small by construction after the
      // groupBy): without it round r replays rounds 1..r-1's rewrites
      .localCheckpoint(true)
    var out: DataFrame = null
    for (r <- 1 to rounds) {
      val pairs = work.select(col("wcnt"),
          explode(asColumn(NGrams(asExpr(unitsOf(col("w"))), 2))).as("pair"))
        .groupBy("pair").agg(sum("wcnt").as("cnt"))
      // one-row argmax; eager localCheckpoint keeps round r+1's plan
      // from inlining round r's whole lineage (2^rounds blowup)
      val best = pairs.orderBy(desc("cnt"), asc("pair")).limit(1)
        .select(lit(r).as("round"), col("pair"), col("cnt"),
          expr("split(pair, ' ')[0]").as("__x"),
          expr("split(pair, ' ')[1]").as("__y"))
        .localCheckpoint(true)
      val row = best.select(col("round"), col("pair"),
        concat(col("__x"), col("__y")).as("merged"), col("cnt"))
      out = if (out == null) row else out.unionByName(row)
      work = work.crossJoin(broadcast(best.select(col("__x"), col("__y"))))
        .select(replace(col("w"),
            concat(lit(D), col("__x"), lit(D + D), col("__y"), lit(D)),
            concat(lit(D), col("__x"), col("__y"), lit(D))).as("w"),
          col("wcnt"))
        .localCheckpoint(true)
    }
    out
  }

  /**
   * Apply a LEARNED merge list to a corpus — the tokenize step that
   * pairs with [[learn]]: each merge (x, y) fuses in list order with
   * the greedy left-to-right non-overlap semantics of [[learn]]'s
   * delimiter-replace identity, then every word's residual units
   * flatten into the document's subword stream. The whole merge table
   * ships inside ONE [[BpeApplyMerges]] expression node (a real
   * vocab's thousands of merges are one shared hash map per executor,
   * not thousands of chained plan nodes; [[learn]]'s output is one row
   * per round, so `learn(...).collect()` is a metadata-sized driver
   * fetch, the CIDR-rule-list class of bounded collect). The merge
   * list must be in LEARNED order — see the kernel's doc for why that
   * makes the single-pass loop exactly the sequential replace chain.
   *
   * Scale shape: one native per-row kernel — ZERO shuffles, zero
   * per-merge corpus copies; the 100 TB corpus tokenizes in the scan
   * at O(word_len · merges_applied) per word regardless of the merge
   * table's size. Output: id, n_units, units_str (the space-joined
   * subword stream).
   */
  def applyMerges(df: DataFrame, idCol: String, textCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    require(merges.nonEmpty, "merges must not be empty")
    df.select(col(idCol).as("id"),
        asColumn(BpeApplyMerges(
          asExpr(filter(split(col(textCol), " "), t => t =!= "")),
          merges)).as("__units"))
      .select(col("id"),
        size(col("__units")).cast("long").as("n_units"),
        concat_ws(" ", col("__units")).as("units_str"))
  }
}

/**
 * Unigram-LM tokenizer (Kudo '18, the SentencePiece model) — the third
 * member of the subword trio next to [[Bpe]] (merge-based) and
 * [[Wordpiece]] (greedy longest-match): a PROBABILISTIC vocabulary
 * where each word's tokenization is the Viterbi-best segmentation
 * under per-piece log-probs, refined by hard-EM (Viterbi E-step,
 * recount M-step).
 *
 * Determinism discipline: piece scores are integer micro-nat COSTS
 * (−round½↑(10⁶·ln p), one rounding point per piece per iteration —
 * the [[Stats.tokenKL]] round-once rule), so the DP inside
 * [[UnigramViterbi]] compares exact longs and every segmentation, count
 * and final score is bit-replayable by the DuckDB oracle's recursive
 * CTEs (q_unigram_learn / q_unigram_apply).
 *
 * Scale shape per EM iteration: the E-step is one scalar kernel pass
 * over the DISTINCT-WORD table (vocabulary-sized, never the corpus),
 * the M-step one vocab-bounded groupBy + driver collect (≤ vocabSize
 * rows — the merges-table class of bounded collect). The corpus
 * itself is touched exactly once, to build the word-frequency table;
 * final tokenization ([[segment]]) rides the scan with zero shuffles.
 */
object Unigram {
  /** Half-away-from-zero long rounding (java.math HALF_UP) — matches
    * Spark's and DuckDB's `round` on NEGATIVE values where
    * `Math.round`'s floor(x+0.5) does not. */
  private def roundHalfUp(x: Double): Long =
    BigDecimal(x).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong

  /** (word, wcnt) corpus word-frequency table. */
  private def wordTable(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(filter(split(col(textCol), " "), t => t =!= ""))
        .as("word"))
      .groupBy("word").agg(count(lit(1)).as("wcnt"))

  /** Integer micro-nat costs from smoothed counts: cost_p =
    * −round½↑(10⁶·ln((cnt_p+1)/Σ(cnt+1))). Driver-side over the
    * bounded vocab. */
  private def costsOf(cnts: Seq[(String, Long)]): Seq[(String, Long)] = {
    val total = cnts.map(_._2 + 1L).sum.toDouble
    cnts.map { case (p, c) =>
      (p, -roundHalfUp(1e6 * math.log((c + 1L).toDouble / total)))
    }
  }

  /**
   * Fit a unigram vocabulary on a corpus: seed with every single
   * code-point piece plus the top (vocabSize − #chars) multi-char
   * substrings (length ≤ maxPieceLen) by (count desc, piece asc), then
   * run `iters` hard-EM rounds. The vocab is FIXED across iterations
   * (chars guarantee coverage; add-one smoothing keeps unused pieces
   * finite) — the pruning refinement of full SentencePiece changes
   * which pieces survive, not the shape of the computation.
   *
   * Returns (piece, cnt, cost_unats): cnt = the final E-step's usage
   * recount (0 for never-chosen pieces), cost_unats = the NEXT-round
   * cost implied by that recount — i.e. the shipped model.
   */
  def learn(df: DataFrame, textCol: String, vocabSize: Int = 64,
      iters: Int = 2, maxPieceLen: Int = 4): DataFrame = {
    require(vocabSize >= 2 && vocabSize <= 65536,
      s"vocabSize must be in [2, 65536], got $vocabSize")
    require(iters >= 1 && iters <= 8, s"iters must be in [1,8], got $iters")
    val spark = df.sparkSession
    import spark.implicits._
    val words = wordTable(df, textCol).localCheckpoint(true)
    val cand = words.select(col("wcnt"), explode(expr(
        s"""flatten(transform(sequence(1, length(word)), s ->
           |  transform(sequence(1, least($maxPieceLen, length(word) - s + 1)),
           |    l -> substring(word, s, l))))""".stripMargin)).as("piece"))
      .groupBy("piece").agg(sum("wcnt").as("cnt"))
    val chars = cand.where(length(col("piece")) === 1)
      .collect().map(r => (r.getString(0), r.getLong(1))) // bounded: alphabet
    require(chars.length < vocabSize,
      s"vocabSize $vocabSize must exceed the ${chars.length} single chars")
    val multis = cand.where(length(col("piece")) > 1)
      .orderBy(col("cnt").desc, col("piece"))
      .limit(vocabSize - chars.length)
      .collect().map(r => (r.getString(0), r.getLong(1))) // bounded: vocabSize
    val vocab = (chars ++ multis).sortBy(_._1)
    // initial costs from RAW seed counts (no smoothing needed: every
    // seed piece was observed)
    val total0 = vocab.map(_._2).sum.toDouble
    var costs: Seq[(String, Long)] = vocab.map { case (p, c) =>
      (p, -roundHalfUp(1e6 * math.log(c.toDouble / total0)))
    }
    var lastCnt: Map[String, Long] = null
    for (_ <- 1 to iters) {
      val seg = words.select(col("wcnt"),
        explode(asColumn(UnigramViterbi(asExpr(array(col("word"))),
          costs.map(_._1), costs.map(_._2), maxPieceLen))).as("piece"))
      lastCnt = seg.groupBy("piece").agg(sum("wcnt").as("c"))
        .collect().map(r => (r.getString(0), r.getLong(1))).toMap // ≤ vocab
      costs = costsOf(vocab.map { case (p, _) => (p, lastCnt.getOrElse(p, 0L)) })
    }
    val cntMap = lastCnt
    val costMap = costs.toMap // one O(V) build vs O(V²) find-per-piece
    vocab.map { case (p, _) =>
      (p, cntMap.getOrElse(p, 0L), costMap(p))
    }.toSeq.toDF("piece", "cnt", "cost_unats")
  }

  /** Tokenize a corpus under a learned vocab: ONE [[UnigramViterbi]]
    * kernel pass and ZERO shuffles — n_pieces/cost/pieces_str are all
    * per-row array work over the piece stream, with the cost lookup a
    * vocab-bounded map LITERAL instead of the old broadcast join +
    * per-doc rollup + join-back (which also evaluated the Viterbi DP
    * twice, once per consuming branch — r19 opt round; the exact-long
    * `aggregate` fold equals the old SUM under any order). Returns
    * (id, n_pieces, cost_unats, pieces_str). */
  def segment(df: DataFrame, idCol: String, textCol: String,
      vocab: Seq[(String, Long)], maxPieceLen: Int = 4): DataFrame = {
    require(vocab.nonEmpty, "vocab must not be empty")
    // duplicate pieces would hit Spark's DUPLICATED_MAP_KEY error deep in
    // the map literal with no hint that vocab is the cause (the old join
    // path silently double-counted instead — neither is right; fail with
    // the actual culprit named)
    require(vocab.map(_._1).distinct.size == vocab.size,
      "segment: vocab pieces must be distinct, got duplicates: " +
        vocab.groupBy(_._1).collect { case (p, vs) if vs.size > 1 => p }
          .mkString(", "))
    val costMap = map(vocab.flatMap { case (p, c) =>
      Seq(lit(p), lit(c)) }: _*)
    df.select(col(idCol).as("id"),
        asColumn(UnigramViterbi(
          asExpr(filter(split(col(textCol), " "), t => t =!= "")),
          vocab.map(_._1), vocab.map(_._2), maxPieceLen)).as("__pieces"))
      .select(col("id"),
        // coalesce: a NULL text yields a NULL piece array — the old
        // join-based path reported (0, 0, "") for such rows
        coalesce(size(col("__pieces")).cast("long"), lit(0L)).as("n_pieces"),
        coalesce(aggregate(col("__pieces"), lit(0L),
          (acc, p) => acc + element_at(costMap, p)), lit(0L)).as("cost_unats"),
        concat_ws(" ", col("__pieces")).as("pieces_str"))
  }
}
