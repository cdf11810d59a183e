package graft.pipeline

import graft.expressions.{asColumn, asExpr}
import org.apache.spark.sql.DataFrame
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
