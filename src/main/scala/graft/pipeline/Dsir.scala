package graft.pipeline

import graft.expressions.{asColumn, asExpr}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
 * arXiv:2302.03169). Scores every document by how much more likely its
 * hashed-unigram features are under a target distribution (docs
 * matching `isTarget`) than under the raw-corpus distribution, then
 * keeps the top-K. The classic use: select from 100 TB of crawl the
 * slice that "looks like" a trusted corpus (Wikipedia, books).
 *
 * Scale shape, deliberately two-pass:
 *  1. the token stream reduces to a `buckets`-row (bucket, raw, target)
 *     count table — map-side partial aggregation, then a shuffle of at
 *     most `buckets` rows per partition;
 *  2. the λ table (one long per bucket — integer micro-nats, so scores
 *     are exact under any accumulation order) is collected to the
 *     driver (bounded, like the ANN quantizer fits) and shipped inside
 *     a scoring expression: pass 2 scores each doc INSIDE the scan —
 *     zero joins, zero shuffles — and top-K is Spark's distributed
 *     TakeOrdered (per-partition heaps, driver merge of K·P rows).
 *
 * Feature space: lowercase ASCII-alnum word unigrams hashed with the
 * `pl_fingerprint` rolling hash into `buckets` buckets (power of two,
 * so unsigned-mod == low-bit mask on both JVM and the DuckDB oracle).
 * λ_b = round(1e6 · [ln((t_b+1)/(T+B)) − ln((r_b+1)/(R+B))]) — add-one
 * smoothed log-likelihood ratio in micro-nats.
 */
object Dsir {
  /** Lowercase ASCII-alnum word runs — the shared feature tokenizer of
    * the DSIR and Wordpiece fits. */
  private[pipeline] def toks(textCol: String): Column =
    expr(s"regexp_extract_all(lower($textCol), '[a-z0-9]+', 0)")

  /** Per-bucket importance weights in integer micro-nats:
    * (b: int, lam: long), one row per bucket observed in the corpus. */
  def lambdaTable(docs: DataFrame, textCol: String, isTarget: Column,
      buckets: Int): DataFrame = {
    require(Integer.bitCount(buckets) == 1,
      s"buckets must be a power of two (unsigned-mod parity), got $buckets")
    val th = docs
      .select(isTarget.cast("boolean").as("tgt"), explode(toks(textCol)).as("tok"))
      .select(col("tgt"),
        pmod(TextFunctions.fingerprint(col("tok")), lit(buckets.toLong)).as("b"))
    val bc = th.groupBy("b").agg(
      count(lit(1)).as("r"),
      sum(when(col("tgt"), 1L).otherwise(0L)).as("t"))
    // one-row totals, broadcast alongside the buckets-row table
    val tot = bc.agg(sum("r").as("rr"), sum("t").as("tt"))
    bc.crossJoin(broadcast(tot))
      .select(col("b").cast("int").as("b"),
        round(lit(1e6) * (log((col("t") + lit(1.0)) / (col("tt") + lit(buckets.toDouble)))
          - log((col("r") + lit(1.0)) / (col("rr") + lit(buckets.toDouble)))))
          .cast("long").as("lam"))
  }

  /** Fit λ on `docs` and return the `k` highest-scoring documents:
    * (doc_id, score_unats, rank). Ties break by ascending id. */
  def topK(docs: DataFrame, idCol: String, textCol: String, isTarget: Column,
      buckets: Int = 512, k: Int = 100): DataFrame = {
    val fit = lambdaTable(docs, textCol, isTarget, buckets)
      .collect() // bounded: `buckets` rows of (int, long)
    val lam = Array.ofDim[Long](buckets)
    fit.foreach(r => lam(r.getInt(0)) = r.getLong(1))
    val scored = docs.select(col(idCol).as("doc_id"),
      asColumn(BucketLogRatioScore(asExpr(toks(textCol)), lam)).as("score_unats"))
    val top = scored.orderBy(col("score_unats").desc, col("doc_id")).limit(k)
    top.withColumn("rank",
      row_number().over(org.apache.spark.sql.expressions.Window
        .orderBy(col("score_unats").desc, col("doc_id"))).cast("int"))
  }
}
