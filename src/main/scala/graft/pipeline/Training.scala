package graft.pipeline

import graft.expressions.{asColumn, asExpr}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Training-set assembly operators: n-gram language-model scoring,
 * fixed-capacity sequence packing, and deterministic train/val/test
 * splitting. Like the rest of [[graft.pipeline]], every shape is
 * partial+final aggregation or an equi-join on the key the data already
 * shuffles on — no UDFs, no driver-side loops over data.
 */
object NGramLM {
  import TextFunctions.c

  /** All bigrams of the whitespace tokens, with multiplicity (strict:
    * docs with fewer than 2 tokens yield an empty array). */
  def bigrams(text: Column, n: Int = 2): Column =
    c(NGrams(asExpr(TextFunctions.tokens(text)), n))

  /** The corpus bigram table: (gram, cnt). One partial+final count,
    * shuffled on the gram — the "training" half of the LM. */
  def model(df: DataFrame, textCol: String, n: Int = 2): DataFrame =
    df.select(explode(bigrams(col(textCol), n)).as("gram"))
      .groupBy("gram").agg(count(lit(1)).as("cnt"))

  /**
   * Perplexity-style fluency signal without floating-point model
   * weights: score each document by how familiar its n-grams are to the
   * corpus-wide n-gram table. Returns (id, n_ngrams, n_rare, sum_freq,
   * rare_ratio, avg_freq) where a gram is "rare" when its corpus
   * frequency is ≤ `rareMax` (default 1 = hapax: the occurrence in this
   * very document is the only one anywhere). High rare_ratio ⇒ the doc
   * is unlike the rest of the corpus (boilerplate-free but possibly
   * noise); low ⇒ fluent/common text. All counters are integers and the
   * two ratios are single IEEE divisions, so the result is bit-exact
   * across engines.
   *
   * Scale shape: the model groupBy and the scoring join shuffle on the
   * SAME key (gram), so the join is co-partitioned with the count that
   * feeds it; the per-doc rollup is a partial+final agg on id. Nothing
   * broadcasts the corpus and nothing funnels it through one reducer.
   */
  def score(df: DataFrame, idCol: String, textCol: String, n: Int = 2,
      rareMax: Long = 1L): DataFrame = {
    val docGrams = df.select(col(idCol).as("id"),
      explode(bigrams(col(textCol), n)).as("gram"))
    val scored = docGrams
      .join(model(df, textCol, n), Seq("gram"))
      .groupBy("id").agg(
        count(lit(1)).cast("int").as("n_ngrams"),
        sum(when(col("cnt") <= rareMax, 1L).otherwise(0L)).cast("int").as("n_rare"),
        sum(col("cnt")).as("sum_freq"))
    // short docs (< n tokens) have no grams: keep them with zero counts
    df.select(col(idCol).as("id"))
      .join(scored, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("n_ngrams"), lit(0)).as("n_ngrams"),
        coalesce(col("n_rare"), lit(0)).as("n_rare"),
        coalesce(col("sum_freq"), lit(0L)).as("sum_freq"))
      .withColumn("rare_ratio",
        when(col("n_ngrams") > 0,
          col("n_rare").cast("double") / col("n_ngrams")))
      .withColumn("avg_freq",
        when(col("n_ngrams") > 0,
          col("sum_freq").cast("double") / col("n_ngrams")))
  }

  /**
   * Interpolated Kneser–Ney bigram log-likelihood scoring — the real
   * perplexity-filter arithmetic of a CCNet/KenLM-style curation
   * pipeline (Kneser & Ney '95; Chen & Goodman '98 eq. 4.27),
   * where [[score]] gives only a rarity heuristic. With absolute
   * discount `D = discountCenti/100`:
   *
   *   P(w₂|w₁) = (max(c(w₁w₂) − D, 0) + D · N₁₊(w₁·) · P_cont(w₂)) / c(w₁·)
   *   P_cont(w₂) = N₁₊(·w₂) / N₁₊(··)
   *
   * N₁₊(w₁·) = distinct continuations of w₁, N₁₊(·w₂) = distinct
   * predecessors of w₂ ("how many contexts has this word completed" —
   * the novel-continuation idea that distinguishes KN from Katz),
   * N₁₊(··) = distinct bigram types. The model is self-scored (grams
   * come from the corpus being scored) so every gram has c ≥ 1 and
   * P > 0 — no OOV branch.
   *
   * Float discipline: one rounded micro-nat long per MODEL gram
   * (round-once, [[graft.pipeline.Stats.tokenKL]]'s discipline — the
   * double expression is left-associated identically in the DuckDB
   * oracle), summed exactly per document; the per-gram average is a
   * single IEEE division at the end.
   *
   * Scale shape: the per-gram log-prob is computed once per DISTINCT
   * gram (vocabulary-sized model table), not per occurrence; the
   * context/continuation tables are groupBys OVER the gram table
   * (already collapsed), and doc scoring is one gram equi-join +
   * one partial+final per-doc rollup. Nothing broadcasts the corpus;
   * the only broadcast is the one-row type count.
   *
   * Returns (id, n_bigrams, ll_unats, nll_unats_per_gram) — higher
   * nll ⇒ less fluent under the corpus model; docs with < 2 tokens
   * carry zero counts and a NULL average.
   */
  def knScore(df: DataFrame, idCol: String, textCol: String,
      discountCenti: Int = 75): DataFrame = {
    require(discountCenti > 0 && discountCenti < 100,
      s"discountCenti must be in (0, 100), got $discountCenti")
    val d = lit(discountCenti / 100.0)
    val big = df.select(explode(bigrams(col(textCol))).as("gram"))
      .groupBy("gram").agg(count(lit(1)).as("c12"))
      .withColumn("__w1", split(col("gram"), " ").getItem(0))
      .withColumn("__w2", split(col("gram"), " ").getItem(1))
    val ctx = big.groupBy("__w1").agg(sum("c12").as("c1"),
      count(lit(1)).as("n1p_fw"))
    val cont = big.groupBy("__w2").agg(count(lit(1)).as("n1p_bw"))
    val types = big.agg(count(lit(1)).as("__v2"))
    val pcont = col("n1p_bw").cast("double") / col("__v2")
    val pkn = (greatest(col("c12").cast("double") - d, lit(0.0)) +
      (d * col("n1p_fw")) * pcont) / col("c1")
    val model = big.join(ctx, Seq("__w1")).join(cont, Seq("__w2"))
      .crossJoin(broadcast(types))
      .select(col("gram"), round(lit(1e6) * log(pkn)).cast("long").as("__lp"))
    val scored = df.select(col(idCol).as("id"),
        explode(bigrams(col(textCol))).as("gram"))
      .join(model, Seq("gram"))
      .groupBy("id").agg(count(lit(1)).cast("int").as("n_bigrams"),
        sum("__lp").as("ll_unats"))
    df.select(col(idCol).as("id")).join(scored, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("n_bigrams"), lit(0)).as("n_bigrams"),
        coalesce(col("ll_unats"), lit(0L)).as("ll_unats"))
      .withColumn("nll_unats_per_gram",
        when(col("n_bigrams") > 0,
          -(col("ll_unats").cast("double") / col("n_bigrams"))))
  }
}

/**
 * Fixed-capacity sequence packing: assign documents to training-context
 * "bins" of `capacity` tokens by contiguous fill — concatenate the
 * (pseudo-randomly ordered) token stream and put each document in the
 * bin where its first token lands. A document longer than the remaining
 * room straddles into the next bin (standard packing-with-cross-doc-
 * attention-masks; the alternative, greedy first-fit, is inherently
 * serial and changes results with parallelism).
 *
 * Packing is sequential BY DEFINITION, so the scale unit is the shard:
 * documents are first sharded by mix64(id) (deterministic, uniform),
 * and the only window runs per shard — `numShards` independent serial
 * units, sized to the cluster, exactly how packed training shards are
 * produced in practice. All arithmetic is integer (offsets, integer
 * division), so results are bit-exact across engines.
 */
object Packing {
  import TextFunctions.c

  private def packed(df: DataFrame, idCol: String, tokenCount: Column,
      capacity: Long, numShards: Int): DataFrame = {
    val w = Window.partitionBy("shard").orderBy(col("__h"), col("id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    df.select(col(idCol).as("id"), tokenCount.cast("long").as("__tok"))
      .withColumn("__h", c(Mix64(asExpr(col("id")))))
      .withColumn("shard", pmod(col("__h"), lit(numShards.toLong)).cast("int"))
      .withColumn("start_offset", coalesce(sum(col("__tok")).over(w), lit(0L)))
      .withColumn("bin", expr(s"start_offset div ${capacity}L"))
  }

  /** (id, shard, bin, start_offset): bin = start_offset / capacity with
    * start_offset = sum of token counts of earlier docs in the shard's
    * mix64 order. */
  def packBins(df: DataFrame, idCol: String, tokenCount: Column,
      capacity: Long, numShards: Int): DataFrame =
    packed(df, idCol, tokenCount, capacity, numShards)
      .select(col("id"), col("shard"), col("bin"), col("start_offset"))

  /** Per-(shard, bin) packing summary: document count and token total
    * (a bin's total can exceed `capacity` only by the straddle of its
    * last document). */
  def binStats(df: DataFrame, idCol: String, tokenCount: Column,
      capacity: Long, numShards: Int): DataFrame =
    packed(df, idCol, tokenCount, capacity, numShards)
      .groupBy("shard", "bin")
      .agg(count(lit(1)).cast("int").as("n_docs"), sum("__tok").as("bin_tokens"))
}

/**
 * Deterministic train/val/test split assignment: permille bucket =
 * mix64(id) mod 1000 (signed-stabilized), split by cumulative permille
 * thresholds. Pure per-row arithmetic — no shuffle, no state — and
 * stable under re-runs, inserts and re-partitioning, which is the whole
 * point: a document's split NEVER changes when the corpus around it
 * does (contrast `randomSplit`, which reassigns on every change of
 * partitioning or seed).
 */
object Splits {
  import TextFunctions.c

  /** Adds (bucket, split) columns; trainPermille + valPermille ≤ 1000,
    * the remainder is "test". */
  def assign(df: DataFrame, idCol: String, trainPermille: Int = 980,
      valPermille: Int = 10): DataFrame = {
    require(trainPermille + valPermille <= 1000, "permilles exceed 1000")
    val h = c(Mix64(asExpr(col(idCol))))
    df.withColumn("bucket", pmod(h, lit(1000L)).cast("int"))
      .withColumn("split",
        when(col("bucket") < trainPermille, "train")
          .when(col("bucket") < trainPermille + valPermille, "val")
          .otherwise("test"))
  }

  /**
   * Weighted PRIORITY sampling (Duffield-Lund-Thorup): a deterministic
   * k-item sample whose inclusion leans toward heavy `weightCol` items
   * — the weighted complement of the hash-order quota sample. Each row
   * gets `priority = u div max(weight, 1)` with `u = mix64(id) &
   * Long.MaxValue` (a uniform integer on [0, 2^63) — integer floor
   * division instead of the scheme's u/w float keeps every comparison
   * EXACT and bit-replayable in any engine); the k SMALLEST priorities
   * win, so doubling a weight halves an item's priority scale.
   *
   * 100 TB shape: the only plan is a scalar projection + global
   * bounded top-k (TakeOrderedAndProject — map partitions keep k rows,
   * no full sort materialization, no shuffle beyond the k-row
   * singleton). Seedless by design: the sample is a pure function of
   * ids, so reruns and engines agree row-for-row.
   *
   * Output: input columns + `priority`, the k winners in
   * (priority, id) order.
   */
  def prioritySample(df: DataFrame, idCol: String, weightCol: String,
      k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val u = c(Mix64(asExpr(col(idCol)))).bitwiseAND(lit(Long.MaxValue))
    df.withColumn("__graft_u", u)
      .withColumn("priority",
        expr(s"__graft_u div greatest($weightCol, 1L)"))
      .orderBy(col("priority"), col(idCol))
      .limit(k)
      .drop("__graft_u")
  }

  /**
   * Per-key deterministic k-sample — [[prioritySample]]'s keyed,
   * unweighted sibling and the batch face of
   * [[graft.streaming.StreamingPipeline.reservoirStream]]: each row's
   * priority is `mix64(id) & Long.MaxValue` (seedless — a pure
   * function of ids, so reruns, engines and the streaming twin agree
   * row-for-row) and the k SMALLEST priorities per key win.
   *
   * 100 TB shape: one scalar projection + one key-partitioned
   * row_number window — rows shuffle once by key; no global sort, no
   * driver state. (A rank-over-window keeps ties deterministic via
   * the (priority, id) order.)
   *
   * Output: input columns + `priority`, k winners per key.
   */
  def prioritySamplePerKey(df: DataFrame, keys: Seq[String],
      idCol: String, k: Int): DataFrame = {
    require(keys.nonEmpty, "keys required")
    require(k > 0, s"k must be positive, got $k")
    val W = org.apache.spark.sql.expressions.Window
    val u = c(Mix64(asExpr(col(idCol)))).bitwiseAND(lit(Long.MaxValue))
    val w = W.partitionBy(keys.map(col): _*)
      .orderBy(col("priority"), col(idCol))
    df.withColumn("priority", u)
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") <= k)
      .drop("__rn")
  }
}

/**
 * Fixed-size token-window chunking with overlap — the context-window
 * split of a training/RAG pipeline. A pure per-row generator (explode
 * of a computed index range + array slices, all codegen'd built-ins):
 * no shuffle, no state, output linear in corpus size, so the plan is
 * identical at 100 TB. Chunk i covers tokens [i*stride, i*stride+size)
 * with stride = size - overlap; every start < n_tokens emits, so short
 * docs yield one (possibly short) chunk and every token lands in at
 * least one chunk.
 */
object Chunking {
  def chunk(df: DataFrame, idCol: String, textCol: String,
      sizeTokens: Int, overlap: Int = 0): DataFrame = {
    require(sizeTokens > 0, "sizeTokens must be positive")
    require(overlap >= 0 && overlap < sizeTokens,
      "overlap must be in [0, sizeTokens)")
    val stride = sizeTokens - overlap
    df.select(col(idCol), split(col(textCol), " ").as("__t"))
      .select(col(idCol), col("__t"),
        explode(expr(s"sequence(0, (size(__t) - 1) div $stride)")).as("__ci"))
      .select(col(idCol),
        col("__ci").cast("int").as("chunk_idx"),
        (col("__ci") * stride).cast("int").as("start_token"),
        concat_ws(" ",
          slice(col("__t"), col("__ci") * stride + 1, lit(sizeTokens))).as("chunk_text"),
        least(lit(sizeTokens), size(col("__t")) - col("__ci") * stride)
          .cast("int").as("n_chunk_tokens"))
  }
}
