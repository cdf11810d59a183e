package graft.pipeline

import graft.expressions.asExpr
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Corpus-curation operators for LLM training-data pipelines: PII
 * detection/redaction, benchmark decontamination, and deterministic
 * mixture sampling. Like the rest of [[graft.pipeline]], everything is
 * built-in (codegen'd) functions plus native expressions — no Scala
 * UDFs — and every shape is partial+final or equi-join bounded.
 */
/**
 * Multi-pattern blocklist matching — the banned-phrase / unsafe-term
 * scan of a curation pipeline, run against dictionaries far too large
 * for per-pattern `contains` probes. One [[MultiMatchCounts]]
 * Aho–Corasick pass per row counts ALL (overlapping) occurrences of
 * every pattern simultaneously: O(len + matches) per document,
 * independent of the dictionary size, where k `LIKE`/`contains`
 * probes cost O(k·len) and k regexes worse.
 *
 * Scale shape: the dictionary ships inside the expression (plan
 * literal — the Bloom-bits pattern, `Pipeline.scala` q_bloom_join);
 * the scan is per-row with ZERO shuffles before the caller's own
 * aggregation. Dictionaries beyond plan-literal size (~10⁶ entries)
 * should ship via a broadcast join on extracted candidates instead.
 */
object Blocklist {
  import graft.expressions.asColumn

  /** Per-pattern occurrence counts as `array<long>` aligned with
    * `patterns` (counts overlapping hits — "banana" vs "ana" is 2). */
  def multi_match_counts(text: Column, patterns: Seq[String]): Column = {
    require(patterns.nonEmpty, "patterns must not be empty")
    asColumn(MultiMatchCounts(asExpr(text),
      asExpr(array(patterns.map(lit(_)): _*))))
  }

  /** (id, pattern, n_hits) rows for every document×pattern with at
    * least one hit. */
  def hits(df: DataFrame, idCol: String, textCol: String,
      patterns: Seq[String]): DataFrame = {
    val pats = array(patterns.map(lit(_)): _*)
    df.select(col(idCol).as("id"),
        posexplode(multi_match_counts(col(textCol), patterns))
          .as(Seq("__pi", "n_hits")))
      .where(col("n_hits") > 0L)
      .select(col("id"),
        element_at(pats, col("__pi") + 1).as("pattern"), col("n_hits"))
  }
}

object PII {
  /** The regex dialect here is the RE2-compatible subset of Java regex
    * (character classes, `\d`, `\b`, non-capturing groups, bounded
    * repetition) so external engines replay detection exactly. */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  val PhoneRe = "\\b\\d{3}[-.]\\d{3}[-.]\\d{4}\\b"

  def emails(text: Column): Column = regexp_extract_all(text, lit(EmailRe), lit(0))
  def ipv4s(text: Column): Column = regexp_extract_all(text, lit(Ipv4Re), lit(0))
  def phones(text: Column): Column = regexp_extract_all(text, lit(PhoneRe), lit(0))

  /** Total PII hits of all three kinds (emails may double-count under
    * phones only if the local part is a bare phone number — the regexes
    * are otherwise disjoint). */
  def piiCount(text: Column): Column =
    (size(emails(text)) + size(ipv4s(text)) + size(phones(text))).cast("int")

  /** Replace every PII span with a typed placeholder. Emails first (their
    * local parts may contain digits), then IPv4 (so the dotted quads are
    * gone before the phone pass can see their digit runs), then phones. */
  def redact(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailRe, "<EMAIL>"),
        Ipv4Re, "<IP>"),
      PhoneRe, "<PHONE>")
}

/**
 * Benchmark decontamination: flag training documents that share n-gram
 * evidence with an evaluation/benchmark corpus, the standard guard
 * against test-set leakage when assembling a training mixture.
 */
object Decontaminate {
  import TextFunctions.{c, tokens}

  private def grams(text: Column, n: Int): Column =
    c(DistinctNGrams(asExpr(tokens(text)), n))

  /**
   * Per-document contamination report: (id, n_grams, n_overlap, score,
   * contaminated) where `score` = fraction of the document's DISTINCT
   * n-grams that appear anywhere in `bench`.
   *
   * Scale shape: the benchmark gram universe is distinct-reduced and
   * BROADCAST (benchmarks are small by nature — contamination against a
   * benchmark too large to broadcast isn't a realistic query), so the
   * probe over the 100 TB training side is a map-side semi-join: no
   * shuffle of the corpus at all, one partial+final count per doc.
   */
  def contamination(docs: DataFrame, idCol: String, textCol: String,
      bench: DataFrame, benchTextCol: String, n: Int = 5): DataFrame = {
    val docGrams = docs.select(col(idCol).as("id"),
      explode(grams(col(textCol), n)).as("gram"))
    val benchGrams = bench.select(explode(grams(col(benchTextCol), n)).as("gram")).distinct()
    val overlap = docGrams.join(broadcast(benchGrams), Seq("gram"), "left_semi")
      .groupBy("id").agg(count(lit(1)).cast("int").as("n_overlap"))
    docGrams.groupBy("id").agg(count(lit(1)).cast("int").as("n_grams"))
      .join(overlap, Seq("id"), "left")
      .select(col("id"), col("n_grams"),
        coalesce(col("n_overlap"), lit(0)).as("n_overlap"))
      .withColumn("score", col("n_overlap").cast("double") / col("n_grams"))
      .withColumn("contaminated", col("n_overlap") > 0)
  }
}

/**
 * Deterministic mixture sampling: select a per-source quota (by document
 * count or token budget) in a stable pseudo-random order — the
 * mixture-building step of a training pipeline ("200 B tokens of web,
 * 20 B of code, ...").
 *
 * The naive spec is `row_number() OVER (PARTITION BY source ORDER BY
 * mix64(id), id) <= quota` — but sources are few and huge, so that
 * window funnels each source's entire 100 TB slice through ONE reducer.
 * Instead both samplers run an exact two-phase bucket cutoff:
 *
 *  1. bucket every row by the top `bucketBits` bits of its sort hash and
 *     aggregate per-(source, bucket) counts/token-sums — a partial+final
 *     agg to a tiny (sources × 2^bucketBits) table;
 *  2. a cumulative sum over that TINY table (the only window, 2^bucketBits
 *     rows per source) finds each source's boundary bucket: every bucket
 *     strictly below it is kept outright, and only the rows INSIDE the
 *     boundary bucket (expected n/2^bucketBits of them) are ranked
 *     precisely against the remaining quota.
 *
 * The result is row-identical to the naive window (the oracle checks
 * exactly that) with no per-source serial bottleneck.
 */
object Mixture {
  import TextFunctions.c

  private val BucketBits = 12

  def hashOrder(id: Column): Column = c(Mix64(asExpr(id)))

  /** (source, bucket) → cumulative weight BEFORE this bucket, computed on
    * the tiny aggregated table; window span is 2^bucketBits rows. */
  private def bucketPlan(weighted: DataFrame): DataFrame = {
    val w = Window.partitionBy("source").orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, -1)
    weighted.groupBy("source", "bucket").agg(sum(col("weight")).as("bw"))
      .withColumn("cum_before", coalesce(sum(col("bw")).over(w), lit(0L)))
  }

  /** Shared core: ranks rows by (bucket, h, id) within each source and
    * keeps rows while the running `weight` total stays within `quota`.
    * `weight` = 1 per row for count quotas, token count for budgets. */
  private def sampleCore(df: DataFrame, idCol: String, srcCol: String,
      weight: Column, quota: Column): DataFrame = {
    val rows = df
      .withColumn("__h", hashOrder(col(idCol)))
      // arithmetic shift + offset keeps the bucket monotone in the SIGNED
      // hash, matching the `ORDER BY mix64(id)` spec order exactly
      .withColumn("__bucket", shiftright(col("__h"), 64 - BucketBits) + (1 << (BucketBits - 1)))
      .withColumn("__w", weight.cast("long"))
      .withColumn("source", col(srcCol))
    val plan = bucketPlan(rows.select(col("source"), col("__bucket").as("bucket"),
      col("__w").as("weight")))
    val joined = rows.join(
      broadcast(plan.select(col("source"), col("bucket").as("__bucket"),
        col("cum_before"), (col("cum_before") + col("bw")).as("cum_after"))),
      Seq("source", "__bucket"))
    // Buckets that fit entirely under quota pass with no ranking at all;
    // only the single boundary bucket per source pays a window, over
    // ~n/2^bucketBits rows.
    val whole = joined.where(col("cum_after") <= quota)
    val wBoundary = Window.partitionBy("source")
      .orderBy(col("__h"), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val boundary = joined
      .where(col("cum_before") < quota && col("cum_after") > quota)
      .withColumn("__cum", col("cum_before") + sum(col("__w")).over(wBoundary))
      .where(col("__cum") <= quota)
      .drop("__cum")
    whole.unionByName(boundary)
  }

  /** Keep (up to) `quota` documents per source, chosen in mix64(id)
    * order. Row-identical to the naive per-source row_number window. */
  def sampleByQuota(df: DataFrame, idCol: String, srcCol: String,
      quota: Long): DataFrame =
    sampleCore(df, idCol, srcCol, lit(1L), lit(quota))
      .drop("__h", "__bucket", "__w", "cum_before", "cum_after")

  /** Keep documents per source, in mix64(id) order, while the running
    * token total stays within `budgetTokens` (first doc that would
    * overflow the budget stops the take for that source). */
  def sampleByTokenBudget(df: DataFrame, idCol: String, srcCol: String,
      tokenCount: Column, budgetTokens: Long): DataFrame =
    sampleCore(df, idCol, srcCol, tokenCount, lit(budgetTokens))
      .drop("__h", "__bucket", "__w", "cum_before", "cum_after")

  /**
   * Neyman-allocated stratified sample: spend a global row `budget`
   * across strata proportional to N_h·σ_h of a pre-scaled integral
   * metric — the variance-optimal allocation for estimating the metric
   * mean (Neyman '34), vs [[sampleByQuota]]'s flat per-source cap.
   *
   *   w_h    = round(√(n_h·Σv² − (Σv)²))   (= N_h·σ_h exactly; IEEE
   *            sqrt is correctly rounded, so the long is engine-exact)
   *   alloc_h = min(n_h, budget·w_h div Σw)
   *
   * Zero-variance strata get 0 (they contribute nothing to mean
   * variance — the textbook behavior); if EVERY stratum is degenerate,
   * all allocations are 0. Rows are then taken per stratum in
   * mix64(id) order through the same bucketed two-phase take as
   * [[sampleByQuota]] — no per-stratum serial window.
   *
   * Scale shape: one moments groupBy (map-side combined,
   * stratum-bounded), a broadcast one-row Σw crossJoin, the bucketed
   * take's tiny-table window. Overflow contract: n_h·Σv² < 2^63 and
   * budget·w_h < 2^63 (the [[Stats.anomalyFlags]] discipline).
   *
   * Returns the sampled rows plus (w_h, alloc).
   */
  def neymanSample(df: DataFrame, idCol: String, srcCol: String,
      metric: Column, budget: Long): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    val m = df.select(col(srcCol).as("source"), metric.cast("long").as("__v"))
      .groupBy("source").agg(count(lit(1)).as("__nh"),
        sum("__v").as("__s"), sum(col("__v") * col("__v")).as("__ssq"))
    val w = m.withColumn("w_h", round(sqrt(
      (col("__nh") * col("__ssq") - col("__s") * col("__s"))
        .cast("double"))).cast("long"))
    val tot = w.agg(sum("w_h").as("__tw"))
    val alloc = w.crossJoin(broadcast(tot))
      .withColumn("alloc", least(col("__nh"),
        expr(s"case when __tw = 0 then 0 else $budget * w_h div __tw end")))
      .select(col("source").as(srcCol), col("w_h"), col("alloc"))
    sampleCore(df.join(broadcast(alloc), srcCol), idCol, srcCol, lit(1L),
        col("alloc"))
      .drop("__h", "__bucket", "__w", "cum_before", "cum_after")
  }
}

/**
 * Percentile-threshold quality filtering (FineWeb-style "drop the
 * bottom p permille by score") with integer-exact semantics: the
 * threshold is the smallest score value whose cumulative count reaches
 * ceil(n * permille / 1000) — i.e. the discrete p-quantile — computed
 * from a value histogram, never a global row sort. The 100 TB shape:
 * one partial+final aggregate builds the histogram (rows collapse to
 * distinct score values), the cumulative scan runs over that bounded
 * histogram only, and the scalar threshold broadcasts back into a
 * codegen'd filter. Requires an integral score with bounded cardinality
 * (token counts, byte lengths, permille-scaled ratios); for unbounded
 * real scores, quantize to permille first.
 */
object QuantileFilter {
  /** One-row frame: the permille threshold of `score` (integer-exact). */
  def threshold(df: DataFrame, score: Column, permille: Int): DataFrame = {
    require(permille >= 0 && permille <= 1000, "permille must be in [0, 1000]")
    val s = df.select(score.cast("long").as("__s"))
    val hist = s.groupBy("__s").agg(count(lit(1)).as("__c"))
    // single-partition window over the HISTOGRAM (distinct values), not rows
    val cum = hist.withColumn("__cume",
      sum(col("__c")).over(Window.orderBy(col("__s"))
        .rowsBetween(Window.unboundedPreceding, 0)))
    val tot = s.agg(count(lit(1)).as("__n"))
    cum.crossJoin(tot)
      .where(col("__cume") >= expr(s"(__n * $permille + 999) div 1000"))
      .agg(min(col("__s")).as("threshold"))
  }

  /** Keep rows whose score >= the permille threshold (threshold ties are
    * kept, so at least (1000 - permille)/1000 of rows survive). */
  def keepAbove(df: DataFrame, score: Column, permille: Int): DataFrame =
    df.crossJoin(broadcast(threshold(df, score, permille)))
      .where(score.cast("long") >= col("threshold"))

  /**
   * Per-group percentile-rank calibration: append `calib_permille` =
   * the permille of the group's rows scoring STRICTLY below this row's
   * score (`below · 1000 div n` — ties share one calibrated value).
   * This is how heterogeneous per-source quality scores become
   * comparable before mixture sampling: a 0.9-quality doc means
   * nothing across scorers, "top 2% of its source" does.
   *
   * Same histogram discipline as [[threshold]], per group: the
   * strictly-below cume runs over distinct (group, score) histogram
   * rows (partitioned window — a group's distinct score count bounds
   * the sort), and the fact table meets the permille map in ONE
   * equi-join on (group, score) — the rows themselves are never
   * window-sorted. Integral scores only (quantize first).
   */
  def calibrate(df: DataFrame, groupCol: String, scoreCol: String): DataFrame = {
    val v = col(scoreCol).cast("long")
    val hist = df.groupBy(col(groupCol).as("__g"), v.as("__v"))
      .agg(count(lit(1)).as("__c"))
    val wCume = Window.partitionBy("__g").orderBy("__v")
      .rowsBetween(Window.unboundedPreceding, 0)
    val wGrp = Window.partitionBy("__g")
    val m = hist
      .withColumn("__below", sum("__c").over(wCume) - col("__c"))
      .withColumn("__n", sum("__c").over(wGrp))
      .select(col("__g"), col("__v"),
        expr("__below * 1000 div __n").as("calib_permille"))
    df.join(m, col(groupCol) === col("__g") && v === col("__v"))
      .drop("__g", "__v")
  }

  /**
   * Quantile normalization across groups — the VALUE-scale completion
   * of [[calibrate]] (the microarray-era quantile-mapping, Bolstad
   * et al. '03, at corpus scale): each row's score maps to the POOLED
   * distribution's value at the row's within-group quantile, so
   * heterogeneous per-source score scales become one comparable scale
   * in real score units (where calibrate outputs a rank).
   *
   *   pm(row)   = ⌈cum_{≤v within group} · 1000 / n_group⌉   (1..1000)
   *             — CEILING division ((cum·1000 + n−1) div n), so the
   *               smallest cum ≥ 1 maps to pm ≥ 1 and every row lands
   *               on the 1..1000 grid (a floor here maps any value
   *               with cum < n/1000 to pm 0, silently dropping it at
   *               the grid join — every >1000-row group with a rare
   *               low value)
   *   norm(pm)  = min pooled v with pooled_cum ≥ ceil(n_pool·pm/1000)
   *             — the [[QuantileFilter.threshold]] discrete quantile
   *
   * Exact integers end to end; ties inside a group share one pm and
   * one normalized value on every engine. Rows with a NULL group or
   * score are excluded by contract (a NULL score has no quantile; the
   * ksStatistic NULL rule — CurationSpec pins it).
   *
   * Scale shape: both sides reduce to distinct-value histograms before
   * any window (the [[calibrate]] discipline — fact rows are never
   * window-sorted); the pooled permille map is a ≤1000-row broadcast
   * built from histogram × permille-grid (bounded by distinct scores ×
   * 1000 — integral pre-quantized scores only, by contract); the fact
   * table meets its (group, score) → pm map in ONE equi-join and the
   * pm → value map by broadcast.
   *
   * Returns the input plus (src_permille, norm_score).
   */
  def quantileNormalize(df: DataFrame, groupCol: String,
      scoreCol: String): DataFrame = {
    val v = col(scoreCol).cast("long")
    val in = df.where(col(groupCol).isNotNull && v.isNotNull)
    val hist = in.groupBy(col(groupCol).as("__g"), v.as("__v"))
      .agg(count(lit(1)).as("__c"))
    val wCume = Window.partitionBy("__g").orderBy("__v")
      .rowsBetween(Window.unboundedPreceding, 0)
    val wGrp = Window.partitionBy("__g")
    val pmMap = hist
      .withColumn("__cum", sum("__c").over(wCume))
      .withColumn("__n", sum("__c").over(wGrp))
      .select(col("__g"), col("__v"),
        expr("(__cum * 1000 + __n - 1) div __n").as("src_permille"))
    // pooled inverse-CDF at each permille: the threshold() recipe over
    // the pooled histogram, once per pm 1..1000
    val pooled = in.groupBy(v.as("__pv")).agg(count(lit(1)).as("__pc"))
      .withColumn("__pcum", sum("__pc").over(Window.orderBy(col("__pv"))
        .rowsBetween(Window.unboundedPreceding, 0)))
    val pTot = in.agg(count(lit(1)).as("__pn"))
    val grid = df.sparkSession.createDataFrame(
      (1 to 1000).map(Tuple1(_))).toDF("__pm")
    val inv = pooled.crossJoin(broadcast(pTot)).crossJoin(broadcast(grid))
      .where(col("__pcum") >= expr("(__pn * __pm + 999) div 1000"))
      .groupBy("__pm").agg(min(col("__pv")).as("norm_score"))
    in.join(pmMap, col(groupCol) === col("__g") && v === col("__v"))
      .join(broadcast(inv), col("src_permille") === col("__pm"))
      .drop("__g", "__v", "__pm")
  }
}

/**
 * Gopher-style document quality rules (Rae et al. 2021, "Scaling
 * Language Models: ... Gopher", §A1.1): word-count bounds, mean word
 * length in [3, 10], symbol-to-word ratio, alphabetic-word fraction,
 * and a minimum distinct-stopword presence. All per-row codegen'd
 * built-ins (split + higher-order array functions) — no shuffle, no
 * UDFs — and every ratio is a single integer/integer division, so
 * external engines replay the doubles bit-exactly. Line-based rules
 * (bullet/ellipsis line fractions) are omitted: the synthetic corpus is
 * single-line; add them over split(text, '\n') when lines exist.
 */
object GopherRules {
  val DefaultStopwords: Seq[String] = Seq("the", "a", "and", "of", "to", "in")

  /** The composite pass verdict as a bare column — for composing the
    * gate inline (e.g. the end-to-end curation pipeline) without
    * materializing the per-rule metric columns. Same pinned arithmetic
    * as [[metrics]]: each ratio is ONE integer/integer division, so the
    * doubles replay bit-exactly on any IEEE-754 engine. */
  def passGate(text: Column,
      minWords: Int = 4, maxWords: Int = 1000,
      minMeanWordLen: Double = 3.0, maxMeanWordLen: Double = 10.0,
      maxSymbolRatio: Double = 0.1, minAlphaRatio: Double = 0.8,
      minStopHits: Int = 2,
      stopwords: Seq[String] = DefaultStopwords): Column = {
    val toks = split(text, " ")
    val n = size(toks)
    val sumLen = aggregate(transform(toks, t => length(t)), lit(0), (a, x) => a + x)
    val hashes = length(text) - length(replace(text, lit("#"), lit("")))
    val ellipses = (length(text) - length(replace(text, lit("..."), lit("")))) / lit(3)
    val alpha = size(filter(toks, t => t.rlike("[a-zA-Z]")))
    val stopHits = size(filter(array_distinct(toks),
      t => t.isin(stopwords.map(lit(_)): _*)))
    n.between(minWords, maxWords) &&
      (sumLen.cast("double") / n).between(minMeanWordLen, maxMeanWordLen) &&
      (hashes + ellipses).cast("double") / n <= maxSymbolRatio &&
      alpha.cast("double") / n >= minAlphaRatio &&
      stopHits >= minStopHits
  }

  /** Adds the rule metrics + the composite `gopher_pass` verdict. */
  def metrics(df: DataFrame, idCol: String, textCol: String,
      minWords: Int = 4, maxWords: Int = 1000,
      minMeanWordLen: Double = 3.0, maxMeanWordLen: Double = 10.0,
      maxSymbolRatio: Double = 0.1, minAlphaRatio: Double = 0.8,
      minStopHits: Int = 2,
      stopwords: Seq[String] = DefaultStopwords): DataFrame = {
    val text = col(textCol)
    val toks = split(text, " ")
    val n = size(toks)
    val sumLen = aggregate(transform(toks, t => length(t)), lit(0), (a, x) => a + x)
    val hashes = length(text) - length(replace(text, lit("#"), lit("")))
    val ellipses = (length(text) - length(replace(text, lit("..."), lit("")))) / lit(3)
    val alpha = size(filter(toks, t => t.rlike("[a-zA-Z]")))
    val stopHits = size(filter(array_distinct(toks),
      t => t.isin(stopwords.map(lit(_)): _*)))
    val meanWordLen = sumLen.cast("double") / n
    val symbolRatio = (hashes + ellipses).cast("double") / n
    val alphaRatio = alpha.cast("double") / n
    df.select(col(idCol),
      n.cast("int").as("n_words"),
      meanWordLen.as("mean_word_len"),
      symbolRatio.as("symbol_ratio"),
      alphaRatio.as("alpha_ratio"),
      stopHits.cast("int").as("stop_hits"),
      (n.between(minWords, maxWords) &&
        meanWordLen.between(minMeanWordLen, maxMeanWordLen) &&
        symbolRatio <= maxSymbolRatio &&
        alphaRatio >= minAlphaRatio &&
        stopHits >= minStopHits).as("gopher_pass"))
  }
}

/**
 * CCNet-style SEGMENT-level language-model filtering: documents split
 * into fixed token windows, each segment scored against the corpus
 * bigram table, and segments whose bigrams are mostly corpus-unique
 * (gibberish, mangled encodings, boilerplate hashes) dropped before
 * the document reassembles — the per-paragraph-perplexity gate of the
 * CCNet pipeline, with bigram RARITY standing in for the external LM
 * (self-supervised: the corpus is its own model; rarity is an exact
 * integer permille, so the gate is replayable to the bit where a
 * float perplexity would not be).
 *
 * Shapes at scale: the model is one partial+final gram count; segment
 * scoring is one shuffle on the gram (ids-only rows) + a (doc, seg)
 * groupBy; reassembly reuses the [[Dedup.segmentDedup]] recipe
 * (in-group sort_array, no window). The model is re-derived from `df`
 * here — persist it once when several filters share it.
 */
object SegmentLm {
  /** Returns (id, clean_text, n_segments, n_dropped). A segment is
    * dropped when `rare_bigrams * 1000 div bigrams > maxRarePermille`;
    * segments too short to have bigrams carry no evidence and are
    * kept. `rareMaxCnt` defines "rare" (corpus count ≤ it). */
  def segmentLmFilter(df: DataFrame, idCol: String, textCol: String,
      segTokens: Int = 8, maxRarePermille: Long = 500,
      rareMaxCnt: Long = 1): DataFrame = {
    require(segTokens > 0, s"segTokens must be positive, got $segTokens")
    val segsArr = expr(
      s"""transform(sequence(0, CAST(ceil(size(__t) / ${segTokens}.0) AS INT) - 1),
         |  i -> array_join(slice(__t, i * $segTokens + 1, $segTokens), ' '))""".stripMargin)
    val tokenized = df.select(col(idCol).as("id"), split(col(textCol), " ").as("__t"))
    val segs = tokenized.select(col("id"), posexplode(segsArr).as(Seq("pos", "seg")))
    val model = NGramLM.model(df, textCol)
    val sgrams = segs.select(col("id"), col("pos"),
      explode(NGramLM.bigrams(col("seg"))).as("gram"))
    val rarity = sgrams.join(model, Seq("gram"))
      .groupBy("id", "pos")
      .agg(count(lit(1)).as("__n"),
        sum(when(col("cnt") <= rareMaxCnt, 1L).otherwise(0L)).as("__r"))
    val kept = segs.join(rarity, Seq("id", "pos"), "left")
      .where(coalesce(expr("__r * 1000 div __n"), lit(0L)) <= maxRarePermille)
      .groupBy("id")
      .agg(count(lit(1)).as("n_kept"),
        array_join(expr(
          "transform(sort_array(collect_list(struct(pos, seg))), s -> s.seg)"),
          " ").as("clean_text"))
    tokenized.select(col("id"), size(segsArr).as("n_segments"))
      .join(kept, Seq("id"), "left")
      .select(col("id"), coalesce(col("clean_text"), lit("")).as("clean_text"),
        col("n_segments"),
        (col("n_segments") - coalesce(col("n_kept"), lit(0L))).cast("int")
          .as("n_dropped"))
  }
}

/**
 * k-anonymity audit over quasi-identifier columns — the privacy gate a
 * training-data release runs before shipping user-derived tables: any
 * quasi-identifier combination observed on fewer than k rows can
 * single someone out. Beside the flag, the audit reports whether the
 * standard remediation — generalizing away the FINEST quasi column —
 * would clear the combo (`coarse_ok`), so the caller can split rows
 * into keep / generalize / suppress in one pass.
 *
 * Scale shape: two groupBys over the same fact scan (full combo and
 * the one-shorter prefix combo — both map-side combinable aggregates
 * whose outputs are combo-bounded, not row-bounded) and one equi-join
 * between the two aggregate tables (AQE broadcasts the coarse side in
 * practice). No window, no self-join of the fact table.
 */
/**
 * Flesch Reading Ease over sentence-per-line text — the classic
 * readability gate of an instruction/educational-data filter, applied
 * to the [[graft.pipeline.TextNorm.clean_lines]] output shape (one
 * sentence per `\n` line; feed prose through a sentence splitter
 * first). Syllables are approximated the standard way — vowel-group
 * runs `[aeiouy]+` per LOWERCASED word, floor 1 (case-folding first,
 * so 'Apple' and 'apple' count alike) — and the score
 * `206.835 − 1.015·(words/sentences) − 84.6·(syllables/words)` is
 * reported in MILLI-points, rounded ONCE from two exact integer
 * divisions in double (replayable on any IEEE engine). Higher = easier;
 * classic English prose sits ~60–70.
 *
 * Scale shape: pure per-row built-ins (split + regexp_extract_all +
 * higher-order folds) — zero shuffles.
 */
object Readability {
  /** (id, n_sentences, n_words, n_syllables, flesch_milli). Rows with
    * no words return NULL flesch (nothing to score). */
  def flesch(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val words = filter(split(regexp_replace(col("__text"), "\n", " "), " "),
      w => w =!= "")
    val syl = expr(
      """aggregate(filter(split(regexp_replace(__text, '\n', ' '), ' '),
        |    w -> w != ''), 0L,
        |  (acc, w) -> acc + greatest(1L,
        |    size(regexp_extract_all(lower(w), '[aeiouy]+', 0))))""".stripMargin)
    val sentences =
      size(filter(split(col("__text"), "\n"), l => trim(l) =!= ""))
    df.select(col(idCol).as("id"), col(textCol).as("__text"))
      .select(col("id"),
        greatest(sentences.cast("long"), lit(1L)).as("n_sentences"),
        size(words).cast("long").as("n_words"),
        syl.as("n_syllables"))
      .select(col("id"), col("n_sentences"), col("n_words"), col("n_syllables"),
        when(col("n_words") > 0L,
          round(lit(206835.0) -
            lit(1015.0) * col("n_words") / col("n_sentences") -
            lit(84600.0) * col("n_syllables") / col("n_words")).cast("long"))
          .as("flesch_milli"))
  }
}

object KAnonymity {
  /** One row per full quasi combo: its count `n`, `is_risky = n < k`,
    * the coarser prefix combo's count `n_coarse`, and
    * `coarse_ok = n_coarse >= k`. `quasiCols` must have >= 2 columns,
    * ordered coarse -> fine (the last is the one generalized away). */
  def audit(df: DataFrame, quasiCols: Seq[String], k: Long): DataFrame = {
    require(quasiCols.size >= 2,
      s"need >= 2 quasi columns (coarse -> fine), got ${quasiCols.size}")
    require(k >= 2, s"k must be >= 2, got $k")
    val coarseCols = quasiCols.dropRight(1)
    val full = df.groupBy(quasiCols.map(col): _*).agg(count(lit(1)).as("n"))
    val coarse = df.groupBy(coarseCols.map(col): _*)
      .agg(count(lit(1)).as("n_coarse"))
    full.join(coarse, coarseCols)
      .withColumn("is_risky", col("n") < k)
      .withColumn("coarse_ok", col("n_coarse") >= k)
  }

  /**
   * l-diversity audit — the sensitive-attribute complement of [[audit]]:
   * a combo can be k-anonymous (n ≥ k rows) yet still leak the
   * sensitive value if all its rows share one (the homogeneity attack,
   * Machanavajjhala et al. ICDE'06). One row per quasi combo: row count
   * `n`, distinct sensitive-value count `l_distinct`, and
   * `is_risky = l_distinct < l`.
   *
   * Scale shape: one (combo, sensitive) groupBy — map-side combinable,
   * output bounded by the distinct pair table — then a combo-bounded
   * rollup; fact rows shuffle once and no countDistinct Expand ever
   * materializes.
   */
  def lDiversity(df: DataFrame, quasiCols: Seq[String], sensitiveCol: String,
      l: Long): DataFrame = {
    require(quasiCols.nonEmpty, "quasi columns required")
    require(l >= 2, s"l must be >= 2, got $l")
    df.groupBy(quasiCols.map(col) :+ col(sensitiveCol): _*)
      .agg(count(lit(1)).as("__c"))
      .groupBy(quasiCols.map(col): _*)
      .agg(sum("__c").as("n"), count(lit(1)).as("l_distinct"))
      .withColumn("is_risky", col("l_distinct") < l)
  }

  /**
   * t-closeness audit over an ORDERED sensitive attribute — the third
   * rung of the privacy-audit ladder ([[audit]] k-anonymity counts,
   * [[lDiversity]] distinct values, this bounds the DISTRIBUTION): a
   * combo is risky when the Earth Mover's Distance between its
   * sensitive-value distribution and the corpus-wide one exceeds `t`
   * (an attacker learns a skewed salary band even when l values are
   * present). EMD for ordered values with unit adjacent-step cost is
   * the mean absolute cumulative gap, cleared to EXACT integers:
   * per combo c over the k global values in order,
   *
   *   emd_permille = ( Σ_j |CumP_j·n − CumQ_j·n_c| ) · 1000
   *                    div ( n_c·n·(k−1) )
   *
   * (CumP over the combo's counts, CumQ over the corpus; the j=k term
   * is identically 0, so summing all k terms equals the k−1-term
   * definition). DECIMAL(38,0) products, so corpus sizes past 2^31
   * cannot wrap.
   *
   * Scale shape: one (combo, value) groupBy + one (value) groupBy; the
   * dense combo×value grid is an allowlisted crossJoin of two
   * METADATA-sized tables (distinct combos × distinct sensitive
   * values — the label_separation pattern), windows run over grid rows
   * only, and fact rows shuffle exactly once. Output: one row per
   * combo — `quasiCols..., n, emd_permille, is_risky`.
   *
   * NULL contract: rows with a NULL sensitive or quasi value are
   * EXCLUDED up front. The grid's left join is null-unsafe and engines
   * disagree on NULL ordering in the cumulative window (Spark sorts
   * NULLS FIRST, most SQL engines NULLS LAST), so admitting them would
   * silently inflate the EMD and diverge cross-engine; audit NULL
   * handling with a COALESCE sentinel upstream if NULLs are data.
   */
  def tCloseness(df: DataFrame, quasiCols: Seq[String], sensitiveCol: String,
      tPermille: Long): DataFrame = {
    require(quasiCols.nonEmpty, "quasi columns required")
    require(tPermille >= 1 && tPermille <= 1000,
      s"tPermille must be in [1,1000], got $tPermille")
    val combo = quasiCols.map(col)
    val nonNull = (quasiCols :+ sensitiveCol)
      .map(col(_).isNotNull).reduce(_ && _)
    val cell = df.where(nonNull)
      .groupBy(combo :+ col(sensitiveCol).as("__v"): _*)
      .agg(count(lit(1)).as("__p"))
      .localCheckpoint(true) // consumed 3x (combos, grid join, global)
    // the global distribution rolls up from the cell table — never a
    // second scan of the fact rows
    val global = cell.groupBy("__v").agg(sum("__p").as("__q"))
    val combos = cell.groupBy(combo: _*).agg(sum("__p").as("n"))
    val grid = broadcast(combos).crossJoin(broadcast(global))
      .join(cell, quasiCols :+ "__v", "left")
      .na.fill(0L, Seq("__p"))
    val w = Window.partitionBy(combo: _*).orderBy(col("__v"))
    val totals = broadcast(global.agg(sum("__q").as("__n"),
      count(lit(1)).as("__k")))
    grid
      .withColumn("__cp", sum("__p").over(w))
      .withColumn("__cq", sum(col("__q")).over(w))
      .crossJoin(totals)
      .where(col("__k") >= 2)
      .groupBy(combo :+ col("n") :+ col("__n") :+ col("__k"): _*)
      .agg(sum(abs(col("__cp").cast("decimal(38,0)") * col("__n") -
        col("__cq").cast("decimal(38,0)") * col("n"))).as("__d"))
      .withColumn("emd_permille", expr(
        "cast(__d * 1000 div (cast(n as decimal(38,0)) * __n * (__k - 1)) as long)"))
      .withColumn("is_risky", col("emd_permille") > tPermille)
      .select(combo ++ Seq(col("n"), col("emd_permille"), col("is_risky")): _*)
  }
}
