"""Training-data pipeline DataFrame ops — Python mirror of the Scala
``graft.pipeline`` package (``Chunking``, ``QuantileFilter``).

Same algorithms, pure PySpark composition, so results are identical
row-for-row (asserted by ``test_pipeline.py`` against the Scala specs'
fixtures):

- ``chunk``: fixed-size token windows with overlap — a per-row explode
  of a computed index range plus array slices; no shuffle.
- ``quantile_threshold`` / ``quantile_keep_above``: integer-exact
  discrete p-quantile from a value histogram (never a global row sort),
  broadcast back as a scalar filter.
"""

from pyspark.sql import functions as F
from pyspark.sql.window import Window


def chunk(df, id_col, text_col, size_tokens, overlap=0):
    """Split documents into ``size_tokens``-token windows advancing by
    ``size_tokens - overlap``; every token lands in at least one chunk,
    short docs yield one short chunk."""
    if size_tokens <= 0:
        raise ValueError("size_tokens must be positive")
    if not 0 <= overlap < size_tokens:
        raise ValueError("overlap must be in [0, size_tokens)")
    stride = size_tokens - overlap
    return (
        df.select(F.col(id_col), F.split(F.col(text_col), " ").alias("__t"))
        .select(
            F.col(id_col), F.col("__t"),
            F.explode(F.expr(f"sequence(0, (size(__t) - 1) div {stride})"))
            .alias("__ci"))
        .select(
            F.col(id_col),
            F.col("__ci").cast("int").alias("chunk_idx"),
            (F.col("__ci") * stride).cast("int").alias("start_token"),
            F.concat_ws(
                " ", F.slice(F.col("__t"), F.col("__ci") * stride + 1,
                             F.lit(size_tokens))).alias("chunk_text"),
            F.least(F.lit(size_tokens),
                    F.size(F.col("__t")) - F.col("__ci") * stride)
            .cast("int").alias("n_chunk_tokens"),
        )
    )


def quantile_threshold(df, score, permille):
    """One-row frame holding the smallest score value whose cumulative
    histogram count reaches ceil(n * permille / 1000)."""
    if not 0 <= permille <= 1000:
        raise ValueError("permille must be in [0, 1000]")
    s = df.select(score.cast("long").alias("__s"))
    hist = s.groupBy("__s").agg(F.count(F.lit(1)).alias("__c"))
    cum = hist.withColumn(
        "__cume",
        F.sum("__c").over(
            Window.orderBy("__s").rowsBetween(Window.unboundedPreceding, 0)))
    tot = s.agg(F.count(F.lit(1)).alias("__n"))
    return (
        cum.crossJoin(tot)
        .where(F.col("__cume") >= F.expr(f"(__n * {permille} + 999) div 1000"))
        .agg(F.min("__s").alias("threshold"))
    )


def quantile_keep_above(df, score, permille):
    """Keep rows with score >= the permille threshold (ties kept)."""
    thr = quantile_threshold(df, score, permille)
    return (
        df.crossJoin(F.broadcast(thr))
        .where(score.cast("long") >= F.col("threshold"))
    )


def dedupe_within_doc(df, id_col, text_col, seg_tokens=8):
    """Collapse repeated ``seg_tokens``-token segments inside one document
    to their first occurrence (order-preserving); returns
    (id, clean_text, n_segments, n_dropped). No shuffle."""
    if seg_tokens <= 0:
        raise ValueError("seg_tokens must be positive")
    segs = F.expr(
        f"transform(sequence(0, (size(__t) + {seg_tokens - 1}) div {seg_tokens} - 1), "
        f"i -> array_join(slice(__t, i * {seg_tokens} + 1, {seg_tokens}), ' '))")
    return (
        df.select(F.col(id_col).alias("id"),
                  F.split(F.col(text_col), " ").alias("__t"))
        .select(F.col("id"), segs.alias("__segs"))
        .select(F.col("id"), F.col("__segs"),
                F.array_distinct("__segs").alias("__kept"))
        .select(F.col("id"),
                F.array_join("__kept", " ").alias("clean_text"),
                F.size("__segs").alias("n_segments"),
                (F.size("__segs") - F.size("__kept")).alias("n_dropped"))
    )


def gopher_metrics(df, id_col, text_col,
                   min_words=4, max_words=1000,
                   min_mean_word_len=3.0, max_mean_word_len=10.0,
                   max_symbol_ratio=0.1, min_alpha_ratio=0.8,
                   min_stop_hits=2,
                   stopwords=("the", "a", "and", "of", "to", "in")):
    """Gopher-rule metrics + composite gopher_pass verdict (same rules,
    thresholds, and pinned arithmetic as the Scala GopherRules)."""
    text = F.col(text_col)
    toks = F.split(text, " ")
    n = F.size(toks)
    sum_len = F.aggregate(F.transform(toks, F.length), F.lit(0),
                          lambda a, x: a + x)
    hashes = F.length(text) - F.length(F.replace(text, F.lit("#"), F.lit("")))
    ellipses = (F.length(text)
                - F.length(F.replace(text, F.lit("..."), F.lit("")))) / F.lit(3)
    alpha = F.size(F.filter(toks, lambda t: t.rlike("[a-zA-Z]")))
    stop_hits = F.size(F.filter(
        F.array_distinct(toks), lambda t: t.isin(*stopwords)))
    mean_word_len = sum_len.cast("double") / n
    symbol_ratio = (hashes + ellipses).cast("double") / n
    alpha_ratio = alpha.cast("double") / n
    return df.select(
        F.col(id_col),
        n.cast("int").alias("n_words"),
        mean_word_len.alias("mean_word_len"),
        symbol_ratio.alias("symbol_ratio"),
        alpha_ratio.alias("alpha_ratio"),
        stop_hits.cast("int").alias("stop_hits"),
        (n.between(min_words, max_words)
         & mean_word_len.between(min_mean_word_len, max_mean_word_len)
         & (symbol_ratio <= max_symbol_ratio)
         & (alpha_ratio >= min_alpha_ratio)
         & (stop_hits >= min_stop_hits)).alias("gopher_pass"))


def winnow_pairs(df, id_col, text_col, k=3, w=4, min_shared=2,
                 max_doc_freq=20):
    """Near-dup candidate pairs by shared winnowing fingerprints with the
    hot-fingerprint cutoff (see Scala Dedup.winnowPairs)."""
    sel = (
        df.select(F.col(id_col).alias("id"),
                  F.explode(F.expr(f"pl_winnow({text_col}, {k}, {w})")).alias("s"))
        .select("id", F.col("s.fp").alias("fp")).distinct())
    hot = (sel.groupBy("fp").agg(F.count(F.lit(1)).alias("df"))
           .where(F.col("df") > max_doc_freq).select("fp"))
    kept = sel.join(F.broadcast(hot), ["fp"], "left_anti")
    return (
        kept.alias("a").join(
            kept.alias("b"),
            (F.col("a.fp") == F.col("b.fp")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("a_id"), F.col("b.id").alias("b_id"))
        .agg(F.count(F.lit(1)).cast("int").alias("shared"))
        .where(F.col("shared") >= min_shared)
    )
