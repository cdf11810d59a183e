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
