"""Temporal joins — Python mirror of ``graft.pipeline.Temporal``.

Pure-PySpark DataFrame implementations of the same two algorithms the
Scala side ships (see ``pipeline/Temporal.scala`` for the full design
notes):

- ``asof_join``: ONE shuffle — union the tagged inputs and take
  ``last(payload, ignoreNulls)`` over a per-key ``(ts, side)`` window —
  instead of the broadcast-nested-loop plan a ``l.ts >= r.ts`` theta
  join produces.
- ``interval_join``: map each point to exactly one time bucket and each
  span to the buckets it overlaps, equi-join on ``(key, bucket)``, then
  refine with the exact half-open containment predicate. Linear shuffle
  volume, no dedup pass.

Both are plain DataFrame compositions, so results are identical to the
Scala operators row-for-row (asserted by ``test_temporal.py`` against
the same fixtures as TemporalSpec).
"""

from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window


def epoch_micros(df, c):
    """``c`` as epoch micros (long), schema-adaptively — the Python twin
    of ``Temporal.epochMicros``: TIMESTAMP via ``unix_micros``,
    TIMESTAMP_NTZ cast in the session timezone (graft pins UTC) first,
    numeric passes through as the caller's own epoch algebra."""
    dt = df.schema[c].dataType
    if isinstance(dt, T.TimestampType):
        return F.unix_micros(F.col(c))
    if isinstance(dt, T.TimestampNTZType):
        return F.unix_micros(F.col(c).cast("timestamp"))
    if isinstance(dt, T.NumericType):
        return F.col(c).cast("long")
    raise ValueError(
        f"column {c}: expected TIMESTAMP, TIMESTAMP_NTZ or numeric epoch, got {dt}")


def _int_bucket_width(bucket_width):
    """Coerce to a positive int — the value is interpolated into SQL as
    an ``L`` literal, so a float like 3600.0 would otherwise produce an
    unparseable ``3600.0L`` (the Scala API enforces Long by type)."""
    w = int(bucket_width)
    if w != bucket_width or w <= 0:
        raise ValueError(
            f"bucket_width must be a positive integer, got {bucket_width!r}")
    return w


def asof_join(left, right, key, left_ts, right_ts, right_prefix="right_",
              tolerance=None, direction="backward",
              allow_exact_matches=True):
    """For every left row, attach the right row of the same ``key`` with
    the greatest ``right_ts <= left_ts`` (pandas ``merge_asof``,
    direction="backward"). ``direction="forward"`` matches the smallest
    ``right_ts >= left_ts`` (the same single-shuffle window read in
    reverse time order); ``"nearest"`` picks whichever sits closer,
    ties backward. ``allow_exact_matches=False`` makes both comparisons
    strict. Left-outer: unmatched rows keep null right columns.

    Timestamp columns may be TIMESTAMP/TIMESTAMP_NTZ or numeric epochs,
    mixed freely — both sides normalize through :func:`epoch_micros`.

    ``tolerance``: optional Column literal bounding ``left_ts -
    right_ts`` in the NORMALIZED domain — micros for TIMESTAMP inputs
    (``F.lit(600000000)`` = 10 min), the columns' own units for numeric.

    Ties on the matched ``(key, ts)`` resolve to the greatest payload
    struct — a total order, so engines and plans agree.
    """
    payload_cols = [c for c in right.columns if c != key]
    if right_ts not in payload_cols:
        raise ValueError(f"right is missing ts column {right_ts}")
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(
            f"direction must be 'backward', 'forward' or 'nearest', got {direction!r}")
    r = right.select(
        F.col(key).alias("__graft_k"),
        epoch_micros(right, right_ts).alias("__graft_ts"),
        F.lit(0).alias("__graft_side"),
        F.lit(0 if allow_exact_matches else 2).alias("__graft_ord"),
        F.struct(*([F.col(c) for c in payload_cols]
                   + [epoch_micros(right, right_ts).alias("__graft_ots")])
                 ).alias("__graft_r"),
    )
    l = (
        left.withColumn("__graft_k", F.col(key))
        .withColumn("__graft_ts", epoch_micros(left, left_ts))
        .withColumn("__graft_side", F.lit(1))
        .withColumn("__graft_ord", F.lit(1))
    )
    u = l.unionByName(r, allowMissingColumns=True)

    def win(desc_ts):
        return (
            Window.partitionBy("__graft_k")
            .orderBy(F.col("__graft_ts").desc() if desc_ts else F.col("__graft_ts"),
                     F.col("__graft_ord"), F.col("__graft_r"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )

    m_b = F.last(F.col("__graft_r"), ignorenulls=True).over(win(False))
    m_f = F.last(F.col("__graft_r"), ignorenulls=True).over(win(True))
    if direction == "backward":
        matched = m_b
    elif direction == "forward":
        matched = m_f
    else:
        bg = F.col("__graft_ts") - m_b["__graft_ots"]
        fg = m_f["__graft_ots"] - F.col("__graft_ts")
        matched = (F.when(m_b.isNull(), m_f).when(m_f.isNull(), m_b)
                   .when(bg <= fg, m_b).otherwise(m_f))
    if tolerance is not None:
        gap = F.abs(F.col("__graft_ts") - matched["__graft_ots"])
        matched = F.when(matched.isNotNull() & (gap <= tolerance), matched)
    u = u.withColumn("__graft_m", matched).where(F.col("__graft_side") == 1)
    return u.select(
        *[F.col(c) for c in left.columns],
        *[F.col("__graft_m")[c].alias(right_prefix + c) for c in payload_cols],
    )


def asof_join_bucketed(left, right, key, left_ts, right_ts, bucket_width,
                       right_prefix="right_", tolerance=None):
    """Hot-key-safe :func:`asof_join`: identical semantics for any
    ``bucket_width``, with the per-key window split into
    ``(key, ts div bucket_width)`` time buckets so one hot key
    parallelizes across its time range. The carry-in (latest right row
    before each bucket start) comes from a bounded per-(key, bucket)
    max-struct summary; carry rows inject at side -1 so real rows win
    boundary ties. Timestamps may be TIMESTAMP/TIMESTAMP_NTZ
    (``bucket_width``/``tolerance`` then in MICROS) or numeric
    non-negative epochs, like :func:`interval_join`.
    """
    bucket_width = _int_bucket_width(bucket_width)
    payload_cols = [c for c in right.columns if c != key]
    if right_ts not in payload_cols:
        raise ValueError(f"right is missing ts column {right_ts}")
    r = right.select(
        F.col(key).alias("__graft_k"),
        epoch_micros(right, right_ts).alias("__graft_ts"),
        F.lit(0).alias("__graft_side"),
        F.struct(*([F.col(c) for c in payload_cols]
                   + [epoch_micros(right, right_ts).alias("__graft_ots")])
                 ).alias("__graft_r"),
    ).withColumn("__graft_b", F.expr(f"__graft_ts div {bucket_width}L"))
    l = (
        left.withColumn("__graft_k", F.col(key))
        .withColumn("__graft_ts", epoch_micros(left, left_ts))
        .withColumn("__graft_side", F.lit(1))
        .withColumn("__graft_b", F.expr(f"__graft_ts div {bucket_width}L"))
    )
    summary = r.groupBy("__graft_k", "__graft_b").agg(
        F.max(F.struct(F.col("__graft_ts"), F.col("__graft_r"))).alias("__graft_last"))
    universe = (
        l.select("__graft_k", "__graft_b").distinct()
        .unionByName(summary.select("__graft_k", "__graft_b")).distinct()
    )
    w_carry = (
        Window.partitionBy("__graft_k").orderBy("__graft_b")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carry = (
        universe.join(summary, ["__graft_k", "__graft_b"], "left")
        .withColumn("__graft_carry", F.max(F.col("__graft_last")).over(w_carry))
        .where(F.col("__graft_carry").isNotNull())
        .select(
            F.col("__graft_k"),
            (F.col("__graft_b") * bucket_width).alias("__graft_ts"),
            F.lit(-1).alias("__graft_side"),
            F.col("__graft_carry.__graft_r").alias("__graft_r"),
            F.col("__graft_b"),
        )
    )
    u = l.unionByName(r.unionByName(carry), allowMissingColumns=True)
    w = (
        Window.partitionBy("__graft_k", "__graft_b")
        .orderBy(F.col("__graft_ts"), F.col("__graft_side"), F.col("__graft_r"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = F.last(F.col("__graft_r"), ignorenulls=True).over(w)
    if tolerance is not None:
        matched = F.when(
            matched.isNotNull()
            & (F.col("__graft_ts") - matched["__graft_ots"] <= tolerance),
            matched,
        )
    u = u.withColumn("__graft_m", matched).where(F.col("__graft_side") == 1)
    return u.select(
        *[F.col(c) for c in left.columns],
        *[F.col("__graft_m")[c].alias(right_prefix + c) for c in payload_cols],
    )


def interval_join(points, spans, key, ts_col, start_col, end_col,
                  bucket_width, span_prefix="span_"):
    """Every (point, span) pair of the same ``key`` with
    ``start <= ts < end`` (half-open). Span columns come back prefixed
    with ``span_prefix``. Timestamps may be TIMESTAMP/TIMESTAMP_NTZ
    (``bucket_width`` then in MICROS) or numeric epochs — bucketing and
    the exact refine both run in the :func:`epoch_micros`-normalized
    domain, so the two sides may even mix typed and numeric columns.

    ``bucket_width`` ~ typical span length: each span explodes to
    ``ceil(span/width)`` bucket rows; any width gives identical results.
    """
    bucket_width = _int_bucket_width(bucket_width)
    span_cols = list(spans.columns)
    p = (
        points.withColumn("__graft_k", F.col(key))
        .withColumn("__graft_t", epoch_micros(points, ts_col))
        .withColumn("__graft_b", F.expr(f"__graft_t div {bucket_width}L"))
    )
    sp = (
        spans.withColumn("__graft_lo", epoch_micros(spans, start_col))
        .withColumn("__graft_hi", epoch_micros(spans, end_col))
        .where(F.col("__graft_hi") > F.col("__graft_lo"))
        .select(
            F.col(key).alias("__graft_k"),
            F.col("__graft_lo"),
            F.col("__graft_hi"),
            F.explode(
                F.sequence(
                    F.expr(f"__graft_lo div {bucket_width}L"),
                    F.expr(f"(__graft_hi - 1) div {bucket_width}L"),
                )
            ).alias("__graft_b"),
            F.struct(*[F.col(c) for c in span_cols]).alias("__graft_s"),
        )
    )
    return (
        p.join(sp, ["__graft_k", "__graft_b"])
        .where(
            (F.col("__graft_t") >= F.col("__graft_lo"))
            & (F.col("__graft_t") < F.col("__graft_hi"))
        )
        .select(
            *[F.col(c) for c in points.columns],
            *[F.col("__graft_s")[c].alias(span_prefix + c) for c in span_cols],
        )
    )
