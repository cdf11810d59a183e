"""Tests for graft.temporal — same fixtures as Scala TemporalSpec."""

from pyspark.sql import functions as F

from graft.temporal import asof_join, asof_join_bucketed, interval_join


def _quotes(spark):
    return spark.createDataFrame(
        [("A", 100, 1.0), ("A", 200, 2.0), ("A", 300, 3.0), ("B", 150, 9.0)],
        "k string, ts long, px double",
    )


def _trades(spark):
    return spark.createDataFrame(
        [("A", 99, 10), ("A", 100, 11), ("A", 250, 12), ("A", 301, 13),
         ("B", 140, 14), ("C", 500, 15)],
        "k string, ts long, qty int",
    )


def test_asof_backward_exact_match_left_outer(spark):
    out = asof_join(_trades(spark), _quotes(spark), "k", "ts", "ts") \
        .orderBy("k", "ts").collect()
    got = [(r.k, r.ts, r.right_ts, r.right_px) for r in out]
    assert got == [
        ("A", 99, None, None),
        ("A", 100, 100, 1.0),
        ("A", 250, 200, 2.0),
        ("A", 301, 300, 3.0),
        ("B", 140, None, None),
        ("C", 500, None, None),
    ]


def test_asof_tolerance(spark):
    out = asof_join(_trades(spark), _quotes(spark), "k", "ts", "ts",
                    tolerance=F.lit(10)).orderBy("k", "ts").collect()
    assert [(r.k, r.ts, r.right_ts is not None) for r in out] == [
        ("A", 99, False), ("A", 100, True), ("A", 250, False),
        ("A", 301, True), ("B", 140, False), ("C", 500, False),
    ]


def test_asof_bucketed_equals_plain_any_width(spark):
    plain = sorted(
        tuple(r) for r in
        asof_join(_trades(spark), _quotes(spark), "k", "ts", "ts").collect())
    for width in (1, 7, 100, 10**6):
        bucketed = sorted(
            tuple(r) for r in
            asof_join_bucketed(_trades(spark), _quotes(spark), "k", "ts", "ts",
                               bucket_width=width).collect())
        assert bucketed == plain, f"width {width} diverged"


def test_interval_join_half_open_any_width(spark):
    pts = spark.createDataFrame(
        [("A", 5, "p1"), ("A", 10, "p2"), ("A", 19, "p3"),
         ("A", 20, "p4"), ("B", 10, "p5")],
        "k string, ts long, tag string")
    spans = spark.createDataFrame(
        [("A", 10, 20, "s1"), ("A", 15, 16, "s2"),
         ("A", 30, 30, "s0"), ("B", 0, 100, "s3")],
        "k string, lo long, hi long, name string")
    expected = {("p2", "s1"), ("p3", "s1"), ("p5", "s3")}
    for width in (1, 7, 64, 1000):
        got = {
            (r.tag, r.span_name)
            for r in interval_join(pts, spans, "k", "ts", "lo", "hi", width)
            .select("tag", "span_name").collect()
        }
        assert got == expected, f"width {width}"


def test_asof_and_interval_accept_timestamp_columns(spark):
    # typed TIMESTAMP inputs must agree row-for-row with the numeric run
    tq = _quotes(spark).withColumn("ts", F.timestamp_micros(F.col("ts")))
    tt = _trades(spark).withColumn("ts", F.timestamp_micros(F.col("ts")))
    typed = (asof_join(tt, tq, "k", "ts", "ts")
             .select(F.col("k"), F.unix_micros("ts").alias("ts"), F.col("qty"),
                     F.unix_micros("right_ts").alias("right_ts"),
                     F.col("right_px"))
             .orderBy("k", "ts").collect())
    num = (asof_join(_trades(spark), _quotes(spark), "k", "ts", "ts")
           .orderBy("k", "ts").collect())
    assert [tuple(r) for r in typed] == [tuple(r) for r in num]

    bucketed = (asof_join_bucketed(tt, tq, "k", "ts", "ts", 100)
                .select(F.col("k"), F.unix_micros("ts").alias("ts"), F.col("qty"),
                        F.unix_micros("right_ts").alias("right_ts"),
                        F.col("right_px"))
                .orderBy("k", "ts").collect())
    assert [tuple(r) for r in bucketed] == [tuple(r) for r in num]

    # typed points against NUMERIC spans: refine runs in the normalized
    # micros domain, so mixing is legal
    pts = spark.createDataFrame(
        [("A", 5, "p1"), ("A", 10, "p2"), ("A", 19, "p3"),
         ("A", 20, "p4"), ("B", 10, "p5")],
        "k string, ts long, tag string",
    ).withColumn("ts", F.timestamp_micros(F.col("ts")))
    spans = spark.createDataFrame(
        [("A", 10, 20, "s1"), ("A", 15, 16, "s2"), ("B", 0, 100, "s3")],
        "k string, lo long, hi long, name string",
    )
    got = {(r["tag"], r["span_name"]) for r in
           interval_join(pts, spans, "k", "ts", "lo", "hi", 7).collect()}
    assert got == {("p2", "s1"), ("p3", "s1"), ("p5", "s3")}


def test_asof_forward_direction(spark):
    out = (asof_join(_trades(spark), _quotes(spark), "k", "ts", "ts",
                     direction="forward")
           .orderBy("k", "ts").collect())
    got = [(r["k"], r["ts"], r["right_ts"]) for r in out]
    assert got == [
        ("A", 99, 100), ("A", 100, 100), ("A", 250, 300),
        ("A", 301, None), ("B", 140, 150), ("C", 500, None)]


def test_asof_nearest_and_strict_matches(spark):
    near = (asof_join(_trades(spark), _quotes(spark), "k", "ts", "ts",
                      direction="nearest")
            .orderBy("k", "ts").collect())
    assert [(r["ts"], r["right_ts"]) for r in near] == [
        (99, 100), (100, 100), (250, 200), (301, 300), (140, 150), (500, None)]
    strict = (asof_join(_trades(spark), _quotes(spark), "k", "ts", "ts",
                        allow_exact_matches=False)
              .orderBy("k", "ts").collect())
    assert [(r["ts"], r["right_ts"]) for r in strict] == [
        (99, None), (100, None), (250, 200), (301, 300), (140, None), (500, None)]
