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


def test_resample_ohlc(spark):
    from graft.temporal import resample

    df = spark.createDataFrame(
        [("A", 101, 5), ("A", 105, 2), ("A", 109, 8), ("A", 113, 1),
         ("B", 101, 7)], ["k", "ts", "v"])
    got = [tuple(r) for r in
           resample(df, "k", "ts", "v", 10).orderBy("k", "bucket_start").collect()]
    assert got == [("A", 100, 5, 8, 2, 8, 3, 15),
                   ("A", 110, 1, 1, 1, 1, 1, 1),
                   ("B", 100, 7, 7, 7, 7, 1, 7)]


def test_rolling_bucketed_matches_plain(spark):
    import random

    from graft.temporal import rolling, rolling_bucketed

    rnd = random.Random(3)
    rows = [(f"k{rnd.randrange(3)}", rnd.randrange(300), rnd.randrange(50))
            for _ in range(400)]
    df = spark.createDataFrame(rows, ["k", "ts", "v"])
    plain = [tuple(r) for r in
             rolling(df, "k", "ts", "v", 25).orderBy("k", "ts", "v").collect()]
    buck = [tuple(r) for r in
            rolling_bucketed(df, "k", "ts", "v", 25, 40)
            .orderBy("k", "ts", "v").collect()]
    assert plain == buck


def test_funnel(spark):
    from graft.temporal import funnel

    df = spark.createDataFrame(
        [(1, 10, "a"), (1, 10, "b"), (1, 30, "c"),
         (2, 5, "b"), (2, 10, "a"), (2, 20, "b"),
         (3, 1, "b")], ["u", "ts", "e"])
    got = [tuple(r) for r in
           funnel(df, "u", "ts", "e", ["a", "b", "c"]).orderBy("u").collect()]
    assert got == [(1, 10, 10, 30, 3), (2, 10, 20, None, 2),
                   (3, None, None, None, 0)]


def test_quantize_roundtrip(spark):
    import graft.functions as gf
    from pyspark.sql import functions as F

    df = (spark.createDataFrame([(1, [3.0, -1.5, 0.75]), (2, [0.0, 0.0, 0.0])],
                                ["id", "v"])
          .withColumn("scale", gf.pl_int8_scale(F.col("v")))
          .withColumn("codes", gf.pl_quantize_int8(F.col("v"), F.col("scale")))
          .withColumn("deq", gf.pl_dequantize_int8(F.col("codes"), F.col("scale"))))
    rows = {r["id"]: r for r in df.collect()}
    assert rows[1]["codes"] == [127, -64, 32]
    assert rows[2]["scale"] == 1.0 and rows[2]["codes"] == [0, 0, 0]
    assert all(abs(a - b) <= rows[1]["scale"] / 2 + 1e-12
               for a, b in zip(rows[1]["v"], rows[1]["deq"]))


def test_clean_lines(spark):
    import graft.functions as gf
    from pyspark.sql import functions as F

    txt = "this line stays around\ntoo short\nEnable JavaScript to view"
    r = (spark.range(1)
         .select(gf.pl_clean_lines(F.lit(txt)).alias("c"),
                 gf.pl_kept_lines(F.lit(txt)).alias("k"))
         .head())
    assert r["c"] == "this line stays around" and r["k"] == 1


def test_cohort_retention(spark):
    from graft.temporal import cohort_retention
    us = 86400 * 1000000
    df = spark.createDataFrame(
        [(1, 0), (1, us), (1, us + 5), (2, us)], "user_id long, tus long")
    got = sorted((str(r.cohort_day), r.day_offset, r.n_active)
                 for r in cohort_retention(df, "user_id", "tus").collect())
    assert got == [("1970-01-01", 0, 1), ("1970-01-01", 1, 1),
                   ("1970-01-02", 0, 1)]


def test_interval_union_length(spark):
    from graft.temporal import interval_union_length
    sp = spark.createDataFrame(
        [("A", 0, 10), ("A", 5, 15), ("A", 20, 25)], "k string, s long, e long")
    r = interval_union_length(sp, "k", "s", "e").head()
    assert (r.n_spans, r.span_sum, r.covered) == (3, 25, 20)


def test_gap_fill(spark):
    from graft.temporal import gap_fill
    sparse = spark.createDataFrame([("A", 10, 1), ("A", 12, 2)],
                                   "k string, b long, v long")
    got = sorted((r.b, r.v, r.v_filled) for r in
                 gap_fill(sparse, "k", "b", "v").collect())
    assert got == [(10, 1, 1), (11, None, 1), (12, 2, 2)]


def test_scd2(spark):
    from graft.temporal import scd2
    log = spark.createDataFrame(
        [("A", 10, "v1", 1), ("A", 20, "v2", 2), ("B", 15, "w1", 3)],
        "k string, ts long, pay string, id long")
    got = sorted((r.k, r.pay, r.valid_from_us, r.valid_to_us)
                 for r in scd2(log, ["k"], "ts", ["id"]).collect())
    assert got == [("A", "v1", 10, 20), ("A", "v2", 20, None),
                   ("B", "w1", 15, None)]


def test_attribution_first_last_touch(spark):
    from graft.temporal import attribution

    ev = spark.createDataFrame(
        [(2, 1, 10, "view"), (3, 1, 20, "click"), (4, 1, 22, "error"),
         (5, 1, 25, "purchase"), (6, 2, 1000, "purchase"),
         (7, 3, 50, "view"), (8, 3, 50, "click"), (10, 3, 60, "purchase")],
        "event_id long, user_id long, ts long, event_type string")
    out = {r["conversion_id"]: r for r in
           attribution(ev, "user_id", "event_id", "ts", "event_type",
                       "purchase", ["click", "view"], 30).collect()}
    assert out[5]["first_touch_id"] == 2 and out[5]["last_touch_id"] == 3
    assert out[6]["first_touch_id"] is None
    # same-ts tie breaks by id on both ends
    assert out[10]["first_touch_id"] == 7 and out[10]["last_touch_id"] == 8


def test_clamped_cum_sum(spark):
    from graft.temporal import clamped_cum_sum

    df = spark.createDataFrame(
        [(1, 0, 5), (1, 1, -10), (1, 2, 3), (1, 3, -1)], "k long, t long, d long")
    out = [r["balance"] for r in
           clamped_cum_sum(df, ["k"], ["t"], "d").orderBy("t").collect()]
    assert out == [5, 0, 3, 2]


def test_seasonality_profile(spark):
    from graft.temporal import seasonality_profile

    # 3 events in hour 0 of a Thursday (day 0, dow 4), 1 in hour 1
    us_h = 3600000000
    df = spark.createDataFrame(
        [("a", 0), ("a", 1), ("a", 2), ("a", us_h)], "t string, tus long")
    rows = {(r["dow"], r["hour"]): (r["n"], r["lift_permille"])
            for r in seasonality_profile(df, "t", "tus").collect()}
    assert rows[(4, 0)] == (3, 3 * 168 * 1000 // 4)
    assert rows[(4, 1)] == (1, 1 * 168 * 1000 // 4)


def test_seasonal_anomaly(spark):
    from graft.temporal import seasonal_anomaly

    us_d = 86400000000
    # type "a": three same-dow days with counts 2, 2, 8 -> day 14 flags
    rows = ([("a", d * us_d) for d in (0, 7) for _ in range(2)]
            + [("a", 14 * us_d)] * 8)
    df = spark.createDataFrame(rows, "t string, tus long")
    out = {r["day"]: r["is_anomaly"]
           for r in seasonal_anomaly(df, "t", "tus").collect()}
    assert out == {0: True, 7: True, 14: True}
    # uniform counts never flag
    flat = spark.createDataFrame(
        [("b", d * us_d) for d in (0, 7, 14) for _ in range(3)],
        "t string, tus long")
    assert all(not r["is_anomaly"]
               for r in seasonal_anomaly(flat, "t", "tus").collect())


def test_growth_curve(spark):
    from graft.temporal import growth_curve

    df = spark.createDataFrame(
        [("a", 1, 1), ("a", 1, 3), ("a", 2, 1), ("a", 3, 3), ("b", 1, 2)],
        "k string, uid long, day long")
    out = {(r["k"], r["day"]): (r["new_ids"], r["cum_ids"])
           for r in growth_curve(df, ["k"], "uid", "day").collect()}
    assert out == {("a", 1): (2, 2), ("a", 3): (1, 3), ("b", 2): (1, 1)}


def test_m4_downsample(spark):
    from graft.temporal import m4_downsample

    df = spark.createDataFrame(
        [("a", 0, 5), ("a", 40, 1), ("a", 90, 9), ("a", 99, 2), ("a", 150, 7)],
        "k string, ts long, v long")
    out = {r["bucket"]: (r["n"], r["v_min"], r["v_max"], r["v_first"], r["v_last"])
           for r in m4_downsample(df, ["k"], "ts", "v", 100).collect()}
    assert out[0] == (4, 1, 9, 5, 2)
    assert out[1] == (1, 7, 7, 7, 7)


def test_debounce_lag_semantics_and_reserved_names(spark):
    from graft.temporal import debounce
    df = spark.createDataFrame(
        [("u", 0, 1), ("u", 5, 2), ("u", 100, 3), ("v", 7, 4)],
        "k string, ts long, id long")
    got = {r["id"]: (r["prev_gap"], r["is_kept"])
           for r in debounce(df, ["k"], "ts", "id", 10).collect()}
    assert got == {1: (None, True), 2: (5, False), 3: (95, True),
                   4: (None, True)}
    try:
        debounce(df.withColumn("is_kept", F.lit(True)), ["k"], "ts", "id", 10)
        assert False, "reserved name must be rejected"
    except ValueError:
        pass


def test_autocorr_hand_case_and_nulls(spark):
    from graft.temporal import autocorr
    rows = [("a", i * 10, i, i) for i in range(1, 5)] + \
           [("c", i * 10, i, 7) for i in range(1, 6)]
    df = spark.createDataFrame(rows, "key string, ts long, id long, v long")
    out = {r["key"]: r for r in autocorr(df, "key", "ts", "id", "v",
                                         k=1).collect()}
    # x=[1,2,3,4]: ACF_1 = 0.25 -> num 20, den 80, 250 permille
    assert (out["a"]["acf_num"], out["a"]["acf_den"]) == (20, 80)
    assert out["a"]["acf_permille"] == 250
    # constant series -> den 0 -> NULL
    assert out["c"]["acf_permille"] is None


def test_journeys_session_breaks(spark):
    from graft.temporal import journeys
    rows = [(1, 10, 1, "a"), (1, 20, 2, "b"), (1, 30, 3, "c"),
            (2, 10, 4, "a"), (2, 20, 5, "b"), (2, 30, 6, "c"),
            (3, 10, 7, "a"), (3, 5000, 8, "b"), (3, 5010, 9, "c")]
    df = spark.createDataFrame(rows, "u long, ts long, id long, tp string")
    got = {r["journey"]: r["cnt"]
           for r in journeys(df, "u", "ts", "id", "tp", gap_micros=100,
                             n=3, min_count=1).collect()}
    # user 3's session break keeps its a out of any trigram
    assert got == {"a b c": 2}


def test_term_counts_windowed_batch_face(spark):
    from graft.temporal import term_counts_windowed
    import datetime as dt
    rows = [(dt.datetime(2024, 1, 1), "a b"), (dt.datetime(2024, 1, 1, 5), "a"),
            (dt.datetime(2024, 1, 9), "a c")]
    df = spark.createDataFrame(rows, "ts timestamp, text string")
    got = {(str(r["window_start"]), r["term"]): r["cnt"]
           for r in term_counts_windowed(df, "ts", "text", "7 days").collect()}
    # epoch-aligned weeks: 2024-01-01..03 is one window, 01-09 the next
    assert sum(v for (w, t), v in got.items() if t == "a") == 3
    assert len({w for (w, t) in got}) == 2
