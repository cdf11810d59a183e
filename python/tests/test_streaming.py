"""Python face of the stateful streaming surface: batch-parity hand
cases (every operator runs its compiled state machine in batch mode on
a plain DataFrame — the same dual-mode contract the Scala specs pin)
plus one genuine micro-batch run through a streaming source."""

from datetime import datetime


def test_drift_stream_batch_hand_case(spark):
    from graft.streaming import drift_stream
    # the Scala spec's hand case: ref {0:1, 10:1}, cur {10, 20}
    df = spark.createDataFrame([(1, 10), (1, 20)], "k long, v long")
    r = drift_stream(df, "k", "v", [(0, 1), (10, 1)], max_bins=8).collect()[0]
    assert (r["nCur"], r["w1Micro"], r["tvPpm"], r["cvmMicro"]) == \
        (2, 10000000, 500000, 187500)


def test_drift_stream_batch_parity_with_batch_operator(spark):
    from graft.streaming import drift_stream
    from graft.pipeline import distribution_distance
    ref = spark.createDataFrame([(v % 20,) for v in range(400)], "v long")
    cur = spark.createDataFrame([(1, 5 + v % 20) for v in range(300)],
                                "k long, v long")
    ref_hist = sorted((r["v"], r["count"])
                      for r in ref.groupBy("v").count().collect())
    got = drift_stream(cur, "k", "v", ref_hist).collect()[0]
    want = distribution_distance(ref, cur.select("v"), "v").collect()[0]
    assert (got["nCur"], got["w1Micro"], got["tvPpm"], got["cvmMicro"]) == \
        (want["n_cur"], want["w1_micro"], want["tv_ppm"], want["cvm_micro"])


def test_drift_stream_accumulates_over_micro_batches(spark, tmp_path):
    from graft.streaming import drift_stream
    src = str(tmp_path / "src")
    df = spark.createDataFrame([(1, 10), (1, 20)], "k long, v long")
    df.write.parquet(src)
    out = drift_stream(spark.readStream.schema(df.schema).parquet(src),
                       "k", "v", [(0, 1), (10, 1)], max_bins=8)
    q = (out.writeStream.format("memory").queryName("py_drift")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(60)
    row = spark.sql("SELECT * FROM py_drift").collect()[0]
    assert (row["w1Micro"], row["tvPpm"]) == (10000000, 500000)


def test_sprt_stream_decides_at_the_boundary(spark):
    from graft.streaming import sprt_stream
    # 17 straight successes cross the H1 bound (the Scala spec constants)
    df = spark.createDataFrame([("a", t, True) for t in range(20)],
                               "k string, t long, x boolean")
    rows = sprt_stream(df, "k", "t", "x").orderBy("n").collect()
    assert rows[15]["decision"] == "continue"
    assert rows[16]["decision"] == "accept_h1"
    assert rows[19]["decidedAt"] == 17


def test_ngram_novelty_batch(spark):
    from graft.streaming import ngram_novelty_stream
    df = spark.createDataFrame(
        [(1, "p q r", datetime(2026, 1, 1, 0, 0, 10)),
         (2, "q r s", datetime(2026, 1, 1, 0, 10, 0))],
        "doc_id long, text string, ts timestamp")
    out = {(r["doc_id"], r["gram"]): r["novel"]
           for r in ngram_novelty_stream(df, "doc_id", "text", "ts",
                                         n=2).collect()}
    assert out == {(1, "p q"): True, (1, "q r"): True,
                   (2, "q r"): False, (2, "r s"): True}


def test_trending_topk_batch(spark):
    from graft.streaming import trending_topk_stream
    base = datetime(2026, 1, 1, 0, 0, 0)
    df = spark.createDataFrame(
        [(base, "alpha beta"), (base, "alpha gamma"), (base, "alpha beta")],
        "ts timestamp, text string")
    rows = trending_topk_stream(df, "ts", "text",
                                window_micros=3600 * 1000000, k=2).collect()
    ranked = {r["rank"]: (r["term"], r["cnt"]) for r in rows}
    assert ranked[1] == ("alpha", 3) and ranked[2] == ("beta", 2)


def test_cusum_and_debounce_and_first_seen(spark):
    from graft.streaming import (cusum_stream, debounce_stream,
                                 first_seen_stream)
    ev = spark.createDataFrame(
        [(1, t, 5 if t < 3 else 9) for t in range(6)], "k long, t long, x long")
    cs = cusum_stream(ev, "k", "t", "x", ref=5, slack=0, threshold=6) \
        .orderBy("t").collect()
    assert not cs[2]["isChange"] and cs[4]["isChange"]
    db = debounce_stream(
        spark.createDataFrame([(1, 0, 100), (1, 5, 101), (1, 20, 102)],
                              "k long, t long, id long"),
        "k", "t", "id", min_gap=10).collect()
    assert sorted(r["id"] for r in db if r["is_kept"]) == [100, 102]
    fs = first_seen_stream(
        spark.createDataFrame([(7, 1), (7, 2), (8, 2)], "id long, b long"),
        "id", "b").collect()
    assert sorted((r["id"], r["first_bucket"]) for r in fs) == [(7, 1), (8, 2)]


def test_session_and_windowed_shapes(spark):
    from graft.streaming import (session_stats, distinct_windowed,
                                 gap_regularity_stream, ewma_stream,
                                 anomaly_stream)
    base = datetime(2026, 1, 1, 0, 0, 0)
    ev = spark.createDataFrame(
        [(1, datetime(2026, 1, 1, 0, 0), 10), (1, datetime(2026, 1, 1, 0, 10), 30)],
        "k long, ts timestamp, v long")
    ss = session_stats(ev, "k", "ts", "v", "1 hour").collect()
    assert len(ss) == 1 and ss[0]["n_events"] == 2 \
        and ss[0]["min_value"] == 10 and ss[0]["max_value"] == 30
    dw = distinct_windowed(
        spark.createDataFrame([(base, i) for i in range(50)],
                              "ts timestamp, id long"),
        "ts", "id", "1 hour").collect()
    # m=64 HLL: ~13% standard error; the deterministic hash lands at 70
    assert len(dw) == 1 and 35 <= dw[0]["n_distinct_est"] <= 75
    # machine-regular cadence: constant 1s gaps -> regular flag
    gp = gap_regularity_stream(
        spark.createDataFrame([(1, t * 1000000) for t in range(10)],
                              "k long, ts long"),
        "k", "ts").orderBy("nGaps").collect()
    assert gp[-1]["nGaps"] >= 5 and gp[-1]["isRobotic"]
    ew = ewma_stream(
        spark.createDataFrame([(1, t, 100) for t in range(4)],
                              "k long, t long, x long"),
        "k", "t", "x").orderBy("t").collect()
    assert ew[-1]["ewmaMilli"] == 100 * 1000  # constant series
    an = anomaly_stream(
        spark.createDataFrame(
            [(1, t, 50 if t < 9 else 500) for t in range(10)],
            "k long, t long, x long"),
        "k", "t", "x").orderBy("t").collect()
    assert not an[5]["isAnomaly"] and an[9]["isAnomaly"]


def test_psi_windowed_shape(spark):
    from graft.streaming import psi_windowed
    base = datetime(2026, 1, 1, 0, 30, 0)
    df = spark.createDataFrame([(base, v % 10) for v in range(100)],
                               "ts timestamp, v long")
    out = psi_windowed(df, "ts", "v", ref_bounds=[6],
                       ref_counts=[50, 50], window_duration="1 hour").collect()
    assert len(out) == 1
    # 60/40 vs the 50/50 reference: a small positive PSI (~40546 unats)
    assert 0 < out[0]["psi_unats"] < 200000


def test_page_hinkley_stream_batch_face(spark):
    from graft.streaming import page_hinkley_stream
    from graft.pipeline import page_hinkley
    df = spark.createDataFrame(
        [(1, i, x) for i, x in enumerate((10, 10, 10, 20, 20))],
        "k long, t long, x long")
    out = page_hinkley_stream(df, "k", "t", "x",
                              lambda_micro=4000000).collect()
    last = max(out, key=lambda r: r["nSoFar"])
    batch = page_hinkley(df, ["k"], "t", "x",
                         lambda_micro=4000000).collect()[0]
    assert (last["nSoFar"], last["phMicro"], last["alarm"]) == \
        (batch["n"], batch["ph_micro"], batch["alarm"])


def test_reservoir_stream_batch_face(spark):
    from graft.streaming import reservoir_stream
    from graft.pipeline import priority_sample_per_key
    df = spark.createDataFrame([(1, i) for i in range(1, 21)],
                               "k long, id long")
    out = reservoir_stream(df, "k", "id", 3).collect()
    batch = priority_sample_per_key(df, ["k"], "id", 3).collect()
    assert sorted(r["id"] for r in out) == sorted(r["id"] for r in batch)


def test_quantile_stream_batch_face(spark):
    from graft.streaming import quantile_stream
    from graft.pipeline import percentile_report
    df = spark.createDataFrame([(1, v) for v in range(1, 11)],
                               "k long, v long")
    r = quantile_stream(df, "k", "v").collect()[0]
    b = percentile_report(df, ["k"], "v").collect()[0]
    assert (r["n"], r["p500"], r["p900"], r["p990"]) == \
        (b["n"], b["p500"], b["p900"], b["p990"])
