"""Tests for graft.pipeline — same fixtures as ChunkingSpec/CurationSpec."""

from pyspark.sql import functions as F

from graft.pipeline import chunk, quantile_keep_above, quantile_threshold


def test_chunk_overlap_boundaries(spark):
    df = spark.createDataFrame(
        [(1, " ".join(f"t{i}" for i in range(1, 11)))], "id long, text string")
    out = [tuple(r) for r in
           chunk(df, "id", "text", 8, 4).orderBy("chunk_idx")
           .select("chunk_idx", "start_token", "chunk_text",
                   "n_chunk_tokens").collect()]
    assert out == [
        (0, 0, "t1 t2 t3 t4 t5 t6 t7 t8", 8),
        (1, 4, "t5 t6 t7 t8 t9 t10", 6),
        (2, 8, "t9 t10", 2),
    ]


def test_chunk_short_docs_single_window(spark):
    df = spark.createDataFrame([(1, "a b c"), (2, "x")], "id long, text string")
    got = {r["id"]: r["chunk_text"]
           for r in chunk(df, "id", "text", 8, 0).collect()}
    assert got == {1: "a b c", 2: "x"}


def test_quantile_threshold_and_filter(spark):
    rows = [(i, (i - 1) // 10 + 1) for i in range(1, 41)]
    df = spark.createDataFrame(rows, "id long, score int")
    assert quantile_threshold(df, F.col("score"), 250).head()[0] == 1
    assert quantile_threshold(df, F.col("score"), 500).head()[0] == 2
    kept = {r["id"] for r in quantile_keep_above(df, F.col("score"), 500)
            .select("id").collect()}
    assert kept == set(range(11, 41))


def test_dedupe_within_doc(spark):
    from graft.pipeline import dedupe_within_doc
    df = spark.createDataFrame(
        [(1, "a b c d a b e f"), (2, "x y x y x y")], "id long, text string")
    got = {r["id"]: (r["clean_text"], r["n_segments"], r["n_dropped"])
           for r in dedupe_within_doc(df, "id", "text", 2).collect()}
    assert got == {1: ("a b c d e f", 4, 1), 2: ("x y", 3, 2)}


def test_gopher_metrics_pass_and_fail(spark):
    from graft.pipeline import gopher_metrics
    df = spark.createDataFrame(
        [(1, "the quick brown fox jumps over a lazy dog in town"),
         (2, "a b")], "id long, text string")
    rows = {r["id"]: r for r in gopher_metrics(df, "id", "text").collect()}
    assert rows[1]["gopher_pass"] is True
    assert rows[2]["gopher_pass"] is False and rows[2]["n_words"] == 2


def test_winnow_pairs_matches_scala_semantics(spark):
    from graft.pipeline import winnow_pairs
    shared = " ".join(f"s{i}" for i in range(1, 13))
    df = spark.createDataFrame(
        [(1, f"{shared} tail one two"), (2, f"head {shared} end"),
         (3, "totally different words here now")], "doc_id long, text string")
    out = winnow_pairs(df, "doc_id", "text", min_shared=2).collect()
    assert any(r["a_id"] == 1 and r["b_id"] == 2 and r["shared"] >= 2
               for r in out)
    assert not any(r["a_id"] == 3 or r["b_id"] == 3 for r in out)
