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
