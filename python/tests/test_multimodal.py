"""mapInPandas multimodal plumbing, cross-checked row-for-row against
the JVM expressions (mm_decode_image / mm_byte_histogram /
mm_frame_sample) on identical payloads."""

import numpy as np
import pytest
from pyspark.sql.functions import col, encode, expr

from graft import multimodal


@pytest.fixture(scope="module")
def blobs_df(spark):
    df = (
        spark.range(50)
        .selectExpr("id", "repeat(concat('payload-', id, ' '), CAST(id % 7 + 1 AS INT)) AS text")
        .select("id", encode(col("text"), "UTF-8").alias("blob"))
        .repartition(4)
    )
    df.cache().count()
    return df


@pytest.fixture(scope="module")
def images_df(spark):
    """Real PNG payloads built on the JVM (mm_encode_png), one per row,
    with dims varying by id — plus one non-image payload (id = -1)."""
    pngs = (
        spark.range(30)
        .selectExpr(
            "id",
            "CAST(id % 7 + 2 AS INT) AS w",
            "CAST(id % 5 + 1 AS INT) AS h",
        )
        .selectExpr(
            "id",
            "mm_encode_png(transform(sequence(0, w * h - 1),"
            " i -> CAST(pmod(i * 31 + id, 16777216) AS INT)), w, h) AS blob",
        )
    )
    garbage = spark.sql("SELECT CAST(-1 AS BIGINT) AS id, encode('not an image', 'UTF-8') AS blob")
    df = pngs.union(garbage).repartition(4)
    df.cache().count()
    return df


def test_decode_images_matches_jvm_expression(spark, images_df):
    py = multimodal.decode_images(images_df, "blob").select(
        "id", "width", "height", "channels", "byte_len"
    )
    jvm = images_df.selectExpr(
        "id",
        "mm_decode_image(blob).width AS width",
        "mm_decode_image(blob).height AS height",
        "mm_decode_image(blob).channels AS channels",
        "mm_decode_image(blob).byte_len AS byte_len",
    )
    a = {r["id"]: (r["width"], r["height"], r["channels"], r["byte_len"]) for r in py.collect()}
    b = {r["id"]: (r["width"], r["height"], r["channels"], r["byte_len"]) for r in jvm.collect()}
    assert a == b and len(a) == 31
    assert a[-1] == (None, None, None, None)  # non-image -> null fields both sides
    assert a[0] == (2, 1, 3, a[0][3])  # real decoded dims, RGB


def test_byte_histograms_match_jvm_expression(spark, blobs_df):
    py = {r["id"]: r["hist"] for r in multimodal.byte_histograms(blobs_df, "blob").collect()}
    jvm = {
        r["id"]: r["hist"]
        for r in blobs_df.selectExpr("id", "mm_byte_histogram(blob, 16) AS hist").collect()
    }
    assert set(py) == set(jvm)
    for k in py:
        assert np.allclose(py[k], jvm[k], atol=1e-7), k
        assert abs(sum(py[k]) - 1.0) < 1e-5


def test_sample_frames_match_jvm_expression(spark, blobs_df):
    py = {
        r["id"]: [bytes(f) for f in r["frames"]]
        for r in multimodal.sample_frames(blobs_df, "blob", 8, 4).collect()
    }
    jvm = {
        r["id"]: [bytes(f) for f in r["frames"]]
        for r in blobs_df.selectExpr("id", "mm_frame_sample(blob, 8, 4) AS frames").collect()
    }
    assert py == jvm


def test_batch_plumbing_preserves_partitioning_and_rows(spark, blobs_df):
    out = multimodal.decode_images(blobs_df, "blob")
    assert out.rdd.getNumPartitions() == blobs_df.rdd.getNumPartitions()
    assert out.count() == blobs_df.count()
    # schema grows by exactly the decoded fields, original columns intact
    assert out.columns == blobs_df.columns + ["width", "height", "channels", "byte_len"]


def test_mm_function_wrappers_round_trip(spark):
    from pyspark.sql.functions import col, expr
    import graft.functions as F

    df = spark.range(1).select(
        F.mm_encode_png(expr("array(16711680, 65280, 255, 0)"), 2, 2).alias("blob")
    )
    out = df.select(
        F.mm_decode_image(col("blob")).alias("img"),
        F.mm_image_pixel(col("blob"), 0, 0).alias("p00"),
        F.mm_byte_histogram(col("blob")).alias("hist"),
    ).collect()[0]
    assert (out["img"]["width"], out["img"]["height"], out["img"]["channels"]) == (2, 2, 3)
    assert out["p00"] == 16711680
    assert abs(sum(out["hist"]) - 1.0) < 1e-5
