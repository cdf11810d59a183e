"""Notebook repr hooks (graft.rf_ipython) — Tile PNG/HTML reprs and the
JVM-backed DataFrame markdown/HTML renderers."""
import struct

import numpy as np
import pytest

from graft.rf_types import Tile
import graft.rf_ipython as rfi


def _png_dims(png):
    assert png[:8] == rfi._PNG_HEADER
    # IHDR is the first chunk: length(4) tag(4) then width/height
    assert png[12:16] == b"IHDR"
    w, h = struct.unpack(">II", png[16:24])
    return w, h


def test_tile_repr_png_dimensions_and_header():
    t = Tile(np.arange(12, dtype=np.float64).reshape(3, 4))
    png = t._repr_png_()
    assert _png_dims(png) == (4, 3)
    # constant tile still encodes (span guard, all-zero grayscale)
    flat = Tile(np.full((2, 2), 7.0))
    assert _png_dims(flat._repr_png_()) == (2, 2)


def test_tile_repr_html_is_img_tag():
    t = Tile(np.arange(4, dtype=np.float64).reshape(2, 2))
    html = t._repr_html_()
    assert html.startswith('<img src="data:image/png;base64,')


def test_binary_to_html_sniffs_png_header():
    t = Tile(np.arange(4, dtype=np.float64).reshape(2, 2))
    png = rfi.tile_to_png(t)
    assert rfi.binary_to_html(bytearray(png)).startswith('<img src=')
    # non-PNG bytes pass through untouched
    raw = b"not a png"
    assert rfi.binary_to_html(raw) == raw


def test_pandas_df_to_html_renders_tiles_and_png_bytes():
    import pandas as pd

    t = Tile(np.arange(4, dtype=np.float64).reshape(2, 2))
    png = rfi.tile_to_png(t)
    pdf = pd.DataFrame({"name": ["a"], "tile": [t], "png": [bytearray(png)]})
    html = rfi.pandas_df_to_html(pdf)
    assert html.count('<img src="data:image/png;base64,') == 2
    assert "name" in html


def test_spark_df_to_markdown_and_html(spark):
    from pyspark.sql.functions import col, expr

    df = spark.sql(
        "SELECT id, rf_make_constant_tile(CAST(id AS DOUBLE), 4, 4, 'float64')"
        " AS t, repeat('x', 60) AS long_str FROM range(3)")
    md = rfi.spark_df_to_markdown(df, num_rows=2)
    lines = md.strip().split("\n")
    assert lines[0].startswith("| id | t | long_str |")
    assert len(lines) == 2 + 2  # header + separator + 2 rows
    assert "float64 4×4" in md
    # truncate caps wide cells at 40 chars
    md_t = rfi.spark_df_to_markdown(df, num_rows=1, truncate=True)
    assert "..." in md_t and "x" * 41 not in md_t
    html = rfi.spark_df_to_html(df, num_rows=2)
    assert html.startswith("<table>")
    assert html.count('<img src="data:image/png;base64,') == 2
