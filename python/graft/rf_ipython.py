"""Notebook display hooks — mirror of the reference's
``pyrasterframes/rf_ipython.py`` (the first module a notebook user
following the reference docs imports) WITHOUT its matplotlib
dependency: local ``Tile`` values render straight to grayscale PNG
through a pure numpy + zlib encoder (the same min..max normalization
the Scala ``rf_render_png`` applies), and Spark DataFrame HTML /
markdown rendering delegates to the JVM renderers
(``extensions.scala`` ``toMarkdown``/``toHTML`` via the
``graft.Display`` py4j bridge — the role of the reference's
``RFContext._dfToMarkdown`` / ``_dfToHTML``).

Importing the module inside IPython registers the formatters, exactly
like the reference::

    import graft.rf_ipython  # noqa: F401  (side-effect import)

Outside IPython every helper stays directly callable.
"""

import base64
import struct
import zlib

import numpy as np

from graft.rf_types import Tile

_PNG_HEADER = bytes([0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A])


def _write_png_gray(gray):
    """Minimal 8-bit grayscale PNG encoder (IHDR + IDAT + IEND) — no
    imaging library needed; rows are filter-0 scanlines."""
    rows, cols = gray.shape

    def chunk(tag, body):
        out = struct.pack(">I", len(body)) + tag + body
        return out + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)

    ihdr = struct.pack(">IIBBBBB", cols, rows, 8, 0, 0, 0, 0)
    raw = b"".join(b"\x00" + gray[r].tobytes() for r in range(rows))
    return (_PNG_HEADER + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw))
            + chunk(b"IEND", b""))


def tile_to_png(tile):
    """Render a local Tile as grayscale PNG bytes: cells normalized
    min..max onto 0..255, NoData/NaN painted 0 — the Scala
    rf_render_png rule (expressions/render.scala)."""
    if tile.cells is None:
        return None
    cells = tile.to_masked()
    finite = cells[np.isfinite(cells)]
    lo = float(finite.min()) if finite.size else 0.0
    hi = float(finite.max()) if finite.size else 0.0
    span = (hi - lo) if hi > lo else 1.0
    gray = np.zeros(cells.shape, dtype=np.uint8)
    mask = np.isfinite(cells)
    gray[mask] = np.clip((cells[mask] - lo) / span * 255.0, 0.0, 255.0).astype(
        np.uint8
    )
    return _write_png_gray(gray)


def tile_to_html(tile):
    """Inline <img> tag with the tile's base64 PNG."""
    png = tile_to_png(tile)
    if png is None:
        return tile.__repr__()
    b64 = base64.b64encode(png).decode("utf-8").replace("\n", "")
    return '<img src="data:image/png;base64,{}" />'.format(b64)


def binary_to_html(blob):
    """rf_render_png results come back as PNG byte strings: sniff the
    header and wrap displayable ones in an <img> tag (the reference's
    rf_ipython.binary_to_html)."""
    if blob[:8] == _PNG_HEADER:
        b64 = base64.b64encode(bytes(blob)).decode("utf-8").replace("\n", "")
        return '<img src="data:image/png;base64,{}" />'.format(b64)
    return blob


def pandas_df_to_html(df):
    """HTML formatting for a pandas DataFrame holding Tile /
    PNG-bytearray cells (what ``spark_df.toPandas()`` yields)."""
    import pandas as pd

    if not pd.get_option("display.notebook_repr_html"):
        return None
    if len(df) == 0:
        return df._repr_html_()

    def fmt_tile(t):
        return tile_to_html(t) if isinstance(t, Tile) else t.__repr__()

    def fmt_bytes(b):
        return (binary_to_html(b) if isinstance(b, (bytes, bytearray))
                else b.__repr__())

    formatter = {}
    first = df.iloc[0]
    for c in df.columns:
        if isinstance(first[c], Tile):
            formatter[c] = fmt_tile
        elif isinstance(first[c], (bytes, bytearray)):
            formatter[c] = fmt_bytes
    default_colwidth = pd.get_option("display.max_colwidth")
    pd.set_option("display.max_colwidth", None)
    try:
        return df.to_html(
            escape=False,
            formatters=formatter,
            render_links=True,
            notebook=True,
            max_rows=pd.get_option("display.max_rows"),
            max_cols=pd.get_option("display.max_columns"),
            show_dimensions=pd.get_option("display.show_dimensions"),
        )
    finally:
        pd.set_option("display.max_colwidth", default_colwidth)


def spark_df_to_markdown(df, num_rows=5, truncate=False):
    """Markdown table via the JVM renderer (tiles summarize as
    `cellType colsxrows`)."""
    jvm = df.sparkSession._jvm
    return jvm.graft.Display.dfToMarkdown(df._jdf, int(num_rows), bool(truncate))


def spark_df_to_html(df, num_rows=5, truncate=False):
    """HTML table via the JVM renderer (tile columns render as inline
    base64 PNG thumbnails)."""
    jvm = df.sparkSession._jvm
    return jvm.graft.Display.dfToHTML(df._jdf, int(num_rows), bool(truncate))


# Tile values answer the standard notebook repr protocol even outside
# IPython (pytest exercises these directly).
Tile._repr_png_ = tile_to_png
Tile._repr_html_ = tile_to_html

try:
    from IPython import get_ipython
    from IPython.display import display_html, display_markdown

    if get_ipython() is not None:
        import pandas
        import pyspark.sql

        ip = get_ipython()
        formatters = ip.display_formatter.formatters
        formatters["image/png"].for_type(Tile, tile_to_png)
        formatters["text/html"].for_type(pandas.DataFrame, pandas_df_to_html)
        formatters["text/html"].for_type(pyspark.sql.DataFrame, spark_df_to_html)
        formatters["text/html"].for_type(Tile, tile_to_html)
        formatters["text/markdown"].for_type(
            pyspark.sql.DataFrame, spark_df_to_markdown)

        def _display(df, num_rows=5, truncate=False, mimetype="text/html"):
            """display(df) with explicit row/width controls — the
            reference's pyspark.sql.DataFrame.display patch."""
            if "html" in mimetype:
                display_html(spark_df_to_html(df, num_rows, truncate), raw=True)
            else:
                display_markdown(
                    spark_df_to_markdown(df, num_rows, truncate), raw=True)

        pyspark.sql.DataFrame.display = _display
except ImportError:  # IPython is optional, exactly like the reference
    pass
