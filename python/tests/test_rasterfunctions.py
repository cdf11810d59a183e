"""PySpark parity tests, patterned on the reference's
python/tests/RasterFunctionsTests.py: every wrapper family is exercised
through the Python surface and checked against known values."""

import math

import numpy as np
import pytest
from pyspark.sql.functions import col, lit

from graft.functions import *  # noqa: F401,F403
from graft.rf_types import CellType, Tile


@pytest.fixture(scope="session")
def tiles_df(spark):
    df = spark.range(4).select(
        col("id"),
        rf_make_constant_tile(col("id").cast("double") + 1.0, 4, 4, "float64").alias("t"),
        rf_make_ones_tile(4, 4, "float64").alias("ones"),
    )
    df.cache().count()
    return df


def test_tile_stats(tiles_df):
    rows = tiles_df.select(
        col("id"),
        rf_tile_sum(col("t")).alias("s"),
        rf_tile_mean(col("t")).alias("m"),
        rf_tile_min(col("t")).alias("lo"),
        rf_tile_max(col("t")).alias("hi"),
        rf_data_cells(col("t")).alias("dc"),
    ).orderBy("id").collect()
    for r in rows:
        v = r["id"] + 1.0
        assert r["s"] == 16 * v
        assert r["m"] == v
        assert r["lo"] == v and r["hi"] == v
        assert r["dc"] == 16


def test_local_algebra(tiles_df):
    r = tiles_df.select(
        rf_tile_sum(rf_local_add(col("t"), col("ones"))).alias("plus"),
        rf_tile_sum(rf_local_subtract(col("t"), 0.5)).alias("minus"),
        rf_tile_sum(rf_local_multiply(col("t"), 2.0)).alias("times"),
        rf_tile_sum(rf_local_divide(col("t"), 2.0)).alias("quot"),
        rf_tile_sum(rf_normalized_difference(col("t"), col("ones"))).alias("nd"),
    ).orderBy(col("plus")).collect()
    first = r[0]
    assert first["plus"] == 16 * 2.0
    assert first["minus"] == 16 * 0.5
    assert first["times"] == 16 * 2.0
    assert first["quot"] == 16 * 0.5
    assert first["nd"] == 0.0


def test_conversions_and_masking(spark):
    df = spark.range(1).select(
        rf_make_constant_tile(5.0, 2, 2, "float64").alias("t"),
        rf_make_constant_tile(3.0, 2, 2, "int32").alias("m"),
    )
    r = df.select(
        rf_cell_type(rf_convert_cell_type(col("t"), "uint16")).alias("ct"),
        rf_data_cells(rf_mask_by_value(col("t"), col("m"), 3.0)).alias("masked"),
        rf_data_cells(rf_mask_by_value(col("t"), col("m"), 4.0)).alias("kept"),
        rf_data_cells(rf_mask_by_bit(col("t"), col("m"), 0, True)).alias("bit_masked"),
        rf_data_cells(rf_mask_by_bits(col("t"), col("m"), 0, 2, [3.0])).alias("bits_masked"),
        rf_tile_sum(rf_local_extract_bits(col("m"), 0, 2)).alias("bits"),
    ).collect()[0]
    assert r["ct"] == "uint16"
    assert r["masked"] == 0 and r["kept"] == 4
    assert r["bit_masked"] == 0  # 3 has bit 0 set
    assert r["bits_masked"] == 0
    assert r["bits"] == 4 * 3.0


def test_explode_assemble_roundtrip(spark):
    df = spark.range(3).select(
        col("id"), rf_make_constant_tile(col("id").cast("double"), 4, 2, "float64").alias("t")
    )
    cells = df.select(col("id"), rf_explode_tiles(col("t")))
    assert cells.count() == 3 * 8
    assert set(cells.columns) == {"id", "column_index", "row_index", "t"}
    back = (
        cells.groupBy("id")
        .agg(rf_assemble_tile(col("column_index"), col("row_index"), col("t"), 4, 2).alias("t2"))
        .select(col("id"), rf_tile_sum(col("t2")).alias("s"))
        .orderBy("id")
        .collect()
    )
    assert [r["s"] for r in back] == [0.0, 8.0, 16.0]


def test_typed_assemble_cell_type(spark):
    df = spark.range(1).select(rf_make_constant_tile(7.0, 2, 2, "float64").alias("t"))
    r = (
        df.select(rf_explode_tiles(col("t")))
        .agg(rf_assemble_tile(col("column_index"), col("row_index"), col("t"), 2, 2, "uint8").alias("t2"))
        .select(rf_cell_type(col("t2")).alias("ct"))
        .collect()[0]
    )
    assert r["ct"] == "uint8"


def test_aggregates(tiles_df):
    r = tiles_df.agg(
        rf_agg_mean(col("t")).alias("m"),
        rf_agg_data_cells(col("t")).alias("n"),
        rf_agg_stats(col("t")).alias("st"),
    ).collect()[0]
    assert r["m"] == pytest.approx((1 + 2 + 3 + 4) / 4.0)
    assert r["n"] == 64
    assert r["st"]["min"] == 1.0 and r["st"]["max"] == 4.0


def test_udt_roundtrip_collect(spark):
    """Tiles deserialize into numpy-backed Python Tile objects."""
    row = spark.range(1).select(
        rf_make_constant_tile(9.0, 3, 2, "float64").alias("t")
    ).collect()[0]
    t = row["t"]
    assert isinstance(t, Tile)
    assert (t.cols, t.rows) == (3, 2)
    assert t.cell_type == CellType("float64")
    assert np.array_equal(t.cells, np.full((2, 3), 9.0))


def test_udt_serialize_deserialize_local():
    from graft.rf_types import TileUDT

    udt = TileUDT()
    for ct in ("uint8", "int16", "int32", "float32", "float64"):
        t = Tile(np.arange(12).reshape(3, 4), ct)
        assert udt.deserialize(udt.serialize(t)) == t


def test_no_data_handling(spark):
    df = spark.range(1).select(
        rf_with_no_data(rf_make_constant_tile(5.0, 2, 2, "float64"), 5.0).alias("nd")
    )
    r = df.select(
        rf_data_cells(col("nd")).alias("dc"),
        rf_no_data_cells(col("nd")).alias("ndc"),
        rf_is_no_data_tile(col("nd")).alias("all_nd"),
    ).collect()[0]
    assert r["dc"] == 0 and r["ndc"] == 4 and r["all_nd"] is True


def test_focal_and_terrain(spark):
    df = spark.range(1).select(rf_make_constant_tile(2.0, 4, 4, "float64").alias("t"))
    r = df.select(
        rf_tile_mean(rf_focal_mean(col("t"), "square-1")).alias("fm"),
        rf_tile_mean(rf_slope(col("t"), 1.0)).alias("slope"),
    ).collect()[0]
    assert r["fm"] == pytest.approx(2.0)
    assert r["slope"] == pytest.approx(0.0)


def test_vector_functions(spark):
    df = spark.range(1).select(
        st_geomFromWKT(lit("POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))")).alias("g"),
        st_makePoint(1.0, 2.0).alias("p"),
    )
    r = df.select(
        st_area(col("g")).alias("area"),
        st_x(col("p")).alias("x"),
        st_y(col("p")).alias("y"),
        st_extent(col("g")).alias("ext"),
        rf_envelope(col("g")).alias("env"),
        st_intersects(col("g"), col("p")).alias("hit"),
        st_asText(st_centroid(col("g"))).alias("c"),
    ).collect()[0]
    assert r["area"] == 16.0
    assert (r["x"], r["y"]) == (1.0, 2.0)
    assert r["ext"]["xmax"] == 4.0
    assert r["env"]["maxx"] == 4.0
    assert r["hit"] is True
    assert "POINT" in r["c"]


def test_vector_breadth(spark):
    box2 = st_geomFromWKT(lit("POLYGON ((2 2, 6 2, 6 6, 2 6, 2 2))"))
    far = st_geomFromWKT(lit("POLYGON ((10 10, 11 10, 11 11, 10 11, 10 10))"))
    df = spark.range(1).select(
        st_geomFromWKT(lit("POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))")).alias("g"),
        st_makePoint(10.0, 2.0).alias("p"),
    )
    r = df.select(
        st_distance(col("p"), col("g")).alias("d"),
        st_withinDistance(col("p"), col("g"), lit(7.0)).alias("near"),
        st_area(st_convexHull(col("g"))).alias("hull"),
        st_asText(
            st_simplify(st_geomFromWKT(lit("LINESTRING (0 0, 1 0, 2 0)")), lit(0.0))
        ).alias("simp"),
        st_area(st_intersection(col("g"), box2)).alias("ia"),
        st_area(st_union(col("g"), box2)).alias("ua"),
        st_nPoints(col("g")).alias("np"),
        st_isEmpty(st_intersection(col("g"), far)).alias("emp"),
        st_isValid(col("g")).alias("valid"),
    ).collect()[0]
    assert r["d"] == 6.0
    assert r["near"] is True
    assert r["hull"] == 16.0
    assert r["simp"] == "LINESTRING (0 0, 2 0)"
    assert r["ia"] == 4.0
    assert r["ua"] == 16.0 + 16.0 - 4.0
    assert r["np"] == 5
    assert r["emp"] is True
    assert r["valid"] is True


def test_reproject(spark):
    df = spark.range(1).select(st_makePoint(0.0, 0.0).alias("p"))
    r = df.select(
        st_x(st_reproject(col("p"), lit("epsg:4326"), lit("epsg:3857"))).alias("x")
    ).collect()[0]
    assert r["x"] == pytest.approx(0.0)


def test_python_mirror_covers_every_registered_sql_name(spark):
    """Parity guard: each rf_*/st_* name registered on the JVM has a
    Python wrapper invoking it (matching the reference's ~130-def
    rasterfunctions surface)."""
    import graft.functions as F

    src = open(F.__file__).read()
    rows = spark.sql("SHOW FUNCTIONS").collect()
    names = [r[0].split(".")[-1] for r in rows]
    graft_names = [n for n in names if n.startswith("rf_") or n.startswith("st_")]
    assert len(graft_names) > 120
    # Spark 4 ships its own st_* built-ins (st_asbinary, ...); only names
    # registered by graft (Class: graft.functions) must have wrappers
    missing = []
    for n in graft_names:
        if '"%s"' % n in src:
            continue
        docs = "\n".join(r[0] for r in spark.sql("DESCRIBE FUNCTION %s" % n).collect())
        if "graft.functions" in docs:
            missing.append(n)
    assert missing == [], "no python wrapper for: %s" % missing


def test_proj_raster_and_resample(spark):
    from pyspark.sql.functions import struct

    df = spark.range(1).select(
        rf_make_constant_tile(4.0, 4, 4, "float64").alias("t"),
        struct(
            lit(0.0).alias("xmin"), lit(0.0).alias("ymin"),
            lit(4.0).alias("xmax"), lit(4.0).alias("ymax")).alias("ext"),
    )
    r = df.select(
        rf_crs(rf_proj_raster(col("t"), col("ext"), "epsg:4326")).alias("crs"),
        rf_extent(rf_proj_raster(col("t"), col("ext"), "epsg:4326")).alias("e"),
        rf_dimensions(rf_resample_nearest(col("t"), 2.0)).alias("d"),
    ).collect()[0]
    assert r["crs"] == "epsg:4326"
    assert r["e"]["xmax"] == 4.0
    assert (r["d"]["cols"], r["d"]["rows"]) == (8, 8)


def test_render_and_quantiles(spark):
    df = spark.range(1).select(rf_make_constant_tile(3.0, 2, 2, "uint8").alias("t"))
    r = df.select(rf_render_matrix(col("t")).alias("m")).collect()[0]
    assert "3" in r["m"]
    q = (
        spark.range(4)
        .select(rf_make_constant_tile(col("id").cast("double"), 2, 2, "float64").alias("t"))
        .agg(rf_agg_approx_quantiles(col("t"), [0.5]).alias("q"))
        .collect()[0]
    )
    assert len(q["q"]) == 1


def test_reference_name_aliases_and_ramp_render(spark):
    from graft.functions import (rf_agg_extent, rf_cell_types, rf_mk_crs,
                                 rf_render_color_ramp_png, rf_render_png)

    assert "uint16" in rf_cell_types() and len(rf_cell_types()) == 15
    df = spark.range(1).select(
        rf_make_constant_tile(3.0, 2, 2, "uint8").alias("t"))
    for png_col in (rf_render_color_ramp_png(col("t"), "Viridis"),
                    rf_render_png(col("t"), color_ramp="Greyscale8"),
                    rf_render_png(col("t"), col("t"), col("t"))):
        png = df.select(png_col.alias("p")).collect()[0]["p"]
        assert bytes(png[1:4]) == b"PNG"
    crs = spark.range(1).select(rf_mk_crs(lit("EPSG:3857")).alias("c")).collect()[0]["c"]
    assert crs == "epsg:3857"
    ext = (
        spark.sql("SELECT named_struct('xmin', CAST(id AS DOUBLE), 'ymin', 0.0D, "
                  "'xmax', CAST(id + 1 AS DOUBLE), 'ymax', 1.0D) AS e FROM range(3)")
        .agg(rf_agg_extent(col("e")).alias("u")).collect()[0]["u"]
    )
    assert ext["xmin"] == 0.0 and ext["xmax"] == 3.0


def test_geojson_and_predicates(spark):
    df = spark.range(1).select(
        st_geomFromGeoJSON(lit('{"type":"Point","coordinates":[1,2]}')).alias("p"),
        st_geomFromWKT(lit("POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))")).alias("g"),
    )
    r = df.select(
        st_x(col("p")).alias("x"),
        st_covers(col("g"), col("p")).alias("cov"),
        st_disjoint(col("g"), st_makePoint(10.0, 10.0)).alias("dis"),
        st_length(col("g")).alias("len"),
    ).collect()[0]
    assert r["x"] == 1.0 and r["cov"] is True and r["dis"] is True
    assert r["len"] == 16.0


def test_sql_surface_from_python(spark):
    assert spark.sql("SELECT rf_tile_sum(rf_make_ones_tile(2, 2, 'float64')) AS s").collect()[0]["s"] == 4.0
    docs = spark.sql("DESCRIBE FUNCTION EXTENDED rf_tile_sum").collect()
    assert any("rf_tile_sum" in r[0] for r in docs)


def test_resample_aggregate_and_cubic_methods(spark):
    from graft.functions import rf_array_to_tile, rf_resample, rf_tile_to_array_double
    from pyspark.sql import functions as F
    df = spark.createDataFrame(
        [([1.0, 3.0, 5.0, 7.0, 2.0, 8.0, 6.0, 4.0],)], "vals array<double>")
    t = rf_array_to_tile(F.col("vals"), 4, 2)
    row = df.select(
        rf_tile_to_array_double(rf_resample(t, F.lit(0.5), "average")).alias("avg"),
        rf_tile_to_array_double(rf_resample(t, F.lit(0.5), "max")).alias("mx"),
        rf_tile_to_array_double(rf_resample(t, F.lit(0.5), "sum")).alias("sm"),
        rf_tile_to_array_double(rf_resample(t, F.lit(0.5), "median")).alias("md"),
    ).collect()[0]
    # blocks {1,3,2,8} and {5,7,6,4}
    assert row["avg"] == [3.5, 5.5]
    assert row["mx"] == [8.0, 7.0]
    assert row["sm"] == [14.0, 22.0]
    assert row["md"] == [2.0, 5.0]  # lower median
