"""Python-side completeness sweep of the registered SQL surface.

The Scala side pins the surface at PINNED_SURFACE names (SqlParitySpec
keeps the same number); this test
re-derives the same set from Python via the session catalog, checks every
name answers DESCRIBE FUNCTION with usage docs, and asserts the
`python/graft` wrapper module covers the registry (or that a gap is in
the documented intentional list).
"""
import inspect

import pytest

PINNED_SURFACE = 261

# Registered SQL names with no same-named Python wrapper, each for a
# documented reason. Keep this list short and justified.
#
# Design note (typed aliases): the reference's rasterfunctions.py also
# exposes ~20 typed names (rf_local_add_double, rf_local_add_int, ...).
# graft intentionally collapses each family into ONE polymorphic wrapper
# that accepts Column or scalar — the typed names would be redundant
# synonyms, so they are neither registered nor wrapped (README §2.15).
INTENTIONAL_GAPS = {
    # variadic generator: wrapped as the *explode_tiles(...)* helper with
    # fraction/seed keywords rather than one def per SQL name
    "rf_explode_tiles": "wrapped by graft.rf_explode_tiles(*tiles)",
    "rf_explode_tiles_sample": "wrapped by graft.rf_explode_tiles_sample(fraction, seed, *tiles)",
}

GRAFT_PREFIXES = ("rf_", "st_", "pl_", "mm_")

# Spark 4.1 ships its own st_* built-ins; exclude anything not registered
# by graft (graft registrations carry the 'graft.functions' class name).
SPARK_BUILTIN_ST = {
    "st_asbinary", "st_geogfromwkb", "st_geomfromwkb", "st_setsrid", "st_srid",
}


def graft_registry(spark):
    rows = spark.sql("SHOW FUNCTIONS").collect()
    names = {r[0].split(".")[-1] for r in rows}
    return {
        n for n in names
        if n.startswith(GRAFT_PREFIXES) and n not in SPARK_BUILTIN_ST
    }


def test_surface_is_pinned(spark):
    assert len(graft_registry(spark)) == PINNED_SURFACE


def test_every_name_has_describe_docs(spark):
    missing = []
    for n in sorted(graft_registry(spark)):
        docs = "\n".join(r[0] for r in spark.sql(f"DESCRIBE FUNCTION EXTENDED {n}").collect())
        if n not in docs or "Usage:" not in docs or " - " not in docs:
            missing.append(n)
    assert not missing, f"names without usable docs: {missing}"


def _fold(name):
    # wrappers use the Scala DSL's camelCase (st_geomFromWKT) while SQL
    # names are lowercase and may keep word underscores
    # (st_aggregate_distance_sphere) — compare case-folded with
    # underscores stripped so both conventions meet in the middle
    return name.lower().replace("_", "")


def test_python_wrappers_cover_registry(spark):
    import graft

    wrappers = {
        _fold(name) for name, obj in inspect.getmembers(graft, inspect.isfunction)
        if name.startswith(GRAFT_PREFIXES)
    }
    registry = graft_registry(spark)

    unwrapped = {
        n for n in registry
        if _fold(n) not in wrappers and n not in INTENTIONAL_GAPS
    }
    assert not unwrapped, f"registered SQL names without python wrappers: {sorted(unwrapped)}"

    # every documented gap must still be a real registered name
    stale_gaps = set(INTENTIONAL_GAPS) - registry
    assert not stale_gaps, f"INTENTIONAL_GAPS lists unregistered names: {sorted(stale_gaps)}"
