"""Catalog invariants: all tables load, the nanos quirk is fixed once."""

from algebraicdb_spark.sources.catalog import TABLES


def test_all_tables_registered(tables, spark):
    assert set(tables) == set(TABLES)
    for name in TABLES:
        assert spark.table(name).columns == tables[name].columns


def test_events_ts_normalized(tables):
    dtypes = dict(tables["events"].dtypes)
    assert dtypes["ts"] == "timestamp"
    assert dtypes["ts_ns"] == "bigint"


def test_events_ts_precision(tables):
    """ts must be exact integer-µs of ts_ns (no float rounding drift)."""
    from pyspark.sql import functions as F

    bad = (
        tables["events"]
        .filter(F.unix_micros("ts") != F.expr("ts_ns DIV 1000"))
        .count()
    )
    assert bad == 0


def test_registry_integrity():
    from algebraicdb_spark.plans import registry

    qs, oracles = registry.queries(), registry.oracles()
    assert set(oracles) <= set(qs)
    assert len(qs) >= 48
    for key, fn in qs.items():
        assert callable(fn), key


def test_cross_scale_loads_keep_views_consistent(spark):
    """A cache-hit load at one scale factor must re-register the
    session temp views when an interleaved load at ANOTHER scale
    replaced them — otherwise SQL-by-name silently reads the other
    scale's data while the returned DataFrames read the right one
    (the latent ordering bug behind dialect-vs-operator twins
    disagreeing when suites interleave scale factors)."""
    from algebraicdb_spark.sources.catalog import load_tables

    small = load_tables(spark, "/root/testdata/sf0.001")
    n_small = small["region"].count()
    load_tables(spark, "/root/testdata/sf0.01")  # replaces the views
    # cache hit at the small scale: views must swing back
    again = load_tables(spark, "/root/testdata/sf0.001")
    assert again["region"].count() == n_small
    assert spark.table("documents").count() == small["documents"].count()
    assert (
        spark.sql("SELECT COUNT(*) AS n FROM lineitem").collect()[0]["n"]
        == small["lineitem"].count()
    )
