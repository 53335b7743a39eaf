"""ADT builder semantics: construction round-trip, pattern matching,
and the analysis-time exhaustiveness check (the reference enforced
this in its typechecker — we enforce it at plan-build time)."""

import pytest
from pyspark.sql import functions as F

from algebraicdb_spark.functions.adt import (
    EVENT_ADT,
    AdtError,
    AdtMatchError,
    AdtType,
    Variant,
    option_of,
)

SHAPE = AdtType(
    "Shape",
    [
        Variant("Circle", [("r", "double")]),
        Variant("Rect", [("w", "double"), ("h", "double")]),
        Variant("Point", []),
    ],
)


def test_construct_roundtrip(spark):
    df = spark.range(1).select(
        SHAPE.construct("Circle", r=F.lit(2.0)).alias("c"),
        SHAPE.construct("Rect", w=F.lit(3.0), h=F.lit(4.0)).alias("rc"),
        SHAPE.construct("Point").alias("p"),
    )
    row = df.collect()[0]
    assert row["c"]["tag"] == "Circle" and row["c"]["circle"]["r"] == 2.0
    assert row["c"]["rect"] is None  # inactive slots are NULL
    assert row["rc"]["rect"]["w"] == 3.0 and row["rc"]["rect"]["h"] == 4.0
    assert row["p"]["tag"] == "Point" and row["p"]["point"]["_unit"] is True


def test_constructed_values_share_schema(spark):
    """Constructor output is unionable regardless of variant."""
    a = spark.range(1).select(SHAPE.construct("Circle", r=F.lit(1.0)).alias("s"))
    b = spark.range(1).select(SHAPE.construct("Point").alias("s"))
    # same field names/types (nullability may differ per active slot)
    assert a.schema.simpleString() == b.schema.simpleString()
    assert a.unionByName(b).count() == 2


def test_match_exhaustive_evaluates(spark):
    df = spark.range(1).select(SHAPE.construct("Rect", w=F.lit(3.0), h=F.lit(4.0)).alias("s"))
    area = SHAPE.match(
        F.col("s"),
        {
            "Circle": lambda p: p["r"] * p["r"] * 3.14159,
            "Rect": lambda p: p["w"] * p["h"],
            "Point": lambda p: F.lit(0.0),
        },
    )
    assert df.select(area.alias("a")).collect()[0]["a"] == 12.0


def test_match_missing_arm_raises_at_plan_time():
    with pytest.raises(AdtMatchError, match="non-exhaustive"):
        SHAPE.match(F.col("s"), {"Circle": lambda p: p["r"]})


def test_match_unknown_arm_raises():
    with pytest.raises(AdtMatchError, match="unknown"):
        SHAPE.match(F.col("s"), {"Square": lambda p: p, "Circle": lambda p: p,
                                 "Rect": lambda p: p, "Point": lambda p: p})


def test_match_default_covers_missing(spark):
    df = spark.range(1).select(SHAPE.construct("Point").alias("s"))
    got = SHAPE.match(F.col("s"), {"Circle": lambda p: F.lit("c")}, default=F.lit("other"))
    assert df.select(got.alias("g")).collect()[0]["g"] == "other"


def test_construct_wrong_fields_raises():
    with pytest.raises(AdtError, match="expects fields"):
        SHAPE.construct("Circle", radius=F.lit(1.0))
    with pytest.raises(AdtError, match="no variant"):
        SHAPE.construct("Square")


def test_nested_option(spark):
    opt = option_of(SHAPE)
    df = spark.range(1).select(
        opt.construct("Some", value=SHAPE.construct("Circle", r=F.lit(5.0))).alias("o"),
        opt.construct("None_").alias("n"),
    )
    inner_r = opt.match(
        F.col("o"),
        {"Some": lambda p: p["value"]["circle"]["r"], "None_": lambda _: F.lit(-1.0)},
    )
    none_r = opt.match(
        F.col("n"),
        {"Some": lambda p: p["value"]["circle"]["r"], "None_": lambda _: F.lit(-1.0)},
    )
    row = df.select(inner_r.alias("some"), none_r.alias("none")).collect()[0]
    assert row["some"] == 5.0 and row["none"] == -1.0


def test_event_adt_encoding_counts(spark, sf_dir):
    """Encoded tag distribution equals raw event_type distribution."""
    from algebraicdb_spark.functions.adt_queries import encode_events

    enc = encode_events(spark, sf_dir)
    got = {r["tag"]: r["n"] for r in enc.groupBy(F.col("e.tag").alias("tag")).agg(F.count(F.lit(1)).alias("n")).collect()}
    from algebraicdb_spark.sources.catalog import load_tables

    raw = {
        r["event_type"]: r["n"]
        for r in load_tables(spark, sf_dir)["events"].groupBy("event_type").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    mapping = {"click": "Click", "view": "View", "purchase": "Purchase",
               "signup": "Signup", "error": "Error"}
    assert got == {mapping[k]: v for k, v in raw.items()}
