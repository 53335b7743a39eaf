"""Property-based ADT tests (Hypothesis, SURVEY §5.2): random values
round-trip construct→match for randomly-shaped sum types."""

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from algebraicdb_spark.functions.adt import AdtMatchError, AdtType, Variant

TYPE3 = AdtType(
    "P3",
    [
        Variant("I", [("x", "bigint")]),
        Variant("D", [("y", "double")]),
        Variant("S", [("z", "string")]),
    ],
)

_settings = settings(
    max_examples=12,  # each example is a Spark job — keep the suite fast
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(
    values=st.lists(
        st.one_of(
            st.tuples(st.just("I"), st.integers(-(2**40), 2**40)),
            st.tuples(st.just("D"), st.floats(-1e6, 1e6, allow_nan=False)),
            st.tuples(st.just("S"), st.text(alphabet="abcdef", max_size=8)),
        ),
        min_size=1,
        max_size=6,
    )
)
@_settings
def test_construct_match_roundtrip(spark, values):
    """For any mix of variants, matching the constructed column with an
    identity arm per variant recovers the original payloads."""
    field = {"I": "x", "D": "y", "S": "z"}
    rows = [(i, tag, str(v)) for i, (tag, v) in enumerate(values)]
    df = spark.createDataFrame(rows, "id bigint, tag string, raw string")
    cast_ty = {"I": "bigint", "D": "double", "S": "string"}
    enc = df.select(
        "id",
        "tag",
        "raw",
        TYPE3.construct_when(
            [
                (
                    F.col("tag") == t,
                    t,
                    {field[t]: F.col("raw").cast(cast_ty[t])},
                )
                for t in ("I", "D", "S")
            ]
        ).alias("e"),
    )
    back = TYPE3.match(
        F.col("e"),
        {
            "I": lambda p: p["x"].cast("string"),
            "D": lambda p: p["y"].cast("string"),
            "S": lambda p: p["z"],
        },
    )
    got = enc.select(
        "id", "tag", back.alias("back"), F.col("raw").cast("string").alias("raw")
    ).collect()
    for r in got:
        assert r["back"] is not None
        if r["tag"] == "S":
            assert r["back"] == r["raw"]
        else:
            assert float(r["back"]) == pytest.approx(float(r["raw"]))
        # tag always preserved
    tags = {r["id"]: r["tag"] for r in got}
    enc_tags = {r["id"]: r["e"]["tag"] for r in enc.collect()}
    assert tags == enc_tags


@given(
    arms=st.sets(st.sampled_from(["I", "D", "S"]), min_size=0, max_size=2),
)
@_settings
def test_partial_match_always_rejected(arms):
    """Any proper subset of arms without a default is non-exhaustive."""
    with pytest.raises(AdtMatchError):
        TYPE3.match(F.col("e"), {a: (lambda p: F.lit(1)) for a in arms})
