"""The portable-rounding contract: pround must produce the identical
double in every engine we compare across — CPython, numpy, DuckDB SQL,
and Spark — including on representational-tie values where ROUND
diverges (the sf0.1 bug this module exists to prevent)."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from algebraicdb_spark.functions.rounding import (
    pround,
    pround_np,
    pround_py,
    pround_sql,
)

# the exact double that bit Spark's ROUND at sf0.1
TIE = 72605.65 * (1 - 0.05) * (1 + 0.02)

ADVERSARIAL = [
    TIE,
    0.00005,
    -0.00005,
    2.5e-5,
    123.456750000001,
    123.45675,
    -123.45675,
    0.0,
    1e11 + 0.00005,
]


def duck_round(xs: list[float], scale: int = 4) -> list[float]:
    con = duckdb.connect()
    expr = pround_sql("x", scale)
    return [
        con.sql(f"SELECT {expr} AS r FROM (SELECT CAST({x!r} AS DOUBLE) AS x)").fetchone()[0]
        for x in xs
    ]


def test_adversarial_values_agree_everywhere(spark):
    py = [pround_py(x) for x in ADVERSARIAL]
    nump = list(pround_np(pd.Series(ADVERSARIAL)))
    duck = duck_round(ADVERSARIAL)
    sdf = spark.createDataFrame([(x,) for x in ADVERSARIAL], "x double")
    spk = [r.r for r in sdf.select(pround(F.col("x")).alias("r")).collect()]
    assert py == nump == duck == spk


def test_tie_value_differs_from_spark_round(spark):
    """Documents WHY pround exists: Spark's ROUND disagrees with the
    binary-value rounding on the repr-tie double."""
    sdf = spark.createDataFrame([(TIE,)], "x double")
    spark_round = sdf.select(F.round("x", 4).alias("r")).collect()[0].r
    assert spark_round == 70354.8749  # shortest-repr half-up
    assert pround_py(TIE) == 70354.8748  # binary value is below the tie
    assert duck_round([TIE]) == [70354.8748]


@settings(max_examples=200, deadline=None)
@given(st.floats(-1e9, 1e9, allow_nan=False))
def test_py_np_duck_agree(x):
    # cheap three-way property (Spark excluded: one job per example)
    assert pround_py(x) == list(pround_np(pd.Series([x])))[0]


def test_duck_bulk_agrees_with_py():
    rng = np.random.default_rng(7)
    xs = list(rng.uniform(-1e7, 1e7, 300)) + [x * 1.0001 for x in ADVERSARIAL]
    assert duck_round(xs) == [pround_py(x) for x in xs]
