"""Central query/oracle registry backing ``__spark_entry__``.

Every operator from SURVEY.md §2 registers here with

    @register("key", oracle="<ANSI SQL DuckDB runs on the same views>")
    def key(spark, sf_dir) -> DataFrame: ...

Keys with no SQL-expressible oracle (sketches, LSH, streaming-only)
pass ``oracle=None`` and get the driver's weaker rows-only check;
their quality is asserted by pytest instead (recall vs brute force,
batch/stream equivalence).

Determinism contract (SURVEY §5.3) every registered query obeys:
  1. double-typed aggregates rounded to 4 dp on BOTH sides,
  2. collected lists sorted,
  3. top-k totally ordered via a unique tie-break,
  4. identical output column names on both sides,
  5. timestamps exposed as epoch-seconds BIGINT or formatted strings.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}

_QUERY_MODULES = (
    "algebraicdb_spark.operators.scans",
    "algebraicdb_spark.operators.filters",
    "algebraicdb_spark.operators.joins",
    "algebraicdb_spark.operators.aggregates",
    "algebraicdb_spark.operators.windows",
    "algebraicdb_spark.operators.sorts_setops",
    "algebraicdb_spark.operators.subqueries",
    "algebraicdb_spark.operators.skew",
    "algebraicdb_spark.functions.scalars",
    "algebraicdb_spark.functions.adt_queries",
    "algebraicdb_spark.streaming.batch_equiv",
    "algebraicdb_spark.operators.dedup",
    "algebraicdb_spark.operators.similarity",
    "algebraicdb_spark.operators.text",
    "algebraicdb_spark.operators.multimodal",
    "algebraicdb_spark.functions.udfs",
    "algebraicdb_spark.operators.pipeline",
    "algebraicdb_spark.operators.sampling",
)


def register(key: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if key in QUERIES:
            raise ValueError(f"duplicate query key: {key}")
        QUERIES[key] = fn
        if oracle is not None:
            ORACLES[key] = oracle
        return fn

    return deco


def load_all() -> None:
    """Import every operator module so its @register calls run."""
    for mod in _QUERY_MODULES:
        importlib.import_module(mod)


def queries() -> dict[str, QueryFn]:
    load_all()
    return dict(QUERIES)


def oracles() -> dict[str, str]:
    load_all()
    return dict(ORACLES)
