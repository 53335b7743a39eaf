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
    "algebraicdb_spark.operators.corpus",
    "algebraicdb_spark.operators.mixing",
    "algebraicdb_spark.operators.analytics",
    "algebraicdb_spark.operators.graph",
    "algebraicdb_spark.operators.warehouse",
    "algebraicdb_spark.operators.ml",
    "algebraicdb_spark.operators.tpch",
    "algebraicdb_spark.operators.fixpoint_queries",
    "algebraicdb_spark.operators.txnlog",
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


# Exposure order for the driver's correctness gate. The driver checks
# the first 50 keys in dict order each round, so the order IS part of
# the evidence pipeline. Rounds 1-4 used a hand-rotated priority tuple;
# that required manual rotation every round and went stale the moment
# the driver wrote new rows (round-4 verdict item 1). The order is now
# DERIVED from the committed CORRECTNESS_r*.json artifacts themselves:
# keys sort by the round of their latest driver row, oldest first, with
# registration order as the stable tie-break. Never-checked keys (new
# this round) and keys whose latest row FAILED sort as round 0, so they
# always lead the window. ``no_oracle`` rows (the rows-only-by-design
# keys) count as normally checked. The net effect: every round the
# 50-slot window automatically lands on the 50 keys whose driver
# evidence is stalest — no manual rotation, no wasted slots.


def _repo_root() -> str:
    import os

    return os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def latest_driver_round() -> dict[str, int]:
    """key -> round of its latest committed driver correctness row.

    A key whose latest row is a hard failure (rows/schema/hash mismatch
    or an unexpected error) maps to 0 — it re-enters the next window
    immediately, same as a never-checked key. A key whose latest row is
    the weaker ``no_oracle`` rows-only check but which NOW has a
    registered oracle also maps to 0: the oracle was added after the
    driver last saw the key, so its value-hash evidence is vacuously
    stale and should not wait for normal rotation (round-5 verdict
    item 3 — ``sim_knn_pq`` gained a grid-replay oracle its r04
    ``no_oracle`` row predates).
    """
    import glob
    import json
    import os
    import re

    load_all()  # ORACLES must be populated for the no_oracle-vacuity rule
    latest: dict[str, int] = {}
    ok: dict[str, bool] = {}
    for path in sorted(glob.glob(os.path.join(_repo_root(), "CORRECTNESS_r*.json"))):
        m = re.search(r"r(\d+)", os.path.basename(path))
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            with open(path) as f:
                rows = json.load(f)
        except (OSError, json.JSONDecodeError, ValueError):
            continue
        if not isinstance(rows, dict):
            continue
        for key, row in rows.items():
            if not isinstance(row, dict) or rnd < latest.get(key, 0):
                continue
            latest[key] = rnd
            rows_only = row.get("err") == "no_oracle"
            hash_green = row.get("err") is None and not any(
                row.get(f) is False for f in ("rows_match", "schema_match", "hash_match")
            )
            # rows-only counts as checked ONLY while the key still has
            # no oracle; once an oracle exists the row is vacuous.
            ok[key] = hash_green or (rows_only and key not in ORACLES)
    return {k: (r if ok.get(k, False) else 0) for k, r in latest.items()}


def load_all() -> None:
    """Import every operator module so its @register calls run.

    A module whose import raises is rolled back: keys its decorators
    registered before the crash line are removed so a retried import
    (pytest collects each test module independently) reports the
    ORIGINAL error instead of a misleading ``duplicate query key`` two
    modules later — the round-7 failure cascade. The eviction covers
    every package module the failed import pulled in TRANSITIVELY,
    not just the named one: a cached-but-rolled-back dependency would
    otherwise re-import as a no-op and leave its keys missing forever.
    """
    import sys

    for mod in _QUERY_MODULES:
        before_q = set(QUERIES)
        before_o = set(ORACLES)
        before_mods = set(sys.modules)
        try:
            importlib.import_module(mod)
        except Exception:
            for k in set(QUERIES) - before_q:
                del QUERIES[k]
            for k in set(ORACLES) - before_o:
                del ORACLES[k]
            # drop every package module this import added (the named
            # module AND anything it imported transitively) so the
            # next attempt retries from scratch and re-registers
            for name in set(sys.modules) - before_mods:
                if name.startswith("algebraicdb_spark"):
                    sys.modules.pop(name, None)
            sys.modules.pop(mod, None)
            raise


def _ordered(d: dict) -> dict:
    latest = latest_driver_round()
    # sorted() is stable: within one staleness class, registration order
    # (scans -> filters -> ... -> tpch) is preserved.
    return {k: d[k] for k in sorted(d, key=lambda k: latest.get(k, 0))}


def queries() -> dict[str, QueryFn]:
    load_all()
    return _ordered(QUERIES)


def oracles() -> dict[str, str]:
    load_all()
    return _ordered(ORACLES)
