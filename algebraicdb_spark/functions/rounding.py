"""Engine-portable rounding: floor(x·10^s + 0.5) / 10^s.

Why not ROUND: engines disagree on representational ties. Spark's
``round`` goes through the double's shortest decimal repr
(``BigDecimal.valueOf``) and half-ups THAT; DuckDB rounds the binary
value. For a double like 70354.874849999992875… (repr
"70354.87485") Spark yields 70354.8749, DuckDB 70354.8748 — a real
divergence hit at sf0.1 (lineitem l_orderkey=8000, l_linenumber=5)
because fixture prices/discounts are 2-decimal, so their products
land on …5 decimal boundaries constantly.

floor(x·10^s + 0.5)/10^s uses only IEEE-754 primitives (multiply,
add, floor, divide) that Spark's codegen, DuckDB, numpy, and CPython
all evaluate bit-identically, so both sides of every oracle compare
equal regardless of which side of a repr-tie the double sits on.
Magnitude bound: x·10^4 stays exactly integer-representable below
2^53 ⇒ correct for |x| < ~9·10^11, far above any fixture measure.
"""

from __future__ import annotations

import math

from pyspark.sql import Column
from pyspark.sql import functions as F


def pround(col: Column | str, scale: int = 4) -> Column:
    """Portable round of a double column (Spark side)."""
    if isinstance(col, str):
        col = F.col(col)
    k = 10**scale
    return F.floor(col * k + F.lit(0.5)) / k


def pround_py(x: float, scale: int = 4) -> float:
    """Portable round of a Python float (pandas-UDF hot loops)."""
    k = 10**scale
    return math.floor(x * k + 0.5) / k


def pround_np(series, scale: int = 4):
    """Portable round of a pandas/numpy vector."""
    import numpy as np

    k = 10**scale
    return np.floor(series * k + 0.5) / k


def pround_sql(expr: str, scale: int = 4) -> str:
    """The identical formula as SQL text (for oracle strings)."""
    k = 10**scale
    return f"floor(CAST({expr} AS DOUBLE) * {k} + 0.5) / {k}"


def exact_money_sum(col: Column, scale: int = 4) -> Column:
    """Order-independent sum of an on-grid decimal measure.

    Fixture money columns have exactly 2 decimals, so products like
    price·(1−disc) sit exactly on the 4-decimal grid; recovering the
    exact grid integer per row (the double is within ~1e-12 of the
    grid point — no tie possible) makes the sum exact and associative,
    so EVERY engine and EVERY partitioning produces the identical
    total. Emitted as DOUBLE (identical exact value → identical
    nearest double). Use this instead of pround(SUM(double)) whenever
    group sums exceed ~1e8, where double summation-order drift crosses
    1e-4 rounding cells. SQL twin (oracles, unchanged):
    CAST(SUM(CAST(expr AS DECIMAL(18,s))) AS DOUBLE).

    Implementation (optimization guide §1.2 step 2 — per-task work):
    the former ``SUM(CAST(x AS DECIMAL(18,s)))`` accumulated through a
    DECIMAL(28,s) buffer — a non-compact JVM object op per row that
    tripled TPC-H Q1's scan-stage time (1.68 s vs 0.55 s single-task
    at sf0.1). Now each row contributes exact LONG grid units
    g = floor(x·10^s + 0.5), split g = hi·10^6 + lo (0 ≤ lo < 10^6)
    so both running sums stay codegen-friendly BIGINTs, and the two
    totals recombine in DECIMAL once per GROUP. Same exact rational,
    same nearest double, bit-identical to the decimal path (A/B and
    oracle hash-verified). Overflow/exactness bounds: |x| < ~9·10^8
    at scale 4 (grid must sit below 2^53 — same class of bound pround
    documents) and ≲ 6·10^12 rows per group (Σlo < 2^63), both far
    beyond any 100 TB corpus measure.
    """
    if isinstance(col, str):
        col = F.col(col)
    k = 10**scale
    g = F.floor(col * k + F.lit(0.5))  # LONG: exact grid units
    lo = F.pmod(g, F.lit(1_000_000))
    # g - lo is a multiple of 1e6 and < 2^53, so the double division
    # is exact; the cast back to long is a no-op value-wise
    hi = ((g - lo) / 1_000_000).cast("long")
    total = F.sum(hi).cast("decimal(38,0)") * 1_000_000 + F.sum(lo).cast(
        "decimal(38,0)"
    )
    return (total / k).cast("double")


def exact_money_sum_sql(expr: str, scale: int = 4) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(18,{scale}))) AS DOUBLE)"
