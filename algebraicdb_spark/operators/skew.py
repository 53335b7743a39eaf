"""Skew-mitigation utilities: salting for hot join keys.

AQE's OptimizeSkewedJoin splits oversized partitions at runtime, but
only for sort-merge/shuffled-hash joins it can see; pre-emptive
salting is the portable technique when one side has pathological hot
keys (the Zipf reality of user_id / token / band keys at 100 TB):

    big side:   key → (key, salt = xxhash64(row-unique) % S)
    small side: replicated S times, one copy per salt value
    join on (key, salt) — the hot key's rows spread over S partitions

Deterministic: salt comes from seeded xxhash64 of a unique column,
never Python/JVM randomness, so retries and oracle checks are stable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from algebraicdb_spark.functions.rounding import exact_money_sum, pround
from algebraicdb_spark.plans.registry import register
from algebraicdb_spark.sources.catalog import load_tables


def salt_big_side(df: DataFrame, unique_col: str, n_salts: int) -> DataFrame:
    """Add a deterministic salt in [0, n_salts) derived from a unique column."""
    return df.withColumn(
        "_salt", F.pmod(F.xxhash64(F.col(unique_col)), F.lit(n_salts)).cast("int")
    )


def explode_small_side(df: DataFrame, n_salts: int) -> DataFrame:
    """Replicate each row once per salt value (the dimension stays small:
    |dim| × n_salts rows)."""
    return df.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: Column,
    unique_col: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the big side salted and the small side replicated.

    Semantically identical to ``big.join(small, on, how)`` for inner
    joins; each (key, salt) shard holds ~1/n_salts of a hot key's rows.
    """
    b = salt_big_side(big, unique_col, n_salts)
    s = explode_small_side(small, n_salts)
    return b.join(s, on & (b["_salt"] == s["_salt"]), how).drop("_salt")


@register(
    "join_skew_salted",
    oracle="""
    SELECT c_mktsegment,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS revenue
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    """,
)
def join_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted fact⋈dim join — must produce exactly the plain join's
    result (the oracle IS the unsalted join) while spreading any hot
    customer across 8 shuffle shards."""
    t = load_tables(spark, sf_dir)
    joined = salted_join(
        t["orders"],
        t["customer"].select("c_custkey", "c_mktsegment"),
        F.col("o_custkey") == F.col("c_custkey"),
        unique_col="o_orderkey",
        n_salts=8,
    )
    return joined.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_orders"),
        exact_money_sum("o_totalprice").alias("revenue"),
    )
