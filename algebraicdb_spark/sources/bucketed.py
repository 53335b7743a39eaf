"""Bucketed tables: shuffle-free co-located joins (SURVEY §4 /
"Partitioning & shuffle": bucketing for co-located joins).

Writing two tables bucketed by the same key into the same number of
buckets lets Spark join them with ZERO exchange on either side — the
decisive optimization for repeated fact⋈fact joins at 100 TB (pay the
shuffle once at write time, never again at read time).

    prepare_bucketed(spark, sf_dir, n_buckets=8)   # one-time write
    j = spark.table("lineitem_b").join(spark.table("orders_b"),
                                       F.col("l_orderkey") == F.col("o_orderkey"))
    # executed plan: SortMergeJoin with NO Exchange on either side

Uses saveAsTable (bucket metadata needs a catalog table — plain
parquet files can't carry it); the warehouse lives under the session's
spark.sql.warehouse.dir.
"""

from __future__ import annotations

import shutil
from urllib.parse import urlparse

from pyspark.sql import DataFrame, SparkSession

from algebraicdb_spark.sources.catalog import load_tables

BUCKETED_SUFFIX = "_b"


def _drop_table_and_location(spark: SparkSession, name: str) -> None:
    """Drop the catalog entry AND any stale on-disk location (a managed
    table left by a previous session blocks saveAsTable otherwise)."""
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    warehouse = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    shutil.rmtree(f"{warehouse.rstrip('/')}/{name.lower()}", ignore_errors=True)


def write_bucketed(
    df: DataFrame, name: str, key: str, n_buckets: int = 8, sort: bool = True
) -> None:
    """Write df as a bucketed (and optionally sorted) managed table."""
    _drop_table_and_location(df.sparkSession, name)
    writer = df.write.mode("overwrite").format("parquet").bucketBy(n_buckets, key)
    if sort:
        writer = writer.sortBy(key)
    writer.saveAsTable(name)


def prepare_bucketed(
    spark: SparkSession, sf_dir: str, n_buckets: int = 8
) -> tuple[str, str]:
    """Bucket lineitem and orders by order key; returns the table names."""
    t = load_tables(spark, sf_dir)
    li_name = f"lineitem{BUCKETED_SUFFIX}"
    o_name = f"orders{BUCKETED_SUFFIX}"
    write_bucketed(t["lineitem"], li_name, "l_orderkey", n_buckets)
    write_bucketed(t["orders"], o_name, "o_orderkey", n_buckets)
    return li_name, o_name
