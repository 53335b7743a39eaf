"""Scale probe for the equality-delete keyed UPSERT vs MERGE on
Iceberg.

    python tools/probe_upsert_scale.py

Builds the same table shape at sf0.01 and sf0.1 (10x the rows):
orders across 8 append commits, then lands the SAME fixed-size CDC
batch (1,000 keyed rows, half updates / half inserts) two ways:

- ``upsert_by_key`` — equality-delete file of the batch's keys + the
  batch, one snapshot, NO read of the existing table at all;
- ``upsert_partitioned`` (round 12) — the same keyed upsert into a
  bucket(8, o_orderkey)-partitioned table: the batch and its key file
  split by the spec, one PARTITION-SCOPED equality-delete file per
  touched partition — the production CDC-into-partitioned shape; the
  point of the probe is that its bytes stay flat too;
- ``merge`` (copy-on-write) — the probe semi-join + rewrite of every
  file the keys reach.

Measured per scale step: wall time of the commit and BYTES WRITTEN
into data/ by it. The 100 TB story: the upsert's cost follows the
BATCH (both columns near-flat across the 10x step), while MERGE's
follows the table (its probe must at least read the key column of
every candidate file, and its rewrite follows the files the keys
reach — here the batch keys spread across every file, the CDC-shaped
worst case). The read-side debt upsert defers is one broadcast
anti-join per delete stratum until OPTIMIZE purges — the standard
Iceberg v2 CDC trade.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F  # noqa: E402

from algebraicdb_spark.operators.iceberg_writer import (  # noqa: E402
    IcebergTableWriter,
)
from algebraicdb_spark.sources.catalog import load_tables  # noqa: E402

BATCH = 1_000


def dir_bytes(path: str) -> int:
    total = 0
    for dirpath, _dirs, files in os.walk(path):
        for fn in files:
            total += os.path.getsize(os.path.join(dirpath, fn))
    return total


def build(
    spark, sf_dir: str, root: str, partition_by=None
) -> IcebergTableWriter:
    orders = load_tables(spark, sf_dir)["orders"].select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    w = IcebergTableWriter(root)
    for i in range(8):
        w.append(
            orders.where(F.col("o_orderkey") % 8 == i).coalesce(1),
            partition_by=partition_by,
        )
    return w


def batch_df(spark, sf_dir: str):
    """A fixed-size CDC batch: the SAME 1,000 keys at every scale —
    half existing (updates, stride-sampled so they spread across every
    file) and half brand-new (inserts)."""
    orders = load_tables(spark, sf_dir)["orders"].select("o_orderkey")
    existing = [
        r["o_orderkey"]
        for r in orders.orderBy("o_orderkey").limit(
            BATCH * 40
        ).collect()[:: 80]
    ][: BATCH // 2]
    new = [10_000_000_000 + i for i in range(BATCH - len(existing))]
    rows = [(int(k), -1, -1.0) for k in existing + new]
    return spark.createDataFrame(
        rows, "o_orderkey long, o_custkey long, o_totalprice double"
    ).coalesce(1)


def run(spark, sf_dir: str) -> dict:
    out: dict = {"sf_dir": sf_dir}
    base = tempfile.mkdtemp(prefix="probe_upsert_")
    try:
        for mode in ("upsert", "upsert_partitioned", "merge"):
            root = os.path.join(base, mode)
            w = build(
                spark, sf_dir, root,
                partition_by=(
                    ["bucket(8, o_orderkey)"]
                    if mode == "upsert_partitioned" else None
                ),
            )
            src = batch_df(spark, sf_dir)
            src.count()  # materialize the batch outside the timing
            data_dir = os.path.join(root, "data")
            before = dir_bytes(data_dir)
            t0 = time.time()
            if mode.startswith("upsert"):
                w.upsert_by_key(spark, src, ["o_orderkey"])
            else:
                w.merge(
                    spark, src, "t.o_orderkey = s.o_orderkey",
                    {"o_custkey": "s.o_custkey",
                     "o_totalprice": "s.o_totalprice"},
                    ["s.o_orderkey", "s.o_custkey", "s.o_totalprice"],
                )
            out[mode] = {
                "wall_s": round(time.time() - t0, 3),
                "bytes_written": dir_bytes(data_dir) - before,
            }
    finally:
        shutil.rmtree(base, ignore_errors=True)
    return out


def main() -> None:
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    results = [
        run(spark, "/root/testdata/sf0.01"),
        run(spark, "/root/testdata/sf0.1"),
    ]
    small, big = results
    summary = {
        "batch_rows": BATCH,
        "upsert_wall_ratio_10x": round(
            big["upsert"]["wall_s"] / max(small["upsert"]["wall_s"], 1e-9), 2
        ),
        "merge_wall_ratio_10x": round(
            big["merge"]["wall_s"] / max(small["merge"]["wall_s"], 1e-9), 2
        ),
        "upsert_bytes_ratio_10x": round(
            big["upsert"]["bytes_written"]
            / max(small["upsert"]["bytes_written"], 1), 2
        ),
        "upsert_partitioned_bytes_ratio_10x": round(
            big["upsert_partitioned"]["bytes_written"]
            / max(small["upsert_partitioned"]["bytes_written"], 1), 2
        ),
        "merge_bytes_ratio_10x": round(
            big["merge"]["bytes_written"]
            / max(small["merge"]["bytes_written"], 1), 2
        ),
    }
    print(json.dumps({"runs": results, "summary": summary}, indent=2))


if __name__ == "__main__":
    main()
