"""Scale probe for merge-on-read DELETE (deletion vectors) vs
copy-on-write DELETE on the standard Delta format.

    python tools/probe_mor_scale.py

Builds the same table shape at sf0.01 and sf0.1 (10x the rows):
orders across 8 append commits (split by o_orderkey % 8), then
measures a SPARSE delete (o_orderkey % 997 = 7 — a prime modulus, so
matches spread across EVERY file, the shape that makes COW rewrite
everything) both ways:

- wall time of the delete commit,
- BYTES WRITTEN by the commit (new parquet staged for COW; the DV
  .bin / inline descriptors for MoR),
- bytes-written ratio across the 10x scale step.

The 100 TB story is the bytes column: COW's write cost follows the
affected FILES (here: all of them — a sparse spread touches every
file), while MoR's follows the compressed BITMAP of deleted ordinals.
Near-flat MoR bytes across the 10x step (bitmap size tracks matched
rows, not table size) against ~10x COW bytes is the measured argument
for dispatching sparse deletes to vectors.
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

from algebraicdb_spark.operators.delta_writer import DeltaTableWriter  # noqa: E402
from algebraicdb_spark.sources.catalog import load_tables  # noqa: E402


def build(spark, sf_dir: str, root: str) -> DeltaTableWriter:
    o = load_tables(spark, sf_dir)["orders"].select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    w = DeltaTableWriter(root)
    for i in range(8):
        w.append(o.where(F.col("o_orderkey") % 8 == i).coalesce(1))
    return w


def tree_bytes(root: str) -> int:
    total = 0
    for dirpath, _dirs, files in os.walk(root):
        if "_delta_log" in dirpath:
            continue
        for fn in files:
            total += os.path.getsize(os.path.join(dirpath, fn))
    return total


def run(spark, sf_dir: str, scratch: str) -> dict:
    out = {}
    for mode in ("cow", "mor"):
        root = os.path.join(scratch, f"t_{mode}")
        w = build(spark, sf_dir, root)
        if mode == "mor":
            w.enable_deletion_vectors()
        before = tree_bytes(root)
        t0 = time.monotonic()
        res = w.delete(spark, "o_orderkey % 997 = 7", mode=mode)
        wall = time.monotonic() - t0
        written = tree_bytes(root) - before
        # inline DVs ride the log, not the tree — count their bytes too
        if mode == "mor":
            with open(os.path.join(
                    root, "_delta_log",
                    f"{res['version']:020d}.json")) as f:
                for line in f:
                    a = json.loads(line)
                    dv = a.get("add", {}).get("deletionVector")
                    if dv and dv.get("storageType") == "i":
                        written += len(dv["pathOrInlineDv"])
        out[mode] = {
            "wall_s": round(wall, 3),
            "bytes_written": written,
            "rows_deleted": res["rows_deleted"],
            "files_touched": res.get("files_removed", 0)
            + res.get("files_rewritten", res.get("files_dv", 0)),
        }
        # correctness cross-check: both modes converge on one content
        out[mode]["rows_after"] = w.snapshot(spark).count()
    assert out["cow"]["rows_after"] == out["mor"]["rows_after"]
    return out


def main() -> None:
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("probe-mor-scale")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    scratch = tempfile.mkdtemp(prefix="mor_probe_")
    try:
        # warmup: JVM/codegen paths, so sf0.01 is not charged the
        # first-query cost (the probe_cow_scale review lesson)
        run(spark, "/root/testdata/sf0.001", os.path.join(scratch, "w"))
        small = run(spark, "/root/testdata/sf0.01",
                    os.path.join(scratch, "s"))
        big = run(spark, "/root/testdata/sf0.1",
                  os.path.join(scratch, "b"))
        report = {"sf0.01": small, "sf0.1": big, "ratios_10x": {
            m: {
                "wall": round(
                    big[m]["wall_s"] / max(small[m]["wall_s"], 1e-9), 2),
                "bytes": round(
                    big[m]["bytes_written"]
                    / max(small[m]["bytes_written"], 1), 2),
            }
            for m in ("cow", "mor")
        }}
        print(json.dumps(report, indent=2))
    finally:
        shutil.rmtree(scratch, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
