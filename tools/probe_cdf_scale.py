"""Scale probe for the Delta CHANGE-DATA-FEED emission tax.

    python tools/probe_cdf_scale.py

Builds the same Delta table shape at sf0.01 and sf0.1 (10x the rows)
and runs the SAME fixed-size mutations (a COW DELETE and a COW UPDATE
whose predicates match a constant ~4k-row key range, present at both
scales) two ways:

- ``cdf_off`` — plain COW mutation;
- ``cdf_on``  — the table declares ``delta.enableChangeDataFeed=true``
  so every mutation additionally lands its row-level diff as
  ``_change_data/`` parquet + ``cdc`` actions in the same commit
  (round 13, delta_writer._cdc_actions).

Measured per scale step: wall time, bytes REWRITTEN into the table by
the mutation (the COW cost both modes share), and the cdc bytes the
CDF mode adds. The 100 TB story the numbers pin: the emission tax
follows the CHANGED rows, not the table — cdc bytes stay ~flat across
the 10x step while the COW rewrite bytes grow with the files the
predicate touches, and the wall overhead is one bounded diff scan of
exactly the files the mutation already rewrote. A CDC consumer gets
O(changed rows) reads forever in exchange.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from algebraicdb_spark.operators.delta_writer import (  # noqa: E402
    DeltaTableWriter,
)
from algebraicdb_spark.sources.catalog import load_tables  # noqa: E402

SCRATCH = os.path.join(tempfile.gettempdir(), "cdf_probe")


def _tree_bytes(root: str, sub: str | None = None, exclude: str | None = None):
    total = 0
    for dirpath, _dirs, files in os.walk(
        os.path.join(root, sub) if sub else root
    ):
        if exclude and exclude in dirpath:
            continue
        if "_delta_log" in dirpath:
            continue
        for fn in files:
            if fn.endswith(".parquet"):
                total += os.path.getsize(os.path.join(dirpath, fn))
    return total


def run(spark: SparkSession, sf_dir: str, cdf: bool) -> dict:
    o = load_tables(spark, sf_dir)["orders"].select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    root = os.path.join(
        SCRATCH, f"{'on' if cdf else 'off'}_{sf_dir.replace('/', '_')}"
    )
    if os.path.isdir(root):
        shutil.rmtree(root)
    w = DeltaTableWriter(root)
    w.append(o)  # the whole fixture: 10x rows at sf0.1
    if cdf:
        w.set_properties({"delta.enableChangeDataFeed": "true"})
    before = _tree_bytes(root, exclude="_change_data")
    t0 = time.time()
    # fixed-size changes: TPC-H orderkeys <= 16k exist at every SF
    w.delete(spark, "o_orderkey <= 8000")
    w.update(spark, {"o_totalprice": "o_totalprice + 1"},
             "o_orderkey > 8000 AND o_orderkey <= 16000")
    wall = time.time() - t0
    rewritten = _tree_bytes(root, exclude="_change_data") - before
    cdc_bytes = _tree_bytes(root, sub="_change_data") if cdf else 0
    out = {"wall_s": round(wall, 3),
           "rewrite_bytes": int(rewritten)}
    if cdf:
        out["cdc_bytes"] = int(cdc_bytes)
        # sanity: the feed replays
        from algebraicdb_spark.operators.txnlog import DeltaLogTable

        feed = DeltaLogTable(root).changes_cdf(spark, since=1)
        out["change_rows"] = feed.count()
    return out


def main() -> None:
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    runs = []
    for sf_dir in ("/root/testdata/sf0.01", "/root/testdata/sf0.1"):
        row = {"sf_dir": sf_dir,
               "cdf_off": run(spark, sf_dir, cdf=False),
               "cdf_on": run(spark, sf_dir, cdf=True)}
        runs.append(row)
        print(json.dumps(row))
    r0, r1 = runs[0], runs[1]
    summary = {
        "cdc_bytes_ratio_10x": round(
            r1["cdf_on"]["cdc_bytes"] / max(r0["cdf_on"]["cdc_bytes"], 1),
            3,
        ),
        "rewrite_bytes_ratio_10x": round(
            r1["cdf_on"]["rewrite_bytes"]
            / max(r0["cdf_on"]["rewrite_bytes"], 1),
            3,
        ),
        "wall_overhead_on_vs_off_sf0_1": round(
            r1["cdf_on"]["wall_s"] / max(r1["cdf_off"]["wall_s"], 1e-9),
            3,
        ),
    }
    doc = {"runs": runs, "summary": summary}
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "docs", "PROBE_CDF_r13.json",
    )
    with open(out, "w") as f:
        json.dump(doc, f, indent=2)
    print(json.dumps(summary))
    shutil.rmtree(SCRATCH, ignore_errors=True)


if __name__ == "__main__":
    main()
