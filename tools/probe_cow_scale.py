"""Scale probe for the round-10 txnlog surfaces: copy-on-write DELETE
and two-tier (partition value + stats) pruning.

    python tools/probe_cow_scale.py

Builds the same table shape at sf0.01 and sf0.1 (10× the rows):
orders hive-partitioned by o_orderpriority (5 values) across 8
append commits with o_orderkey stats, then measures

- a partition+stats-pruned snapshot's DIRECTORY OPENS vs the full
  live set (pure driver-side metadata — the prune ratio is the
  100 TB story),
- wall time of a selective COW DELETE (one priority, one key range:
  the probe scan + the partial rewrite) at both scales.

Near-linear delete time (ratio ≲ data ratio) means the rewrite
follows the affected files, not the table; the pruned-open count
should not grow with data volume at all (it follows partition/file
count, not rows).
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F  # noqa: E402

from algebraicdb_spark.operators.txnlog import TxnLogTable  # noqa: E402
from algebraicdb_spark.sources.catalog import load_tables  # noqa: E402


def build(spark, sf_dir: str, root: str) -> TxnLogTable:
    o = load_tables(spark, sf_dir)["orders"].select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    t = TxnLogTable(root)
    for i in range(8):  # streaming-ish: 8 commits of 1/8 each
        t.append(
            o.where(F.col("o_orderkey") % 8 == i),
            partition_by=["o_orderpriority"],
            stats_cols=["o_orderkey"],
        )
    return t


def probe(spark, sf_dir: str) -> dict:
    tmp = tempfile.mkdtemp(prefix="cow_probe_")
    try:
        t = build(spark, sf_dir, os.path.join(tmp, "t"))
        all_dirs = len(t.live_paths())
        # point-ish read: one priority, a narrow key range
        hi = t.snapshot(spark).agg(F.max("o_orderkey")).collect()[0][0]
        skip = [("o_orderpriority", "3-MEDIUM", "3-MEDIUM"),
                ("o_orderkey", 1, hi // 20)]
        pruned = len(t.live_paths(skip=skip))
        t0 = time.time()
        res = t.delete(
            spark,
            f"o_orderpriority = '3-MEDIUM' AND o_orderkey <= {hi // 20}",
            skip=skip,
        )
        dt = time.time() - t0
        return {"dirs": all_dirs, "pruned_opens": pruned,
                "delete_s": dt, **res}
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def main():
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    probe(spark, "/root/testdata/sf0.01")  # discard: JVM/codegen warmup
    small = probe(spark, "/root/testdata/sf0.01")
    big = probe(spark, "/root/testdata/sf0.1")
    print(f"sf0.01: {small}")
    print(f"sf0.1 : {big}")
    print(
        f"delete time ratio at 10x rows: "
        f"{big['delete_s'] / small['delete_s']:.2f}x; "
        f"pruned opens {small['pruned_opens']}->{big['pruned_opens']} "
        f"of {small['dirs']}->{big['dirs']} live dirs"
    )


if __name__ == "__main__":
    main()
