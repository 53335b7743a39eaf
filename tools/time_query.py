"""Time individual registered queries in isolation (noop sink).

Usage:
    python tools/time_query.py key [key ...] [--runs N]

Methodology matches bench.py (guide §1.4): one untimed warmup
(plan/codegen/read warm), then N timed noop-sink materializations;
prints per-run seconds plus min/median. Jobs are labelled with
setJobDescription for UI attribution (guide §1.5).
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    argv = sys.argv[1:]
    args = []
    runs = 3
    i = 0
    while i < len(argv):
        a = argv[i]
        if a.startswith("--runs"):
            if "=" in a:
                runs = int(a.split("=", 1)[1])
            else:
                runs = int(argv[i + 1])
                i += 1
        else:
            args.append(a)
        i += 1

    from algebraicdb_spark.plans import registry
    from algebraicdb_spark.session import get_spark
    from algebraicdb_spark.sources.catalog import load_tables

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("algebraicdb-time-query", shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    load_tables(spark, SF_DIR)
    qs = registry.queries()

    print(f"load(start)={os.getloadavg()[0]:.2f}")
    for key in args:
        spark.sparkContext.setJobDescription(f"{key}: warmup")
        qs[key](spark, SF_DIR).write.format("noop").mode("overwrite").save()
        samples = []
        for i in range(runs):
            spark.sparkContext.setJobDescription(f"{key}: run {i}")
            t0 = time.time()
            qs[key](spark, SF_DIR).write.format("noop").mode("overwrite").save()
            samples.append(time.time() - t0)
        spark.sparkContext.setJobDescription(None)
        fmt = " ".join(f"{s:.3f}" for s in samples)
        print(
            f"{key:32s} min={min(samples):.3f} med={statistics.median(samples):.3f} runs=[{fmt}]"
        )
    print(f"load(end)={os.getloadavg()[0]:.2f}")


if __name__ == "__main__":
    main()
