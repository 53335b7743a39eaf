"""At-scale side record (round 15, VERDICT r14 item 2): time keys on
the N×-replicated sf0.1 fixture (tools/stress_scale.py's key-shifted
build) with the bench's noop-sink methodology, at whatever core count
$SPARK_GRAFT_CPUS names. NOT part of bench.py's contract — this is
the separate evidence that the optimized plans still win when data
(not the scheduling floor) dominates, and that they parallelize.

    python tools/atscale_probe.py N key [key ...]

N=1 times the plain sf0.1 fixture (no build). The N× build is reused
across invocations (delete /tmp/adb_stress_<N>x to rebuild) so the
32-core and 8-core runs see identical bytes.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE_SF = "/root/testdata/sf0.1"


def main() -> int:
    n = int(sys.argv[1])
    keys = sys.argv[2:]
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")
    from algebraicdb_spark.plans import registry
    from algebraicdb_spark.session import get_spark
    from algebraicdb_spark.sources.catalog import load_tables

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("atscale-probe", shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    if n == 1:
        sf_dir = BASE_SF
    else:
        import tools.stress_scale as ss

        sf_dir = os.path.join("/tmp", f"adb_stress_{n}x")
        if not os.path.isdir(sf_dir):
            print(f"building {n}x fixtures …", flush=True)
            built = ss.build(spark, n)
            assert built == sf_dir, built

    load_tables(spark, sf_dir)
    qs = registry.queries()
    print(f"# n={n} cpus={cpus} load_start={os.getloadavg()[0]:.2f}", flush=True)
    for key in keys:
        spark.sparkContext.setJobDescription(f"atscale {n}x: {key} warmup")
        qs[key](spark, sf_dir).write.format("noop").mode("overwrite").save()
        runs = []
        for i in range(2):
            spark.sparkContext.setJobDescription(f"atscale {n}x: {key} run{i}")
            t0 = time.time()
            qs[key](spark, sf_dir).write.format("noop").mode("overwrite").save()
            runs.append(time.time() - t0)
        spark.sparkContext.setJobDescription(None)
        print(f"{key:32s} n={n} cpus={cpus} min={min(runs):7.3f} "
              f"runs=[{' '.join(f'{r:.3f}' for r in runs)}]", flush=True)
    print(f"# load_end={os.getloadavg()[0]:.2f}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
