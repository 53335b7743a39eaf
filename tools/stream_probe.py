"""Streaming-tier scale probe: wall-clock the TWS ingest operators
(incremental dedup, LSH candidate generation) over the documents
fixture at two scale factors and print the time ratio vs the data
ratio — the streaming counterpart of tools/stress_scale.py.

    python tools/stream_probe.py            # sf0.001 (500 docs) vs sf0.1 (5000 docs)

Near-linear (time ratio <= data ratio) means per-batch work is bounded
by arriving data + touched state, not by corpus size — the property
that keeps ingest-time dedup running at a 100 TB standing corpus.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from algebraicdb_spark.session import get_spark  # noqa: E402
from algebraicdb_spark.streaming import engine  # noqa: E402

SFS = ("/root/testdata/sf0.001", "/root/testdata/sf0.1")
SPLIT_FRACTION = 0.8  # corpus/batch boundary scaled per SF
_CURRENT_SF = [SFS[0]]  # which fixture the op builder should read


def probe(spark, sf_dir: str, op_name: str, build) -> tuple[float, int]:
    _CURRENT_SF[0] = sf_dir
    docs = spark.read.parquet(f"{sf_dir.rstrip('/')}/documents.parquet")
    n = docs.count()
    split = int(docs.agg({"doc_id": "max"}).collect()[0][0] * SPLIT_FRACTION)
    src = engine.stage_document_files(spark, sf_dir, split)
    t0 = time.time()
    got = engine.run_to_memory(
        build(engine.read_documents_stream(spark, src)),
        f"probe_{op_name}_{n}",
        output_mode="append",
    )
    got.count()
    return time.time() - t0, n


def main() -> None:
    spark = get_spark("stream-probe")
    spark.sparkContext.setLogLevel("ERROR")
    def near_dup(docs):
        # the complete tier needs the static corpus token table (the
        # persisted shingle store a production ingest joins)
        from algebraicdb_spark.operators.dedup import minhash_token_arrays

        sf_dir = _CURRENT_SF[0]
        corpus = docs.sparkSession.read.parquet(
            f"{sf_dir.rstrip('/')}/documents.parquet"
        )
        return engine.near_dup_pairs_tws(docs, minhash_token_arrays(corpus))

    def funnel(docs):
        # the composed tier: gate + LSH + rerank in one query
        from algebraicdb_spark.operators.dedup import minhash_token_arrays

        sf_dir = _CURRENT_SF[0]
        corpus = docs.sparkSession.read.parquet(
            f"{sf_dir.rstrip('/')}/documents.parquet"
        )
        return engine.dedup_funnel_tws(docs, minhash_token_arrays(corpus))

    ops = {
        "incremental_dedup_tws": engine.incremental_dedup_tws,
        "lsh_candidates_tws": engine.lsh_candidates_tws,
        "near_dup_pairs_tws": near_dup,
        "dedup_funnel_tws": funnel,
    }
    # warmup: the session's FIRST streaming query pays one-time JVM/
    # state-server/Arrow init that would otherwise land on the small-SF
    # measurement and invert the ratio
    probe(spark, SFS[0], "warmup", engine.incremental_dedup_tws)
    for op_name, build in ops.items():
        times, counts = [], []
        for sf_dir in SFS:
            secs, n = probe(spark, sf_dir, op_name, build)
            times.append(secs)
            counts.append(n)
            print(f"{op_name:28s} {sf_dir}  docs={n:6d}  {secs:6.2f}s", flush=True)
        data_ratio = counts[1] / counts[0]
        time_ratio = times[1] / times[0]
        print(
            f"{op_name:28s} time ratio {time_ratio:.1f}x at {data_ratio:.0f}x docs",
            flush=True,
        )


if __name__ == "__main__":
    main()
