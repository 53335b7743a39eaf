"""Ad-hoc probe: PQ recall@5 vs brute force, by Lloyd rounds and by
exact-rerank pool size, per SF.

Usage: python tools/pq_recall_probe.py [mode]
  mode=iters   -> vary Lloyd rounds (1,2,3) at the default rerank
  mode=rerank  -> vary the rerank pool (40,80,160,240) at PQ_ITERS

Prints one line per cell. Used to pin the PQ grids in
operators/similarity.py and docs/SCALE.md §6 — not part of the test
suite (tests pin the floor, this measures the surface).
"""
import sys

sys.path.insert(0, ".")

from algebraicdb_spark.session import get_spark  # noqa: E402
from algebraicdb_spark.operators.similarity import (  # noqa: E402
    _queries_and_corpus,
    build_pq_codebook,
    pq_search,
    sim_knn_cosine,
)


def topk(df):
    out = {}
    for r in df.collect():
        out.setdefault(r["q_id"], set()).add(r["vec_id"])
    return out


def recall(approx, exact):
    hit = sum(len(approx.get(q, set()) & nb) for q, nb in exact.items())
    tot = sum(len(nb) for nb in exact.values())
    return hit / tot


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "rerank"
    spark = get_spark()
    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        sf_dir = f"/root/testdata/{sf}"
        exact = topk(sim_knn_cosine(spark, sf_dir))
        q, e = _queries_and_corpus(spark, sf_dir)
        if mode == "iters":
            for it in (1, 2, 3):
                cb = build_pq_codebook(spark, sf_dir, iters=it)
                r = recall(topk(pq_search(q, e, cb)), exact)
                print(f"{sf} iters={it} recall@5={r:.2f}", flush=True)
        else:
            cb = build_pq_codebook(spark, sf_dir).localCheckpoint()
            for rk in (40, 80, 160, 240):
                r = recall(topk(pq_search(q, e, cb, rerank=rk)), exact)
                print(f"{sf} rerank={rk} recall@5={r:.2f}", flush=True)


if __name__ == "__main__":
    main()
