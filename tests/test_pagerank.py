"""PageRank correctness: the distributed loop must agree with a dense
numpy power iteration on the same graph — including dangling-node
mass redistribution, which the in-plan broadcast aggregate handles."""

from __future__ import annotations

import numpy as np

from algebraicdb_spark.operators.analytics import (
    PR_DAMPING,
    PR_ITERS,
    event_pagerank,
    pagerank,
)


def _numpy_pagerank(edges, d=PR_DAMPING, iters=PR_ITERS):
    nodes = sorted({s for s, _, _ in edges} | {t for _, t, _ in edges})
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    M = np.zeros((n, n))
    for s, t, w in edges:
        M[idx[t], idx[s]] += w
    out = M.sum(axis=0)
    has_out = out > 0
    M[:, has_out] /= out[has_out]
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        dangling = r[~has_out].sum()
        r = (1 - d) / n + d * (M @ r + dangling / n)
    return dict(zip(nodes, r))


def test_pagerank_matches_numpy_with_dangling(spark):
    # c is dangling (no out-edges); b is the hub
    edges = [("a", "b", 2.0), ("a", "c", 1.0), ("b", "c", 1.0), ("d", "b", 1.0)]
    df = spark.createDataFrame(edges, ["src", "dst", "weight"])
    got = {r.node: r.rank for r in pagerank(df).collect()}
    want = _numpy_pagerank(edges)
    assert set(got) == set(want)
    for node in want:
        assert abs(got[node] - want[node]) < 1e-9, node
    assert abs(sum(got.values()) - 1.0) < 1e-9


def test_pagerank_exact_refuses_large_graphs(spark):
    """The ordered-fold exact tier must refuse loudly past its node cap
    instead of silently grinding — large graphs belong to pagerank()."""
    import pytest

    from algebraicdb_spark.operators.analytics import (
        PR_EXACT_MAX_NODES,
        pagerank_exact,
    )

    n = PR_EXACT_MAX_NODES + 1
    edges = spark.range(n).selectExpr(
        "id AS src", f"(id + 1) % {n} AS dst", "CAST(1 AS DOUBLE) AS weight"
    )
    with pytest.raises(ValueError, match="exact-tier cap"):
        pagerank_exact(edges)


def test_event_pagerank_is_a_distribution(spark, sf_dir):
    rows = event_pagerank(spark, sf_dir).collect()
    assert abs(sum(r["rank"] for r in rows) - 1.0) < 1e-3
    again = event_pagerank(spark, sf_dir).collect()
    assert [tuple(r) for r in rows] == [tuple(r) for r in again]
    # output is totally ordered: rank desc, node asc
    key = [(-r["rank"], r["node"]) for r in rows]
    assert key == sorted(key)
