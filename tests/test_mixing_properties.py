"""Property-based tests (Hypothesis): the distributed packing layout
and PageRank agree with straight-line Python/numpy references on
arbitrary inputs — not just the fixture corpus."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from algebraicdb_spark.operators.analytics import pagerank
from algebraicdb_spark.operators.mixing import pack_layout

_settings = settings(
    max_examples=8,  # each example is a Spark job — keep the suite fast
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(
    toks=st.lists(st.integers(1, 50), min_size=1, max_size=20),
    n_sources=st.integers(1, 3),
    cap=st.integers(4, 64),
)
@_settings
def test_pack_layout_matches_python_reference(spark, toks, n_sources, cap):
    rows = [
        (i, f"s{i % n_sources}", n) for i, n in enumerate(toks)
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, n_tokens long")
    got = {
        r.doc_id: (r.seq_id, r.seq_offset)
        for r in pack_layout(df, cap=cap).collect()
    }
    # straight-line reference: per source, running position
    pos: dict = {}
    for doc_id, src, n in rows:
        p = pos.get(src, 0)
        assert got[doc_id] == (p // cap, p % cap), (doc_id, src, p, cap)
        pos[src] = p + n


@given(
    edges=st.lists(
        st.tuples(
            st.integers(0, 5), st.integers(0, 5), st.integers(1, 5)
        ),
        min_size=1,
        max_size=12,
    )
)
@_settings
def test_pagerank_matches_numpy_on_random_graphs(spark, edges):
    import numpy as np

    # dedupe parallel edges so both references see one weight per pair
    agg: dict = {}
    for s, t, w in edges:
        agg[(s, t)] = agg.get((s, t), 0) + w
    elist = [(f"n{s}", f"n{t}", float(w)) for (s, t), w in sorted(agg.items())]
    df = spark.createDataFrame(elist, "src string, dst string, weight double")
    got = {r.node: r.rank for r in pagerank(df, iters=8).collect()}

    nodes = sorted({s for s, _, _ in elist} | {t for _, t, _ in elist})
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    M = np.zeros((n, n))
    for s, t, w in elist:
        M[idx[t], idx[s]] += w
    out = M.sum(axis=0)
    has_out = out > 0
    M[:, has_out] /= out[has_out]
    r = np.full(n, 1.0 / n)
    for _ in range(8):
        dangling = r[~has_out].sum()
        r = (1 - 0.85) / n + 0.85 * (M @ r + dangling / n)
    for node, want in zip(nodes, r):
        assert abs(got[node] - want) < 1e-9, node
