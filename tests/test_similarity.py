"""ANN quality: LSH and IVF top-k must recover most of the exact
brute-force neighbors (recall@k), since their oracle check is
rows-only."""

import pytest


def topk(df):
    out = {}
    for r in df.collect():
        out.setdefault(r["q_id"], set()).add(r["vec_id"])
    return out


@pytest.fixture(scope="module")
def exact(spark, sf_dir):
    from algebraicdb_spark.operators.similarity import sim_knn_cosine

    return topk(sim_knn_cosine(spark, sf_dir))


def _recall(approx, exact):
    hits = sum(len(approx.get(q, set()) & nb) for q, nb in exact.items())
    total = sum(len(nb) for nb in exact.values())
    return hits / total


def test_exact_knn_shape(exact):
    assert len(exact) > 0
    assert all(len(nb) == 5 for nb in exact.values())


def test_lsh_recall_at_5(spark, sf_dir, exact):
    from algebraicdb_spark.operators.similarity import sim_knn_lsh

    recall = _recall(topk(sim_knn_lsh(spark, sf_dir)), exact)
    assert recall >= 0.5, f"hyperplane-LSH recall@5 {recall:.2f} < 0.5"


def test_ivf_recall_at_5(spark, sf_dir, exact):
    from algebraicdb_spark.operators.similarity import sim_knn_ivf

    recall = _recall(topk(sim_knn_ivf(spark, sf_dir)), exact)
    assert recall >= 0.5, f"IVF recall@5 {recall:.2f} < 0.5"


def test_pq_recall_at_5(spark, sf_dir, exact):
    from algebraicdb_spark.operators.similarity import sim_knn_pq

    recall = _recall(topk(sim_knn_pq(spark, sf_dir)), exact)
    assert recall >= 0.5, f"PQ recall@5 {recall:.2f} < 0.5"


def test_self_similarity_excluded(spark, sf_dir, exact):
    for q, nb in exact.items():
        assert q not in nb
