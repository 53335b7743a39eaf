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
    # 2-round Lloyd measures 0.72/0.66/0.60 at sf0.001/0.01/0.1 (the
    # full rounds × SF grid lives at similarity.IVF_ITERS); 0.6 holds
    # at every SF while still pinning the improvement over the 1-round
    # build (which cleared only 0.5)
    assert recall >= 0.6, f"IVF recall@5 {recall:.2f} < 0.6"


def test_pq_recall_at_5(spark, sf_dir, exact):
    from algebraicdb_spark.operators.similarity import sim_knn_pq

    recall = _recall(topk(sim_knn_pq(spark, sf_dir)), exact)
    assert recall >= 0.5, f"PQ recall@5 {recall:.2f} < 0.5"


def test_self_similarity_excluded(spark, sf_dir, exact):
    for q, nb in exact.items():
        assert q not in nb


def test_mmr_diversifies_vs_pure_topk(spark, sf_dir):
    """MMR invariants: k distinct picks; rank 1 is the pure-relevance
    argmax; and the diversity term actually changes the set vs plain
    top-k (otherwise λ might as well be 1)."""
    from pyspark.sql import functions as F

    from algebraicdb_spark.operators.similarity import (
        MMR_K,
        dot,
        sim_mmr_diversify,
    )
    from algebraicdb_spark.sources.catalog import load_tables

    picks = sim_mmr_diversify(spark, sf_dir).collect()
    assert len(picks) == MMR_K
    ids = [r["vec_id"] for r in picks]
    assert len(set(ids)) == MMR_K
    e = load_tables(spark, sf_dir)["embeddings"]
    q = e.where(F.col("vec_id") == 0).select(
        F.col("embedding").alias("q_emb")
    )
    rel = (
        e.where(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id", dot(F.col("q_emb"), F.col("embedding")).alias("s")
        )
        .orderBy(F.col("s").desc(), "vec_id")
        .limit(MMR_K)
        .collect()
    )
    top_ids = [r["vec_id"] for r in rel]
    assert ids[0] == top_ids[0]  # first pick = pure argmax
    assert set(ids) != set(top_ids), "MMR never traded relevance for diversity"
    # picked relevances are non-increasing in the PURE top-k order only
    # for rank 1; later ranks may sacrifice relevance — but never below
    # the corpus minimum
    assert all(-1.0 <= r["rel"] <= 1.0 + 1e-9 for r in picks)
