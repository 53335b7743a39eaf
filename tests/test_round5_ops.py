"""Semantic invariants for the round-5 additions (feature hashing,
degree stats, conversion latency, linear attribution, keep-best
dedup). Value correctness is oracle-gated in tools/verify_local.py;
these pin the mathematical properties the hash can't see."""

from pyspark.sql import functions as F


def test_feature_hashing_bounds_and_mass(spark, sf_dir):
    from algebraicdb_spark.operators.ml import FH_DIM, ml_feature_hashing

    rows = ml_feature_hashing(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r["bucket"] < FH_DIM
        # |signed sum| can never exceed the token count in the bucket
        assert abs(r["val"]) <= r["n_tokens"]
    # token mass is conserved: sum over buckets == total token count
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_tok = d.select(
        F.sum(F.size(F.filter(F.split("text", " "), lambda t: t != "")))
    ).collect()[0][0]
    assert sum(r["n_tokens"] for r in rows) == n_tok


def test_degree_stats_buckets_partition_nodes(spark, sf_dir):
    from algebraicdb_spark.operators.graph import (
        graph_degree_stats,
        graph_triangle_count,
    )

    stats = graph_degree_stats(spark, sf_dir).collect()
    tri = graph_triangle_count(spark, sf_dir).collect()[0]
    # bucket = bit_length(d): 2^(b-1) <= d < 2^b
    for r in stats:
        b = r["bucket"]
        assert 2 ** (b - 1) <= r["min_deg"] <= r["max_deg"] < 2**b
    assert sum(r["n_nodes"] for r in stats) == tri["n_nodes"]
    # handshake lemma: sum of degrees = 2|E|
    assert sum(r["sum_deg"] for r in stats) == 2 * tri["n_edges"]


def test_conversion_latency_ordering(spark, sf_dir):
    from algebraicdb_spark.operators.analytics import (
        event_conversion_latency,
    )

    r = event_conversion_latency(spark, sf_dir).collect()[0]
    assert r["n_converted"] > 0
    assert (
        0
        <= r["min_us"]
        <= r["p50_us"]
        <= r["p90_us"]
        <= r["max_us"]
    )
    assert r["min_us"] <= r["mean_us"] <= r["max_us"]


def test_attribution_conserves_purchase_value(spark, sf_dir):
    """Linear attribution must conserve total purchase value across
    touch types + '(none)' up to the 1e-6 credit grid."""
    from algebraicdb_spark.operators.analytics import attribution_linear

    rows = attribution_linear(spark, sf_dir).collect()
    types = {r["touch_type"] for r in rows}
    assert types <= {"click", "view", "(none)"}
    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    total = (
        e.where(F.col("event_type") == "purchase")
        .agg(F.sum("value"))
        .collect()[0][0]
    )
    credited = sum(r["credited_value"] for r in rows)
    n_purchases = e.where(F.col("event_type") == "purchase").count()
    # each purchase's credit splits over <= n_touch grid-floored terms;
    # worst-case loss per purchase ~ n_touch * 1e-6, bounded loosely
    assert credited <= total + 1e-6
    assert total - credited < n_purchases * 0.05


def test_dedup_keep_best_policy(spark, sf_dir):
    """Survivor is the longest doc in its group (ties: smallest id),
    and groups partition the corpus."""
    from algebraicdb_spark.operators.dedup import dedup_keep_best

    kept = dedup_keep_best(spark, sf_dir).collect()
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert sum(r["grp_n"] for r in kept) == n_docs
    assert len({r["set_fp"] for r in kept}) == len(kept)
    assert any(r["grp_n"] > 1 for r in kept), (
        "no multi-doc group — keep-policy untested by fixture"
    )
    # spot-check the policy on the largest group
    big = max(kept, key=lambda r: r["grp_n"])
    from algebraicdb_spark.operators.dedup import canonical_text

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    fp = F.md5(
        F.concat_ws(
            " ",
            F.sort_array(F.array_distinct(F.split(canonical_text("text"), " "))),
        )
    )
    grp = d.select("doc_id", "n_chars", fp.alias("fp")).where(
        F.col("fp") == big["set_fp"]
    ).collect()
    best = sorted(grp, key=lambda r: (-r["n_chars"], r["doc_id"]))[0]
    assert best["doc_id"] == big["kept_id"]
