"""Semantic invariants of the corpus-mixing operators — properties the
value-hash oracle can't express (bounds, monotonicity, conservation)."""

from __future__ import annotations

from pyspark.sql import functions as F

from algebraicdb_spark.operators.mixing import (
    SEQ_CAP,
    corpus_mix_report,
    embedding_quantize_int8,
    mix_weighted_sample,
    pack_sequences,
)


def test_mix_report_shares_sum_to_one(spark, sf_dir):
    rows = corpus_mix_report(spark, sf_dir).collect()
    assert abs(sum(r.token_share for r in rows) - 1.0) < 1e-3
    # the coverage curve ends at 1 and never decreases along its order
    by_cum = sorted(rows, key=lambda r: r.cum_share)
    assert abs(by_cum[-1].cum_share - 1.0) < 1e-3
    assert all(
        a.cum_share <= b.cum_share + 1e-12 for a, b in zip(by_cum, by_cum[1:])
    )


def test_pack_sequences_layout(spark, sf_dir):
    rows = pack_sequences(spark, sf_dir).collect()
    # every doc's start offset is inside a sequence window
    assert all(0 <= r.seq_offset < SEQ_CAP for r in rows)
    # within a source, consecutive docs advance by exactly n_tokens
    by_src: dict = {}
    for r in rows:
        by_src.setdefault(r.source, []).append(r)
    for src, docs in by_src.items():
        docs.sort(key=lambda r: r.doc_id)
        pos = 0
        for r in docs:
            assert r.seq_id == pos // SEQ_CAP, (src, r.doc_id)
            assert r.seq_offset == pos % SEQ_CAP
            pos += r.n_tokens
    # conservation: total packed tokens == sum of doc token counts
    assert sum(r.n_tokens for r in rows) > 0


def test_mix_sample_rates_and_determinism(spark, sf_dir):
    rows = mix_weighted_sample(spark, sf_dir).collect()
    again = mix_weighted_sample(spark, sf_dir).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))
    for r in rows:
        assert 0 <= r.n_kept <= r.n_docs
        # achieved rate tracks the target within sampling noise at
        # fixture sizes (n_docs ~ 20-30 per source)
        assert abs(r.kept_rate - r.target_rate) < 0.35


def test_quantize_error_bounded_by_half_step(spark, sf_dir, tables):
    # max |err| of int8 min/max quantization is scale/2 = range/510
    stats = {r.label: r for r in embedding_quantize_int8(spark, sf_dir).collect()}
    ranges = (
        tables["embeddings"]
        .groupBy("label")
        .agg(
            F.max(
                F.array_max("embedding").cast("double")
                - F.array_min("embedding").cast("double")
            ).alias("max_range")
        )
        .collect()
    )
    for r in ranges:
        bound = r.max_range / 510 + 1e-9
        assert stats[r.label].max_abs_err <= bound + 1e-6
        assert stats[r.label].mse <= bound * bound


def test_token_budget_greedy_cut(spark, sf_dir):
    from algebraicdb_spark.operators.mixing import (
        BUDGET_FRACTION,
        select_token_budget,
    )

    rows = sorted(
        select_token_budget(spark, sf_dir).collect(), key=lambda r: -r.bucket
    )
    total = sum(r.n_tokens for r in rows)
    budget = int(total * BUDGET_FRACTION)
    # kept prefix is contiguous from the best bucket down
    kept_flags = [r.kept for r in rows]
    assert kept_flags == sorted(kept_flags, reverse=True)
    kept = [r for r in rows if r.kept]
    assert kept, "budget must keep at least the best bucket"
    # greedy invariant: without its last bucket the selection is under
    # budget; the cut bucket is the first to cross it
    assert sum(r.n_tokens for r in kept[:-1]) < budget
    # cum_tokens is the running total in bucket-desc order
    run = 0
    for r in rows:
        run += r.n_tokens
        assert r.cum_tokens == run


def test_entropy_matches_numpy(spark, sf_dir, tables):
    import numpy as np

    from algebraicdb_spark.operators.mixing import agg_entropy_diversity

    got = {r["source"]: r for r in agg_entropy_diversity(spark, sf_dir).collect()}
    pdf = tables["documents"].groupBy("source", "lang").count().toPandas()
    for source, grp in pdf.groupby("source"):
        p = grp["count"].to_numpy() / grp["count"].sum()
        h = float(-(p * np.log(p)).sum())
        assert abs(got[source]["entropy_nats"] - h) < 1e-3
        assert 0.0 <= got[source]["norm_entropy"] <= 1.0 + 1e-9
        assert got[source]["n_langs"] == len(grp)
