"""Seeded sampling must be reproducible — the property that makes a
sampled training set regenerable from (data, seed) alone."""

from __future__ import annotations

from pyspark.sql import functions as F

from algebraicdb_spark.operators.sampling import (
    STRATA_FRACTIONS,
    stratified_sample,
)


def test_same_seed_same_sample(tables):
    a = stratified_sample(tables["events"]).collect()
    b = stratified_sample(tables["events"]).collect()
    assert sorted(r.event_id for r in a) == sorted(r.event_id for r in b)


def test_different_seed_different_sample(tables):
    b = {r.event_id for r in stratified_sample(tables["events"], seed=1).collect()}
    c = {r.event_id for r in stratified_sample(tables["events"], seed=2).collect()}
    assert b != c  # overwhelmingly likely with ~10% fractions


def test_rare_strata_kept(tables):
    full = {
        r["event_type"]: r["n"]
        for r in tables["events"].groupBy("event_type").agg(F.count("*").alias("n")).collect()
    }
    res = {
        r["event_type"]: r["n"]
        for r in stratified_sample(tables["events"])
        .groupBy("event_type")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    for etype, frac in STRATA_FRACTIONS.items():
        if frac == 1.0 and full.get(etype):
            assert res.get(etype) == full[etype]  # keep-all strata intact
    for etype, frac in STRATA_FRACTIONS.items():
        if frac < 1.0 and full.get(etype):
            assert res.get(etype, 0) < full[etype]  # down-sampled strata shrink


def test_hash_split_partitions_corpus(spark, sf_dir, tables):
    from algebraicdb_spark.operators.sampling import split_hash_assign

    rows = {r["split"]: r for r in split_hash_assign(spark, sf_dir).collect()}
    total = tables["documents"].count()
    assert sum(r["n_docs"] for r in rows.values()) == total  # exhaustive
    # train must dominate (cut is 80/10/10; sf0.001 is ~50 docs so just
    # assert the ordering property, not tight fractions)
    assert rows["train"]["n_docs"] > rows.get("val", rows["train"])["n_docs"] or "val" not in rows
    # deterministic: second run bit-identical
    rows2 = {r["split"]: r for r in split_hash_assign(spark, sf_dir).collect()}
    assert rows == rows2
