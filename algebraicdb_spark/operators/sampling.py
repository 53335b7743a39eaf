"""Sampling operators — a training-data pipeline's third leg next to
dedup and quality gates (down-sample over-represented sources,
hold-out splits, debug slices).

Sampling is engine-specific by nature (Spark's Bernoulli sampler and
DuckDB's will never agree row-for-row), so these keys are rows-only
for the driver gate; *determinism under a fixed seed* — the property
that actually matters for reproducible pipelines — is asserted in
tests/test_sampling.py (same seed → identical sample, twice).

Scale: ``sample``/``sampleBy`` are narrow map-stage operators (no
shuffle); stratified fractions are applied per-partition with the
seed + partition id, so the plan is identical at any cluster size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from algebraicdb_spark.plans.registry import register
from algebraicdb_spark.sources.catalog import load_tables

SEED = 41

# down-sample the over-represented event types, keep the rare ones
STRATA_FRACTIONS = {
    "click": 0.1,
    "view": 0.1,
    "purchase": 1.0,
    "signup": 1.0,
    "error": 1.0,
}


def stratified_sample(events: DataFrame, fractions=None, seed: int = SEED) -> DataFrame:
    """Per-stratum Bernoulli sampling (seeded, reproducible)."""
    return events.sampleBy("event_type", fractions or STRATA_FRACTIONS, seed=seed)


@register("sample_stratified")  # rows-only: samplers are engine-specific
def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seeded stratified sample of events + per-stratum counts, so the
    (rows-only) check still sees a stable one-row-per-type summary."""
    e = load_tables(spark, sf_dir)["events"]
    return (
        stratified_sample(e)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_sampled"),
            F.sum("event_id").alias("id_checksum"),
        )
        .orderBy("event_type")
    )
