"""§2.10 multimodal columns: opaque binary payloads + typed metadata.

Real multimodal corpora carry image/audio/video as ``binary`` columns
with a metadata struct alongside. The container has no codec
libraries, so the DECODE step is a clearly-marked deterministic stub
(see ``fake_decode_batch``) — but everything Spark-cares-about is
real and tested: the binary column handling, the metadata schema, the
``mapInPandas`` batch iteration (Arrow transfer, bounded batches),
and the partition-parallel feature-extract plan shape.

Swap-in for production: replace ``fake_decode_batch``'s body with
PIL/ffmpeg calls; signatures, schema, and the plan don't change.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from algebraicdb_spark.functions.rounding import pround, pround_np
from algebraicdb_spark.plans.registry import register
from algebraicdb_spark.sources.catalog import load_tables


@register(
    "multimodal_binary_meta",
    oracle="""
    SELECT doc_id,
           octet_length(CAST(text AS BLOB)) AS n_bytes,
           md5(text) AS payload_md5,
           CASE WHEN octet_length(CAST(text AS BLOB)) > 300
                THEN 'large' ELSE 'small' END AS size_class
    FROM documents
    WHERE doc_id % 8 = 0
    """,
)
def multimodal_binary_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary column + typed metadata: byte length, content hash,
    size class (document text stands in for an opaque media payload)."""
    d = load_tables(spark, sf_dir)["documents"]
    payload = F.col("text").cast("binary")
    return d.filter(F.col("doc_id") % 8 == 0).select(
        "doc_id",
        F.octet_length(payload).alias("n_bytes"),
        F.md5(payload).alias("payload_md5"),
        F.when(F.octet_length(payload) > 300, "large")
        .otherwise("small")
        .alias("size_class"),
    )


DECODED_SCHEMA = (
    "doc_id bigint, n_bytes int, width int, height int, "
    "n_frames int, mean_luma double"
)


def fake_decode_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """STUB DECODER — deterministic fake.

    Real implementation would do ``PIL.Image.open(io.BytesIO(payload))``
    / ffmpeg frame sampling; this container has no codec libs
    (by design — see module docstring), so dimensions/luma are derived
    deterministically from the payload bytes. The Arrow batch
    iteration, output schema, and per-partition parallelism are the
    real thing.
    """
    for pdf in batches:
        payloads = pdf["payload"]
        n_bytes = payloads.map(len)
        digest = payloads.map(lambda b: int.from_bytes(b[:8].ljust(8, b"\0"), "big"))
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_bytes": n_bytes.astype("int32"),
                "width": (64 + digest % 1024).astype("int32"),
                "height": (64 + (digest // 1024) % 1024).astype("int32"),
                "n_frames": (1 + n_bytes % 16).astype("int32"),
                "mean_luma": pround_np((digest % 256_000) / 1000.0),
            }
        )


@register("multimodal_decode_stub")  # rows-only: decode is a stubbed library call
def multimodal_decode_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInPandas decode/feature-extract pipeline over binary payloads.

    Plan shape for 100 TB: pure map stage (no shuffle), Arrow-batched
    into the Python workers, output schema fixed up front; a final
    tiny agg keeps the checked output small.
    """
    d = load_tables(spark, sf_dir)["documents"]
    payloads = d.select("doc_id", F.col("text").cast("binary").alias("payload"))
    decoded = payloads.mapInPandas(fake_decode_batch, schema=DECODED_SCHEMA)
    return decoded.agg(
        F.count(F.lit(1)).alias("n_decoded"),
        F.sum("n_bytes").alias("total_bytes"),
        pround(F.avg("mean_luma")).alias("avg_luma"),
        F.max("width").alias("max_width"),
    )
