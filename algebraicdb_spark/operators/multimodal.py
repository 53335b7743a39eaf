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


# The stub decoder is a pure function of the payload bytes, so the
# oracle can replay it in SQL: fixture texts are ASCII (char offset ==
# byte offset, asserted when the oracle runs via n_bytes) and ≥ 8
# bytes, so the first-8-bytes big-endian digest is Σ ascii(c_i)·256^(8−i).
_DIGEST_SQL = " + ".join(
    f"CAST(ascii(substring(text, {i}, 1)) AS HUGEINT) * {256 ** (8 - i)}"
    for i in range(1, 9)
)

_DECODE_ORACLE = f"""
WITH dec AS (
  SELECT doc_id,
         octet_length(CAST(text AS BLOB)) AS n_bytes,
         ({_DIGEST_SQL}) AS digest
  FROM documents
), feat AS (
  SELECT doc_id, n_bytes,
         CAST(64 + digest % 1024 AS INTEGER) AS width,
         floor(CAST(CAST(digest % 256000 AS BIGINT) / 1000.0 AS DOUBLE) * 10000 + 0.5) / 10000 AS mean_luma
  FROM dec
)
SELECT COUNT(*) AS n_decoded,
       CAST(SUM(n_bytes) AS BIGINT) AS total_bytes,
       floor(CAST(CAST(SUM(CAST(mean_luma AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS DOUBLE) * 10000 + 0.5) / 10000 AS avg_luma,
       MAX(width) AS max_width
FROM feat
"""


@register("multimodal_decode_stub", oracle=_DECODE_ORACLE)
def multimodal_decode_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInPandas decode/feature-extract pipeline over binary payloads.

    Plan shape for 100 TB: pure map stage (no shuffle), Arrow-batched
    into the Python workers, output schema fixed up front; a final
    tiny agg keeps the checked output small. The decode body is a
    deterministic stub (no codec libs in the container), which makes
    the whole pipeline value-checkable: the oracle replays the digest
    arithmetic in SQL. avg_luma sums on the exact decimal grid
    (exact_money_sum-style) so partitioning never shifts the mean.
    """
    d = load_tables(spark, sf_dir)["documents"]
    payloads = d.select("doc_id", F.col("text").cast("binary").alias("payload"))
    decoded = payloads.mapInPandas(fake_decode_batch, schema=DECODED_SCHEMA)
    return decoded.agg(
        F.count(F.lit(1)).alias("n_decoded"),
        F.sum("n_bytes").alias("total_bytes"),
        pround(
            F.sum(F.col("mean_luma").cast("decimal(18,4)")).cast("double")
            / F.count(F.lit(1))
        ).alias("avg_luma"),
        F.max("width").alias("max_width"),
    )
