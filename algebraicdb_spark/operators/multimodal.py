"""§2.10 multimodal columns: opaque binary payloads + typed metadata.

Real multimodal corpora carry image/audio/video as ``binary`` columns
with a metadata struct alongside. The IMAGE decode path is real since
round 8: ``multimodal_decode_ppm`` encodes a genuine PPM/P6 byte
stream per document and parses it back (header regex + numpy pixel
math — see ``decode_ppm_batch``). The container has no ffmpeg, so the
VIDEO frame-sample step remains a clearly-marked deterministic stub
(``fake_frame_sample_batch``) — but everything Spark-cares-about is
real and tested throughout: binary column handling, metadata schema,
``mapInPandas`` batch iteration (Arrow transfer, bounded batches),
and the partition-parallel feature-extract plan shape.

Swap-in for production: point ``decode_ppm_batch`` at
PIL.Image.open / ffmpeg; signatures, schema, and the plan don't
change.
"""

from __future__ import annotations

import re
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


# ---- real codec path: PPM (P6) encode → parse (round 8) ----------
#
# The container has no PIL/ffmpeg, but PPM "P6" (netpbm) is a real,
# public, self-describing image format with a header simple enough to
# parse correctly in pure Python + numpy: b"P6\n<w> <h>\n<maxval>\n"
# followed by w*h*3 raw RGB bytes. The fixtures carry no images, so
# the pipeline ENCODES one deterministically per document (pixel
# bytes = the doc's ASCII text cycled — pure function of
# (doc_id, text)) and then DECODES it by genuinely parsing the bytes:
# header regex, dimension extraction, numpy pixel math. A parser bug
# (wrong offset, wrong dims, wrong channel order) breaks the value
# hash against the oracle, which computes the expected features from
# the SOURCE columns without ever seeing the bytes.

DECODED_SCHEMA = (
    "doc_id bigint, width int, height int, maxval int, "
    "n_pixels bigint, sum_luma_milli bigint, mean_luma double"
)


def _ppm_dims(doc_id: int) -> tuple[int, int]:
    """Deterministic per-doc image geometry (8..16 × 8..14)."""
    return 8 + doc_id % 9, 8 + (doc_id // 9) % 7


def encode_ppm_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """(doc_id, text) -> (doc_id, payload): a real binary P6 stream
    per document. Pixel byte i (R,G,B,R,G,B,… order) is the text's
    byte at i mod len — ASCII fixtures make char offset == byte
    offset, which is what lets the oracle replay the pixel values
    with ascii(substring(...)) in SQL."""
    for pdf in batches:
        payloads = []
        for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
            w, h = _ppm_dims(int(doc_id))
            raw = text.encode("utf-8") if text else b""
            if not raw:
                raise ValueError(
                    f"doc {doc_id}: empty text has no bytes to encode "
                    "(filter len(text) > 0 upstream)"
                )
            n = w * h * 3
            reps = n // len(raw) + 1
            pixels = (raw * reps)[:n]
            payloads.append(b"P6\n%d %d\n255\n" % (w, h) + pixels)
        yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})


_PPM_HEADER = re.compile(rb"^P6\s+(\d+)\s+(\d+)\s+(\d+)\s")


def decode_ppm_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """REAL P6 parser: header regex → dims/maxval → numpy over the raw
    RGB bytes → integer Rec.601 luma (299R+587G+114B per mill). All
    feature values come from the parsed BYTES, never from the source
    row — a decoder bug surfaces as an oracle hash mismatch."""
    import numpy as np

    for pdf in batches:
        rows = {k: [] for k in (
            "doc_id", "width", "height", "maxval",
            "n_pixels", "sum_luma_milli",
        )}
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            m = _PPM_HEADER.match(bytes(payload))
            if not m:
                raise ValueError(f"doc {doc_id}: not a P6 stream")
            w, h, maxval = (int(g) for g in m.groups())
            px = np.frombuffer(payload, dtype=np.uint8, count=w * h * 3,
                               offset=m.end()).astype(np.int64).reshape(-1, 3)
            lm = int(px[:, 0].sum() * 299 + px[:, 1].sum() * 587
                     + px[:, 2].sum() * 114)
            rows["doc_id"].append(int(doc_id))
            rows["width"].append(w)
            rows["height"].append(h)
            rows["maxval"].append(maxval)
            rows["n_pixels"].append(w * h)
            rows["sum_luma_milli"].append(lm)
        out = pd.DataFrame(
            {
                "doc_id": pd.Series(rows["doc_id"], dtype="int64"),
                "width": pd.Series(rows["width"], dtype="int32"),
                "height": pd.Series(rows["height"], dtype="int32"),
                "maxval": pd.Series(rows["maxval"], dtype="int32"),
                "n_pixels": pd.Series(rows["n_pixels"], dtype="int64"),
                "sum_luma_milli": pd.Series(
                    rows["sum_luma_milli"], dtype="int64"
                ),
            }
        )
        out["mean_luma"] = pround_np(
            out["sum_luma_milli"] / (1000.0 * out["n_pixels"])
        )
        yield out


_PPM_ORACLE = """
WITH dims AS (
  SELECT doc_id, text,
         CAST(8 + doc_id % 9 AS INTEGER) AS width,
         CAST(8 + (doc_id // 9) % 7 AS INTEGER) AS height,
         len(text) AS n_chars
  FROM documents
  WHERE len(text) > 0
), px AS (
  SELECT doc_id, width, height,
         list_sum(list_transform(range(0, width * height * 3),
           i -> CAST(ascii(substring(text,
                    CAST(i % n_chars AS INTEGER) + 1, 1)) AS BIGINT)
                * (CASE i % 3 WHEN 0 THEN 299 WHEN 1 THEN 587 ELSE 114 END)))
           AS sum_lm
  FROM dims
)
SELECT doc_id, width, height, 255 AS maxval,
       CAST(width * height AS BIGINT) AS n_pixels,
       CAST(sum_lm AS BIGINT) AS sum_luma_milli,
       floor(CAST(sum_lm AS DOUBLE) / (1000.0 * width * height)
             * 10000 + 0.5) / 10000 AS mean_luma
FROM px
"""


@register("multimodal_decode_ppm", oracle=_PPM_ORACLE)
def multimodal_decode_ppm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary image decode as a real codec path: encode a P6 PPM per
    document (pure function of the row), then PARSE the byte stream
    back — header regex, dimensions, maxval, numpy Rec.601 luma over
    the raw RGB bytes (replaces round-2's digest-replay stub key).

    Plan shape for 100 TB: two chained Arrow map stages (encode,
    decode), no shuffle anywhere — frame-exact with how a production
    corpus would run PIL/ffmpeg decode over mapInPandas. Features are
    computed from the PARSED bytes only; the oracle recomputes them
    from the source columns, so the value hash checks the whole
    encode→parse loop end to end.
    """
    d = load_tables(spark, sf_dir)["documents"]
    # empty/null text has no bytes to cycle into pixels: excluded on
    # BOTH sides (oracle: WHERE len(text) > 0) so the encoder never
    # divides by a zero-length payload source
    payloads = (
        d.filter(F.length("text") > 0)
        .select("doc_id", "text")
        .mapInPandas(encode_ppm_batch, schema="doc_id bigint, payload binary")
    )
    return payloads.mapInPandas(decode_ppm_batch, schema=DECODED_SCHEMA)


# The frame-sample/resize stubs are pure functions of the payload
# bytes, so their oracles can replay them in SQL: fixture texts are
# ASCII (char offset == byte offset) and ≥ 8 bytes, so the
# first-8-bytes big-endian digest is Σ ascii(c_i)·256^(8−i).
_DIGEST_SQL = " + ".join(
    f"CAST(ascii(substring(text, {i}, 1)) AS HUGEINT) * {256 ** (8 - i)}"
    for i in range(1, 9)
)

FRAMES_SCHEMA = "doc_id bigint, frame_idx int, frame_luma double"
MAX_FRAMES_SAMPLED = 4
_LUMA_MIX = 2654435761  # Knuth multiplicative-hash constant


def fake_frame_sample_batch(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """STUB FRAME SAMPLER — deterministic fake, 1→N rows.

    Real implementation: ffmpeg seeks to k evenly-spaced timestamps
    and decodes one frame each. Here frame count and per-frame
    "luma" derive from the payload digest with exact integer
    arithmetic, so the oracle can replay them. The 1→N Arrow batch
    expansion (one output row per sampled frame) is the real
    production shape — this is how video corpora explode into frame
    tables without a shuffle.
    """
    for pdf in batches:
        rows = {"doc_id": [], "frame_idx": [], "frame_luma": []}
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            n_bytes = len(payload)
            digest = int.from_bytes(payload[:8].ljust(8, b"\0"), "big")
            n_frames = 1 + n_bytes % 16
            k = min(MAX_FRAMES_SAMPLED, n_frames)
            for j in range(k):
                idx = (j * n_frames) // k
                rows["doc_id"].append(doc_id)
                rows["frame_idx"].append(idx)
                rows["frame_luma"].append(
                    ((digest + idx * _LUMA_MIX) % 256_000) / 1000.0
                )
        yield pd.DataFrame(
            {
                "doc_id": pd.Series(rows["doc_id"], dtype="int64"),
                "frame_idx": pd.Series(rows["frame_idx"], dtype="int32"),
                "frame_luma": pround_np(pd.Series(rows["frame_luma"], dtype="float64")),
            }
        )


_FRAME_ORACLE = f"""
WITH dec AS (
  SELECT doc_id,
         octet_length(CAST(text AS BLOB)) AS n_bytes,
         ({_DIGEST_SQL}) AS digest
  FROM documents
), frames AS (
  SELECT doc_id, digest,
         1 + n_bytes % 16 AS n_frames,
         LEAST({MAX_FRAMES_SAMPLED}, 1 + n_bytes % 16) AS k
  FROM dec
), sampled AS (
  SELECT doc_id,
         CAST((j * n_frames) // k AS INTEGER) AS frame_idx,
         floor(CAST(CAST((digest + ((j * n_frames) // k) * {_LUMA_MIX})
                         % 256000 AS BIGINT) / 1000.0 AS DOUBLE)
               * 10000 + 0.5) / 10000 AS frame_luma
  FROM frames, LATERAL unnest(range(0, k)) AS t(j)
)
SELECT doc_id, frame_idx, frame_luma FROM sampled
"""


@register("multimodal_frame_sample", oracle=_FRAME_ORACLE)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Evenly-spaced frame sampling from binary video-like payloads:
    mapInPandas expands each payload into ≤4 (doc_id, frame_idx,
    feature) rows — the 1→N decode-explode every video pipeline
    needs, still a pure map stage (no shuffle; frame rows land in the
    same partition as their source payload). Frame count and the
    per-frame feature come from the deterministic stub decoder, which
    the oracle replays with exact integer arithmetic in SQL.
    """
    d = load_tables(spark, sf_dir)["documents"]
    payloads = d.select("doc_id", F.col("text").cast("binary").alias("payload"))
    return payloads.mapInPandas(fake_frame_sample_batch, schema=FRAMES_SCHEMA)


RESIZE_TARGET = 256  # fit-within box, aspect preserved


@register(
    "multimodal_resize_stub",
    oracle=f"""
    WITH dec AS (
      SELECT doc_id,
             octet_length(CAST(text AS BLOB)) AS n_bytes,
             ({_DIGEST_SQL}) AS digest
      FROM documents
    ), dims AS (
      SELECT doc_id,
             CAST(64 + digest % 1024 AS INTEGER) AS width,
             CAST(64 + (digest // 1024) % 1024 AS INTEGER) AS height
      FROM dec
    )
    SELECT doc_id, width, height,
           CAST((width * {RESIZE_TARGET}) // GREATEST(width, height) AS INTEGER)
             AS out_w,
           CAST((height * {RESIZE_TARGET}) // GREATEST(width, height) AS INTEGER)
             AS out_h
    FROM dims
    WHERE GREATEST(width, height) > {RESIZE_TARGET}
    """,
)
def multimodal_resize_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize planning for image-like payloads: derive dimensions from
    the payload digest, then fit-within-256 output dimensions with
    aspect preserved, only for images that need shrinking.

    The geometry is JVM-side integer expressions — the actual pixel
    resample would live inside the mapInPandas decode pass
    (``decode_ppm_batch``) at production; what Spark plans, schedules
    and checks here (dimension math, the needs-resize predicate, pure
    map stage) is identical either way.
    """
    d = load_tables(spark, sf_dir)["documents"]
    payload = F.col("text").cast("binary")
    digest = F.conv(F.substring(F.hex(payload), 1, 16), 16, 10).cast("decimal(38,0)")
    # only the low 20 digest bits matter; bring them into exact LONG
    # range first (decimal division would ROUND, not floor)
    low20 = (digest % F.lit(1048576)).cast("long")
    width = (F.lit(64) + (low20 % 1024)).cast("int")
    height = (F.lit(64) + F.floor(low20 / 1024) % 1024).cast("int")
    dims = d.select("doc_id", width.alias("width"), height.alias("height"))
    longest = F.greatest("width", "height")
    return (
        dims.filter(longest > RESIZE_TARGET)
        .select(
            "doc_id", "width", "height",
            F.floor(F.col("width") * RESIZE_TARGET / longest).cast("int").alias("out_w"),
            F.floor(F.col("height") * RESIZE_TARGET / longest).cast("int").alias("out_h"),
        )
    )


CHUNK_BYTES = 96       # chunk length (stands in for e.g. 30 s of audio)
CHUNK_STRIDE = 64      # hop — CHUNK_BYTES-CHUNK_STRIDE bytes of overlap


@register(
    "multimodal_chunk_overlap",
    # overlapping segmentation of an opaque payload (audio windows,
    # video GOPs, long-doc context chunks): chunk i covers
    # [i*stride, i*stride+len), last partial chunk kept; per-chunk
    # content hash proves byte-exact slicing on both engines.
    oracle=f"""
    WITH src AS (
      SELECT doc_id, text AS payload,
             octet_length(CAST(text AS BLOB)) AS n_bytes
      FROM documents WHERE doc_id % 8 = 0
    ), chunks AS (
      SELECT doc_id, n_bytes,
             CAST(t.i AS INT) AS chunk_idx,
             CAST(t.i * {CHUNK_STRIDE} AS BIGINT) AS start_byte,
             substring(payload, t.i * {CHUNK_STRIDE} + 1,
                       {CHUNK_BYTES}) AS chunk
      FROM src,
           LATERAL unnest(range(0,
             CAST(GREATEST((n_bytes - {CHUNK_BYTES} + {CHUNK_STRIDE} - 1)
                  // {CHUNK_STRIDE}, 0) + 1 AS BIGINT))) AS t(i)
    )
    SELECT doc_id, chunk_idx, start_byte,
           CAST(octet_length(CAST(chunk AS BLOB)) AS INT) AS chunk_bytes,
           md5(chunk) AS chunk_md5
    FROM chunks
    """,
)
def multimodal_chunk_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping chunk segmentation of an opaque binary payload —
    the windowing every audio/ASR and long-context pipeline runs
    (30 s windows with hop, video GOP splits, token-window chunking).
    Chunk i covers bytes [i·stride, i·stride+len); the final partial
    window is kept; the per-chunk md5 pins byte-exact slicing.

    Scale shape: pure map-side sequence-explode — zero shuffle, and
    the expansion factor is len/stride (bounded 1.5x here). The
    chunk count derives from the payload length in EXACT integer
    ceil-division; a real decoder swaps byte offsets for sample or
    frame offsets without touching the plan.
    """
    d = load_tables(spark, sf_dir)["documents"]
    src = d.where(F.col("doc_id") % 8 == 0).select(
        "doc_id",
        F.col("text").alias("payload"),
        F.octet_length(F.col("text").cast("binary")).alias("n_bytes"),
    )
    n_chunks = (
        F.greatest(
            F.expr(
                f"(n_bytes - {CHUNK_BYTES} + {CHUNK_STRIDE} - 1) "
                f"DIV {CHUNK_STRIDE}"
            ),
            F.lit(0),
        )
        + 1
    )
    chunks = src.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("i"),
        "payload",
    ).select(
        "doc_id",
        F.col("i").cast("int").alias("chunk_idx"),
        (F.col("i").cast("bigint") * CHUNK_STRIDE).alias("start_byte"),
        F.expr(
            f"substring(payload, i * {CHUNK_STRIDE} + 1, {CHUNK_BYTES})"
        ).alias("chunk"),
    )
    return chunks.select(
        "doc_id",
        "chunk_idx",
        "start_byte",
        F.octet_length(F.col("chunk").cast("binary"))
        .cast("int")
        .alias("chunk_bytes"),
        F.md5(F.col("chunk").cast("binary")).alias("chunk_md5"),
    )


@register(
    "multimodal_pair_integrity",
    # Pair-integrity audit for a two-modality corpus: captions
    # (documents) FULL OUTER joined to vectors (embeddings) on id;
    # every id classified paired / missing_embedding /
    # orphan_embedding, plus a dim check on the paired side. The
    # pre-training gate for any image-text style dataset: silent
    # modality drop-off is the classic multimodal data bug.
    oracle="""
    WITH j AS (
      SELECT d.doc_id, e.vec_id,
             CASE WHEN d.doc_id IS NOT NULL AND e.vec_id IS NOT NULL
                  THEN CASE WHEN len(e.embedding) = 64
                            THEN 'paired' ELSE 'paired_bad_dim' END
                  WHEN d.doc_id IS NOT NULL THEN 'missing_embedding'
                  ELSE 'orphan_embedding' END AS status
      FROM documents d FULL OUTER JOIN embeddings e ON e.vec_id = d.doc_id
    )
    SELECT status,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(COALESCE(doc_id, vec_id)) AS BIGINT) AS id_checksum
    FROM j GROUP BY status
    """,
)
def multimodal_pair_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Modality-pair integrity: before training on (caption, vector)
    pairs, audit the join — which captions have no embedding, which
    embeddings have no caption, and which pairs carry a wrong-dim
    vector. At sf0.1 the fixture itself exhibits the realistic
    failure (5,000 documents vs 2,000 embeddings: 3,000
    missing_embedding rows); at sf0.01 coverage is complete — the
    audit reports both truthfully.

    Scale shape: ONE full-outer hash join on the id + one hash agg on
    the status; the dim check is a map-side array length. The binary
    payload itself never moves — this is a manifest-grain audit,
    which is exactly how a petabyte multimodal store is checked.
    """
    d = load_tables(spark, sf_dir)["documents"].select("doc_id")
    e = load_tables(spark, sf_dir)["embeddings"].select(
        "vec_id", F.size("embedding").alias("dim")
    )
    j = d.join(e, d.doc_id == e.vec_id, "full_outer")
    status = (
        F.when(
            F.col("doc_id").isNotNull() & F.col("vec_id").isNotNull(),
            F.when(F.col("dim") == 64, "paired").otherwise("paired_bad_dim"),
        )
        .when(F.col("doc_id").isNotNull(), "missing_embedding")
        .otherwise("orphan_embedding")
    )
    return j.select(
        status.alias("status"), F.coalesce("doc_id", "vec_id").alias("id")
    ).groupBy("status").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("id").cast("bigint").alias("id_checksum"),
    )
