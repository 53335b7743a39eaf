"""§2.9 true Structured Streaming variants (E3 entry point).

The batch keys in batch_equiv.py are the hash-checked contract; this
module runs the SAME transformations incrementally over a file-source
stream of the events table, proving stream/batch equivalence (asserted
in tests/test_streaming.py with availableNow micro-batching).

Scale notes:
  - File source + ``maxFilesPerTrigger`` mimics a real append-only
    ingest; at cluster scale the same code points at a Kafka source.
  - Every stateful op carries a watermark so state is bounded:
    windows expire, dedup keys age out, join state is pruned to the
    1 h band. Unbounded state is the way streaming jobs die at scale.
  - ``applyInPandasWithState`` is the custom-stateful escape hatch
    (Arrow-batched); everything else is built-in incremental operators.
"""

from __future__ import annotations

import os
import shutil
import tempfile

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import StructType

from algebraicdb_spark.functions.rounding import pround, pround_py
from algebraicdb_spark.sources.catalog import ensure_confs, normalize_events

RAW_EVENTS_DDL = (
    "event_id bigint, ts bigint, user_id bigint, "
    "event_type string, value double, props string"
)


def stage_event_files(spark: SparkSession, sf_dir: str, n_files: int = 4) -> str:
    """Split the events fixture into n time-ordered files in a temp dir
    (simulates an append-only ingest directory; files arrive in order)."""
    ensure_confs(spark)
    out = os.path.join(
        tempfile.gettempdir(),
        f"adb_stream_src_{sf_dir.rstrip('/').replace('/', '_')}",
    )
    if os.path.isdir(out):
        shutil.rmtree(out)
    os.makedirs(out)
    raw = spark.read.parquet(f"{sf_dir.rstrip('/')}/events.parquet")
    # Stage with bigint-nanos ts regardless of fixture generation
    # (timestamp[us] or TIMESTAMP(NANOS)-as-long), so the stream schema
    # below is stable and normalize_events takes its exact-int path.
    raw = normalize_events(raw).select(
        "event_id", F.col("ts_ns").alias("ts"), "user_id",
        "event_type", "value", "props",
    )
    # Executor-side staging (no driver row transfer): range-partition on
    # ts so part-0000k holds the k-th contiguous time slice, written in
    # parallel.
    (
        raw.repartitionByRange(n_files, "ts")
        .sortWithinPartitions("ts")
        .write.mode("overwrite")
        .parquet(out)
    )
    # FileStreamSource ingests files in MODIFICATION-TIME order, and
    # parallel write tasks finish in arbitrary order — restamp mtimes
    # in path order (path order == ts-range order) so micro-batches
    # arrive time-ordered and watermarks never see artificial late
    # data. Metadata-only touch, O(n_files), no row transfer.
    import time as _time

    base = _time.time()
    for i, fname in enumerate(
        sorted(f for f in os.listdir(out) if f.endswith(".parquet"))
    ):
        path = os.path.join(out, fname)
        os.utime(path, (base + i, base + i))
    return out


def read_events_stream(spark: SparkSession, src_dir: str) -> DataFrame:
    """readStream over the staged directory via the ``StreamSource``
    seam (one file per micro-batch), normalized exactly like the
    batch catalog (ts µs + ts_ns)."""
    from algebraicdb_spark.streaming.sources import FileEventsSource, open_stream

    return open_stream(spark, FileEventsSource(src_dir))


def read_rate_stream(
    spark: SparkSession, rows_per_batch: int = 200, n_users: int = 50
) -> DataFrame:
    """NON-FILE streaming source via the seam: a deterministic
    ``rate-micro-batch`` generator mapped onto the events shape, so
    every transformation in this module runs unchanged over it. The
    Kafka-shaped path lives next to it as
    ``sources.KafkaEventsSource`` — same normalized output schema,
    nothing downstream changes."""
    from algebraicdb_spark.streaming.sources import RateEventsSource, open_stream

    return open_stream(
        spark, RateEventsSource(rows_per_batch=rows_per_batch, n_users=n_users)
    )


# ---- incremental transformations (same semantics as batch_equiv) ----

def tumbling_agg(events: DataFrame) -> DataFrame:
    return (
        events.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            pround(F.sum("value")).alias("sum_value"),
        )
        .select(
            F.unix_timestamp(F.col("w.start")).alias("window_start_s"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def session_agg(events: DataFrame) -> DataFrame:
    return (
        events.withWatermark("ts", "1 hour")
        .groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            pround(F.sum("value")).alias("sum_value"),
        )
        .select(
            "user_id",
            F.unix_micros(F.col("w.start")).alias("session_start_us"),
            "n_events",
            "sum_value",
        )
    )


def dedup_watermarked(events: DataFrame) -> DataFrame:
    """Streaming dedup on event_id with 1 h of dedup state."""
    return events.withWatermark("ts", "1 hour").dropDuplicates(["event_id"])


def stream_stream_join(clicks: DataFrame, purchases: DataFrame) -> DataFrame:
    """Watermarked stream-stream join: purchases within 1 h of a click."""
    c = (
        clicks.withWatermark("ts", "1 hour")
        .select(
            F.col("event_id").alias("click_id"), "user_id", F.col("ts").alias("c_ts")
        )
    )
    p = (
        purchases.withWatermark("ts", "2 hours")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
            "value",
        )
    )
    return c.join(
        p,
        (F.col("user_id") == F.col("p_user"))
        & (F.col("p_ts") >= F.col("c_ts"))
        & (F.col("p_ts") < F.col("c_ts") + F.expr("INTERVAL 1 HOUR")),
    ).select(
        "click_id",
        "purchase_id",
        "user_id",
        pround("value").alias("purchase_value"),
    )


def stream_stream_left_join(clicks: DataFrame, purchases: DataFrame) -> DataFrame:
    """LEFT OUTER watermarked stream-stream join: every click emits;
    unmatched clicks surface with NULL purchase columns only when the
    watermark passes the click's join-window upper bound (c_ts + 1 h)
    — Structured Streaming cannot emit an outer NULL earlier without
    risking a late match. Consequence pinned in the runtime test: an
    availableNow replay emits the unmatched rows whose windows the
    final watermark closed; clicks still inside the last open window
    stay buffered (they are NOT lost — a restart with more data
    resolves them), while the batch twin (`stream_stream_left_join`
    in batch_equiv) sees the whole timeline at once and emits every
    unmatched click."""
    c = clicks.withWatermark("ts", "1 hour").select(
        F.col("event_id").alias("click_id"), "user_id", F.col("ts").alias("c_ts")
    )
    p = purchases.withWatermark("ts", "2 hours").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
        "value",
    )
    return c.join(
        p,
        (F.col("user_id") == F.col("p_user"))
        & (F.col("p_ts") >= F.col("c_ts"))
        & (F.col("p_ts") < F.col("c_ts") + F.expr("INTERVAL 1 HOUR")),
        "leftOuter",
    ).select(
        "click_id",
        "purchase_id",
        "user_id",
        pround("value").alias("purchase_value"),
        F.when(F.col("purchase_id").isNull(), 1).otherwise(0).cast("int").alias(
            "unmatched"
        ),
        "c_ts",
    )


def stream_stream_full_join(clicks: DataFrame, purchases: DataFrame) -> DataFrame:
    """FULL OUTER watermarked stream-stream join — the family's last
    member: BOTH sides emit NULL-padded rows at watermark expiry. A
    click with no purchase surfaces once the watermark passes its join
    window's upper bound (c_ts + 1 h, same as the left join); a
    purchase with no click surfaces once the watermark passes its OWN
    event time (every matching click has c_ts ≤ p_ts, so nothing that
    could still arrive can match it). Until those bounds pass, rows
    stay buffered — Structured Streaming cannot emit an outer NULL
    earlier without risking a late match; the batch twin
    (`stream_stream_full_join_batch`, batch_equiv) sees the whole
    timeline and emits every unmatched row, which is exactly the
    terminal-watermark limit of this query."""
    c = clicks.withWatermark("ts", "1 hour").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"),
    )
    p = purchases.withWatermark("ts", "2 hours").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
        "value",
    )
    return c.join(
        p,
        (F.col("c_user") == F.col("p_user"))
        & (F.col("p_ts") >= F.col("c_ts"))
        & (F.col("p_ts") < F.col("c_ts") + F.expr("INTERVAL 1 HOUR")),
        "fullOuter",
    ).select(
        "click_id",
        "purchase_id",
        F.coalesce(F.col("c_user"), F.col("p_user")).alias("user_id"),
        pround("value").alias("purchase_value"),
        F.when(F.col("purchase_id").isNull(), 1).otherwise(0).cast("int").alias(
            "unmatched_click"
        ),
        F.when(F.col("click_id").isNull(), 1).otherwise(0).cast("int").alias(
            "unmatched_purchase"
        ),
        "c_ts",
        "p_ts",
    )


STATEFUL_OUTPUT_DDL = "event_id bigint, user_id bigint, user_seq int, running_value double"
STATEFUL_STATE_DDL = "seq int, total double"


def _running_counter(key, pdf_iter, state: GroupState):
    """Per-user running (sequence, value-sum) across micro-batches."""
    (user_id,) = key
    seq, total = state.get if state.exists else (0, 0.0)
    out = []
    for pdf in pdf_iter:
        pdf = pdf.sort_values(["ts_ns", "event_id"])
        for _, row in pdf.iterrows():
            seq += 1
            total += float(row["value"])
            out.append((int(row["event_id"]), int(user_id), seq, pround_py(total)))
    state.update((seq, total))
    yield pd.DataFrame(out, columns=["event_id", "user_id", "user_seq", "running_value"])


def stateful_running_counter(events: DataFrame) -> DataFrame:
    """Arbitrary stateful op: per-user event counter + running value sum
    via applyInPandasWithState (Arrow-batched, partitioned by user)."""
    return (
        events.filter(F.col("user_id") % 10 == 0)
        .groupBy("user_id")
        .applyInPandasWithState(
            _running_counter,
            outputStructType=STATEFUL_OUTPUT_DDL,
            stateStructType=STATEFUL_STATE_DDL,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def run_to_memory(
    stream_df: DataFrame, name: str, output_mode: str = "append", timeout: int = 120
) -> DataFrame:
    """Execute a streaming DF with availableNow and return the final
    in-memory result table (test/smoke harness)."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(timeout):
        # still running at the deadline: reading the memory table now
        # would return a silently partial result
        q.stop()
        raise TimeoutError(f"stream '{name}' still running after {timeout}s")
    spark = stream_df.sparkSession
    return spark.table(name)


# ---- transformWithStateInPandas (Spark 4 stateful API) ----------------

from pyspark.sql.streaming.stateful_processor import StatefulProcessor  # noqa: E402

TWS_OUTPUT_DDL = "user_id bigint, n_events bigint, total_value double"


class UserTotalsProcessor(StatefulProcessor):
    """Per-user running totals via the Spark 4 ``StatefulProcessor``
    API: ValueState in the state store, Arrow-batched input rows.
    Module-level class — the instance is pickled to the stateful
    Python worker. Update mode emits the user's CURRENT total each
    micro-batch; state size is bounded by user-key cardinality."""

    def init(self, handle) -> None:
        self._state = handle.getValueState("totals", "n bigint, total double")

    def handleInputRows(self, key, rows, timerValues):
        if self._state.exists():
            n, total = self._state.get()
        else:
            n, total = 0, 0.0
        for pdf in rows:
            n += len(pdf)
            total += float(pdf["value"].sum())
        self._state.update((n, total))
        (user_id,) = key
        yield pd.DataFrame(
            {
                "user_id": [int(user_id)],
                "n_events": [int(n)],
                "total_value": [pround_py(total)],
            }
        )

    def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
        return iter(())

    def close(self) -> None:
        pass


def stateful_totals_tws(events: DataFrame) -> DataFrame:
    """Per-user totals with transformWithStateInPandas (update mode)."""
    return (
        events.filter(F.col("user_id") % 10 == 0)
        .groupBy("user_id")
        .transformWithStateInPandas(
            UserTotalsProcessor(),
            outputStructType=TWS_OUTPUT_DDL,
            outputMode="Update",
            timeMode="None",
        )
    )


TWS_TIMER_OUTPUT_DDL = "user_id bigint, phase string, n_events bigint"


class IdleFinalizeProcessor(StatefulProcessor):
    """Timer-driven session finalization (the TTL/idle-expiry shape):
    every input batch refreshes a short processing-time timer; when a
    user goes idle past it, ``handleExpiredTimer`` emits a terminal
    'final' row and clears their state. The other half of the Spark 4
    stateful API that UserTotalsProcessor doesn't touch — state that
    CLEANS ITSELF UP, which is what makes unbounded-keyspace stateful
    pipelines shippable (abandoned keys cost nothing forever)."""

    def init(self, handle) -> None:
        self._handle = handle
        self._state = handle.getValueState("idle_n", "n bigint")

    def handleInputRows(self, key, rows, timerValues):
        n = self._state.get()[0] if self._state.exists() else 0
        for pdf in rows:
            n += len(pdf)
        self._state.update((n,))
        # arm an idle timer 1 ms out, so the NEXT micro-batch (test
        # harness: one file each) fires it; stale timers for a key
        # whose state was already finalized are no-ops (the expiry
        # handler checks state existence)
        self._handle.registerTimer(timerValues.getCurrentProcessingTimeInMs() + 1)
        (user_id,) = key
        yield pd.DataFrame(
            {"user_id": [int(user_id)], "phase": ["live"], "n_events": [int(n)]}
        )

    def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
        if self._state.exists():
            (n,) = self._state.get()
            self._state.clear()
            (user_id,) = key
            yield pd.DataFrame(
                {"user_id": [int(user_id)], "phase": ["final"], "n_events": [int(n)]}
            )

    def close(self) -> None:
        pass


def stateful_idle_finalize_tws(events: DataFrame) -> DataFrame:
    """Idle-expiry finalization with transformWithStateInPandas
    processing-time timers."""
    return (
        events.filter(F.col("user_id") % 10 == 0)
        .groupBy("user_id")
        .transformWithStateInPandas(
            IdleFinalizeProcessor(),
            outputStructType=TWS_TIMER_OUTPUT_DDL,
            outputMode="Update",
            timeMode="ProcessingTime",
        )
    )


SCD2_TWS_OUTPUT_DDL = (
    "user_id bigint, segment string, version bigint, "
    "valid_from_us bigint, valid_to_us bigint"
)


def scd2_fold(user_id, cur, batch):
    """Fold one micro-batch of a user's events into SCD2 state: sort
    by (ts_us, event_id), close an interval on every segment change.
    Returns (closed_rows, new_open_row). Pure pandas — unit-testable
    without a state store, and the exact logic Scd2Processor runs."""
    out: list[tuple[int, str, int, int, int]] = []
    batch = batch.sort_values(["ts_us", "event_id"])
    for seg, ts_us in zip(batch["event_type"], batch["ts_us"]):
        if cur is None:
            cur = (str(seg), 1, int(ts_us))
        elif seg != cur[0]:
            out.append((user_id, cur[0], cur[1], cur[2], int(ts_us)))
            cur = (str(seg), cur[1] + 1, int(ts_us))
    return out, cur


class Scd2Processor(StatefulProcessor):
    """Streaming SCD type-2 build: per-user ValueState carries the
    OPEN dimension row (segment, version, valid_from); every arriving
    change CLOSES it (emits the finished interval) and opens the
    next. The streaming twin of the batch ``scd2_history`` key — the
    closed intervals it emits must equal the batch build's
    ``is_current = 0`` rows exactly (pinned in test_streaming.py),
    with state carried across micro-batch boundaries.

    State per key is ONE row regardless of history length — this is
    why SCD2 is streamable at unbounded key cardinality: the closed
    intervals leave the state store the moment they're final."""

    def init(self, handle) -> None:
        self._state = handle.getValueState(
            "open_row", "segment string, version bigint, valid_from bigint"
        )

    def handleInputRows(self, key, rows, timerValues):
        cur = self._state.get() if self._state.exists() else None
        (user_id,) = key
        pdfs = [pdf for pdf in rows]
        out: list[tuple[int, str, int, int, int]] = []
        if pdfs:
            batch = pd.concat(pdfs)
            out, cur = scd2_fold(int(user_id), cur, batch)
            self._state.update(cur)
        if out:
            yield pd.DataFrame(
                out,
                columns=[
                    "user_id",
                    "segment",
                    "version",
                    "valid_from_us",
                    "valid_to_us",
                ],
            )

    def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
        return iter(())

    def close(self) -> None:
        pass


def scd2_tws(events: DataFrame) -> DataFrame:
    """Streaming SCD2 via transformWithStateInPandas (append mode:
    each closed interval is emitted exactly once, when it closes)."""
    return (
        events.select(
            "user_id",
            "event_type",
            F.unix_micros("ts").alias("ts_us"),
            "event_id",
        )
        .groupBy("user_id")
        .transformWithStateInPandas(
            Scd2Processor(),
            outputStructType=SCD2_TWS_OUTPUT_DDL,
            outputMode="Append",
            timeMode="None",
        )
    )


def run_to_parquet(
    stream_df: DataFrame, out_dir: str, checkpoint_dir: str, timeout: int = 120
) -> None:
    """One availableNow pass to a parquet sink with an EXPLICIT
    checkpoint — call again (with a freshly built stream) after new
    source files land to simulate a stop/restart: source offsets and
    operator state both resume from the checkpoint, which is the
    recovery contract a production stateful job runs on."""
    q = (
        stream_df.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(timeout):
        # a timed-out query is still RUNNING and still holds the
        # checkpoint — proceeding would race it (stale source reads,
        # concurrent-writer checkpoint conflicts). Fail loudly.
        q.stop()
        raise TimeoutError(f"stream to {out_dir} still running after {timeout}s")


# ---- streaming incremental dedup (TWS) --------------------------------

DEDUP_TWS_OUTPUT_DDL = "doc_id bigint, status string"


def stage_document_files(
    spark: SparkSession, sf_dir: str, split: int, out_dir: str | None = None
) -> str:
    """Split the documents fixture into two ingest files — doc_id <
    ``split`` (the standing corpus) then the rest (the new batch) —
    in a temp dir with mtimes ordered so FileStreamSource replays them
    as two micro-batches in that order. Each half is a filtered write
    (the boundary must be exact: the dedup twin's statuses depend on
    it), then moved into the stream dir under an ordered name.

    Pass ``out_dir`` for an isolated directory (a test that mutates
    the staged files, parallel runners); the default fixed path is
    shared per (split, sf_dir) across sequential callers."""
    ensure_confs(spark)
    out = out_dir or os.path.join(
        tempfile.gettempdir(),
        f"adb_docs_src_{split}_{sf_dir.rstrip('/').replace('/', '_')}",
    )
    if os.path.isdir(out):
        shutil.rmtree(out)
    os.makedirs(out)
    docs = spark.read.parquet(f"{sf_dir.rstrip('/')}/documents.parquet").select(
        "doc_id", "text"
    )
    import time as _time

    base = _time.time()
    halves = (
        docs.filter(F.col("doc_id") < split),
        docs.filter(F.col("doc_id") >= split),
    )
    for i, half in enumerate(halves):
        stage = os.path.join(out, f"_stage{i}")
        half.coalesce(1).write.mode("overwrite").parquet(stage)
        (part,) = [f for f in os.listdir(stage) if f.endswith(".parquet")]
        dst = os.path.join(out, f"batch{i}.parquet")
        shutil.move(os.path.join(stage, part), dst)
        shutil.rmtree(stage)
        os.utime(dst, (base + i, base + i))
    return out


def read_documents_stream(spark: SparkSession, src_dir: str) -> DataFrame:
    """readStream over a staged documents ingest directory via the
    ``StreamSource`` seam (one file per micro-batch)."""
    from algebraicdb_spark.streaming.sources import (
        FileDocumentsSource,
        open_stream,
    )

    return open_stream(spark, FileDocumentsSource(src_dir))


class IncrementalDedupProcessor(StatefulProcessor):
    """Streaming incremental dedup: keyed by content fingerprint, ONE
    ValueState row per UNIQUE fingerprint ('seen in a prior batch').
    Every row of a micro-batch whose fp is already in state is
    'dup_of_corpus'; within the first batch to carry an fp, the lowest
    doc_id is 'fresh' and the rest are 'dup_in_batch' — exactly the
    batch ``incremental_dedup_classify`` rule, folded associatively
    across micro-batches by the state store. State grows with unique
    content only — the same bound as the batch key's persisted
    fingerprint state, which is what keeps ingest-time dedup
    streamable over an unbounded corpus."""

    def init(self, handle) -> None:
        self._state = handle.getValueState("seen", "n bigint")

    def handleInputRows(self, key, rows, timerValues):
        doc_ids = sorted(int(x) for pdf in rows for x in pdf["doc_id"].tolist())
        if not doc_ids:
            return
        if self._state.exists():
            statuses = ["dup_of_corpus"] * len(doc_ids)
            n = int(self._state.get()[0]) + len(doc_ids)
        else:
            statuses = ["fresh"] + ["dup_in_batch"] * (len(doc_ids) - 1)
            n = len(doc_ids)
        self._state.update((n,))
        yield pd.DataFrame({"doc_id": doc_ids, "status": statuses})

    def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
        return iter(())

    def close(self) -> None:
        pass


LSH_TWS_OUTPUT_DDL = "doc_a bigint, doc_b bigint"


class LshBucketProcessor(StatefulProcessor):
    """Streaming MinHash-LSH candidate generation: keyed by
    (band_idx, band_hash), ListState holds the bucket's member doc
    ids. Each arriving doc pairs with every standing member (the
    cross-batch candidates) and with its batch-mates in the same
    bucket (the within-batch candidates) — together exactly the pairs
    the batch band self-join produces, so ingest-time near-dup checks
    see the same candidate set as a full-corpus recompute.

    State per key is the bucket's occupancy list, and ``max_bucket``
    makes the bound ENFORCED, not advisory: once a bucket holds that
    many members, further arrivals are dropped from it — no more state
    growth and no more pair fan-out from that key. A saturated bucket
    is a super-common band pattern carrying little dedup signal, so
    dropping it is the standard trade (the batch tier's DF cap,
    ``dedup.jaccard_pairs_capped``, prunes the same hazard by shingle
    frequency). Default None = exact parity with the batch self-join
    (pinned in tests)."""

    def __init__(self, max_bucket: int | None = None):
        self._max_bucket = max_bucket

    def init(self, handle) -> None:
        self._members = handle.getListState("members", "doc_id bigint")

    def handleInputRows(self, key, rows, timerValues):
        new_ids = sorted({int(x) for pdf in rows for x in pdf["doc_id"].tolist()})
        if not new_ids:
            return
        old_ids = [int(r[0]) for r in self._members.get()]
        if self._max_bucket is not None:
            room = self._max_bucket - len(old_ids)
            if room <= 0:
                return
            new_ids = new_ids[:room]
        pairs = [
            (min(o, n), max(o, n)) for n in new_ids for o in old_ids if o != n
        ]
        pairs += [
            (new_ids[i], new_ids[j])
            for i in range(len(new_ids))
            for j in range(i + 1, len(new_ids))
        ]
        self._members.appendList([(n,) for n in new_ids])
        if pairs:
            yield pd.DataFrame(pairs, columns=["doc_a", "doc_b"])

    def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
        return iter(())

    def close(self) -> None:
        pass


def lsh_candidates_tws(docs: DataFrame, max_bucket: int | None = None) -> DataFrame:
    """Streaming near-dup candidate pairs: the map-side banded MinHash
    the batch tier uses (``dedup.minhash_banded`` — shingles,
    signatures, band hashes, all narrow expressions), then
    transformWithStateInPandas keyed on the band bucket. A pair that
    collides in several bands is emitted once per band (append mode);
    consumers dedup, as the batch tier's dropDuplicates does.
    ``max_bucket`` enforces the per-bucket occupancy/fan-out bound
    (see LshBucketProcessor)."""
    from algebraicdb_spark.operators.dedup import minhash_banded, shingle_tokens

    return (
        minhash_banded(shingle_tokens(docs))
        .groupBy("band_idx", "band_hash")
        .transformWithStateInPandas(
            LshBucketProcessor(max_bucket),
            outputStructType=LSH_TWS_OUTPUT_DDL,
            outputMode="Append",
            timeMode="None",
        )
    )


def near_dup_pairs_tws(
    docs: DataFrame,
    toks: DataFrame,
    max_bucket: int | None = None,
    dedup_horizon: str | None = None,
) -> DataFrame:
    """The full streaming near-dup tier: bucket-state LSH candidates
    (``lsh_candidates_tws``, ``max_bucket`` forwarded) reranked by
    exact shingle Jaccard via a STREAM-STATIC join against the corpus
    token table — the production shape, where the shingle store is a
    persisted lookup table the arriving batch joins
    (``dedup.minhash_rerank`` runs unchanged on the stream side).

    A pair that collides in several bands would otherwise pay the
    double-join + array Jaccard once PER band — and near-identical
    docs collide in the most bands — so candidates are deduped BEFORE
    the wide rerank. ``dedup_horizon`` is the state bound for that
    dedup (the same role ``max_bucket`` plays for bucket state):

    - ``None`` (default): plain stateful ``dropDuplicates`` — the
      pair-set state grows forever, but every re-collision is
      suppressed; exact parity with the batch tier (pinned in tests).
    - an interval string (e.g. ``"10 minutes"``): stamps candidates
      with their processing-time arrival, watermarks that column, and
      uses ``dropDuplicatesWithinWatermark`` — state is evicted once
      older than the horizon, so a pair re-colliding AFTER the
      horizon re-emits (consumers are idempotent on (doc_a, doc_b)
      anyway). This is the 100 TB setting: pair-dedup state becomes
      O(pairs per horizon) instead of O(pairs ever).

    Emits each (doc_a, doc_b, jaccard ≥ τ) once per horizon."""
    from algebraicdb_spark.operators.dedup import JACCARD_TAU, minhash_rerank

    raw_cands = lsh_candidates_tws(docs, max_bucket)
    if dedup_horizon is None:
        cands = raw_cands.dropDuplicates(["doc_a", "doc_b"])
    else:
        cands = (
            raw_cands.withColumn("arrival_ts", F.current_timestamp())
            .withWatermark("arrival_ts", dedup_horizon)
            .dropDuplicatesWithinWatermark(["doc_a", "doc_b"])
            .drop("arrival_ts")
        )
    return (
        minhash_rerank(cands, toks)
        .select("doc_a", "doc_b", "jaccard")
        .filter(F.col("jaccard") >= F.lit(JACCARD_TAU))
    )


def incremental_dedup_tws(docs: DataFrame) -> DataFrame:
    """Streaming twin of ``pipeline_incremental_dedup``: fingerprints
    computed map-side (the same md5-of-canonical-token-set as the
    batch key), then transformWithStateInPandas keyed on fp. Append
    mode — each doc's status is final the moment its batch commits."""
    from algebraicdb_spark.operators.pipeline import doc_fingerprints

    return (
        doc_fingerprints(docs)
        .groupBy("fp")
        .transformWithStateInPandas(
            IncrementalDedupProcessor(),
            outputStructType=DEDUP_TWS_OUTPUT_DDL,
            outputMode="Append",
            timeMode="None",
        )
    )


DEDUP_GATE_OUTPUT_DDL = "doc_id bigint, text string"


class DedupGateProcessor(StatefulProcessor):
    """Exact-dedup GATE for the composed streaming funnel: keyed by
    md5(canonical text) — the same grain as the batch funnel's
    ``GROUP BY ctext`` exact tier (NOT the coarser token-set fp the
    classify tier uses: docs sharing a token set but differing in
    order/multiplicity must stay distinct here). The first batch to
    carry a fingerprint passes its lowest doc_id through WITH its
    text (so downstream tiers can shingle it without rejoining a
    store); every later row of that fingerprint is swallowed. One
    bigint ValueState row per unique text — the same state bound as
    the classify tier."""

    def init(self, handle) -> None:
        self._seen = handle.getValueState("seen", "n bigint")

    def handleInputRows(self, key, rows, timerValues):
        best_id: int | None = None
        best_text = None
        n = 0
        for pdf in rows:
            for i, t in zip(pdf["doc_id"].tolist(), pdf["text"].tolist()):
                n += 1
                if best_id is None or int(i) < best_id:
                    best_id, best_text = int(i), t
        if best_id is None:
            return
        if self._seen.exists():
            self._seen.update((int(self._seen.get()[0]) + n,))
            return
        self._seen.update((n,))
        yield pd.DataFrame({"doc_id": [best_id], "text": [best_text]})

    def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
        return iter(())

    def close(self) -> None:
        pass


def dedup_funnel_tws(
    docs: DataFrame, toks: DataFrame, max_bucket: int | None = None
) -> DataFrame:
    """The COMPOSED streaming dedup funnel — the three pinned tiers as
    ONE streaming query, the ingest-time shape of the batch
    ``pipeline_dedup_funnel``:

        staged ingest → exact-dedup gate (text-grain TWS ValueState)
        → banded MinHash → LSH bucket state (TWS ListState, optional
        ``max_bucket``) → candidate dedup → stream-static exact-Jaccard
        rerank against the corpus token table → τ filter

    Output is an append-only union of typed rows, the lakehouse
    event-log pattern for a result that needs late retraction:
      - kind='fresh': a doc_id that passed the exact gate (tier-1
        survivor) the moment its batch committed;
      - kind='pair': a confirmed near-dup (doc_a keeps, doc_b drops).
    A doc emitted fresh may LATER lose to a pair — append mode cannot
    retract, so the final keep-set is a view over the sink:
    ``dedup_funnel_keep_set``. Parity with the batch funnel's tiers is
    pinned in tests/test_streaming.py.

    Note the gate subtree feeds both union branches; Structured
    Streaming instantiates one stateful gate operator PER branch
    (identical deterministic state twice). That doubles gate state —
    acceptable here because the composed query is the parity/e2e
    harness; a production deployment sinks the single-branch pair
    stream and derives fresh-set from the classify tier it already
    runs (see SCALE.md §5n)."""
    from algebraicdb_spark.operators.dedup import (
        JACCARD_TAU,
        canonical_text,
        minhash_banded,
        minhash_rerank,
        shingle_tokens,
    )

    fresh = (
        docs.select("doc_id", "text", F.md5(canonical_text("text")).alias("fp"))
        .groupBy("fp")
        .transformWithStateInPandas(
            DedupGateProcessor(),
            outputStructType=DEDUP_GATE_OUTPUT_DDL,
            outputMode="Append",
            timeMode="None",
        )
    )
    cands = (
        minhash_banded(shingle_tokens(fresh))
        .groupBy("band_idx", "band_hash")
        .transformWithStateInPandas(
            LshBucketProcessor(max_bucket),
            outputStructType=LSH_TWS_OUTPUT_DDL,
            outputMode="Append",
            timeMode="None",
        )
        .dropDuplicates(["doc_a", "doc_b"])
    )
    pairs = (
        minhash_rerank(cands, toks)
        .select("doc_a", "doc_b", "jaccard")
        .filter(F.col("jaccard") >= F.lit(JACCARD_TAU))
    )
    fresh_rows = fresh.select(
        F.lit("fresh").alias("kind"),
        "doc_id",
        F.lit(None).cast("bigint").alias("doc_a"),
        F.lit(None).cast("bigint").alias("doc_b"),
        F.lit(None).cast("double").alias("jaccard"),
    )
    pair_rows = pairs.select(
        F.lit("pair").alias("kind"),
        F.lit(None).cast("bigint").alias("doc_id"),
        "doc_a",
        "doc_b",
        "jaccard",
    )
    return fresh_rows.unionByName(pair_rows)


def dedup_funnel_keep_set(sink: DataFrame) -> DataFrame:
    """The keep-set view over a ``dedup_funnel_tws`` sink: tier-2
    survivors = fresh docs minus every confirmed near-dup loser.
    Plain batch ops over the append-only event log — one anti-join,
    doc-id grain."""
    fresh = sink.filter(F.col("kind") == "fresh").select("doc_id")
    drops = (
        sink.filter(F.col("kind") == "pair")
        .select(F.col("doc_b").alias("doc_id"))
        .distinct()
    )
    return fresh.join(drops, "doc_id", "left_anti")
