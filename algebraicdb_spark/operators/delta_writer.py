"""Standard-format Delta Lake WRITER — the interop twin of
``DeltaLogTable`` (txnlog.py), which round 9 proved can *read* tables
other systems maintain. This module closes the opposite gap the
round-9 verdict ranked first: a table built by THIS engine was, until
now, recorded in ``TxnLogTable``'s simplified private log, so no other
engine could consume it. ``DeltaTableWriter`` emits a real
``_delta_log`` per the public protocol spec
(https://github.com/delta-io/delta/blob/master/PROTOCOL.md):

- one NDJSON commit file per version, 20-digit zero-padded names, one
  action object per line;
- commit 0 carries ``protocol`` (minReaderVersion 1 / minWriterVersion
  2 — exactly the capabilities used, nothing advertised that isn't
  written) and ``metaData`` (stable table id, parquet format,
  ``schemaString`` = Spark StructType JSON, ``partitionColumns``);
- every data file becomes an ``add`` with a root-relative URL-encoded
  ``path``, ``partitionValues`` (hive-style string serialization,
  null for missing), ``size``, ``modificationTime``, ``dataChange``,
  and a ``stats`` JSON string with ``numRecords`` / ``minValues`` /
  ``maxValues`` / ``nullCount`` read from the parquet FOOTERS
  (O(KB of metadata), no data scanned — same as every real writer);
- OVERWRITE emits data-changing ``remove`` tombstones for the replaced
  live set plus the new adds, atomically in one commit;
- additive schema evolution re-emits ``metaData`` in the same commit,
  behind the same loud gate as ``TxnLogTable`` (drift without
  ``evolve_schema=True``, column removal, or retyping refuses);
- ``write_checkpoint`` materializes the folded state as a classic
  single-file ``<v>.checkpoint.parquet`` (one action per row, struct
  columns) plus the ``_last_checkpoint`` pointer, optionally cleaning
  the compacted JSON prefix per retention — after which a reader MUST
  start from the checkpoint, which is exactly what the round-trip
  tests prove ``DeltaLogTable`` does.

Concurrency is Delta's own: the commit publish is a create-exclusive
write of the next version file; a racing writer loses with
``ConcurrentWriteError`` and rebases (on S3-class stores real
deployments route this through a commit service / conditional put —
the same deployment seam as ``TxnLogTable._publish``).

Proof of interop is structural: every round-trip test reads the
written table back through ``DeltaLogTable`` — the reader built and
validated against HAND-WRITTEN protocol fixtures and the published
action schema, never against this writer — so agreement between the
two is evidence both sides speak the spec, not that they share bugs.

Scale shape: identical to every Delta client — commits are O(files in
the commit) KB-sized driver-side JSON, stats ride footer metadata,
data files are written once by a distributed Spark job and never
rewritten by commit bookkeeping; the checkpoint is O(live files) rows
written driver-side via pyarrow (real writers use a Spark job for
million-file tables — the same rows, distributed).
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid
from urllib.parse import quote

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructField, StructType

from algebraicdb_spark.operators.txnlog import (
    ConcurrentWriteError,
    DeltaLogTable,
    SchemaEvolutionError,
    _cm_id_write_type,
    _cm_phys_type,
    _hive_partition_values,
    _schema_fields,
    parse_schema_string,
)

_EMPTY_ST = StructType([])


def _file_stats_json(fpath: str) -> str:
    """Delta's per-file ``stats`` string, from the parquet footer:
    numRecords always; min/max/nullCount per leaf column whose stats
    are present and JSON-native (int/float/str — bool and binary
    don't order usefully for skipping and bloat the log). A column
    with any statless row group is dropped from min/max (absent stats
    mean "cannot prune", never "prune wrongly") but keeps nullCount
    when complete."""
    import pyarrow.parquet as pq

    md = pq.ParquetFile(fpath).metadata
    mins: dict = {}
    maxs: dict = {}
    nulls: dict = {}
    dead: set[str] = set()
    null_dead: set[str] = set()
    for rg in range(md.num_row_groups):
        for i in range(md.num_columns):
            c = md.row_group(rg).column(i)
            name = c.path_in_schema
            st = c.statistics
            if st is None:
                dead.add(name)
                null_dead.add(name)
                continue
            if st.null_count is None:
                null_dead.add(name)
            else:
                nulls[name] = nulls.get(name, 0) + st.null_count
            if (
                not st.has_min_max
                or not isinstance(st.min, (int, float, str))
                or isinstance(st.min, bool)
            ):
                dead.add(name)
                continue
            if name not in mins or st.min < mins[name]:
                mins[name] = st.min
            if name not in maxs or st.max > maxs[name]:
                maxs[name] = st.max
    doc: dict = {"numRecords": md.num_rows}
    doc["minValues"] = {k: v for k, v in mins.items() if k not in dead}
    doc["maxValues"] = {k: v for k, v in maxs.items() if k not in dead}
    doc["nullCount"] = {k: v for k, v in nulls.items() if k not in null_dead}
    return json.dumps(doc)


class DeltaTableWriter:
    """Write a table OTHER Delta engines can consume. Reads of our own
    output go through ``DeltaLogTable`` — one reader for external and
    self-written tables, which is the round-trip the format exists for."""

    def __init__(self, path: str):
        self.path = path
        self.log_dir = os.path.join(path, "_delta_log")
        os.makedirs(self.log_dir, exist_ok=True)

    # -- read-side delegation -------------------------------------------

    def reader(self) -> DeltaLogTable:
        return DeltaLogTable(self.path)

    def latest_version(self) -> int:
        return self.reader().latest_version()

    def snapshot(self, spark: SparkSession, as_of: int | None = None):
        return self.reader().snapshot(spark, as_of)

    def live_paths(self, as_of: int | None = None) -> list[str]:
        return self.reader().live_paths(as_of)

    def table_schema(self, as_of: int | None = None):
        """StructType (or None) — the reader's pinned schema; lets the
        engine's post-mutation re-registration treat both writable
        formats uniformly."""
        return self.reader().table_schema(as_of)

    # -- commit primitives ------------------------------------------------

    def _publish(self, version: int, actions: list[dict]) -> None:
        """Create-exclusive publish — the same atomicity primitive as
        ``TxnLogTable._publish``, in Delta's on-disk dialect: NDJSON,
        one action per line, 20-digit version names."""
        target = os.path.join(self.log_dir, f"{version:020d}.json")
        doc = "\n".join(json.dumps(a) for a in actions) + "\n"
        try:
            with open(target, "x") as f:
                f.write(doc)
        except FileExistsError as exc:
            raise ConcurrentWriteError(
                f"delta version {version} already committed by another "
                "writer — rebase on the new snapshot and retry"
            ) from exc

    def _cm_of(self, meta: dict | None) -> dict[str, str] | None:
        """logical → physical column mapping from a metaData's pinned
        schemaString ('name' OR 'id' mode), None when unmapped — the
        writer-side twin of the reader's ``_mapping_for`` lookup,
        reading the SAME metadata so stage-rename and scan-rename can
        never disagree. For 'id' mode the returned ``_IdMapping``
        additionally makes ``_stage`` stamp each column's
        ``parquet.field.id`` into the staged footers — a file this
        writer stages must be matchable by the very ids the mode says
        readers resolve by."""
        from algebraicdb_spark.operators.txnlog import (
            _cm_id_mapping,
            _cm_mapping,
        )

        conf = (meta or {}).get("configuration") or {}
        if isinstance(conf, list):
            conf = dict(conf)
        mode = conf.get("delta.columnMapping.mode")
        if mode not in ("name", "id"):
            return None
        st = parse_schema_string(
            (meta or {}).get("schemaString"), self.path
        )
        return _cm_mapping(st) if mode == "name" else _cm_id_mapping(st)

    @staticmethod
    def _constraints_of(meta: dict | None) -> list[tuple[str, str]]:
        """Declared CHECK constraints: (name, SQL expression) from the
        ``delta.constraints.<name>`` configuration keys."""
        conf = (meta or {}).get("configuration") or {}
        if isinstance(conf, list):
            conf = dict(conf)
        pre = "delta.constraints."
        return sorted(
            (k[len(pre):], str(v))
            for k, v in conf.items()
            if k.startswith(pre)
        )

    def _generated_of(self, meta: dict | None) -> list[tuple]:
        """Declared GENERATED columns: (name, generation expression,
        declared type) from each field's
        ``delta.generationExpression`` metadata."""
        st = parse_schema_string(
            (meta or {}).get("schemaString"), self.path
        )
        out = []
        for f in (st.fields if st else []):
            e = (f.metadata or {}).get("delta.generationExpression")
            if e:
                out.append((f.name, str(e), f.dataType))
        return out

    def _apply_generated(self, df: DataFrame, meta: dict | None):
        """Compute ABSENT generated columns into an incoming batch —
        what lets `INSERT (other_cols)` work on a table whose
        partition date is `GENERATED ALWAYS AS (CAST(ts AS DATE))`.
        Present columns pass through and are VALIDATED instead
        (``_enforce_invariants``) — recomputing over an explicit
        value would silently discard what the caller wrote."""
        from pyspark.sql import functions as F

        for name, e, dt in self._generated_of(meta):
            if name not in df.columns:
                df = df.withColumn(name, F.expr(e).cast(dt))
        return df

    def _recompute_generated(self, df: DataFrame, meta: dict | None):
        """Re-derive every generated column from the row's (possibly
        just-updated) source values — UPDATE/MERGE postimage
        semantics: when a source column changes, the generated column
        follows. Deterministic expressions leave untouched rows
        bit-identical."""
        from pyspark.sql import functions as F

        for name, e, dt in self._generated_of(meta):
            df = df.withColumn(name, F.expr(e).cast(dt))
        return df

    def _enforce_invariants(
        self, df: DataFrame, meta: dict | None, mutation: str
    ) -> None:
        """ONE probe pass over the rows about to land: every declared
        CHECK constraint (violated iff the expression is FALSE — null
        satisfies, per SQL) and every PRESENT generated column's
        consistency with its expression (null-safe equality). The
        first violating row aborts the commit BEFORE any action
        publishes; the probe is one scan with limit(1), not one scan
        per rule."""
        from pyspark.sql import functions as F

        checks: list[tuple[str, object]] = []
        for name, expr in self._constraints_of(meta):
            checks.append((
                f"CHECK constraint {name} ({expr})",
                ~F.coalesce(F.expr(expr).cast("boolean"), F.lit(True)),
            ))
        for name, e, dt in self._generated_of(meta):
            if name in df.columns:
                checks.append((
                    f"generated column {name} = {e}",
                    ~F.col(name).eqNullSafe(F.expr(e).cast(dt)),
                ))
        if not checks:
            return
        hit = (
            df.select(
                F.array_compact(F.array(*[
                    F.when(cond, F.lit(label)) for label, cond in checks
                ])).alias("__viol")
            )
            .where(F.size("__viol") > 0)
            .limit(1)
            .collect()
        )
        if hit:
            raise ValueError(
                f"{mutation} on {self.path}: a row violates "
                f"{hit[0]['__viol'][0]} — refused before any action "
                "landed"
            )

    def _gate_generated_assignments(
        self, assignments: dict | None, meta: dict | None, mutation: str
    ) -> None:
        """Direct assignment to a generated or identity column
        refuses — a generated column's value is DEFINED by its
        expression (postimages recompute from the updated sources);
        an identity column's values are writer-allocated and
        reassigning them would corrupt the high-water mark."""
        if not assignments:
            return
        gen = {n for n, _e, _t in self._generated_of(meta)}
        bad = sorted(gen & set(assignments))
        if bad:
            raise ValueError(
                f"{mutation} on {self.path}: column(s) {bad} are "
                "GENERATED — their values derive from their "
                "expressions; assign the source columns instead"
            )
        ident = {i[0] for i in self._identity_of(meta)}
        bad_i = sorted(ident & set(assignments))
        if bad_i:
            raise ValueError(
                f"{mutation} on {self.path}: column(s) {bad_i} are "
                "IDENTITY — their values are writer-allocated; "
                "reassigning them would corrupt the high-water mark"
            )

    def _identity_of(self, meta: dict | None) -> list[tuple]:
        """Declared IDENTITY columns: (name, start, step,
        allowExplicitInsert, highWaterMark-or-None) from each field's
        ``delta.identity.*`` metadata. Identity columns are BIGINT by
        the protocol; other types refuse at use."""
        st = parse_schema_string(
            (meta or {}).get("schemaString"), self.path
        )
        out = []
        for f in (st.fields if st else []):
            md = f.metadata or {}
            if not any(k.startswith("delta.identity.") for k in md):
                continue
            hw = md.get("delta.identity.highWaterMark")
            out.append((
                f.name,
                int(md.get("delta.identity.start", 1)),
                int(md.get("delta.identity.step", 1)),
                str(md.get("delta.identity.allowExplicitInsert", False))
                .lower() == "true",
                int(hw) if hw is not None else None,
                f.dataType,
            ))
        return out

    def _apply_identity(
        self, df: DataFrame, meta: dict | None, mutation: str
    ):
        """Allocate ABSENT identity columns and derive the commit's
        high-water-mark advances: generated values are
        ``hw + step·(monotonic_id + 1)`` — per-partition allocation
        with GAPS, exactly what distributed identity implementations
        produce (the protocol only demands step-direction monotonicity
        past the recorded mark, never contiguity). The frame is
        localCheckpointed once so the mark aggregation and the staged
        write see the SAME nondeterministic ids. Explicit values are
        legal only under ``allowExplicitInsert`` (GENERATED BY
        DEFAULT) and extend the mark too. Returns (df, {col: new
        high-water mark})."""
        from pyspark.sql import functions as F
        from pyspark.sql.types import LongType

        idents = self._identity_of(meta)
        if not idents:
            return df, {}
        generated = False
        for name, start, step, allow, hw, dt in idents:
            if step == 0:
                raise ValueError(
                    f"{self.path}: identity column {name} declares "
                    "step 0 — no value sequence exists"
                )
            if not isinstance(dt, LongType):
                raise NotImplementedError(
                    f"{self.path}: identity column {name} is declared "
                    f"{dt.simpleString()} — the protocol defines "
                    "identity over BIGINT only"
                )
            if name in df.columns:
                if not allow:
                    raise ValueError(
                        f"{mutation} on {self.path}: identity column "
                        f"{name} is GENERATED ALWAYS "
                        "(allowExplicitInsert=false) — explicit "
                        "values refuse; omit the column"
                    )
            else:
                base = hw if hw is not None else start - step
                df = df.withColumn(
                    name,
                    (F.lit(base)
                     + (F.monotonically_increasing_id() + F.lit(1))
                     * F.lit(step)).cast("long"),
                )
                generated = True
        if generated:
            # the allocated column lands LAST — realign to the
            # declared order so the schema gate sees the table shape
            st = parse_schema_string(
                (meta or {}).get("schemaString"), self.path
            )
            if st and set(df.columns) == {f.name for f in st.fields}:
                df = df.select(*[f.name for f in st.fields])
            df = df.localCheckpoint()
        aggs = []
        for name, _s, step, _a, _hw, _dt in idents:
            if name in df.columns:
                fn = F.max if step > 0 else F.min
                aggs.append(fn(F.col(name)).alias(name))
        hw_updates: dict[str, int] = {}
        if aggs:
            row = df.agg(*aggs).collect()[0]
            for name, _s, step, _a, hw, _dt in idents:
                if name not in df.columns:
                    continue
                ext = row[name]
                if ext is None:
                    continue  # empty batch / all-null explicit
                new_hw = (
                    int(ext) if hw is None
                    else (max(hw, int(ext)) if step > 0
                          else min(hw, int(ext)))
                )
                if new_hw != hw:
                    hw_updates[name] = new_hw
        return df, hw_updates

    def _identity_meta_patch(
        self,
        cur_meta: dict | None,
        meta_actions: list[dict],
        parts: list[str],
        hw_updates: dict[str, int],
    ) -> list[dict]:
        """Fold the commit's high-water-mark advances into its
        metaData action — patching the one the schema gate already
        emitted, else minting one from the CURRENT schema doc patched
        in place (every other field property — physicalNames, ids,
        generation expressions — carries verbatim). The mark rides
        the SAME commit as the rows it covers: a crash between them
        is impossible by construction."""
        if not hw_updates:
            return meta_actions
        src = (
            meta_actions[0]["metaData"]["schemaString"]
            if meta_actions
            else (cur_meta or {}).get("schemaString")
        )
        doc = json.loads(src)
        for f in doc.get("fields", []):
            if f.get("name") in hw_updates:
                md = dict(f.get("metadata") or {})
                md["delta.identity.highWaterMark"] = (
                    hw_updates[f["name"]]
                )
                f["metadata"] = md
        sj = json.dumps(doc)
        if meta_actions:
            meta_actions[0]["metaData"]["schemaString"] = sj
            return meta_actions
        return [self._evolved_meta(cur_meta, sj, list(parts))]

    def _stage(
        self,
        df: DataFrame,
        partition_by: list[str] | tuple = (),
        mapping: dict[str, str] | None = None,
        subdir: str = "",
    ) -> list[tuple[str, dict]]:
        """Write the batch's parquet into the table directory (under
        hive-style partition dirs when partitioned) and return
        (root-relative path, partitionValues) per file. Staged files
        are invisible until the commit publishes — the log, not the
        directory listing, defines the table. ``mapping`` renames the
        batch's LOGICAL columns to their PHYSICAL parquet names before
        the write (column-mapped tables, 'name' mode) — the footer
        stats then key on physical names too, which is what the
        protocol's stats contract expects under column mapping.
        ``subdir`` stages under a table-root subdirectory and is
        REFLECTED in the returned relative paths — the ``_change_data``
        staging for CDF commits (whose ``cdc`` actions record
        root-relative paths, same as adds)."""
        restore_field_id = None
        if mapping:
            # 'id'-mode tables ALSO stamp each column's field id into
            # the staged parquet footers (Spark's parquet.field.id
            # schema metadata + fieldId writes) — the staged file must
            # be matchable by the ids the mode says readers resolve by.
            # The conf is restored right after the (eager) write below
            # — it must not leak to the session's unrelated writes.
            ids = getattr(mapping, "ids", None)
            if ids:
                _sess = df.sparkSession
                _key = "spark.sql.parquet.fieldId.write.enabled"
                _prior = _sess.conf.get(_key, None)
                _sess.conf.set(_key, "true")

                def restore_field_id() -> None:
                    if _prior is None:
                        _sess.conf.unset(_key)
                    else:
                        _sess.conf.set(_key, _prior)

            # recursive rename to the PHYSICAL twin (round 14 —
            # nested structs included): the pinned logical schema
            # rides on the mapping (``mapping.st``); a column whose
            # type contains structs positionally casts to the
            # physical/id-write twin, flat columns alias-rename as
            # before. Extra columns outside the schema (a cdc frame's
            # _change_type) pass through under their own name.
            st_by_name = {
                f.name: f
                for f in (getattr(mapping, "st", None) or _EMPTY_ST).fields
            }
            sel = []
            write_fields = []
            for c in df.columns:
                f = st_by_name.get(c)
                if f is None:
                    sel.append(df[c])
                    write_fields.append(
                        StructField(c, df.schema[c].dataType, True)
                    )
                    continue
                twin = (
                    _cm_id_write_type(f.dataType)
                    if ids else _cm_phys_type(f.dataType)
                )
                col = df[c]
                if twin != f.dataType:
                    col = col.cast(twin)
                sel.append(col.alias(
                    mapping.get(c, c),
                    metadata=(
                        {"parquet.field.id": ids[c]}
                        if ids and c in ids else {}
                    ),
                ))
                write_fields.append(StructField(
                    mapping.get(c, c), twin, f.nullable,
                    {"parquet.field.id": ids[c]}
                    if ids and c in ids else {},
                ))
            df = df.select(*sel)
            if ids and any(
                _cm_id_write_type(f.dataType) != _cm_phys_type(f.dataType)
                for f in st_by_name.values()
            ):
                # nested field ids: cast carries the twin's nested
                # metadata only partially across writers — ``to()``
                # pins the exact write schema (names, types AND
                # nested parquet.field.id metadata) the footer must
                # carry
                df = df.to(StructType(write_fields))
            # physical partition-dir names: the df is now in physical
            # space, so partitionBy must be too (add actions then key
            # partitionValues by physical name via the hive decode —
            # Delta's convention for mapped tables)
            partition_by = [mapping.get(c, c) for c in partition_by]
        tmp = os.path.join(self.path, f"_staging_{uuid.uuid4().hex}")
        try:
            w = df.write.mode("errorifexists")
            if partition_by:
                w = w.partitionBy(*list(partition_by))
            w.parquet(tmp)
        except BaseException:
            # a write that dies mid-flight leaves the half-written
            # staging dir behind — the log never references it and
            # vacuum's log-candidates rule would never reclaim it
            shutil.rmtree(tmp, ignore_errors=True)
            raise
        finally:
            if restore_field_id is not None:
                restore_field_id()
        staged: list[tuple[str, dict]] = []
        for dirpath, _dirs, files in os.walk(tmp):
            for fn in sorted(files):
                if not fn.endswith(".parquet"):
                    continue
                rel_dir = os.path.relpath(dirpath, tmp)
                pv: dict = {}
                if rel_dir == ".":
                    rel = fn
                else:
                    # hive layout decoded by the SAME helper as the
                    # txnlog staging path (txnlog._hive_partition_values)
                    pv = _hive_partition_values(rel_dir)
                    rel = os.path.join(rel_dir, fn)
                if subdir:
                    rel = os.path.join(subdir, rel)
                dest = os.path.join(self.path, rel)
                os.makedirs(os.path.dirname(dest), exist_ok=True)
                os.replace(os.path.join(dirpath, fn), dest)
                staged.append((rel, pv))
        shutil.rmtree(tmp)
        return staged

    def _unstage(self, staged: list[tuple[str, dict]]) -> None:
        """Remove staged-but-never-published files (gate refusal after
        staging, or an idempotent no-op discovered late): the log never
        references them, and vacuum's log-candidates-only rule means
        nothing else would ever reclaim them."""
        for rel, _pv in staged:
            p = os.path.join(self.path, rel)
            if os.path.exists(p):
                os.unlink(p)
            parent = os.path.dirname(p)
            # tidy a hive partition dir this staging created and
            # emptied (never the table root; non-empty dirs survive)
            if parent != self.path:
                try:
                    os.rmdir(parent)
                except OSError:
                    pass

    def _add_actions(
        self, staged: list[tuple[str, dict]], data_change: bool = True
    ) -> list[dict]:
        out = []
        for rel, pv in staged:
            full = os.path.join(self.path, rel)
            out.append({"add": {
                "path": quote(rel, safe="/"),
                "partitionValues": pv,
                "size": os.path.getsize(full),
                "modificationTime": int(os.path.getmtime(full) * 1000),
                "dataChange": data_change,
                "stats": _file_stats_json(full),
            }})
        return out

    @staticmethod
    def _cur_parts(cur_meta: dict | None) -> list[str]:
        return list((cur_meta or {}).get("partitionColumns") or [])

    def _meta_action(
        self,
        df: DataFrame,
        partition_by: list[str] | tuple,
        evolve: bool,
        cur_meta: dict | None = None,
        fetched: bool = False,
    ) -> list[dict]:
        """The ``metaData`` action this batch needs, behind the same
        gate as ``TxnLogTable._schema_actions``: first write records,
        identical schema records nothing, drift refuses unless opted
        into AND purely additive. The partition spec is pinned for the
        table's lifetime on the append path (changing it scrambles
        which values live in the log vs the files — Delta itself only
        allows it through a full overwrite, see ``overwrite``).

        ``cur_meta``/``fetched`` let hot-path callers (the per-
        micro-batch sink commit) pass an already-folded metaData
        instead of paying another full log fold; the current schema
        comes from cur_meta's own schemaString — one fold serves the
        whole gate."""
        if not fetched:
            _proto, cur_meta = self.reader()._protocol_meta()
        new_schema = df.schema.json()
        new_parts = list(partition_by)
        if not cur_meta:
            return [self._fresh_meta(new_schema, new_parts)]
        cur_parts = self._cur_parts(cur_meta)
        if cur_parts != new_parts:
            raise SchemaEvolutionError(
                f"append partition spec {new_parts} differs from the "
                f"table's {cur_parts} — the partition layout is pinned; "
                "use overwrite() to re-partition the table"
            )
        cur_schema = cur_meta.get("schemaString")
        if not cur_schema or not json.loads(cur_schema).get("fields"):
            # no parseable schema recorded (not a state this writer
            # produces — "{}" fixtures); record ours
            return [self._evolved_meta(cur_meta, new_schema, new_parts)]
        old_f, new_f = _schema_fields(cur_schema), _schema_fields(new_schema)
        if old_f == new_f and list(old_f) == list(new_f):
            return []
        if self._cm_of(cur_meta):
            # evolving a mapped table means assigning the new column a
            # physical name + bumping maxColumnId — and re-recording
            # the schema from the batch would drop every existing
            # physicalName; both are a full client's job
            raise SchemaEvolutionError(
                f"schema evolution on {self.path}: the table is "
                "column-mapped ('name' mode) — evolve it with a full "
                "Delta client"
            )
        missing = [c for c in old_f if c not in new_f]
        retyped = [c for c in old_f if c in new_f and new_f[c] != old_f[c]]
        if missing or retyped or not evolve:
            raise SchemaEvolutionError(
                f"batch schema drifted from the table's (missing="
                f"{missing}, retyped={retyped}, added="
                f"{[c for c in new_f if c not in old_f]}); only ADDITIVE "
                "evolution is supported, and it must be opted into with "
                "evolve_schema=True"
            )
        return [self._evolved_meta(cur_meta, new_schema, new_parts)]

    @staticmethod
    def _fresh_meta(schema_json: str, partition_by: list[str]) -> dict:
        return {"metaData": {
            "id": str(uuid.uuid4()),
            "format": {"provider": "parquet", "options": {}},
            "schemaString": schema_json,
            "partitionColumns": partition_by,
            "configuration": {},
            "createdTime": int(time.time() * 1000),
        }}

    @staticmethod
    def _evolved_meta(cur: dict, schema_json: str, partition_by: list[str]) -> dict:
        """Evolution keeps the table id STABLE — readers use it to
        detect replaced-table situations, so minting a new one per
        schema change would look like a different table."""
        meta = {
            "id": cur.get("id") or str(uuid.uuid4()),
            "format": cur.get("format") or {"provider": "parquet",
                                            "options": {}},
            "schemaString": schema_json,
            "partitionColumns": partition_by,
            "configuration": cur.get("configuration") or {},
        }
        if cur.get("createdTime") is not None:
            meta["createdTime"] = cur["createdTime"]
        return {"metaData": meta}

    @staticmethod
    def _protocol_action() -> dict:
        # advertise exactly the capabilities this writer uses: plain
        # parquet adds/removes/metaData (writer v2 = invariants-aware,
        # the floor modern clients expect), nothing feature-gated
        return {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}}

    # writer features this minimal client actually honors when a
    # table's protocol announces them (minWriterVersion 7): deletion
    # vectors are read, applied, unioned, and purged by every mutation
    # path; appendOnly is honored by REFUSING the mutations it forbids;
    # timestampNtz is just a type; vacuumProtocolCheck requires exactly
    # this check to run before vacuum; invariants/checkConstraints are
    # honored below only when no invariant/constraint is DECLARED —
    # enforcing declared ones needs an expression evaluator this
    # writer doesn't have, so those refuse.
    # changeDataFeed is honored by EMITTING the feed (round 13): every
    # data-changing mutation on a table with
    # delta.enableChangeDataFeed=true lands its row-level diff as
    # `_change_data/` parquet + `cdc` actions in the same commit
    # (_cdc_actions). generatedColumns / identityColumns are honored
    # while no such column is DECLARED — the declaration checks below
    # refuse the tables where the capability would actually bind.
    # v2Checkpoint is honored by WRITING the layout it mandates:
    # write_checkpoint emits the UUID-named main + sidecar shape on
    # tables announcing the feature (round 13, _write_checkpoint_v2);
    # ordinary commits are layout-neutral.
    _WRITER_FEATURES = {"deletionVectors", "appendOnly", "timestampNtz",
                        "vacuumProtocolCheck", "invariants",
                        "checkConstraints", "columnMapping",
                        "changeDataFeed", "generatedColumns",
                        "identityColumns", "v2Checkpoint"}

    def _check_writable(
        self, proto: dict, meta: dict, mutation: str,
        data_change: bool = True,
    ) -> None:
        """Refuse — loudly, before staging anything — writes a foreign
        table's protocol says we must not make blindly. The write twin
        of ``DeltaLogTable._check_readable``: an unknown writerFeature
        means commits must uphold semantics we'd silently break (e.g.
        row tracking assigns per-add metadata)."""
        conf = (meta or {}).get("configuration") or {}
        if isinstance(conf, list):
            conf = dict(conf)
        cm = conf.get("delta.columnMapping.mode")
        if cm not in (None, "", "none") and mutation != "VACUUM":
            # VACUUM is exempt: it unlinks unreferenced files and
            # never stages a parquet byte, so naming cannot corrupt it.
            # 'name' mode WRITES are supported (round 12): staging
            # renames logical → physical through the SAME mapping the
            # reader renames back by, for exactly the shapes the
            # reader supports — the reader's own gate runs here so
            # writer and reader can never disagree about what is
            # writable (total flat unpartitioned mapping). 'id' mode
            # WRITES are supported since round 13: staging
            # additionally stamps parquet field ids (_stage) and needs
            # the physicalName hints to name the staged columns — a
            # table whose schema omits them refuses (narrowed from the
            # round-12 blanket 'id' refusal).
            if cm == "name":
                self.reader()._check_name_mapping(meta)
            elif cm == "id":
                self.reader()._check_id_mapping(meta)
                st_cm = parse_schema_string(
                    (meta or {}).get("schemaString"), self.path
                )
                no_phys = (
                    self.reader()._cm_unmapped_fields(
                        st_cm, "delta.columnMapping.physicalName"
                    )
                    if st_cm is not None else []
                )
                if no_phys:
                    raise NotImplementedError(
                        f"{mutation} on {self.path}: 'id'-mode fields "
                        f"{no_phys} carry no physicalName — this "
                        "writer cannot choose physical column names "
                        "for staged files; use a full Delta client"
                    )
            else:
                raise NotImplementedError(
                    f"{mutation} on {self.path}: "
                    f"delta.columnMapping.mode={cm!r} is not a "
                    "protocol mode this writer understands; use a "
                    "full Delta client"
                )
        mwv = int((proto or {}).get("minWriterVersion", 1) or 1)
        feats = set((proto or {}).get("writerFeatures") or [])
        if mwv >= 7:
            unknown = sorted(feats - self._WRITER_FEATURES)
            if unknown:
                raise NotImplementedError(
                    f"{self.path}: protocol writerFeatures {unknown} are "
                    "not honored by this minimal writer — committing "
                    "anyway could silently break the table's invariants; "
                    "use a full Delta client"
                )
        elif mwv > 2 and mutation != "VACUUM":
            # Legacy writer versions 3..6 imply capabilities that are
            # all INTROSPECTABLE from metadata this writer already
            # reads, so the version number alone no longer refuses
            # (round 13): check constraints (v3+) are ENFORCED when
            # declared (round 14, _enforce_invariants); change data
            # feed (v4+) is honored by emitting `_change_data` + cdc
            # actions in every mutation commit (_cdc_actions);
            # generated columns (v4+) are honored (round 14 —
            # computed/validated/recomputed); identity columns (v6)
            # refuse below when DECLARED; column mapping
            # (v5) is gated above. VACUUM stays exempt: it unlinks
            # files no retained snapshot references and never stages a
            # parquet byte or commits an action; cdc/_change_data
            # files are never vacuum candidates here (candidates come
            # from add/remove actions).
            if mwv > 6:
                raise NotImplementedError(
                    f"{self.path}: legacy minWriterVersion={mwv} is "
                    "newer than this writer understands; use a full "
                    "Delta client"
                )
        if mutation != "VACUUM":
            # declaration-based capability checks — these bind at ANY
            # writer version (a v7 table announcing generatedColumns /
            # identityColumns passes the feature gate above; the
            # capability only constrains commits once a column is
            # actually declared, which is what's checked here)
            st_d = parse_schema_string(
                (meta or {}).get("schemaString"), self.path
            )
            # generated columns are HONORED since round 14: absent
            # columns compute at write (_apply_generated), present
            # ones validate (_enforce_invariants), postimages
            # recompute (_recompute_generated) — no gate needed here
            # identity columns are MAINTAINED on the ingest paths
            # since round 14 (_apply_identity: allocation + high-water
            # mark riding the same commit); UPDATE/MERGE carry values
            # and refuse only the unmaintainable shapes (assignment to
            # the column, MERGE INSERT) at their own entry points
        if data_change and mutation != "APPEND" and (
            "appendOnly" in feats
            or str(conf.get("delta.appendOnly", "")).lower() == "true"
        ):
            raise ValueError(
                f"{mutation} on {self.path}: the table is append-only "
                "(delta.appendOnly) — data-changing removes are "
                "forbidden by its own configuration"
            )
        # CHECK constraints are ENFORCED since round 14: every path
        # that lands new row content probes the declared expressions
        # before publishing (_enforce_invariants) — declaring them no
        # longer refuses

    def enable_deletion_vectors(
        self,
        max_retries: int = 8,
        extra_props: dict[str, str] | None = None,
    ) -> int | None:
        """Commit the protocol upgrade that lets DELETEs write
        merge-on-read deletion vectors instead of rewriting files:
        minReader 3 / minWriter 7 with the deletionVectors feature in
        BOTH lists plus the table config flag, per PROTOCOL.md. Every
        capability the table already announced carries forward —
        readers of the v<N skip the feature until a DV actually lands.
        No-op (returns None) when already enabled.

        ``extra_props`` fold into the SAME metaData commit (already
        validated by the caller): a SET TBLPROPERTIES statement that
        enables DVs plus other keys must land in ONE version — two
        commits would leave the statement half-applied (with the
        irreversible protocol upgrade already committed) if a crash
        or retry exhaustion hit between them."""
        for _ in range(max_retries):
            rdr = self.reader()
            # pin the head FIRST and derive protocol/metaData AT it —
            # reading them at an unpinned head and then re-reading
            # latest_version() for the slot opens a lost-update window
            # (a racer's commit between the reads is overwritten by
            # the stale metaData we re-commit, with no slot collision
            # to force the retry)
            head = rdr.latest_version()
            proto, meta = rdr._protocol_meta(head if head >= 0 else None)
            feats_w = set(proto.get("writerFeatures") or [])
            if "deletionVectors" in feats_w:
                return None
            upgraded = self._dv_upgraded_protocol(proto)
            self._check_writable(
                {**proto, "minWriterVersion": 7,
                 "writerFeatures": upgraded["protocol"]["writerFeatures"]},
                meta, "ALTER",
                data_change=False,
            )
            if extra_props and not meta:
                raise ValueError(
                    f"SET PROPERTIES on {self.path}: table has no "
                    "metaData to carry the configuration — append a "
                    "first batch"
                )
            actions = [
                self._commit_info(
                    "SET TBLPROPERTIES",
                    properties={"delta.enableDeletionVectors": "true",
                                **(extra_props or {})},
                ),
                upgraded,
            ]
            if meta:
                conf = meta.get("configuration") or {}
                if isinstance(conf, list):
                    conf = dict(conf)  # pyarrow MAP columns → [(k, v)]
                conf = dict(conf)
                conf["delta.enableDeletionVectors"] = "true"
                for k, v in (extra_props or {}).items():
                    if v in (None, ""):
                        conf.pop(k, None)
                    else:
                        conf[k] = str(v)
                # checkpoint-sourced metaData rows surface parquet
                # nulls for absent fields — strip them, they are not
                # part of the committed action shape
                m = {k: v for k, v in meta.items() if v is not None}
                m["configuration"] = conf
                actions.append({"metaData": m})
            version = head + 1
            try:
                self._publish(version, actions)
                return version
            except ConcurrentWriteError:
                continue
        raise ConcurrentWriteError(
            f"enable_deletion_vectors lost {max_retries} publish races "
            "— table is under pathological write contention"
        )

    @staticmethod
    def _cdf_protocol_ok(proto: dict) -> bool:
        """Does the protocol already license CDF writes? Legacy writer
        v4..v6 implies the capability; v7+ must announce the
        changeDataFeed feature explicitly."""
        mwv = int((proto or {}).get("minWriterVersion", 1) or 1)
        if mwv >= 7:
            return "changeDataFeed" in (proto.get("writerFeatures") or [])
        return mwv >= 4

    def enable_change_data_feed(
        self,
        max_retries: int = 8,
        extra_props: dict[str, str] | None = None,
    ) -> int | None:
        """Commit ``delta.enableChangeDataFeed=true`` together with a
        protocol that actually licenses it (PROTOCOL.md: CDF needs
        legacy writer v4+ or the ``changeDataFeed`` writer feature) —
        the capability flag and the announcement must land in ONE
        version, or a reader between two commits sees a config lying
        about the protocol. After this, every mutation commit lands
        its row-level diff as ``_change_data`` parquet + ``cdc``
        actions (``_cdc_actions``). No-op (returns None) when already
        fully enabled. ``extra_props`` fold into the same commit, as
        in ``enable_deletion_vectors``."""
        for _ in range(max_retries):
            rdr = self.reader()
            # pin the head FIRST — see enable_deletion_vectors for the
            # lost-update window two separate reads would open
            head = rdr.latest_version()
            proto, meta = rdr._protocol_meta(head if head >= 0 else None)
            if (
                self._cdf_protocol_ok(proto)
                and self._cdf_enabled(meta)
                and not extra_props
            ):
                return None
            actions = [self._commit_info(
                "SET TBLPROPERTIES",
                properties={"delta.enableChangeDataFeed": "true",
                            **(extra_props or {})},
            )]
            if not self._cdf_protocol_ok(proto):
                upgraded = self._feature_upgraded_protocol(
                    proto, {"changeDataFeed"}
                )
                self._check_writable(
                    upgraded["protocol"], meta, "ALTER",
                    data_change=False,
                )
                actions.append(upgraded)
            else:
                self._check_writable(proto, meta, "ALTER",
                                     data_change=False)
            if not meta:
                raise ValueError(
                    f"SET PROPERTIES on {self.path}: table has no "
                    "metaData to carry the configuration — append a "
                    "first batch"
                )
            conf = meta.get("configuration") or {}
            if isinstance(conf, list):
                conf = dict(conf)  # pyarrow MAP columns → [(k, v)]
            conf = dict(conf)
            conf["delta.enableChangeDataFeed"] = "true"
            for k, v in (extra_props or {}).items():
                if v in (None, ""):
                    conf.pop(k, None)
                else:
                    conf[k] = str(v)
            m = {k: v for k, v in meta.items() if v is not None}
            m["configuration"] = conf
            actions.append({"metaData": m})
            try:
                self._publish(head + 1, actions)
                return head + 1
            except ConcurrentWriteError:
                continue
        raise ConcurrentWriteError(
            f"enable_change_data_feed lost {max_retries} publish races "
            "— table is under pathological write contention"
        )

    # delta.* configuration keys this minimal writer can honestly
    # commit: ones it HONORS itself (appendOnly gates mutations,
    # retention keys are advisory durations) — anything else under the
    # delta.* prefix may imply protocol features (CDF, generated
    # columns, column mapping…) this writer would then silently not
    # uphold. Non-delta keys are freeform user properties.
    _SETTABLE_DELTA_KEYS = {
        "delta.appendOnly",
        "delta.logRetentionDuration",
        "delta.deletedFileRetentionDuration",
        "delta.dataSkippingNumIndexedCols",
    }

    def set_properties(
        self, props: dict[str, str], max_retries: int = 8,
        spark: SparkSession | None = None,
    ) -> int | None:
        """``SET TBLPROPERTIES`` as one metaData commit: merge
        ``props`` into the table configuration (None/'' deletes a
        key). ``delta.enableDeletionVectors=true`` ROUTES to
        ``enable_deletion_vectors`` — it needs the protocol upgrade
        committed atomically with the flag, not a bare config write;
        other delta.*-prefixed keys outside the honored set refuse
        (committing a capability flag this writer would not uphold is
        the silent-corruption shape the writer gate exists for)."""
        props = {str(k): v for k, v in props.items()}
        # validate EVERY key before committing ANYTHING: the DV route
        # below is an irreversible protocol upgrade, and a statement
        # that half-applies before refusing leaves a committed side
        # effect behind a failed SQL statement
        bad = sorted(
            k for k in props
            if k.startswith("delta.")
            and k not in self._SETTABLE_DELTA_KEYS
            and not k.startswith("delta.constraints.")
            and k not in ("delta.enableDeletionVectors",
                          "delta.enableChangeDataFeed")
        )
        if bad:
            raise NotImplementedError(
                f"SET PROPERTIES on {self.path}: {bad} are delta "
                "capability keys this minimal writer does not uphold — "
                "committing the flag without the behavior would lie to "
                "every other client; use a full Delta client"
            )
        # ALTER ADD CONSTRAINT semantics: a NEW check constraint must
        # validate the EXISTING rows before it commits — a table whose
        # declared rule its own content violates lies to every reader
        adding = {
            k: v for k, v in props.items()
            if k.startswith("delta.constraints.") and v not in (None, "")
        }
        if adding:
            if spark is None:
                raise ValueError(
                    f"SET PROPERTIES on {self.path}: adding CHECK "
                    f"constraint(s) {sorted(adding)} validates the "
                    "table's existing rows — pass spark="
                )
            if self.latest_version() >= 0:
                try:
                    snap = self.reader().snapshot(spark)
                except ValueError:
                    snap = None  # no live files: nothing to validate
                if snap is not None:
                    self._enforce_invariants(
                        snap,
                        {"configuration": dict(adding),
                         "schemaString": None},
                        "ADD CONSTRAINT",
                    )
        if str(props.get("delta.enableDeletionVectors", "")
               ).lower() == "true":
            rest = {k: v for k, v in props.items()
                    if k != "delta.enableDeletionVectors"}
            # the remaining keys ride the SAME commit as the protocol
            # upgrade — the whole statement lands in one version (a
            # crash between two commits would leave it half-applied
            # with the irreversible upgrade already in)
            v = self.enable_deletion_vectors(
                max_retries=max_retries, extra_props=rest or None
            )
            if v is not None or not rest:
                return v
            # already DV-enabled (the route no-opped): the remaining
            # keys still need their own metaData commit below
            props = rest
        if str(props.get("delta.enableChangeDataFeed", "")
               ).lower() == "true":
            # capability key with a protocol obligation — route through
            # the upgrade so the flag and the changeDataFeed feature
            # announcement land atomically (same shape as the DV route)
            rest = {k: v for k, v in props.items()
                    if k != "delta.enableChangeDataFeed"}
            v = self.enable_change_data_feed(
                max_retries=max_retries, extra_props=rest or None
            )
            if v is not None or not rest:
                return v
            props = rest
        for _ in range(max_retries):
            rdr = self.reader()
            # pinned head — see enable_deletion_vectors for the
            # lost-update window two separate reads would open
            head = rdr.latest_version()
            proto, meta = rdr._protocol_meta(head if head >= 0 else None)
            self._check_writable(proto, meta, "ALTER", data_change=False)
            if not meta:
                raise ValueError(
                    f"SET PROPERTIES on {self.path}: table has no "
                    "metaData to carry the configuration — append a "
                    "first batch"
                )
            conf = meta.get("configuration") or {}
            if isinstance(conf, list):
                conf = dict(conf)
            conf = dict(conf)
            for k, v in props.items():
                if v in (None, ""):
                    conf.pop(k, None)
                else:
                    conf[k] = str(v)
            m = {k: v for k, v in meta.items() if v is not None}
            m["configuration"] = conf
            try:
                self._publish(head + 1, [
                    self._commit_info(
                        "SET TBLPROPERTIES", properties=props
                    ),
                    {"metaData": m},
                ])
                return head + 1
            except ConcurrentWriteError:
                continue
        raise ConcurrentWriteError(
            f"set_properties lost {max_retries} publish races — table "
            "is under pathological write contention"
        )

    def properties(self) -> dict[str, str]:
        """The current configuration map (empty when unset);
        ``dict()`` folds both the dict and the pyarrow
        list-of-pairs checkpoint shape."""
        _p, meta = self.reader()._protocol_meta()
        return dict((meta or {}).get("configuration") or {})

    @staticmethod
    def _commit_info(operation: str, **params) -> dict:
        return {"commitInfo": {
            "timestamp": int(time.time() * 1000),
            "operation": operation,
            "operationParameters": {
                k: json.dumps(v) if not isinstance(v, str) else v
                for k, v in params.items()
            },
        }}

    # -- transactions ------------------------------------------------------

    def append(
        self,
        df: DataFrame,
        partition_by: list[str] | None = None,
        evolve_schema: bool = False,
        max_retries: int = 8,
    ) -> int:
        """APPEND commit. Blind (adds-only commits never logically
        conflict): the version slot resolves at publish time and a lost
        race retries one slot up. ``partition_by=None`` INHERITS the
        table's recorded spec (so appends to a partitioned table stay
        partitioned without restating it).

        Gate ordering is the correctness core: a pre-stage gate
        refuses bad batches before any file lands in the table
        directory, and the AUTHORITATIVE gate re-runs whenever the log
        head has moved past the last gated state — read AFTER the slot
        resolves, so a racer landing later forces a slot collision and
        therefore a re-gate (publishing attempt-0 metaData computed
        before the staging window would silently clobber a concurrent
        creation/evolution that took a DIFFERENT slot). A gate refusal
        after staging unstages the batch's files — the log never
        references them and vacuum's log-candidates rule would
        otherwise leak them forever."""
        base = self.latest_version()
        proto, cur_meta = self.reader()._protocol_meta()
        self._check_writable(proto, cur_meta, "APPEND")
        df = self._apply_generated(df, cur_meta)
        df, hw_up = self._apply_identity(df, cur_meta, "APPEND")
        self._enforce_invariants(df, cur_meta, "APPEND")
        parts = (
            list(partition_by)
            if partition_by is not None
            else self._cur_parts(cur_meta)
        )
        meta = self._identity_meta_patch(
            cur_meta,
            self._meta_action(
                df, parts, evolve_schema, cur_meta, fetched=True
            ),
            parts, hw_up,
        )
        staged = self._stage(
            df, parts, mapping=self._cm_of(cur_meta)
        )
        adds = self._add_actions(staged)
        try:
            for _ in range(max_retries):
                version = self.latest_version() + 1
                if version != base + 1:
                    # the log advanced past the gated state: re-gate
                    # against the new head before taking the new slot
                    meta = self._meta_action(df, parts, evolve_schema)
                    base = version - 1
                head = [self._protocol_action()] if version == 0 else []
                try:
                    self._publish(
                        version,
                        head + meta
                        + [self._commit_info("WRITE", mode="Append")]
                        + adds,
                    )
                    return version
                except ConcurrentWriteError:
                    continue
            raise ConcurrentWriteError(
                f"append lost {max_retries} publish races — table is "
                "under pathological write contention"
            )
        except (SchemaEvolutionError, ConcurrentWriteError):
            # the staged files were never referenced by a published
            # commit — leaving them would leak forever under vacuum's
            # log-candidates rule
            self._unstage(staged)
            raise

    def append_txn(
        self,
        df: DataFrame,
        app_id: str,
        txn_version: int,
        partition_by: list[str] | None = None,
        evolve_schema: bool = False,
        max_retries: int = 8,
    ) -> int | None:
        """Idempotent APPEND — Delta's REAL transaction-identifier
        protocol (the spec's ``txn`` action: ``{"txn": {"appId",
        "version"}}`` riding atomically with the adds), which is what
        production Delta sinks use as ``txnAppId``/``txnVersion`` write
        options. A redelivered (app_id, txn_version) no-ops (returns
        None, unstaging anything it wrote). Makes the exactly-once
        streaming sink (streaming/sink.py) able to target a table every
        other Delta engine can then consume; like
        ``TxnLogTable.append_txn`` it INHERITS the table's partition
        spec by default (the sink never states one).

        The idempotence mark and the schema gate are both validated
        against the log head read AFTER the slot resolves, and
        re-validated whenever the head has moved: a zombie driver's
        duplicate commit that lands while this one stages takes a
        DIFFERENT slot (no collision), so only a moved-head re-check
        catches it — re-checking solely after a lost race would commit
        the batch twice. Folds are skipped entirely while the head
        hasn't moved, keeping the per-micro-batch hot path at two
        O(checkpoint + tail) folds in the uncontended case."""
        base = self.latest_version()
        rdr = self.reader()
        if txn_version <= rdr.last_txn_version(app_id):
            return None
        proto, cur_meta = rdr._protocol_meta()
        self._check_writable(proto, cur_meta, "APPEND")
        df = self._apply_generated(df, cur_meta)
        df, hw_up = self._apply_identity(df, cur_meta, "APPEND")
        self._enforce_invariants(df, cur_meta, "APPEND")
        parts = (
            list(partition_by)
            if partition_by is not None
            else self._cur_parts(cur_meta)
        )
        meta = self._identity_meta_patch(
            cur_meta,
            self._meta_action(
                df, parts, evolve_schema, cur_meta, fetched=True
            ),
            parts, hw_up,
        )
        staged = self._stage(
            df, parts, mapping=self._cm_of(cur_meta)
        )
        tail = self._add_actions(staged) + [
            {"txn": {"appId": app_id, "version": txn_version,
                     "lastUpdated": int(time.time() * 1000)}}
        ]
        try:
            for _ in range(max_retries):
                version = self.latest_version() + 1
                if version != base + 1:
                    # the log advanced past the validated state: the
                    # racer may have been OUR zombie twin (mark) or an
                    # evolver (gate) — re-check both against the head
                    if txn_version <= self.reader().last_txn_version(
                        app_id
                    ):
                        self._unstage(staged)
                        return None
                    meta = self._meta_action(df, parts, evolve_schema)
                    base = version - 1
                head = [self._protocol_action()] if version == 0 else []
                try:
                    self._publish(
                        version,
                        head + meta
                        + [self._commit_info("STREAMING UPDATE",
                                             outputMode="Append")]
                        + tail,
                    )
                    return version
                except ConcurrentWriteError:
                    continue
            # exhausted: the FINAL slot's winner may have been our
            # own redelivered twin — a committed no-op, not a failure;
            # the in-loop check runs at iteration top, so the last lost
            # race would otherwise exit unchecked and kill a streaming
            # query whose batch is durably committed
            if txn_version <= self.reader().last_txn_version(app_id):
                self._unstage(staged)
                return None
            raise ConcurrentWriteError(
                f"append_txn({app_id}, {txn_version}) lost {max_retries} "
                "publish races — table is under pathological write "
                "contention"
            )
        except (SchemaEvolutionError, ConcurrentWriteError):
            self._unstage(staged)
            raise

    def overwrite(
        self,
        df: DataFrame,
        expected_version: int,
        partition_by: list[str] | None = None,
    ) -> int:
        """OVERWRITE commit: data-changing remove tombstones for every
        file live at the base snapshot, plus the replacement adds, in
        ONE atomic commit. ``expected_version`` is REQUIRED — an
        overwrite racing an append would silently drop the append's
        rows. Schema and partition spec may change wholesale (the
        content is being replaced; ``partition_by=None`` inherits the
        current spec, an explicit list — including ``[]`` —
        re-partitions), recorded via a fresh-shape ``metaData`` under
        the stable table id."""
        current = self.latest_version()
        if expected_version != current + 1:
            raise ConcurrentWriteError(
                f"overwrite based on version {expected_version - 1} but "
                f"table is at {current} — rebase and retry"
            )
        rdr = self.reader()
        proto, cur_meta = rdr._protocol_meta()
        self._check_writable(proto, cur_meta, "OVERWRITE")
        df = self._apply_generated(df, cur_meta)
        df, hw_up = self._apply_identity(df, cur_meta, "OVERWRITE")
        self._enforce_invariants(df, cur_meta, "OVERWRITE")
        partition_by = (
            list(partition_by)
            if partition_by is not None
            else self._cur_parts(cur_meta)
        )
        mapping = self._cm_of(cur_meta)
        if mapping:
            # same-logical-shape overwrite composes (round 14): the
            # mapped metaData — physicalNames, field ids, maxColumnId
            # — carries forward UNTOUCHED and the batch restages under
            # physical names (the mapped staging contract). A schema-
            # or partition-changing overwrite still refuses: minting a
            # whole new physical namespace is a full client's job.
            cur_schema = (cur_meta or {}).get("schemaString")
            new_f = _schema_fields(df.schema.json())
            old_f = _schema_fields(cur_schema) if cur_schema else {}
            if (
                old_f != new_f
                or list(old_f) != list(new_f)
                or list(partition_by) != self._cur_parts(cur_meta)
            ):
                raise NotImplementedError(
                    f"OVERWRITE on {self.path}: the table is "
                    "column-mapped and the batch changes the schema or "
                    "partition spec — re-recording it would need a "
                    "fresh physical-name assignment; use a full Delta "
                    "client (same-shape overwrites compose)"
                )
        now_ms = int(time.time() * 1000)
        # tombstones reuse the committed add.path BYTES verbatim — the
        # log fold is keyed by the raw string, and re-encoding a
        # resolved path may not match a foreign writer's
        # percent-encoding canonicalization, which would leave the old
        # add live (silent row resurrection on every later snapshot)
        removes = []
        for raw, _res, pv, dv in rdr._live_entries_full():
            r = {
                "path": raw,
                "deletionTimestamp": now_ms,
                "dataChange": True,
                "partitionValues": pv,
            }
            if dv is not None:
                r["deletionVector"] = dv
            removes.append({"remove": r})
        new_schema = df.schema.json()
        cur_schema_st = rdr.table_schema()
        meta: list[dict] = []
        if mapping:
            pass  # same shape gated above: the mapped metaData —
            # physicalNames, ids, maxColumnId — carries forward as-is
        elif not cur_meta:
            meta = [self._fresh_meta(new_schema, list(partition_by))]
        else:
            cur_sj = cur_schema_st.json() if cur_schema_st else None
            shape_same = (
                cur_sj is not None
                and _schema_fields(cur_sj) == _schema_fields(new_schema)
                and list(_schema_fields(cur_sj))
                == list(_schema_fields(new_schema))
            )
            parts_same = (
                list(cur_meta.get("partitionColumns") or [])
                == list(partition_by)
            )
            if shape_same:
                # SAME logical shape: the current schemaString carries
                # VERBATIM — its field metadata (CHECK constraints,
                # generation expressions, identity declarations) must
                # survive an overwrite, and re-recording the batch's
                # bare schema would silently strip every declaration;
                # only a partition change needs a metaData action
                if not parts_same:
                    meta = [self._evolved_meta(
                        cur_meta, cur_meta.get("schemaString"),
                        list(partition_by),
                    )]
            else:
                meta = [self._evolved_meta(
                    cur_meta, new_schema, list(partition_by)
                )]
        meta = self._identity_meta_patch(
            cur_meta, meta, partition_by, hw_up
        )
        staged = self._stage(df, partition_by, mapping=mapping)
        head = [self._protocol_action()] if expected_version == 0 else []
        try:
            self._publish(
                expected_version,
                head + meta
                + [self._commit_info("WRITE", mode="Overwrite")]
                + removes
                + self._add_actions(staged),
            )
        except ConcurrentWriteError:
            # the error tells the caller to rebase and retry — the
            # staged files must not leak while they do (vacuum's
            # log-candidates rule never reclaims unreferenced files)
            self._unstage(staged)
            raise
        return expected_version

    def _cm_assign_new_fields(
        self, new_fields: list, st, cur_meta: dict
    ) -> tuple[list, dict]:
        """Stamp fresh column-mapping identities onto an ALTER ADD
        COLUMN's fields: each struct field at every depth gets the
        next ``delta.columnMapping.id`` and a ``col-<uuid>``
        physicalName (both keys in both modes, like full clients
        emit). The id high-water mark is max(configuration's
        maxColumnId, every id already in the schema) — a foreign
        writer that under-recorded the config must not cause id
        reuse. Returns (stamped fields, patched configuration)."""
        from algebraicdb_spark.operators.txnlog import (
            _cm_walk_struct_fields,
        )

        conf = cur_meta.get("configuration") or {}
        if isinstance(conf, list):
            conf = dict(conf)
        conf = dict(conf)
        seen: list[int] = [
            int(conf.get("delta.columnMapping.maxColumnId", 0) or 0)
        ]

        def collect(f, new_dt):
            if f.metadata and "delta.columnMapping.id" in f.metadata:
                seen.append(int(f.metadata["delta.columnMapping.id"]))
            return StructField(f.name, new_dt, f.nullable, f.metadata)

        _cm_walk_struct_fields(st, collect)
        next_id = max(seen)

        def stamp(f, new_dt):
            nonlocal next_id
            next_id += 1
            return StructField(
                f.name, new_dt, f.nullable,
                {
                    **(f.metadata or {}),
                    "delta.columnMapping.id": next_id,
                    "delta.columnMapping.physicalName":
                        f"col-{uuid.uuid4()}",
                },
            )

        stamped = list(
            _cm_walk_struct_fields(StructType(new_fields), stamp).fields
        )
        conf["delta.columnMapping.maxColumnId"] = str(next_id)
        return stamped, conf

    def evolve_add_column(
        self, name: str, ddl_type: str, max_retries: int = 8
    ) -> int:
        """ADDITIVE schema evolution as a METADATA-ONLY commit on the
        standard format (`ALTER TABLE … ADD COLUMN` with no data
        rewrite — readers pin schemaString, old files surface NULL).
        The stable table id carries through (`_evolved_meta`); a
        racer's commit forces a re-read + retry."""
        from pyspark.sql.types import StructType

        for _ in range(max_retries):
            rdr = self.reader()
            # pin the head, read the schema AT it, publish at head+1 —
            # see enable_deletion_vectors for the lost-update window
            # the two-separate-reads shape opens
            head = rdr.latest_version()
            _proto, cur_meta = rdr._protocol_meta(
                head if head >= 0 else None
            )
            self._check_writable(_proto, cur_meta, "ALTER",
                                 data_change=False)
            st = parse_schema_string(
                (cur_meta or {}).get("schemaString"), self.path
            )
            if st is None:
                raise ValueError(
                    "ALTER on a schema-less delta table — record a "
                    "schema first (any append does)"
                )
            if name in [f.name for f in st.fields]:
                raise ValueError(
                    f"ALTER TABLE: column {name!r} already exists"
                )
            new_fields = list(StructType.fromDDL(f"{name} {ddl_type}"))
            conf_patch: dict[str, str] | None = None
            if self._cm_of(cur_meta):
                # column-mapped evolution (round 14): the new column
                # gets a FRESH physicalName (col-<uuid>, Delta's own
                # convention — never reused, so a later drop+re-add
                # can't resurrect old bytes) and the next field id,
                # with maxColumnId bumped in the SAME metaData commit.
                # Old files simply lack the new physical name / id, so
                # scans NULL-backfill in both modes. Nested struct
                # additions map every subfield the same way — the
                # totality gates require it.
                new_fields, conf_patch = self._cm_assign_new_fields(
                    new_fields, st, cur_meta
                )
            widened = StructType(st.fields + new_fields)
            meta = self._evolved_meta(
                cur_meta, widened.json(), self._cur_parts(cur_meta)
            )
            if conf_patch is not None:
                meta["metaData"]["configuration"] = conf_patch
            version = head + 1
            try:
                self._publish(version, [
                    self._commit_info(
                        "ADD COLUMNS", columns=[name]
                    ),
                    meta,
                ])
                return version
            except ConcurrentWriteError:
                continue
        raise ConcurrentWriteError(
            f"evolve_add_column lost {max_retries} publish races — "
            "table is under pathological write contention"
        )

    # -- copy-on-write row mutation ------------------------------------------

    def _cow_context(self, spark: SparkSession, mutation: str):
        """The pinned inputs every COW mutation needs, from ONE log
        fold: live entries (raw path verbatim — the fold key —
        including each file's deletion-vector descriptor, which the
        mutation must APPLY when scanning and carry when tombstoning),
        schema, partition columns, and a resolved-path → (raw, pv, dv)
        map for attributing probe hits to files. The writability gate
        runs here — before any staging."""
        rdr = self.reader()
        proto, meta = rdr._protocol_meta()
        rdr._check_readable(proto, meta)
        self._check_writable(proto, meta, mutation)
        entries = rdr._live_entries_full()
        part_cols = list((meta or {}).get("partitionColumns") or [])
        st = parse_schema_string(
            (meta or {}).get("schemaString"), self.path
        )
        by_local = {res: (raw, pv, dv) for raw, res, pv, dv in entries}
        # the mutation's logical→physical mapping ('name'-mode column
        # mapping; None otherwise) — rewrites must restage under
        # PHYSICAL names or every mapped reader resolves the
        # rewritten columns to all-NULL
        mapping = self._cm_of(meta)
        return rdr, entries, st, part_cols, by_local, mapping, meta

    def _probe_affected(
        self, spark: SparkSession, rdr, entries, st, part_cols,
        by_local, predicate: str, mapping: dict | None = None,
    ) -> tuple[dict[str, int], int]:
        """{raw path: matching LIVE rows} — ONE distributed scan with
        the predicate pushed into the parquet reader and each file's
        deletion vector already applied (a DV'd row must not rematch:
        it is deleted). Attribution keys on the scan's own ``__lp``
        normalized path, exact by construction at file grain."""
        from pyspark.sql import functions as F

        df = rdr._assemble_mor(
            spark, entries, st, part_cols, keep_pos=True,
            mapping=mapping,
        )
        rows = (
            df.where(F.expr(predicate))
            .groupBy("__lp")
            .agg(F.count(F.lit(1)).alias("__n"))
            .collect()
        )
        by_raw: dict[str, int] = {}
        for r in rows:
            hit = by_local.get(r["__lp"])
            if hit is None:
                raise RuntimeError(
                    f"probe returned file {r['__lp']} outside the live "
                    "set — concurrent vacuum mid-probe?"
                )
            by_raw[hit[0]] = by_raw.get(hit[0], 0) + int(r["__n"])
        return by_raw, sum(by_raw.values())

    @staticmethod
    def _file_rows(path: str) -> int:
        import pyarrow.parquet as pq

        return pq.ParquetFile(path).metadata.num_rows

    def _live_rows(self, res: str, dv: dict | None) -> int:
        """Rows a snapshot reads from this file: physical footer count
        minus the deletion vector's cardinality (the descriptor field —
        validated against the decoded bitmap on every read path)."""
        n = self._file_rows(res)
        return n - int(dv["cardinality"]) if dv else n

    @staticmethod
    def _dv_key(dv: dict | None) -> tuple | None:
        """A deletion vector's identity — (path, dv) is the file
        identity in the fold, so conflict checks compare this too."""
        if dv is None:
            return None
        return (dv.get("storageType"), dv.get("pathOrInlineDv"),
                dv.get("offset"))

    @staticmethod
    def _cdf_enabled(meta: dict | None) -> bool:
        """Does the table's configuration opt into the row-level
        change feed? (delta.enableChangeDataFeed=true — the flag CDC
        consumers set on production tables)."""
        conf = (meta or {}).get("configuration") or {}
        if isinstance(conf, list):
            conf = dict(conf)
        return str(conf.get("delta.enableChangeDataFeed", "")
                   ).lower() == "true"

    def _cdc_actions(
        self,
        spark: SparkSession,
        rdr,
        st,
        part_cols: list[str],
        mapping: dict[str, str] | None,
        op: str,
        pre_entries: list[tuple[str, str, dict, dict | None]],
        post_entries: list[tuple[str, str, dict, dict | None]],
        staged: list[tuple[str, dict]],
        changes_df: DataFrame | None = None,
    ) -> tuple[list[dict], list[tuple[str, dict]]]:
        """Land a mutation commit's row-level changes in Delta's
        INTEROP change-data format: ``_change_data/`` parquet files
        (table columns + ``_change_type``) referenced by ``cdc``
        actions riding the SAME commit — PROTOCOL.md's "Change Data
        Files". Per the spec, a commit carrying ANY cdc action is
        consumed by CDF readers from its change files ALONE (the
        add/remove actions describe the same changes), so the diff
        here covers the WHOLE commit:

        - ``pre_entries``: the affected files in their PRE-commit
          state (old deletion vectors applied),
        - ``post_entries``: the same files in their POST-commit state
          (MoR re-adds with the new vectors; empty for COW, where the
          old file leaves the table entirely),
        - ``staged``: the commit's new files (COW rewrites, MoR
          postimages, MERGE inserts).

        pre EXCEPT ALL post = rows the commit removes; post EXCEPT ALL
        pre = rows it introduces — the SAME multiset algebra the
        engine's own ``changes_cdf`` replays from add/remove actions,
        now landed where other engines read it. Labels match that
        reader: UPDATE → update_preimage/update_postimage, everything
        else delete/insert (a MERGE's updated rows surface as a
        delete+insert pair — semantically equivalent, and exactly what
        the diff-based replay of the same commit yields).

        ``changes_df`` bypasses the generic whole-file diff with an
        already-labeled change frame the CALLER derived — the
        DELETE/UPDATE fast path, where the change set is directly
        expressible as the matched rows (and for UPDATE a diff over
        just those matches, preserving the algebra's cancellation of
        no-op assignments): the cdc scan then costs O(matched rows)
        instead of a shuffle over every affected file's content
        (docs/PROBE_CDF_r13.json pins the tax). The caller's frame
        must be MULTISET-EQUAL to the generic diff — deterministic
        predicates over immutable files make the two derivations
        provably identical, and the three-way equivalence tests
        (cdc replay = changes_cdf = snapshot diff) pin it.

        Cost: ONE extra bounded scan of exactly the files the mutation
        already rewrote or vectored — the tax every CDF-emitting
        writer pays, O(affected bytes), never O(table); DELETE and
        UPDATE pass ``changes_df`` (below), shrinking it to O(matched
        rows). Returns (cdc actions, staged cdc files for abort-path
        unstaging); callers thread both through ``_commit_cow``."""
        from pyspark.sql import functions as F

        def side(entries, extra_staged):
            ents = list(entries) + [
                (rel, os.path.join(self.path, rel), pv, None)
                for rel, pv in extra_staged
            ]
            if not ents:
                return None
            return rdr._assemble_mor(
                spark, ents, st, part_cols, mapping=mapping
            )

        if changes_df is not None:
            changes = changes_df
        else:
            pre = side(pre_entries, [])
            post = side(post_entries, staged)
            if pre is None and post is None:
                return [], []
            if pre is None:
                pre = post.limit(0)
            if post is None:
                post = pre.limit(0)
            pre_l, post_l = (
                ("update_preimage", "update_postimage")
                if op.upper() == "UPDATE"
                else ("delete", "insert")
            )
            changes = (
                pre.exceptAll(post)
                .withColumn("_change_type", F.lit(pre_l))
                .unionByName(
                    post.exceptAll(pre)
                    .withColumn("_change_type", F.lit(post_l))
                )
            )
        cdc_staged = self._stage(
            changes, part_cols, mapping=mapping, subdir="_change_data"
        )
        # an all-cancelled partition can stage an empty part file —
        # drop it rather than commit a rowless cdc action
        kept: list[tuple[str, dict]] = []
        for rel, pv in cdc_staged:
            if self._file_rows(os.path.join(self.path, rel)) == 0:
                self._unstage([(rel, pv)])
            else:
                kept.append((rel, pv))
        actions = []
        for rel, pv in kept:
            full = os.path.join(self.path, rel)
            actions.append({"cdc": {
                "path": quote(rel, safe="/"),
                "partitionValues": pv,
                "size": os.path.getsize(full),
                "dataChange": False,
            }})
        return actions, kept

    def _commit_cow(
        self,
        removed_raw: list[str],
        removed_pv: dict[str, dict],
        dv_of: dict[str, dict | None],
        staged: list[tuple[str, dict]],
        op: str,
        params: dict,
        max_retries: int,
        extra_actions: list[dict] | None = None,
        cdc: tuple[list[dict], list[tuple[str, dict]]] | None = None,
    ) -> int:
        """remove(affected, dataChange) + add(rewrites) in one commit
        under the COW conflict matrix (appends commute — retry one
        slot up; removal OR deletion-vector flip of an input aborts: a
        racer's MoR delete mutates a file in place, and committing a
        rewrite scanned under the old vector would resurrect its
        deletions). Tombstones reuse the committed raw path bytes AND
        the old DV descriptor verbatim — (path, dv) is the file's
        identity; every abort path unstages."""
        now_ms = int(time.time() * 1000)

        def tomb(raw: str) -> dict:
            r = {
                "path": raw,
                "deletionTimestamp": now_ms,
                "dataChange": True,
                "partitionValues": removed_pv.get(raw) or {},
            }
            if dv_of.get(raw) is not None:
                r["deletionVector"] = dv_of[raw]
            return {"remove": r}

        actions = (
            [self._commit_info(op, **params)]
            + [tomb(raw) for raw in removed_raw]
            + self._add_actions(staged)
            + list(extra_actions or [])
            + list(cdc[0] if cdc else [])
        )
        # abort paths must reclaim the staged CDF files too — they are
        # table-root files the log never references until publish
        unstage_all = staged + (cdc[1] if cdc else [])
        want = {raw: self._dv_key(dv_of.get(raw)) for raw in removed_raw}
        for _ in range(max_retries):
            # pin the head FIRST and validate (path, dv) identity AT
            # it, so a racer landing after the check collides on
            # head+1 and forces re-validation — a later
            # latest_version() read would let a remove/DV-flip slip
            # between the two reads and publish cleanly
            head = self.latest_version()
            live_now = {
                raw: self._dv_key(dv)
                for raw, _r, _p, dv
                in self.reader()._live_entries_full(head)
            }
            conflicted = sorted(
                raw for raw, k in want.items()
                if raw not in live_now or live_now[raw] != k
            )
            if conflicted:
                self._unstage(unstage_all)
                raise ConcurrentWriteError(
                    f"{op} inputs {conflicted[:3]} were removed or "
                    "DV-mutated by a concurrent writer — committing "
                    "would resurrect or double-mutate replaced data; "
                    f"rerun {op} on the new snapshot"
                )
            version = head + 1
            try:
                self._publish(version, actions)
                return version
            except ConcurrentWriteError:
                continue
        self._unstage(unstage_all)
        raise ConcurrentWriteError(
            f"{op} lost {max_retries} publish races — table is under "
            "pathological write contention"
        )

    def delete(
        self,
        spark: SparkSession,
        predicate: str,
        max_retries: int = 8,
        mode: str = "auto",
        dv_inline_threshold: int = 512,
    ) -> dict:
        """Row-level ``DELETE FROM … WHERE predicate`` on the STANDARD
        format, two physical strategies behind one semantic:

        - ``cow`` (copy-on-write): the same three file classes as
          ``TxnLogTable.delete`` from one probe + footer counts:
          untouched files keep their add entries, fully-matching files
          drop with zero rewrite I/O, partial files rewrite minus the
          matches (NULL keeps the row — SQL DELETE semantics). The
          commit is a data-changing remove+add any Delta engine folds.
        - ``mor`` (merge-on-read): partial files get a DELETION VECTOR
          instead of a rewrite — the commit is O(bitmap bytes), not
          O(file bytes), which is the strategy that matters at scale
          (a sparse delete across a 100 TB table rewrites nothing).
          New vectors UNION any existing one (a DV'd row never
          rematches: the probe scans merge-on-read), files whose
          cumulative vector covers every physical row drop as plain
          removes, and the re-added action keeps the file's verbatim
          path/size with ``stats`` re-marked ``tightBounds: false``
          per the spec. Vectors ≤ ``dv_inline_threshold`` bytes ride
          the add action inline (storageType 'i'); larger ones share
          one on-disk ``.bin`` (storageType 'u'). Requires the
          deletionVectors table feature — committed atomically with
          the first MoR delete when absent.
        - ``auto``: ``mor`` iff the table's protocol already announces
          deletionVectors in writerFeatures, else ``cow`` — the same
          config-driven dispatch real Delta writers use.
        """
        from pyspark.sql import functions as F

        if mode not in ("auto", "cow", "mor"):
            raise ValueError(f"delete mode {mode!r}: auto, cow, or mor")
        if self.latest_version() < 0:
            raise ValueError(
                f"delta table {self.path} has no commits to delete from"
            )
        rdr, entries, st, part_cols, by_local, mapping, meta = (
            self._cow_context(spark, "DELETE")
        )
        if mode == "auto":
            proto, _m = rdr._protocol_meta()
            mode = (
                "mor"
                if "deletionVectors" in (proto.get("writerFeatures") or [])
                else "cow"
            )
        if not entries:
            return {"version": None, "rows_deleted": 0,
                    "files_removed": 0, "files_rewritten": 0}
        if mode == "mor":
            # mapped tables compose since round 14: the probe and the
            # CDC fast path assemble through the mapping (predicates
            # stay in LOGICAL names); vectors address physical row
            # ordinals, which no mapping touches
            return self._delete_mor(
                spark, rdr, entries, st, part_cols, by_local,
                predicate, max_retries, dv_inline_threshold, meta,
                mapping=mapping,
            )
        by_raw, matched = self._probe_affected(
            spark, rdr, entries, st, part_cols, by_local, predicate,
            mapping=mapping,
        )
        if not matched:
            return {"version": None, "rows_deleted": 0,
                    "files_removed": 0, "files_rewritten": 0}
        res_of = {raw: res for raw, res, _pv, _dv in entries}
        pv_of = {raw: pv for raw, _res, pv, _dv in entries}
        dv_of = {raw: dv for raw, _res, _pv, dv in entries}
        full = [
            raw for raw, n in by_raw.items()
            if n == self._live_rows(res_of[raw], dv_of[raw])
        ]
        partial = sorted(set(by_raw) - set(full))
        staged: list[tuple[str, dict]] = []
        if partial:
            keep = rdr._assemble_mor(
                spark,
                [(raw, res_of[raw], pv_of[raw], dv_of[raw])
                 for raw in partial],
                st, part_cols, mapping=mapping,
            ).where(
                ~F.coalesce(F.expr(predicate).cast("boolean"), F.lit(False))
            )
            staged = self._stage(keep, part_cols, mapping=mapping)
        cdc = None
        if self._cdf_enabled(meta):
            # fast path: the deletes ARE the matched rows — the
            # whole-file diff would shuffle the survivors just to
            # cancel them
            aff = rdr._assemble_mor(
                spark,
                [(raw, res_of[raw], pv_of[raw], dv_of[raw])
                 for raw in sorted(by_raw)],
                st, part_cols, mapping=mapping,
            )
            deletes = aff.where(
                F.coalesce(F.expr(predicate).cast("boolean"), F.lit(False))
            ).withColumn("_change_type", F.lit("delete"))
            cdc = self._cdc_actions(
                spark, rdr, st, part_cols, mapping, "DELETE",
                [], [], [], changes_df=deletes,
            )
        version = self._commit_cow(
            sorted(by_raw), pv_of, dv_of, staged, "DELETE",
            {"predicate": predicate}, max_retries, cdc=cdc,
        )
        return {
            "version": version,
            "rows_deleted": matched,
            "files_removed": len(by_raw),
            "files_rewritten": len(partial),
        }

    def _probe_positions(
        self, spark, rdr, entries, st, part_cols, by_local,
        predicate: str, mapping: dict[str, str] | None = None,
    ) -> tuple[dict[str, list[int]], int]:
        """ONE probe scan (predicate pushed to parquet, existing DVs
        applied — a deleted row never rematches) → each affected
        file's newly-matched PHYSICAL row ordinals + the match count.
        Bitmaps serialize EXECUTOR-side (``mapInPandas`` over the
        probe output — driver traffic is O(compressed bitmap), never
        O(matched rows))."""
        from pyspark.sql import functions as F

        probe = (
            rdr._assemble_mor(spark, entries, st, part_cols,
                              keep_pos=True, mapping=mapping)
            .where(F.expr(predicate))
            .select("__lp", "__pos")
        )
        return self._collect_positions(probe, by_local)

    def _collect_positions(
        self, probe, by_local
    ) -> tuple[dict[str, list[int]], int]:
        """Executor-side bitmap collection for a (__lp, __pos) probe
        frame — shared by MoR DELETE/UPDATE (predicate probes) and
        MoR MERGE (semi-join probes)."""
        import pandas as pd
        from pyspark.sql import functions as F

        from algebraicdb_spark.operators.deletion_vectors import (
            roaring64_positions,
        )

        def to_bitmaps(batches):
            from algebraicdb_spark.operators.deletion_vectors import (
                roaring64_serialize,
            )

            acc: dict[str, list[int]] = {}
            for b in batches:
                for lp, pos in zip(b["__lp"], b["__pos"]):
                    acc.setdefault(lp, []).append(int(pos))
            if acc:
                yield pd.DataFrame({
                    "__lp": list(acc),
                    "bm": [roaring64_serialize(sorted(v))
                           for v in acc.values()],
                    "n": [len(v) for v in acc.values()],
                })

        parts = (
            probe.select("__lp", "__pos")
            .repartition(F.col("__lp"))
            .mapInPandas(to_bitmaps, "__lp string, bm binary, n long")
            .collect()
        )
        new_pos: dict[str, list[int]] = {}
        matched = 0
        for r in parts:
            hit = by_local.get(r["__lp"])
            if hit is None:
                raise RuntimeError(
                    f"probe returned file {r['__lp']} outside the live "
                    "set — concurrent vacuum mid-probe?"
                )
            # one partition per __lp after the repartition, so each
            # file appears exactly once; decode is O(bitmap)
            new_pos.setdefault(hit[0], []).extend(
                roaring64_positions(bytes(r["bm"]))
            )
            matched += int(r["n"])
        return new_pos, matched

    def _build_dv_actions(
        self, entries, new_pos: dict[str, list[int]],
        inline_threshold: int,
    ) -> tuple[list[dict], list[str], list[str], str | None]:
        """Turn per-file matched ordinals into the commit pieces:
        (re-add actions carrying the UNIONED vectors with
        ``tightBounds: false`` stats, fully-covered files → plain
        removes, DV'd files, the written ``.bin``'s uuid-enc for
        abort-path reclamation). New vector = old positions ∪ new
        matches (the old vector decodes driver-side, bounded by its
        own size); vectors ≤ ``inline_threshold`` bytes ride inline."""
        from algebraicdb_spark.operators.deletion_vectors import (
            dv_positions, inline_dv_descriptor, write_dv_file,
        )

        res_of = {raw: res for raw, res, _pv, _dv in entries}
        pv_of = {raw: pv for raw, _res, pv, _dv in entries}
        dv_of = {raw: dv for raw, _res, _pv, dv in entries}
        full_removes: list[str] = []
        dv_files: list[str] = []       # file order for vector assembly
        vectors: list[list[int]] = []
        for raw in sorted(new_pos):
            pos = sorted(set(new_pos[raw]))
            if dv_of[raw] is not None:
                pos = sorted(
                    set(pos) | set(dv_positions(self.path, dv_of[raw]))
                )
            if len(pos) >= self._file_rows(res_of[raw]):
                full_removes.append(raw)   # vector covers the file
            else:
                dv_files.append(raw)
                vectors.append(pos)
        descs: dict[str, dict] = {}
        written_bin: str | None = None
        file_backed = [
            (raw, pos) for raw, pos in zip(dv_files, vectors)
            if 8 + 2 * len(pos) > inline_threshold  # cheap size proxy
        ]
        if file_backed:
            written_bin, fdescs = write_dv_file(
                self.path, [pos for _raw, pos in file_backed]
            )
            for (raw, _pos), d in zip(file_backed, fdescs):
                descs[raw] = d
        for raw, pos in zip(dv_files, vectors):
            if raw not in descs:
                descs[raw] = inline_dv_descriptor(pos)
        adds = []
        for raw in dv_files:
            res = res_of[raw]
            stats = json.loads(_file_stats_json(res))
            stats["tightBounds"] = False  # min/max may cover DV'd rows
            adds.append({"add": {
                "path": raw,  # verbatim committed bytes — the fold key
                "partitionValues": pv_of[raw] or {},
                "size": os.path.getsize(res),
                "modificationTime": int(os.path.getmtime(res) * 1000),
                "dataChange": True,
                "stats": json.dumps(stats),
                "deletionVector": descs[raw],
            }})
        return adds, full_removes, dv_files, written_bin

    def _dv_protocol_actions(self, rdr) -> list[dict]:
        """The protocol-upgrade action a first MoR mutation must carry
        ATOMICALLY with its vectors when the table has not announced
        deletionVectors yet (a separate enable commit is also
        supported — ``enable_deletion_vectors``; both shapes derive
        from the SAME upgrade fold so they can never diverge)."""
        proto, _m = rdr._protocol_meta()
        if "deletionVectors" in (proto.get("writerFeatures") or []):
            return []
        return [self._dv_upgraded_protocol(proto)]

    @staticmethod
    def _legacy_implied_features(proto: dict) -> tuple[set[str], set[str]]:
        """The (reader, writer) features a table's LEGACY version
        numbers imply — CUMULATIVELY, per the protocol's version
        table (writer v5 must support everything v3 and v4 required,
        not just column mapping): moving to feature lists must name
        them all or the upgrade silently drops capabilities for
        feature-aware clients."""
        mrv = int(proto.get("minReaderVersion", 1) or 1)
        mwv = int(proto.get("minWriterVersion", 1) or 1)
        legacy_r = {"columnMapping"} if mrv == 2 else set()
        w_map = {
            3: ["checkConstraints"],
            4: ["changeDataFeed", "generatedColumns"],
            5: ["columnMapping"],
            6: ["identityColumns"],
        }
        legacy_w = {
            f for v, fs in w_map.items() if 3 <= mwv <= 6 and mwv >= v
            for f in fs
        }
        return legacy_r, legacy_w

    @classmethod
    def _feature_upgraded_protocol(
        cls, proto: dict, writer_features: set[str],
        reader_features: set[str] = frozenset(),
    ) -> dict:
        """A minWriter-7 protocol action announcing ``writer_features``
        (and, when ``reader_features`` is non-empty, minReader 3 with
        those reader features), carrying forward every capability the
        table already announced — including the ones its legacy
        version numbers implied (``_legacy_implied_features``)."""
        legacy_r, legacy_w = cls._legacy_implied_features(proto)
        out = {
            "minReaderVersion": int(proto.get("minReaderVersion", 1) or 1),
            "minWriterVersion": 7,
            "writerFeatures": sorted(
                set(proto.get("writerFeatures") or [])
                | legacy_w | set(writer_features)
            ),
        }
        cur_r = set(proto.get("readerFeatures") or [])
        if reader_features or cur_r or out["minReaderVersion"] >= 3:
            out["minReaderVersion"] = 3
            out["readerFeatures"] = sorted(
                cur_r | legacy_r | set(reader_features)
            )
        return {"protocol": out}

    @classmethod
    def _dv_upgraded_protocol(cls, proto: dict) -> dict:
        """minReader 3 / minWriter 7 with deletionVectors in BOTH
        feature lists (DV is a reader+writer feature), legacy
        capabilities carried forward."""
        return cls._feature_upgraded_protocol(
            proto, {"deletionVectors"}, {"deletionVectors"}
        )

    def _reclaim_bin(self, written_bin: str | None) -> None:
        """Unlink a never-published DV ``.bin`` (nothing else ever
        reclaims it — vacuum candidates come from the log)."""
        if written_bin is None:
            return
        from algebraicdb_spark.operators.deletion_vectors import (
            dv_file_path,
        )

        p = dv_file_path(self.path, written_bin)
        if os.path.exists(p):
            os.unlink(p)

    def _delete_mor(
        self, spark, rdr, entries, st, part_cols, by_local,
        predicate: str, max_retries: int, inline_threshold: int,
        meta: dict | None = None,
        mapping: dict[str, str] | None = None,
    ) -> dict:
        """The merge-on-read DELETE body: matched ordinals become
        deletion vectors — O(bitmap bytes) committed, zero rewrite.
        Column-mapped tables compose (round 14): the probe assembles
        through ``mapping`` so the predicate evaluates over LOGICAL
        names, while the vectors themselves address physical row
        ordinals and the re-added file actions keep their
        physical-name stats verbatim — the mapping never touches
        either."""
        new_pos, matched = self._probe_positions(
            spark, rdr, entries, st, part_cols, by_local, predicate,
            mapping=mapping,
        )
        if not new_pos:
            return {"version": None, "rows_deleted": 0,
                    "files_removed": 0, "files_dv": 0}
        pv_of = {raw: pv for raw, _res, pv, _dv in entries}
        dv_of = {raw: dv for raw, _res, _pv, dv in entries}
        res_of = {raw: res for raw, res, _pv, _dv in entries}
        adds, full_removes, dv_files, written_bin = self._build_dv_actions(
            entries, new_pos, inline_threshold
        )
        extra = self._dv_protocol_actions(rdr)
        cdc = None
        if self._cdf_enabled(meta):
            # fast path: the newly-flipped rows are exactly the
            # predicate's matches over the affected files under their
            # OLD vectors (already-deleted rows never rematch) — same
            # frame the old-vs-new-vector diff yields, no shuffle
            from pyspark.sql import functions as F

            aff = rdr._assemble_mor(
                spark,
                [(raw, res_of[raw], pv_of[raw], dv_of[raw])
                 for raw in sorted(new_pos)],
                st, part_cols, mapping=mapping,
            )
            deletes = aff.where(
                F.coalesce(F.expr(predicate).cast("boolean"), F.lit(False))
            ).withColumn("_change_type", F.lit("delete"))
            cdc = self._cdc_actions(
                spark, rdr, st, part_cols, mapping, "DELETE",
                [], [], [], changes_df=deletes,
            )
        try:
            version = self._commit_cow(
                sorted(new_pos), pv_of, dv_of, [], "DELETE",
                {"predicate": predicate}, max_retries,
                extra_actions=adds + extra, cdc=cdc,
            )
        except ConcurrentWriteError:
            self._reclaim_bin(written_bin)
            raise
        return {
            "version": version,
            "rows_deleted": matched,
            "files_removed": len(full_removes),
            "files_dv": len(dv_files),
        }

    def update(
        self,
        spark: SparkSession,
        assignments: dict[str, str],
        predicate: str | None = None,
        max_retries: int = 8,
        mode: str = "auto",
        dv_inline_threshold: int = 512,
    ) -> dict:
        """Row-level ``UPDATE … SET col = expr WHERE predicate``, two
        physical strategies behind one semantic (dispatch as in
        ``delete``):

        - ``cow``: affected files rewrite through a CASE per assigned
          column cast back to the declared type (the pinned schema
          never drifts); unmatched files keep their add entries.
        - ``mor``: matched rows get DELETION-VECTORED in place and
          only their POSTIMAGES stage as new files — an update
          touching 1% of a file's rows commits O(bitmap + changed
          rows), not O(file bytes); production Delta's UPDATE under
          deletionVectors does exactly this.
        - ``auto`` (the default, and what SQL UPDATE uses): ``mor``
          iff the protocol announces deletionVectors.

        Partition-column assignment refuses — row movement is an
        overwrite-shaped operation."""
        from pyspark.sql import functions as F

        if mode not in ("auto", "cow", "mor"):
            raise ValueError(f"update mode {mode!r}: auto, cow, or mor")
        if self.latest_version() < 0:
            raise ValueError(
                f"delta table {self.path} has no commits to update"
            )
        rdr, entries, st, part_cols, by_local, mapping, meta = (
            self._cow_context(spark, "UPDATE")
        )
        if mode == "auto":
            proto, _m = rdr._protocol_meta()
            mode = (
                "mor"
                if "deletionVectors" in (proto.get("writerFeatures") or [])
                else "cow"
            )
        if not entries:
            return {"version": None, "rows_updated": 0,
                    "files_rewritten": 0}
        if st is not None:
            known = {f.name for f in st.fields} | set(part_cols)
            unknown = [c for c in assignments if c not in known]
            if unknown:
                raise ValueError(
                    f"UPDATE assigns unknown column(s) {unknown} — the "
                    "table schema is pinned"
                )
        bad = [c for c in assignments if c in part_cols]
        if bad:
            raise ValueError(
                f"UPDATE assigns partition column(s) {bad} — moving rows "
                "across partitions is an overwrite-shaped operation; "
                "DELETE + append instead"
            )
        self._gate_generated_assignments(assignments, meta, "UPDATE")
        pred = predicate if predicate is not None else "TRUE"
        if mode == "mor":
            # mapped tables compose since round 14 (see _delete_mor)
            return self._update_mor(
                spark, rdr, entries, st, part_cols, by_local,
                assignments, pred, max_retries, dv_inline_threshold,
                meta, mapping=mapping,
            )
        by_raw, matched = self._probe_affected(
            spark, rdr, entries, st, part_cols, by_local, pred,
            mapping=mapping,
        )
        if not matched:
            return {"version": None, "rows_updated": 0,
                    "files_rewritten": 0}
        res_of = {raw: res for raw, res, _pv, _dv in entries}
        pv_of = {raw: pv for raw, _res, pv, _dv in entries}
        dv_of = {raw: dv for raw, _res, _pv, dv in entries}
        affected = sorted(by_raw)
        df = rdr._assemble_mor(
            spark,
            [(raw, res_of[raw], pv_of[raw], dv_of[raw])
             for raw in affected],
            st, part_cols, mapping=mapping,
        )
        cond = F.coalesce(F.expr(pred).cast("boolean"), F.lit(False))
        out = df.select(
            *[
                F.when(cond, F.expr(assignments[c]))
                .otherwise(F.col(c))
                .cast(df.schema[c].dataType)
                .alias(c)
                if c in assignments
                else F.col(c)
                for c in df.columns
            ]
        )
        out = self._recompute_generated(out, meta)
        # the whole rewrite frame probes (pre-existing rows satisfied
        # their rules at their own write time, so they pass trivially;
        # filtering by the predicate over POST-update values would
        # mis-select when an assigned column appears in it)
        self._enforce_invariants(out, meta, "UPDATE")
        staged = self._stage(out, part_cols, mapping=mapping)
        cdc = None
        if self._cdf_enabled(meta):
            # fast path: diff over the MATCHED rows only (preimages vs
            # the same rows with assignments applied — deterministic
            # expressions over immutable files, the exact projection
            # the rewrite staged), preserving the generic algebra's
            # cancellation of no-op assignments at O(matched rows)
            pre_m = df.where(cond)
            post_m = self._recompute_generated(
                pre_m.select(
                    *[
                        F.expr(assignments[c])
                        .cast(df.schema[c].dataType).alias(c)
                        if c in assignments
                        else F.col(c)
                        for c in df.columns
                    ]
                ),
                meta,
            )
            changes = (
                pre_m.exceptAll(post_m)
                .withColumn("_change_type", F.lit("update_preimage"))
                .unionByName(
                    post_m.exceptAll(pre_m)
                    .withColumn("_change_type", F.lit("update_postimage"))
                )
            )
            cdc = self._cdc_actions(
                spark, rdr, st, part_cols, mapping, "UPDATE",
                [], [], [], changes_df=changes,
            )
        version = self._commit_cow(
            affected, pv_of, dv_of, staged, "UPDATE",
            {"predicate": pred}, max_retries, cdc=cdc,
        )
        return {
            "version": version,
            "rows_updated": matched,
            "files_rewritten": len(affected),
        }

    def _update_mor(
        self, spark, rdr, entries, st, part_cols, by_local,
        assignments: dict[str, str], pred: str, max_retries: int,
        inline_threshold: int, meta: dict | None = None,
        mapping: dict[str, str] | None = None,
    ) -> dict:
        """The merge-on-read UPDATE body: the preimage rows get
        deletion-vectored in place (same machinery as MoR DELETE) and
        ONLY the postimages — the matched rows with assignments
        applied, cast to declared types — stage as new files. Both
        halves ride ONE data-changing commit, so a reader never sees
        the delete without the re-insert. On mapped tables the probe
        and postimage scan assemble through ``mapping`` (logical
        names) and the postimages RESTAGE under physical names with
        field ids — the same staging contract as mapped COW."""
        from pyspark.sql import functions as F

        new_pos, matched = self._probe_positions(
            spark, rdr, entries, st, part_cols, by_local, pred,
            mapping=mapping,
        )
        if not new_pos:
            return {"version": None, "rows_updated": 0, "files_dv": 0}
        pv_of = {raw: pv for raw, _res, pv, _dv in entries}
        dv_of = {raw: dv for raw, _res, _pv, dv in entries}
        res_of = {raw: res for raw, res, _pv, _dv in entries}
        affected = sorted(new_pos)
        post_src = rdr._assemble_mor(
            spark,
            [(raw, res_of[raw], pv_of[raw], dv_of[raw])
             for raw in affected],
            st, part_cols, mapping=mapping,
        ).where(F.coalesce(F.expr(pred).cast("boolean"), F.lit(False)))
        post = post_src.select(
            *[
                F.expr(assignments[c])
                .cast(post_src.schema[c].dataType)
                .alias(c)
                if c in assignments
                else F.col(c)
                for c in post_src.columns
            ]
        )
        post = self._recompute_generated(post, meta)
        self._enforce_invariants(post, meta, "UPDATE")
        staged = self._stage(post, part_cols, mapping=mapping)
        adds, _full, dv_files, written_bin = self._build_dv_actions(
            entries, new_pos, inline_threshold
        )
        extra = self._dv_protocol_actions(rdr)
        cdc = None
        if self._cdf_enabled(meta):
            # fast path: the flipped rows are post_src (matched rows
            # under OLD vectors) and their postimages are post — the
            # frames this mutation already built; diffing just them
            # preserves no-op-assignment cancellation at O(matched)
            changes = (
                post_src.exceptAll(post)
                .withColumn("_change_type", F.lit("update_preimage"))
                .unionByName(
                    post.exceptAll(post_src)
                    .withColumn("_change_type", F.lit("update_postimage"))
                )
            )
            cdc = self._cdc_actions(
                spark, rdr, st, part_cols, mapping, "UPDATE",
                [], [], [], changes_df=changes,
            )
        try:
            version = self._commit_cow(
                affected, pv_of, dv_of, staged, "UPDATE",
                {"predicate": pred}, max_retries,
                extra_actions=adds + extra, cdc=cdc,
            )
        except ConcurrentWriteError:
            self._reclaim_bin(written_bin)
            raise
        return {
            "version": version,
            "rows_updated": matched,
            "files_dv": len(dv_files),
        }

    def merge(
        self,
        spark: SparkSession,
        source,
        cond: str,
        assignments: dict[str, str] | None,
        insert_exprs: list[str] | None,
        target_alias: str = "t",
        source_alias: str = "s",
        max_retries: int = 8,
        delete_matched: bool = False,
        mode: str = "auto",
        dv_inline_threshold: int = 512,
    ) -> dict:
        """``MERGE INTO`` as ONE copy-on-write commit on the standard
        format — the same plan as ``TxnLogTable.merge`` (probe
        semi-join → rewrite only reached files → anti-join inserts →
        atomic remove+add), with the same free multi-match refusal
        (a matched rewrite preserves row count; staged footers
        disagreeing with input footers IS the multi-match signal) and
        the same ``delete_matched`` WHEN MATCHED THEN DELETE clause
        (fully-matching files drop without rewrite I/O; partial files
        rewrite via LEFT ANTI)."""
        from pyspark.sql import functions as F

        if self.latest_version() < 0:
            raise ValueError(
                f"delta table {self.path} has no commits to merge into"
            )
        if delete_matched and assignments:
            raise ValueError(
                "MERGE: WHEN MATCHED THEN DELETE and THEN UPDATE are "
                "mutually exclusive in this dialect"
            )
        if not assignments and not delete_matched and insert_exprs is None:
            raise ValueError(
                "MERGE needs WHEN MATCHED THEN UPDATE assignments, "
                "WHEN MATCHED THEN DELETE, and/or WHEN NOT MATCHED "
                "THEN INSERT expressions"
            )
        if mode not in ("auto", "cow", "mor"):
            raise ValueError(f"merge mode {mode!r}: auto, cow, or mor")
        rdr, entries, st, part_cols, by_local, mapping, meta = (
            self._cow_context(spark, "MERGE")
        )
        self._gate_generated_assignments(assignments, meta, "MERGE")
        if insert_exprs is not None and self._identity_of(meta):
            raise NotImplementedError(
                f"MERGE INSERT on {self.path}: the table declares "
                "identity column(s) whose high-water mark MERGE does "
                "not maintain — append the not-matched rows instead"
            )
        if assignments:
            bad = [c for c in assignments if c in part_cols]
            if bad:
                raise ValueError(
                    f"MERGE assigns partition column(s) {bad} — moving "
                    "rows across partitions is an overwrite-shaped "
                    "operation; DELETE + append instead"
                )
        if mode == "auto":
            proto, _m = rdr._protocol_meta()
            mode = (
                "mor"
                if "deletionVectors" in (proto.get("writerFeatures") or [])
                else "cow"
            )
        if mode == "mor" and entries:
            # mapped tables compose since round 14 (see _delete_mor)
            return self._merge_mor(
                spark, rdr, entries, st, part_cols, by_local, source,
                cond, assignments, insert_exprs, target_alias,
                source_alias, max_retries, delete_matched,
                dv_inline_threshold, meta, mapping=mapping,
            )
        res_of = {raw: res for raw, res, _pv, _dv in entries}
        pv_of = {raw: pv for raw, _res, pv, _dv in entries}
        dv_of = {raw: dv for raw, _res, _pv, dv in entries}
        cond_col = F.expr(cond)
        by_raw: dict[str, int] = {}
        matched = 0
        if (assignments or delete_matched) and entries:
            tgt = rdr._assemble_mor(
                spark, entries, st, part_cols, keep_pos=True,
                mapping=mapping,
            )
            rows = (
                tgt.alias(target_alias)
                .join(source.alias(source_alias), cond_col, "left_semi")
                .groupBy("__lp")
                .agg(F.count(F.lit(1)).alias("__n"))
                .collect()
            )
            for r in rows:
                hit = by_local.get(r["__lp"])
                if hit is None:
                    raise RuntimeError(
                        f"probe returned file {r['__lp']} outside the "
                        "live set — concurrent vacuum mid-probe?"
                    )
                by_raw[hit[0]] = by_raw.get(hit[0], 0) + int(r["__n"])
            matched = sum(by_raw.values())
        affected = sorted(by_raw)
        staged: list[tuple[str, dict]] = []
        rewritten = len(affected)
        if affected and delete_matched:
            partial = [
                raw for raw in affected
                if by_raw[raw] != self._live_rows(res_of[raw], dv_of[raw])
            ]
            rewritten = len(partial)
            if partial:
                keep = (
                    rdr._assemble_mor(
                        spark,
                        [(raw, res_of[raw], pv_of[raw], dv_of[raw])
                         for raw in partial],
                        st, part_cols, mapping=mapping,
                    )
                    .alias(target_alias)
                    .join(source.alias(source_alias), cond_col, "left_anti")
                )
                staged = self._stage(keep, part_cols, mapping=mapping)
        elif affected:
            aff = rdr._assemble_mor(
                spark,
                [(raw, res_of[raw], pv_of[raw], dv_of[raw])
                 for raw in affected],
                st, part_cols, mapping=mapping,
            )
            input_rows = sum(
                self._live_rows(res_of[raw], dv_of[raw]) for raw in affected
            )
            mark = "__merge_matched"
            joined = aff.alias(target_alias).join(
                source.withColumn(mark, F.lit(True)).alias(source_alias),
                cond_col,
                "left_outer",
            )
            hit_c = F.col(f"{source_alias}.{mark}").isNotNull()
            out = joined.select(
                *[
                    F.when(hit_c, F.expr(assignments[c]))
                    .otherwise(F.col(f"{target_alias}.{c}"))
                    .cast(aff.schema[c].dataType)
                    .alias(c)
                    if c in assignments
                    else F.col(f"{target_alias}.{c}").alias(c)
                    for c in aff.columns
                ]
            )
            staged = self._stage(out, part_cols, mapping=mapping)
            staged_rows = sum(
                self._file_rows(os.path.join(self.path, rel))
                for rel, _pv in staged
            )
            if staged_rows != input_rows:
                self._unstage(staged)
                raise ValueError(
                    f"MERGE: {staged_rows - input_rows} target row(s) "
                    "matched multiple source rows — the rewrite would "
                    "duplicate them; deduplicate the source on the "
                    "merge key first"
                )
        rows_inserted = 0
        if insert_exprs is not None:
            if entries:
                full_t = rdr._assemble_mor(
                    spark, entries, st, part_cols, mapping=mapping,
                )
                ins_src = source.alias(source_alias).join(
                    full_t.alias(target_alias), cond_col, "left_anti"
                )
                tbl_schema = full_t.schema
            else:
                ins_src = source.alias(source_alias)
                tbl_schema = st
            if tbl_schema is None:
                raise ValueError(
                    "MERGE into an empty schema-less delta table has no "
                    "column shape to insert into — append a first batch"
                )
            cols = [(f.name, f.dataType) for f in tbl_schema.fields]
            if len(insert_exprs) != len(cols):
                # the matched rewrite already staged — unstage it or
                # the files leak under vacuum's log-candidates rule
                self._unstage(staged)
                raise ValueError(
                    f"MERGE: INSERT VALUES has {len(insert_exprs)} "
                    f"expressions for {len(cols)} target columns"
                )
            ins = ins_src.select(
                *[
                    F.expr(e).cast(t_).alias(c)
                    for e, (c, t_) in zip(insert_exprs, cols)
                ]
            )
            self._enforce_invariants(ins, meta, "MERGE")
            ins_staged = self._stage(ins, part_cols, mapping=mapping)
            rows_inserted = sum(
                self._file_rows(os.path.join(self.path, rel))
                for rel, _pv in ins_staged
            )
            if rows_inserted == 0:
                self._unstage(ins_staged)
            else:
                staged = staged + ins_staged
        if not affected and not staged:
            return {"version": None, "rows_matched": 0,
                    "rows_inserted": 0, "files_rewritten": 0}
        cdc = None
        if self._cdf_enabled(meta):
            cdc = self._cdc_actions(
                spark, rdr, st, part_cols, mapping, "MERGE",
                [(raw, res_of[raw], pv_of[raw], dv_of[raw])
                 for raw in affected],
                [], staged,
            )
        version = self._commit_cow(
            affected, pv_of, dv_of, staged, "MERGE",
            {"predicate": cond}, max_retries, cdc=cdc,
        )
        return {
            "version": version,
            "rows_matched": matched,
            "rows_inserted": rows_inserted,
            "files_rewritten": rewritten,
        }

    def _merge_mor(
        self, spark, rdr, entries, st, part_cols, by_local, source,
        cond: str, assignments, insert_exprs, target_alias,
        source_alias, max_retries: int, delete_matched: bool,
        inline_threshold: int, meta: dict | None = None,
        mapping: dict[str, str] | None = None,
    ) -> dict:
        """The merge-on-read MERGE body: matched target rows
        deletion-vector in place; THEN-UPDATE postimages come from an
        inner join of the matched rows with the source (assignments
        applied, declared-type casts); THEN-DELETE stages nothing;
        NOT-MATCHED inserts anti-join the DV-applied live set. All
        pieces ride ONE data-changing commit. Multi-match stays a
        free refusal: postimage row count must equal the matched
        count — an inner join against a duplicated source inflates it.
        Mapped tables: scans assemble through ``mapping``, staged
        postimages/inserts restage under physical names + field ids
        (the mapped-COW staging contract)."""
        from pyspark.sql import functions as F

        cond_col = F.expr(cond)
        pv_of = {raw: pv for raw, _res, pv, _dv in entries}
        dv_of = {raw: dv for raw, _res, _pv, dv in entries}
        new_pos: dict[str, list[int]] = {}
        matched = 0
        tgt = rdr._assemble_mor(spark, entries, st, part_cols,
                                keep_pos=True, mapping=mapping)
        if assignments or delete_matched:
            probe = (
                tgt.alias(target_alias)
                .join(source.alias(source_alias), cond_col, "left_semi")
            )
            new_pos, matched = self._collect_positions(probe, by_local)
        staged: list[tuple[str, dict]] = []
        if matched and assignments:
            joined = (
                tgt.alias(target_alias)
                .join(source.alias(source_alias), cond_col, "inner")
            )
            data_cols = [
                c for c in tgt.columns if c not in ("__lp", "__pos")
            ]
            post = self._recompute_generated(
                joined.select(
                    *[
                        F.expr(assignments[c])
                        .cast(tgt.schema[c].dataType)
                        .alias(c)
                        if c in assignments
                        else F.col(f"{target_alias}.{c}").alias(c)
                        for c in data_cols
                    ]
                ),
                meta,
            )
            self._enforce_invariants(post, meta, "MERGE")
            staged = self._stage(post, part_cols, mapping=mapping)
            staged_rows = sum(
                self._file_rows(os.path.join(self.path, rel))
                for rel, _pv in staged
            )
            if staged_rows != matched:
                self._unstage(staged)
                raise ValueError(
                    f"MERGE: {staged_rows - matched} target row(s) "
                    "matched multiple source rows — the rewrite would "
                    "duplicate them; deduplicate the source on the "
                    "merge key first"
                )
        rows_inserted = 0
        if insert_exprs is not None:
            full_t = rdr._assemble_mor(spark, entries, st, part_cols,
                                       mapping=mapping)
            ins_src = source.alias(source_alias).join(
                full_t.alias(target_alias), cond_col, "left_anti"
            )
            cols = [(f.name, f.dataType) for f in full_t.schema.fields]
            if len(insert_exprs) != len(cols):
                # the postimage staging already landed — unstage it or
                # the files leak under vacuum's log-candidates rule
                self._unstage(staged)
                raise ValueError(
                    f"MERGE: INSERT VALUES has {len(insert_exprs)} "
                    f"expressions for {len(cols)} target columns"
                )
            ins = ins_src.select(
                *[
                    F.expr(e).cast(t_).alias(c)
                    for e, (c, t_) in zip(insert_exprs, cols)
                ]
            )
            self._enforce_invariants(ins, meta, "MERGE")
            ins_staged = self._stage(ins, part_cols, mapping=mapping)
            rows_inserted = sum(
                self._file_rows(os.path.join(self.path, rel))
                for rel, _pv in ins_staged
            )
            if rows_inserted == 0:
                self._unstage(ins_staged)
            else:
                staged = staged + ins_staged
        if not new_pos and not staged:
            return {"version": None, "rows_matched": 0,
                    "rows_inserted": 0, "files_dv": 0}
        adds, _full, dv_files, written_bin = self._build_dv_actions(
            entries, new_pos, inline_threshold
        )
        extra = self._dv_protocol_actions(rdr)
        cdc = None
        if self._cdf_enabled(meta):
            res_of = {raw: res for raw, res, _pv, _dv in entries}
            cdc = self._cdc_actions(
                spark, rdr, st, part_cols, mapping, "MERGE",
                [(raw, res_of[raw], pv_of[raw], dv_of[raw])
                 for raw in sorted(new_pos)],
                [(a["add"]["path"], res_of[a["add"]["path"]],
                  pv_of[a["add"]["path"]], a["add"]["deletionVector"])
                 for a in adds],
                staged,
            )
        try:
            version = self._commit_cow(
                sorted(new_pos), pv_of, dv_of, staged, "MERGE",
                {"predicate": cond}, max_retries,
                extra_actions=adds + extra, cdc=cdc,
            )
        except (ConcurrentWriteError, ValueError):
            self._reclaim_bin(written_bin)
            raise
        return {
            "version": version,
            "rows_matched": matched,
            "rows_inserted": rows_inserted,
            "files_dv": len(dv_files),
        }

    # -- maintenance -------------------------------------------------------

    def restore(self, version: int, max_retries: int = 8) -> dict:
        """RESTORE the table to its state at ``version`` as ONE NEW
        data-changing commit on the standard format — Delta's own
        RESTORE semantics: rollback with history preserved (time
        travel above the restore still reads the undone commits).
        Pure metadata: tombstone the files live now but not at v,
        re-add the files live at v but not now, and re-add files
        whose DELETION VECTOR changed in between with their OLD
        vector (a MoR delete after v flips back) — zero bytes copied;
        the original add actions' stats/partitionValues/DV descriptors
        carry verbatim, and the target version's metaData re-commits
        when the schema changed in between. Restoring past the
        retention that reclaimed the files refuses loudly. Returns
        {"version", "files_removed", "files_readded"}; a content-
        identical restore commits nothing."""
        from urllib.parse import unquote

        rdr = self.reader()
        latest = rdr.latest_version()
        if version < 0 or version > latest:
            raise ValueError(
                f"RESTORE to version {version}: table has versions "
                f"0..{latest}"
            )
        proto_v, meta_v = rdr._protocol_meta(version)
        rdr._check_readable(proto_v, meta_v)
        target = rdr._live_fold(version)
        gone = sorted(
            p for p in target
            if not os.path.exists(os.path.join(self.path, unquote(p)))
        )
        if gone:
            raise ValueError(
                f"RESTORE to version {version} needs files retention "
                f"already reclaimed ({gone[:3]}…) — restore within the "
                "retention window"
            )
        now_ms = int(time.time() * 1000)
        for _ in range(max_retries):
            head = rdr.latest_version()
            proto, meta = rdr._protocol_meta(head)
            self._check_writable(proto, meta, "RESTORE")
            cur = rdr._live_fold(head)
            dvk = self._dv_key
            removes = sorted(
                raw for raw, (pv, dv, _st) in cur.items()
                if raw not in target or dvk(dv) != dvk(target[raw][1])
            )
            readds = sorted(
                raw for raw, (pv, dv, _st) in target.items()
                if raw not in cur or dvk(dv) != dvk(cur[raw][1])
            )
            meta_actions = []

            def _meta_key(m: dict | None) -> tuple:
                # schemaString AND partitionColumns: an overwrite can
                # re-partition without touching the schema, and since
                # partition VALUES live only in the log, restoring the
                # old live set under the new partitionColumns would
                # silently NULL (or fabricate) the partition column
                return (
                    (m or {}).get("schemaString"),
                    list((m or {}).get("partitionColumns") or []),
                )

            if meta_v and _meta_key(meta) != _meta_key(meta_v):
                m = {k: v for k, v in meta_v.items() if v is not None}
                conf = m.get("configuration") or {}
                if isinstance(conf, list):
                    conf = dict(conf)
                m["configuration"] = conf
                meta_actions.append({"metaData": m})
            if not removes and not readds and not meta_actions:
                return {"version": None, "files_removed": 0,
                        "files_readded": 0}
            actions = [self._commit_info(
                "RESTORE", version=str(version)
            )] + meta_actions
            for raw in removes:
                pv, dv, _st = cur[raw]
                r = {"path": raw, "deletionTimestamp": now_ms,
                     "dataChange": True, "partitionValues": pv or {}}
                if dv is not None:
                    r["deletionVector"] = dv
                actions.append({"remove": r})
            for raw in readds:
                pv, dv, st = target[raw]
                res = os.path.join(self.path, unquote(raw))
                a = {
                    "path": raw,  # verbatim committed bytes — fold key
                    "partitionValues": pv or {},
                    "size": os.path.getsize(res),
                    "modificationTime": int(os.path.getmtime(res) * 1000),
                    "dataChange": True,
                }
                if st:
                    a["stats"] = st
                if dv is not None:
                    a["deletionVector"] = dv
                actions.append({"add": a})
            try:
                self._publish(head + 1, actions)
                return {"version": head + 1,
                        "files_removed": len(removes),
                        "files_readded": len(readds)}
            except ConcurrentWriteError:
                continue  # racer took the slot: re-derive off its head
        raise ConcurrentWriteError(
            f"restore lost {max_retries} publish races — table is "
            "under pathological write contention"
        )

    def optimize(
        self,
        spark: SparkSession,
        target_files: int = 1,
        min_inputs: int = 2,
        max_retries: int = 8,
        zorder_by: list[str] | None = None,
    ) -> int | None:
        """OPTIMIZE — transactional small-file compaction on the
        STANDARD format, the maintenance pass a streaming-ingested
        table needs (the exactly-once sink commits one file set per
        micro-batch). Rewrites the live set into ``target_files``
        coalesced files (per partition, one shuffle keyed by the
        partition columns, when partitioned) and commits
        remove(inputs) + add(compacted) atomically with
        ``dataChange: false`` — so Delta CDF consumers (ours and
        external) skip the traffic. Conflict matrix as everywhere: a
        concurrent APPEND commutes (retry one slot up), concurrent
        removal of an input aborts. Returns the new version, or None
        below ``min_inputs``.

        ``zorder_by`` re-CLUSTERS instead of just re-packing — the
        same Morton-key range clustering as ``TxnLogTable.optimize``
        (txnlog._zorder_clustered), landing in a STANDARD table other
        Delta engines then skip-scan: each output file covers a narrow
        span of every clustering column, and since delta adds are
        file-grain with footer stats by construction, the narrow spans
        reach the log for free. Legitimate on a single input
        (clustering changes layout value even at one file);
        hive-partitioned tables refuse, as in txnlog — the partition
        layout already provides the coarse tier."""
        from algebraicdb_spark.operators.txnlog import _zorder_clustered

        rdr = self.reader()
        entries = rdr._live_entries_full()
        has_dv = any(dv is not None for _r, _s, _p, dv in entries)
        if not entries or (
            len(entries) < min_inputs and not zorder_by and not has_dv
        ):
            return None
        proto, meta = rdr._protocol_meta()
        rdr._check_readable(proto, meta)
        # removes here are dataChange:false — allowed even on
        # append-only tables (compaction preserves logical content)
        self._check_writable(proto, meta, "OPTIMIZE", data_change=False)
        part_cols = list((meta or {}).get("partitionColumns") or [])
        if part_cols and zorder_by:
            raise NotImplementedError(
                "OPTIMIZE ZORDER on a hive-partitioned table is not "
                "supported — the partition layout already provides the "
                "coarse clustering tier; re-cluster within a partition "
                "by overwriting it"
            )
        # scan EXACTLY the pinned entry list (the remove set) — a
        # second fold via snapshot() could include a file a concurrent
        # append landed between the folds, baking its rows into the
        # compacted add while its own add action stays live → silent
        # duplication ("append commutes" would let the publish succeed).
        # The schema comes from the SAME already-folded meta (a
        # separate table_schema() fold could straddle a concurrent
        # metaData commit and disagree with part_cols)
        st = parse_schema_string(
            (meta or {}).get("schemaString"), self.path
        )
        # merge-on-read assembly PURGES deletion vectors: the rewrite
        # materializes the deletes, so the compacted files are plain
        # and every DV'd input drops — delta's REORG ... APPLY (PURGE),
        # folded into OPTIMIZE (logical content unchanged, so the
        # commit stays dataChange:false and CDF-invisible)
        df = rdr._assemble_mor(
            spark, entries, st, part_cols, mapping=self._cm_of(meta)
        )
        if zorder_by:
            df = _zorder_clustered(df, zorder_by, target_files)
        elif part_cols:
            from pyspark.sql import functions as F

            df = df.repartition(*[F.col(c) for c in part_cols])
        else:
            df = df.coalesce(max(target_files, 1))
        staged = self._stage(
            df, part_cols, mapping=self._cm_of(meta)
        )
        adds = self._add_actions(staged, data_change=False)
        now_ms = int(time.time() * 1000)
        removes = []
        for raw, _res, pv, dv in entries:
            r = {"path": raw, "deletionTimestamp": now_ms,
                 "dataChange": False, "partitionValues": pv}
            if dv is not None:
                r["deletionVector"] = dv
            removes.append({"remove": r})
        inputs = {
            raw: self._dv_key(dv) for raw, _res, _pv, dv in entries
        }
        for _ in range(max_retries):
            # pinned head: identity validated AT the publish slot's
            # parent — see the COW commit loop for the two-read race
            head = self.latest_version()
            live_now = {
                raw: self._dv_key(dv)
                for raw, _r, _p, dv
                in self.reader()._live_entries_full(head)
            }
            gone = sorted(
                raw for raw, k in inputs.items()
                if raw not in live_now or live_now[raw] != k
            )
            if gone:
                # abort path: the compacted staging is unreferenced —
                # unstage or it leaks under vacuum's log-candidates rule
                self._unstage(staged)
                raise ConcurrentWriteError(
                    f"optimize inputs {gone[:3]} were removed or "
                    "DV-mutated by a concurrent writer — committing "
                    "would resurrect replaced data; rerun optimize on "
                    "the new snapshot"
                )
            version = head + 1
            info = (
                self._commit_info("OPTIMIZE", zOrderBy=zorder_by)
                if zorder_by
                else self._commit_info("OPTIMIZE")
            )
            try:
                self._publish(version, [info] + removes + adds)
                return version
            except ConcurrentWriteError:
                continue
        self._unstage(staged)
        raise ConcurrentWriteError(
            f"optimize lost {max_retries} publish races — table is "
            "under pathological write contention"
        )

    def vacuum(self, retain_versions: int = 2) -> list[str]:
        """Physically delete data files the LOG references but no
        snapshot in the last ``retain_versions`` versions reaches —
        retention stated in versions (the fixture has no wall-clock),
        like ``TxnLogTable.vacuum``; real Delta states it in hours off
        the remove tombstones' deletionTimestamp, same contract. The
        log is never deleted (history structure stays auditable); AS
        OF reads older than retention fail on the missing files, which
        is Delta's own behavior. Pure metadata: fold, diff path sets,
        unlink.

        Candidates come from the log's OWN add/remove actions, never a
        directory walk: a walk would reap files a concurrent writer
        has staged but not yet committed (staging is invisible to
        readers precisely because the log defines the table — vacuum
        must honor the same rule or an in-flight append publishes adds
        pointing at deleted bytes, bricking the table). Files only
        referenced below a cleaned checkpoint stay on disk —
        conservative, like an unknown file to real Delta's retention.
        """
        from urllib.parse import unquote

        rdr = self.reader()
        latest = rdr.latest_version()
        if latest < 0:
            return []
        proto, meta = rdr._protocol_meta()
        # vacuumProtocolCheck is honored by RUNNING exactly this check
        self._check_writable(proto, meta, "VACUUM", data_change=False)
        referenced: set[str] = set()
        cp = rdr._cp
        if cp is not None:
            for p, _pv, _dv, _st in rdr._checkpoint_adds_full(cp):
                referenced.add(os.path.join(self.path, unquote(p)))
            for t in rdr._checkpoint_removes(cp):
                # checkpointed tombstones are the ONLY remaining record
                # of files removed at-or-before a cleaned prefix — they
                # must stay vacuum candidates or every pre-checkpoint
                # overwrite/OPTIMIZE casualty leaks forever
                referenced.add(os.path.join(self.path, unquote(t["path"])))
        # candidates come from ALL SURVIVING JSON commits, not just the
        # post-checkpoint tail: a checkpoint stores only the live set,
        # so files tombstoned at-or-before it appear solely in their
        # original JSON actions — starting the fold at cp+1 would leak
        # every overwrite/OPTIMIZE casualty on any table that
        # checkpoints regularly (exactly the streaming-sink tables)
        vs = rdr._json_versions()
        if vs:
            for _v, actions in rdr._json_commit_actions(vs[0], None):
                for a in actions:
                    for kind in ("add", "remove"):
                        if kind in a and a[kind].get("path"):
                            referenced.add(
                                os.path.join(
                                    self.path, unquote(a[kind]["path"])
                                )
                            )
        keep_from = max(0, latest - max(retain_versions, 1) + 1)
        keep: set[str] = set()
        for v in range(keep_from, latest + 1):
            try:
                keep.update(
                    res for _raw, res, _pv, _dv
                    in rdr._live_entries_full(v)
                )
            except ValueError:
                # below a cleaned checkpoint: that snapshot is already
                # unreadable, so retention cannot apply to it
                continue
        doomed = []
        for p in sorted(referenced - keep):
            if os.path.exists(p):
                doomed.append(p)
                os.unlink(p)
        return doomed

    def write_checkpoint(self, clean: bool = False) -> int | None:
        """Materialize the folded state at the current head as a
        checkpoint, advance ``_last_checkpoint``, and — with
        ``clean=True`` — delete the compacted JSON prefix the way
        Delta's retention does, after which readers MUST replay from
        the checkpoint. The checkpoint carries the FULL folded
        protocol (feature lists included) and the unexpired remove
        tombstones, per the spec — cleaning the prefix must not lose
        feature enablement or make removed files invisible to
        retention-based VACUUM. Returns the checkpointed version, or
        None on an empty table.

        LAYOUT follows the table's protocol: classic single-file by
        default (one action per parquet row, struct columns); on a
        table announcing the ``v2Checkpoint`` writer feature, the V2
        layout that feature mandates (round 13): a UUID-named main
        file carrying protocol/metaData/txn plus a
        ``checkpointMetadata`` action and ``sidecar`` pointers, with
        the add/remove state in a parquet part under
        ``_delta_log/_sidecars/`` — exactly the shape
        ``DeltaLogTable._checkpoint_files`` was validated against on
        hand-written fixtures, so writer and reader meet at the spec,
        not at each other."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        rdr = self.reader()
        latest = rdr.latest_version()
        if latest < 0:
            return None
        proto, meta = rdr._protocol_meta(latest)
        proto = proto or self._protocol_action()["protocol"]
        unknown = sorted(
            set(proto.get("writerFeatures") or []) - self._WRITER_FEATURES
        )
        if unknown:
            # an unknown feature may govern the checkpoint layout the
            # way v2Checkpoint does — overwriting _last_checkpoint
            # with a shape the feature forbids breaks what the table
            # promises other clients
            raise NotImplementedError(
                f"checkpoint on {self.path}: writerFeatures {unknown} "
                "are not honored by this writer and may govern the "
                "checkpoint layout itself; use a full Delta client"
            )
        # the FULL folded protocol carries through — reader/writer
        # feature lists included: v3 protocols REQUIRE them, and
        # feature enablement (e.g. deletionVectors on a table with no
        # live DV adds) is table state later writers rely on; reducing
        # to the two min versions would rewrite the log spec-invalid
        # once the JSON prefix is cleaned
        proto_row: dict = {
            "minReaderVersion": proto.get("minReaderVersion", 1),
            "minWriterVersion": proto.get("minWriterVersion", 2),
        }
        if proto.get("readerFeatures") is not None:
            proto_row["readerFeatures"] = list(proto["readerFeatures"])
        if proto.get("writerFeatures") is not None:
            proto_row["writerFeatures"] = list(proto["writerFeatures"])
        rows: list[dict] = [{"protocol": proto_row}]
        if meta:
            conf = meta.get("configuration") or {}
            if isinstance(conf, list):
                conf = dict(conf)
            rows.append({"metaData": {
                "id": meta.get("id"),
                "format": {"provider": (meta.get("format") or {}).get(
                    "provider", "parquet")},
                "schemaString": meta.get("schemaString"),
                "partitionColumns": list(
                    meta.get("partitionColumns") or []),
                "configuration": conf,
                "createdTime": meta.get("createdTime"),
            }})
        for app, ver in sorted(rdr._txn_marks().items()):
            # idempotence high-water marks survive the checkpoint (one
            # txn row per appId, latest version — the spec's shape), or
            # a cleaned prefix would reset every sink's replay guard
            rows.append({"txn": {"appId": app, "version": ver}})
        for raw, p, pv, dv in rdr._live_entries_full(latest):
            # the raw committed path string carries through verbatim —
            # see overwrite(): re-encoding can diverge from a foreign
            # writer's canonicalization and break the fold keying
            add = {
                "path": raw,
                "partitionValues": dict(pv or {}),
                "size": os.path.getsize(p),
                "modificationTime": int(os.path.getmtime(p) * 1000),
                "dataChange": False,
                "stats": _file_stats_json(p),
            }
            if dv is not None:
                # a live deletion vector is part of the file's identity
                # — dropping it from the checkpoint would resurrect the
                # deleted rows once the JSON prefix is cleaned
                add["deletionVector"] = {
                    "storageType": dv.get("storageType"),
                    "pathOrInlineDv": dv.get("pathOrInlineDv"),
                    "offset": dv.get("offset"),
                    "sizeInBytes": dv.get("sizeInBytes"),
                    "cardinality": dv.get("cardinality"),
                }
            rows.append({"add": add})
        for t in rdr._tombstones():
            # unexpired remove tombstones ride in the checkpoint per
            # the spec — they keep their deletionTimestamp so VACUUM
            # (ours and foreign clients') can honor retention after
            # clean=True deletes the JSON that originally carried them
            rows.append({"remove": {
                "path": t["path"],
                "deletionTimestamp": t.get("deletionTimestamp"),
                "dataChange": bool(t.get("dataChange", True)),
            }})
        # the spec's FIXED checkpoint schema, stated explicitly — never
        # inferred: partitionValues is map<string,string> (an inferred
        # struct would make the file unreadable to Spark Delta /
        # delta-rs, with no JSON fallback once the prefix is cleaned),
        # it is present on EVERY add ({} when unpartitioned — a
        # required field), and empty MAPS are representable in parquet
        # where empty structs are not
        kv = pa.map_(pa.string(), pa.string())
        schema = pa.schema([
            ("protocol", pa.struct([
                ("minReaderVersion", pa.int32()),
                ("minWriterVersion", pa.int32()),
                ("readerFeatures", pa.list_(pa.string())),
                ("writerFeatures", pa.list_(pa.string())),
            ])),
            ("txn", pa.struct([
                ("appId", pa.string()),
                ("version", pa.int64()),
            ])),
            ("metaData", pa.struct([
                ("id", pa.string()),
                ("format", pa.struct([("provider", pa.string())])),
                ("schemaString", pa.string()),
                ("partitionColumns", pa.list_(pa.string())),
                ("configuration", kv),
                ("createdTime", pa.int64()),
            ])),
            ("add", pa.struct([
                ("path", pa.string()),
                ("partitionValues", kv),
                ("size", pa.int64()),
                ("modificationTime", pa.int64()),
                ("dataChange", pa.bool_()),
                ("stats", pa.string()),
                ("deletionVector", pa.struct([
                    ("storageType", pa.string()),
                    ("pathOrInlineDv", pa.string()),
                    ("offset", pa.int32()),
                    ("sizeInBytes", pa.int32()),
                    ("cardinality", pa.int64()),
                ])),
            ])),
            ("remove", pa.struct([
                ("path", pa.string()),
                ("deletionTimestamp", pa.int64()),
                ("dataChange", pa.bool_()),
            ])),
        ])
        keys = [f.name for f in schema]
        rows = [{k: r.get(k) for k in keys} for r in rows]
        if "v2Checkpoint" in set(proto.get("writerFeatures") or []):
            size = self._write_checkpoint_v2(latest, rows, schema)
        else:
            pq.write_table(
                pa.Table.from_pylist(rows, schema=schema),
                os.path.join(
                    self.log_dir, f"{latest:020d}.checkpoint.parquet"
                ),
            )
            size = len(rows)
        ptr = os.path.join(self.log_dir, "_last_checkpoint")
        tmp = ptr + f".tmp.{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            # ``size`` = the number of actions stored in the
            # checkpoint, part of the pointer's published schema
            json.dump({"version": latest, "size": size}, f)
        os.replace(tmp, ptr)  # atomic pointer swing
        if clean:
            for v in range(0, latest + 1):
                jp = os.path.join(self.log_dir, f"{v:020d}.json")
                if os.path.exists(jp):
                    os.unlink(jp)
        return latest

    def _write_checkpoint_v2(self, latest: int, rows, schema) -> int:
        """The V2 checkpoint layout: the add/remove state lands in a
        sidecar parquet part under ``_delta_log/_sidecars/`` and the
        UUID-named main file carries the metadata actions
        (protocol/metaData/txn), a ``checkpointMetadata`` action (the
        v2 marker, required), and the ``sidecar`` pointer. Two
        complete checkpoints at the SAME version describe the same
        state, so discovery-by-listing picking either is correct —
        the same rule the reader applies. Returns the action count
        for the pointer's ``size``."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        kv = pa.map_(pa.string(), pa.string())
        file_rows = [
            r for r in rows if r.get("add") or r.get("remove")
        ]
        meta_rows = [
            r for r in rows if not (r.get("add") or r.get("remove"))
        ]
        side_dir = os.path.join(self.log_dir, "_sidecars")
        os.makedirs(side_dir, exist_ok=True)
        side_name = f"{uuid.uuid4()}.parquet"
        side_path = os.path.join(side_dir, side_name)
        file_schema = pa.schema([
            schema.field("add"), schema.field("remove"),
        ])
        pq.write_table(
            pa.Table.from_pylist(
                [{"add": r.get("add"), "remove": r.get("remove")}
                 for r in file_rows],
                schema=file_schema,
            ),
            side_path,
        )
        main_schema = pa.schema(
            [schema.field("protocol"), schema.field("txn"),
             schema.field("metaData")]
            + [
                ("checkpointMetadata", pa.struct([
                    ("version", pa.int64()),
                    ("tags", kv),
                ])),
                ("sidecar", pa.struct([
                    ("path", pa.string()),
                    ("sizeInBytes", pa.int64()),
                    ("modificationTime", pa.int64()),
                    ("tags", kv),
                ])),
            ]
        )
        mkeys = [f.name for f in main_schema]
        main_rows = [
            {k: r.get(k) for k in mkeys} for r in meta_rows
        ] + [
            {"checkpointMetadata": {"version": latest, "tags": {}}},
            {"sidecar": {
                "path": side_name,  # relative to _delta_log/_sidecars
                "sizeInBytes": os.path.getsize(side_path),
                "modificationTime": int(
                    os.path.getmtime(side_path) * 1000
                ),
                "tags": {},
            }},
        ]
        main_rows = [{k: r.get(k) for k in mkeys} for r in main_rows]
        pq.write_table(
            pa.Table.from_pylist(main_rows, schema=main_schema),
            os.path.join(
                self.log_dir,
                f"{latest:020d}.checkpoint.{uuid.uuid4()}.parquet",
            ),
        )
        return len(rows) + 2  # + checkpointMetadata + sidecar actions
