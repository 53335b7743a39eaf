"""Round 14: Iceberg v3 Puffin deletion vectors — READS (round-13
verdict missing item 2). The round-13 refusal is deleted: a v3 table
whose delete manifests carry PUFFIN deletion-vector entries now scans
with the DVs applied, time-travels, and feeds ``changes_cdf`` (a DV
flip emits exactly the flipped rows).

Two-path methodology: the positive fixtures hand-encode the Puffin
file byte-by-byte in this test (magic, framed blob, footer JSON,
footer sizes) — no reader code writes any byte the reader later
decodes; `write_puffin_dv_file` (the engine's own encoder) is
validated AGAINST those hand-written frames in
TestPuffinCodec.test_encoder_agrees_with_hand_encoding."""

import json
import os
import struct
import uuid
import zlib

import pytest

# Heavyweight lakehouse interop e2e tier: excluded from the
# default pytest run (see pyproject [tool.pytest.ini_options]);
# run explicitly with `pytest -m interop`.
pytestmark = pytest.mark.interop

from algebraicdb_spark.operators.deletion_vectors import (
    puffin_dv_positions,
    puffin_dvs,
    roaring64_serialize,
    write_puffin_dv_file,
)
from algebraicdb_spark.operators.iceberg import IcebergTable
from algebraicdb_spark.operators.iceberg_writer import (
    AvroFileWriter,
    IcebergTableWriter,
    _MANIFEST_LIST_SCHEMA,
    _manifest_schema,
)

_PUFFIN_MAGIC = b"PFA1"
_DV_MAGIC = 1681511377


def _hand_puffin(path: str, dvs: dict[str, list[int]]) -> dict:
    """Hand-encode a Puffin DV file (independent of the engine's
    encoder); returns referenced-uri -> (offset, length)."""
    body = bytearray(_PUFFIN_MAGIC)
    blobs, locs = [], {}
    for ref in sorted(dvs):
        vec = struct.pack("<i", _DV_MAGIC) + roaring64_serialize(
            sorted(set(dvs[ref]))
        )
        framed = (
            struct.pack(">i", len(vec)) + vec
            + struct.pack(">I", zlib.crc32(vec) & 0xFFFFFFFF)
        )
        locs[ref] = (len(body), len(framed))
        blobs.append({
            "type": "deletion-vector-v1", "fields": [],
            "snapshot-id": 1, "sequence-number": 1,
            "offset": len(body), "length": len(framed),
            "properties": {"referenced-data-file": ref,
                           "cardinality": str(len(set(dvs[ref])))},
        })
        body += framed
    payload = json.dumps({"blobs": blobs}).encode()
    body += _PUFFIN_MAGIC + payload
    body += struct.pack("<i", len(payload)) + b"\x00" * 4 + _PUFFIN_MAGIC
    with open(path, "wb") as f:
        f.write(bytes(body))
    return locs


def _dv_manifest_schema() -> dict:
    """The v2 manifest schema widened with the three v3 DV address
    fields (spec field ids 143-145)."""
    import copy

    sch = copy.deepcopy(_manifest_schema([]))
    sch["fields"][4]["type"]["fields"] += [
        {"name": "referenced_data_file", "type": ["null", "string"]},
        {"name": "content_offset", "type": ["null", "long"]},
        {"name": "content_size_in_bytes", "type": ["null", "long"]},
    ]
    return sch


def _v3_table(spark, tmp_path, name):
    root = str(tmp_path / name)
    w = IcebergTableWriter(root)
    w.append(spark.createDataFrame(
        [(i, float(i)) for i in range(4)], "k long, v double",
    ).coalesce(1))
    w.append(spark.createDataFrame(
        [(10 + i, 10.0 + i) for i in range(3)], "k long, v double",
    ).coalesce(1))
    base_v, cur = w._current()
    md = dict(cur)
    md["format-version"] = 3
    md["next-row-id"] = 7
    md["row-lineage"] = True
    with open(os.path.join(w.meta_dir, f"v{base_v + 1}.metadata.json"),
              "w") as f:
        json.dump(md, f)
    with open(os.path.join(w.meta_dir, "version-hint.text"), "w") as f:
        f.write(str(base_v + 1))
    return w


def _commit_dv_snapshot(
    w, dvs_by_uri: dict[str, list[int]], with_address: bool = True,
    hand: bool = True, summary_op: str = "delete",
):
    """Append a snapshot that REPLACES the table's DV set with
    ``dvs_by_uri`` (puffin file + DV manifest + manifest list carrying
    the data manifests, dropping prior DV manifests)."""
    from algebraicdb_spark.operators.iceberg import AvroFileReader

    rdr = IcebergTable(w.path)
    base_v, cur = w._current()
    snap = rdr._snapshot(None)
    seq = int(cur.get("last-sequence-number", 0)) + 1
    sid = int(snap["snapshot-id"]) + 1
    puffin = os.path.join(w.path, "data", f"dv-{uuid.uuid4().hex}.puffin")
    locs = (_hand_puffin(puffin, dvs_by_uri) if hand
            else write_puffin_dv_file(puffin, dvs_by_uri,
                                      snapshot_id=sid,
                                      sequence_number=seq))
    entries = []
    for ref in sorted(dvs_by_uri):
        off, ln = locs[ref]
        entries.append({
            "status": 1, "snapshot_id": sid,
            "sequence_number": seq, "file_sequence_number": seq,
            "data_file": {
                "content": 1, "file_path": puffin,
                "file_format": "PUFFIN", "partition": {},
                "record_count": len(set(dvs_by_uri[ref])),
                "file_size_in_bytes": os.path.getsize(puffin),
                "lower_bounds": None, "upper_bounds": None,
                "referenced_data_file": ref if with_address else None,
                "content_offset": off if with_address else None,
                "content_size_in_bytes": ln if with_address else None,
            },
        })
    dv_m = os.path.join(w.meta_dir, f"m-dv-{uuid.uuid4().hex}.avro")
    AvroFileWriter.write(dv_m, _dv_manifest_schema(), entries)
    carried = [
        dict(r) for r in AvroFileReader(
            rdr._resolve(snap["manifest-list"])).records
        if r.get("content", 0) == 0  # data manifests; old DVs replaced
    ]
    ml = os.path.join(w.meta_dir, f"snap-{sid}-{uuid.uuid4().hex}.avro")
    AvroFileWriter.write(ml, _MANIFEST_LIST_SCHEMA, carried + [{
        "manifest_path": dv_m,
        "manifest_length": os.path.getsize(dv_m),
        "partition_spec_id": 0, "content": 1,
        "sequence_number": seq, "min_sequence_number": seq,
        "added_snapshot_id": sid,
        "added_files_count": len(entries), "existing_files_count": 0,
        "deleted_files_count": 0,
        "added_rows_count": sum(
            len(set(v)) for v in dvs_by_uri.values()),
        "existing_rows_count": 0, "deleted_rows_count": 0,
    }])
    md = dict(cur)
    md["last-sequence-number"] = seq
    md["current-snapshot-id"] = sid
    md["snapshots"] = list(cur["snapshots"]) + [{
        "snapshot-id": sid, "sequence-number": seq,
        "parent-snapshot-id": snap["snapshot-id"],
        "timestamp-ms": 99 + sid, "manifest-list": ml,
        "summary": {"operation": summary_op},
    }]
    with open(os.path.join(w.meta_dir, f"v{base_v + 1}.metadata.json"),
              "w") as f:
        json.dump(md, f)
    with open(os.path.join(w.meta_dir, "version-hint.text"), "w") as f:
        f.write(str(base_v + 1))
    return sid


def _uris(w):
    """Recorded data-file URIs ordered by data sequence number —
    [0] is the first append's file (k = 0..3)."""
    data, _p, _e, _d = IcebergTable(w.path)._files(None)
    return [u for _p2, u, _s in sorted(data, key=lambda t: t[2] or 0)]


class TestPuffinCodec:
    def test_encoder_agrees_with_hand_encoding(self, tmp_path):
        dvs = {"a.parquet": [0, 5, 7, 1 << 33], "b.parquet": [2]}
        p1 = str(tmp_path / "hand.puffin")
        p2 = str(tmp_path / "ours.puffin")
        _hand_puffin(p1, dvs)
        write_puffin_dv_file(p2, dvs, snapshot_id=1, sequence_number=1)
        assert open(p1, "rb").read() == open(p2, "rb").read()
        assert puffin_dvs(p1) == {k: sorted(v) for k, v in dvs.items()}

    def test_corrupt_blob_refuses(self, tmp_path):
        p = str(tmp_path / "c.puffin")
        locs = _hand_puffin(p, {"a.parquet": [1, 2]})
        raw = bytearray(open(p, "rb").read())
        off, _ln = locs["a.parquet"]
        raw[off + 6] ^= 0x40  # flip a bitmap byte -> CRC mismatch
        open(p, "wb").write(bytes(raw))
        with pytest.raises(ValueError, match="checksum"):
            puffin_dv_positions(p, *locs["a.parquet"])

    def test_compressed_footer_refuses(self, tmp_path):
        p = str(tmp_path / "z.puffin")
        _hand_puffin(p, {"a.parquet": [1]})
        raw = bytearray(open(p, "rb").read())
        raw[-8] |= 0x01  # footer-compressed flag
        open(p, "wb").write(bytes(raw))
        with pytest.raises(NotImplementedError, match="compressed"):
            puffin_dvs(p)


class TestV3DvScans:
    @pytest.mark.parametrize("with_address", [True, False])
    def test_snapshot_applies_dvs(self, spark, tmp_path, with_address):
        w = _v3_table(spark, tmp_path, f"s{with_address}")
        uri_a = _uris(w)[0]  # the k=0..3 file
        _commit_dv_snapshot(w, {uri_a: [1, 3]}, with_address=with_address)
        t = IcebergTable(w.path)
        got = sorted(r["k"] for r in t.snapshot(spark).collect())
        assert got == [0, 2, 10, 11, 12]
        # time travel below the DV still reads everything
        first = t.snapshots()[0]["snapshot-id"]
        assert t.snapshot(spark, snapshot_id=first).count() == 4
        # raw path list refuses under live DVs
        with pytest.raises(ValueError, match="delete files"):
            t.live_paths()

    def test_changes_cdf_emits_flipped_rows(self, spark, tmp_path):
        w = _v3_table(spark, tmp_path, "flip")
        uri_a = _uris(w)[0]
        s1 = _commit_dv_snapshot(w, {uri_a: [1, 3]})
        _commit_dv_snapshot(w, {uri_a: [0, 1, 3]})  # flip: +pos 0
        t = IcebergTable(w.path)
        feed = t.changes_cdf(spark, s1)
        rows = [(r["k"], r["_change_type"]) for r in feed.collect()]
        assert rows == [(0, "delete")]
        # the full window since the pre-DV snapshot sees all three
        first = t.snapshots()[1]["snapshot-id"]
        feed2 = t.changes_cdf(spark, first)
        assert sorted(
            (r["k"], r["_change_type"]) for r in feed2.collect()
        ) == [(0, "delete"), (1, "delete"), (3, "delete")]

    def test_non_superset_flip_refuses(self, spark, tmp_path):
        w = _v3_table(spark, tmp_path, "bad")
        uri_a = _uris(w)[0]
        s1 = _commit_dv_snapshot(w, {uri_a: [1, 3]})
        _commit_dv_snapshot(w, {uri_a: [2]})  # drops 1,3 — resurrects
        with pytest.raises(ValueError, match="NON-superset"):
            IcebergTable(w.path).changes_cdf(spark, s1).collect()

    def test_mutations_under_live_dvs(self, spark, tmp_path):
        """v3 DELETE under a live hand-written DV merges into a
        superset vector (one-DV-per-file rule); OPTIMIZE — a COW
        rewrite that cannot keep _row_id — still refuses loudly."""
        w = _v3_table(spark, tmp_path, "mut")
        uri_a = _uris(w)[0]
        _commit_dv_snapshot(w, {uri_a: [1]})
        res = w.delete(spark, "k = 0")
        assert res["rows_deleted"] == 1
        t = IcebergTable(w.path)
        got = sorted(r["k"] for r in t.snapshot(spark).collect())
        assert got == [2, 3, 10, 11, 12]
        # the merged vector is a superset — the CDF flip algebra holds
        dv_map = t._dv_positions_map(t._files(None)[3])
        assert sorted(dv_map[uri_a]) == [0, 1]
        # OPTIMIZE works since round 14's second half: the purge pass
        # materializes row lineage and retires the vectors
        assert w.optimize(spark) is not None
        t2 = IcebergTable(w.path)
        assert not t2._files(None)[3], "vectors purged"
        assert sorted(r["k"] for r in t2.snapshot(spark).collect()) == [
            2, 3, 10, 11, 12]
