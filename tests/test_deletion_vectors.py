"""Delta deletion-vector decoding + scan application
(operators/deletion_vectors.py, DeltaLogTable.snapshot).

Methodology as everywhere in the interop layer: the tests hand-encode
the published byte formats (ZeroMQ Z85, the official RoaringFormatSpec
32-bit layout inside delta-io's portable 64-bit wrapper, Delta
PROTOCOL.md's DV file framing) through their own encoders below; the
engine decodes through its independent implementation. Agreement is
evidence both follow the specs."""

import json
import os
import struct
import zlib

import pytest

from algebraicdb_spark.operators.deletion_vectors import (
    _DV_MAGIC,
    dv_file_path,
    dv_positions,
    roaring64_positions,
    z85_decode,
)

Z85_ALPHABET = (
    "0123456789abcdefghijklmnopqrstuvwxyz"
    "ABCDEFGHIJKLMNOPQRSTUVWXYZ.-:+=^!/*?&<>()[]{}@%$#"
)


def z85_encode(b: bytes) -> str:
    assert len(b) % 4 == 0
    out = []
    for i in range(0, len(b), 4):
        (acc,) = struct.unpack(">I", b[i : i + 4])
        chunk = []
        for _ in range(5):
            chunk.append(Z85_ALPHABET[acc % 85])
            acc //= 85
        out.extend(reversed(chunk))
    return "".join(out)


# ---- hand encoders for the roaring formats (spec, not the engine) ----

def rb32(containers: list[tuple[int, str, list]]) -> bytes:
    """One 32-bit RoaringBitmap. containers = [(key16, kind, payload)]
    with kind 'array' (payload = sorted uint16 values) or 'run'
    (payload = [(start, length)] pairs). Encodes the RUN cookie form
    (12347) — flags bitset, offsets present iff n >= 4."""
    n = len(containers)
    out = struct.pack("<I", 12347 | ((n - 1) << 16))
    bits = bytearray((n + 7) // 8)
    for i, (_k, kind, _p) in enumerate(containers):
        if kind == "run":
            bits[i // 8] |= 1 << (i % 8)
    out += bytes(bits)
    bodies = []
    for _k, kind, payload in containers:
        if kind == "array":
            bodies.append(struct.pack(f"<{len(payload)}H", *payload))
            card = len(payload)
        else:
            body = struct.pack("<H", len(payload))
            for start, length in payload:
                body += struct.pack("<HH", start, length)
            bodies.append(body)
            card = sum(ln + 1 for _s, ln in payload)
        out += b""  # desc header written below with cardinality
    desc = b"".join(
        struct.pack(
            "<HH",
            k,
            (len(p) if kind == "array"
             else sum(ln + 1 for _s, ln in p)) - 1,
        )
        for k, kind, p in containers
    )
    out += desc
    if n >= 4:
        # offset header: positions relative to the bitmap start
        off = len(out) + 4 * n
        offsets = []
        for b in bodies:
            offsets.append(off)
            off += len(b)
        out += b"".join(struct.pack("<I", o) for o in offsets)
    return out + b"".join(bodies)


def rb32_bitmap_container(key16: int, values: list[int]) -> bytes:
    """The 12346 (no-run) cookie form with ONE bitmap container
    (cardinality > 4096) and the mandatory offset header."""
    assert len(values) > 4096
    bits = bytearray(8192)
    for v in values:
        bits[v // 8] |= 1 << (v % 8)
    head = struct.pack("<II", 12346, 1)
    desc = struct.pack("<HH", key16, len(values) - 1)
    offset = struct.pack("<I", len(head) + len(desc) + 4)
    return head + desc + offset + bytes(bits)


def roaring64(buckets: list[tuple[int, bytes]]) -> bytes:
    out = struct.pack("<q", len(buckets))
    for key32, rb in buckets:
        out += struct.pack("<I", key32) + rb
    return out


def dv_blob(bitmap64: bytes) -> bytes:
    """The DATA bytes of one vector: magic + serialized bitmap."""
    return struct.pack("<i", _DV_MAGIC) + bitmap64


def dv_file(vectors: list[bytes]) -> tuple[bytes, list[int]]:
    """A DV FILE: 1-byte version then per vector
    <size BE><data><crc32(data) BE>; returns (blob, offsets)."""
    blob = b"\x01"
    offsets = []
    for data in vectors:
        offsets.append(len(blob))
        blob += struct.pack(">i", len(data)) + data
        blob += struct.pack(">I", zlib.crc32(data) & 0xFFFFFFFF)
    return blob, offsets


class TestRoaringAndZ85:
    def test_z85_spec_vector(self):
        # the ZeroMQ spec's published test vector
        assert z85_decode("HelloWorld") == bytes(
            [0x86, 0x4F, 0xD2, 0x6F, 0xB5, 0x59, 0xF7, 0x5B]
        )
        assert z85_encode(bytes(
            [0x86, 0x4F, 0xD2, 0x6F, 0xB5, 0x59, 0xF7, 0x5B]
        )) == "HelloWorld"
        with pytest.raises(ValueError, match="multiple of 5"):
            z85_decode("abc")

    def test_array_and_run_containers(self):
        rb = rb32([
            (0, "array", [1, 5, 7]),
            (2, "run", [(10, 2), (100, 0)]),  # 10,11,12,100
        ])
        got = roaring64_positions(roaring64([(0, rb)]))
        assert got == [
            1, 5, 7,
            (2 << 16) | 10, (2 << 16) | 11, (2 << 16) | 12,
            (2 << 16) | 100,
        ]

    def test_offset_header_form_and_bitmap_container(self):
        # ≥4 containers forces the offset header path in the 12347 form
        rb = rb32([
            (0, "array", [0]),
            (1, "array", [1]),
            (2, "run", [(2, 1)]),
            (3, "array", [3]),
        ])
        got = roaring64_positions(roaring64([(0, rb)]))
        assert got == [0, (1 << 16) | 1, (2 << 16) | 2, (2 << 16) | 3,
                       (3 << 16) | 3]
        # bitmap container through the 12346 no-run form
        vals = list(range(0, 10000, 2))  # 5000 values > 4096
        rb2 = rb32_bitmap_container(7, vals)
        got2 = roaring64_positions(roaring64([(0, rb2)]))
        assert got2 == [(7 << 16) | v for v in vals]

    def test_multi_bucket_64bit(self):
        rb = rb32([(0, "array", [42])])
        got = roaring64_positions(roaring64([(0, rb), (1, rb)]))
        assert got == [42, (1 << 32) | 42]

    def test_checksum_and_magic_refusals(self, tmp_path):
        bitmap = roaring64([(0, rb32([(0, "array", [1])]))])
        blob, offs = dv_file([dv_blob(bitmap)])
        p = tmp_path / "dv.bin"
        p.write_bytes(blob)
        desc = {"storageType": "p", "pathOrInlineDv": str(p),
                "offset": offs[0], "sizeInBytes": 0, "cardinality": 1}
        assert dv_positions("/x", desc) == [1]
        # flipped payload byte → checksum mismatch
        bad = bytearray(blob)
        bad[10] ^= 0xFF
        (tmp_path / "bad.bin").write_bytes(bytes(bad))
        with pytest.raises(ValueError, match="checksum|magic"):
            dv_positions("/x", dict(desc, pathOrInlineDv=str(
                tmp_path / "bad.bin")))
        # wrong magic
        blob2, offs2 = dv_file([struct.pack("<i", 999) + bitmap])
        (tmp_path / "m.bin").write_bytes(blob2)
        with pytest.raises(ValueError, match="magic"):
            dv_positions("/x", dict(
                desc, pathOrInlineDv=str(tmp_path / "m.bin"),
                offset=offs2[0], cardinality=None))
        # cardinality disagreement
        with pytest.raises(ValueError, match="cardinality"):
            dv_positions("/x", dict(desc, cardinality=5))

    def test_uuid_storage_resolution(self, tmp_path):
        import uuid as _uuid

        u = _uuid.UUID("00112233-4455-6677-8899-aabbccddeeff")
        enc = z85_encode(u.bytes)
        assert dv_file_path(str(tmp_path), enc) == os.path.join(
            str(tmp_path), f"deletion_vector_{u}.bin"
        )
        # a random prefix becomes a subdirectory (the spec's S3 trick)
        assert dv_file_path(str(tmp_path), "ab" + enc) == os.path.join(
            str(tmp_path), "ab", f"deletion_vector_{u}.bin"
        )


class TestDeltaDVScan:
    def _one_file_table(self, spark, tmp_path):
        """A standard delta table with ONE data file of known physical
        row order, built by the engine's own writer."""
        from algebraicdb_spark.operators.delta_writer import DeltaTableWriter

        root = str(tmp_path / "t")
        w = DeltaTableWriter(root)
        df = spark.createDataFrame(
            [(i, f"r{i}") for i in range(10)], "k long, s string"
        ).coalesce(1).sortWithinPartitions("k")
        w.append(df)
        log = os.path.join(root, "_delta_log")
        with open(os.path.join(log, f"{0:020d}.json")) as f:
            actions = [json.loads(line) for line in f]
        add = next(a["add"] for a in actions if "add" in a)
        return root, w, add

    def _readd_with_dv(self, root, add, dv_desc, version=1):
        with open(os.path.join(
            root, "_delta_log", f"{version:020d}.json"
        ), "x") as f:
            f.write(json.dumps({"remove": {
                "path": add["path"], "deletionTimestamp": 1,
                "dataChange": True}}) + "\n")
            f.write(json.dumps({"add": {
                **add, "dataChange": True, "deletionVector": dv_desc,
            }}) + "\n")

    def test_dv_applied_at_scan_file_and_inline(self, spark, tmp_path):
        from algebraicdb_spark.operators.txnlog import DeltaLogTable

        root, _w, add = self._one_file_table(spark, tmp_path)
        # a foreign writer deletes rows at positions 0, 3, 7 via a
        # UUID-stored DV
        import uuid as _uuid

        u = _uuid.uuid4()
        bitmap = roaring64([(0, rb32([(0, "array", [0, 3, 7])]))])
        blob, offs = dv_file([dv_blob(bitmap)])
        with open(os.path.join(
            root, f"deletion_vector_{u}.bin"
        ), "wb") as f:
            f.write(blob)
        self._readd_with_dv(root, add, {
            "storageType": "u", "pathOrInlineDv": z85_encode(u.bytes),
            "offset": offs[0], "sizeInBytes": len(blob), "cardinality": 3,
        })
        t = DeltaLogTable(root)
        # physical order = sorted k (the fixture sorted one partition),
        # so positions 0/3/7 are k = 0/3/7
        got = sorted(r["k"] for r in t.snapshot(spark).collect())
        assert got == [1, 2, 4, 5, 6, 8, 9]
        # time travel BELOW the DV commit sees all rows
        assert t.snapshot(spark, as_of=0).count() == 10
        # inline storage ('i'): pathOrInlineDv IS the z85 data — pad
        # the payload to a 4-byte multiple with a trailing NUL the
        # decoder never reads (size framing is absent inline)
        data = dv_blob(roaring64([(0, rb32([(0, "array", [5])]))]))
        pad = (-len(data)) % 4
        inline = z85_encode(data + b"\x00" * pad)
        self._readd_with_dv(root, dict(add), {
            "storageType": "i", "pathOrInlineDv": inline,
            "sizeInBytes": len(data), "cardinality": 1,
        }, version=2)
        got2 = sorted(r["k"] for r in t.snapshot(spark).collect())
        assert got2 == [0, 1, 2, 3, 4, 6, 7, 8, 9]

    def test_writers_honor_external_dv_tables(self, spark, tmp_path):
        """Graduated in round 11 (was: every writer path refuses):
        writer paths now HONOR a foreign engine's deletion vector —
        the hand-encoded external DV deletes k=0, and our DELETE must
        union with it, our OPTIMIZE purge it, our VACUUM tolerate it
        — never resurrect the row. The external vector is still the
        independent-encoder path (run-container roaring, our writer
        never emits runs)."""
        from algebraicdb_spark.operators.delta_writer import DeltaTableWriter
        from algebraicdb_spark.operators.txnlog import DeltaLogTable

        root, w, add = self._one_file_table(spark, tmp_path)
        bitmap = roaring64([(0, rb32([(0, "array", [0])]))])
        data = dv_blob(bitmap)
        pad = (-len(data)) % 4
        self._readd_with_dv(root, add, {
            "storageType": "i",
            "pathOrInlineDv": z85_encode(data + b"\x00" * pad),
            "sizeInBytes": len(data), "cardinality": 1,
        })
        assert DeltaLogTable(root).snapshot(spark).count() == 9
        w2 = DeltaTableWriter(root)
        # raw path lists still refuse — they cannot apply vectors
        with pytest.raises(NotImplementedError, match="deletion vector"):
            w2.live_paths()
        # a MoR delete UNIONS with the foreign vector (k=0 stays gone)
        res = w2.delete(spark, "k = 1", mode="mor")
        assert res["rows_deleted"] == 1
        t = DeltaLogTable(root)
        dvs = [dv for *_x, dv in t._live_entries_full() if dv]
        assert len(dvs) == 1 and dvs[0]["cardinality"] == 2
        assert sorted(r["k"] for r in t.snapshot(spark).collect()) == [
            2, 3, 4, 5, 6, 7, 8, 9,
        ]
        # OPTIMIZE purges the union; vacuum then reclaims the original
        assert w2.optimize(spark, min_inputs=1) is not None
        t = DeltaLogTable(root)
        assert not [dv for *_x, dv in t._live_entries_full() if dv]
        assert t.snapshot(spark).count() == 8
        w2.vacuum(retain_versions=1)
        assert DeltaLogTable(root).snapshot(spark).count() == 8

    def test_attach_and_select_through_engine(self, spark, tmp_path):
        from algebraicdb_spark.engine import Engine

        root, _w, add = self._one_file_table(spark, tmp_path)
        data = dv_blob(roaring64([(0, rb32([(0, "array", [2, 4])]))]))
        pad = (-len(data)) % 4
        self._readd_with_dv(root, add, {
            "storageType": "i",
            "pathOrInlineDv": z85_encode(data + b"\x00" * pad),
            "sizeInBytes": len(data), "cardinality": 2,
        })
        eng = Engine(spark)
        eng.sql(f"ATTACH TABLE mor FROM delta LOCATION '{root}'")
        assert eng.sql(
            "SELECT COUNT(*) AS n FROM mor").collect()[0]["n"] == 8
        assert eng.sql(
            "SELECT COUNT(*) AS n FROM mor WHERE k IN (2, 4)"
        ).collect()[0]["n"] == 0
