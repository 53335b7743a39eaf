"""Delta Lake DELETION VECTOR decoding — the read half of the last
merge-on-read gap: aged production Delta tables carry DV'd adds, and
until round 11 ``DeltaLogTable`` refused them wholesale ("scanning the
file raw would resurrect deleted rows"). This module decodes the
vectors so ``snapshot()`` can apply them instead.

Formats implemented from the PUBLIC specs, nothing else:

- Delta PROTOCOL.md "Deletion Vector Descriptor" + "Deletion Vector
  File Storage Format" (https://github.com/delta-io/delta/blob/master/
  PROTOCOL.md): the descriptor's ``storageType`` is ``'i'`` (inline —
  ``pathOrInlineDv`` IS the z85-encoded data), ``'u'`` (a file under
  the table root whose name derives from a z85-encoded UUID with an
  optional random prefix), or ``'p'`` (absolute path). DV files start
  with a 1-byte format version (= 1); each vector sits at the
  descriptor's ``offset`` as ``<dataSize: int32 BE>`` then ``dataSize``
  bytes of data — a 4-byte magic (1681511377, little-endian like the
  bitmap payload it frames) followed by the serialized 64-bit roaring
  bitmap — then ``<CRC-32 of the data: int32 BE>``.
- Z85 (ZeroMQ spec 32, https://rfc.zeromq.org/spec/32/): 5 printable
  chars per 4 big-endian bytes over the fixed 85-char alphabet.
- RoaringBitmapArray "portable" 64-bit serialization (delta-io's
  public RoaringBitmapArray, stated in PROTOCOL.md): ``<number of
  32-bit buckets: int64 LE>`` then per bucket ``<key: int32 LE>`` +
  one standard 32-bit RoaringBitmap in the OFFICIAL roaring format
  (https://github.com/RoaringBitmap/RoaringFormatSpec): cookie 12346
  (no run containers, container count in the next int32) or 12347
  (run containers; count-1 rides the cookie's upper 16 bits, then a
  run-flag bitset), descriptive header of (key, cardinality-1) uint16
  pairs, an offset header when required, then array (uint16 values) /
  bitmap (8 KiB bitset) / run (count + (start, length) pairs)
  containers.

The test fixtures hand-encode these formats independently (the same
two-path methodology as the Avro/WAV/PPM codecs) — agreement between
this decoder and those fixtures is evidence both follow the published
byte layouts, not that they share bugs.

Scale note: positions decode driver-side here (a DV is KBs — it rides
the add action's file, not the data); at warehouse scale a DV-heavy
snapshot would evaluate bitmaps executor-side against
``_metadata.row_index``. The join shape in ``DeltaLogTable.snapshot``
is identical either way: (file, position) LEFT ANTI, the same plan as
Iceberg position deletes.
"""

from __future__ import annotations

import os
import struct
import zlib

_Z85_ALPHABET = (
    "0123456789abcdefghijklmnopqrstuvwxyz"
    "ABCDEFGHIJKLMNOPQRSTUVWXYZ.-:+=^!/*?&<>()[]{}@%$#"
)
_Z85_INDEX = {c: i for i, c in enumerate(_Z85_ALPHABET)}

# RoaringFormatSpec constants
_SERIAL_COOKIE_NO_RUN = 12346
_SERIAL_COOKIE = 12347
_NO_OFFSET_THRESHOLD = 4

_DV_MAGIC = 1681511377
_MAX_POSITIONS = 10_000_000  # refuse absurd driver-side decodes loudly


def z85_encode(b: bytes) -> str:
    """ZeroMQ Z85: 4 big-endian bytes → 5 chars. Strict per spec 32 —
    length must be a multiple of 4 (DV callers pad and record the true
    length in the descriptor's ``sizeInBytes``, which the decode path
    trims by)."""
    if len(b) % 4:
        raise ValueError(f"z85 input length {len(b)} is not a multiple of 4")
    out = []
    for i in range(0, len(b), 4):
        (acc,) = struct.unpack_from(">I", b, i)
        chunk = []
        for _ in range(5):
            acc, rem = divmod(acc, 85)
            chunk.append(_Z85_ALPHABET[rem])
        out.extend(reversed(chunk))
    return "".join(out)


def z85_decode(s: str) -> bytes:
    """ZeroMQ Z85: 5 chars → 4 big-endian bytes."""
    if len(s) % 5:
        raise ValueError(f"z85 length {len(s)} is not a multiple of 5")
    out = bytearray()
    for i in range(0, len(s), 5):
        acc = 0
        for ch in s[i : i + 5]:
            if ch not in _Z85_INDEX:
                raise ValueError(f"invalid z85 character {ch!r}")
            acc = acc * 85 + _Z85_INDEX[ch]
        if acc > 0xFFFFFFFF:
            raise ValueError("z85 group overflows 32 bits")
        out += struct.pack(">I", acc)
    return bytes(out)


def _decode_rb32(buf: bytes, pos: int) -> tuple[list[int], int]:
    """One standard 32-bit RoaringBitmap at ``pos``; returns (sorted
    values, next offset)."""
    (cookie,) = struct.unpack_from("<I", buf, pos)
    base = pos
    run_flags: list[bool]
    if (cookie & 0xFFFF) == _SERIAL_COOKIE:
        n = (cookie >> 16) + 1
        pos += 4
        nbytes = (n + 7) // 8
        bits = buf[pos : pos + nbytes]
        run_flags = [bool(bits[i // 8] >> (i % 8) & 1) for i in range(n)]
        pos += nbytes
    elif cookie == _SERIAL_COOKIE_NO_RUN:
        (n,) = struct.unpack_from("<I", buf, pos + 4)
        pos += 8
        run_flags = [False] * n
    else:
        raise ValueError(f"unknown roaring cookie {cookie}")
    keys: list[int] = []
    cards: list[int] = []
    for i in range(n):
        k, c_minus_1 = struct.unpack_from("<HH", buf, pos)
        keys.append(k)
        cards.append(c_minus_1 + 1)
        pos += 4
    has_offsets = cookie == _SERIAL_COOKIE_NO_RUN or n >= _NO_OFFSET_THRESHOLD
    offsets: list[int] | None = None
    if has_offsets:
        offsets = [
            struct.unpack_from("<I", buf, pos + 4 * i)[0] for i in range(n)
        ]
        pos += 4 * n
    values: list[int] = []
    for i in range(n):
        cpos = base + offsets[i] if offsets is not None else pos
        hi = keys[i] << 16
        if run_flags[i]:
            (n_runs,) = struct.unpack_from("<H", buf, cpos)
            cpos += 2
            for _ in range(n_runs):
                start, length = struct.unpack_from("<HH", buf, cpos)
                cpos += 4
                values.extend(hi | v for v in range(start, start + length + 1))
        elif cards[i] > 4096:  # bitmap container: fixed 8 KiB bitset
            bits = buf[cpos : cpos + 8192]
            if len(bits) < 8192:
                raise ValueError("truncated roaring bitmap container")
            for byte_i, b in enumerate(bits):
                while b:
                    low = b & -b
                    values.append(hi | (byte_i * 8 + low.bit_length() - 1))
                    b ^= low
            cpos += 8192
        else:  # array container
            vals = struct.unpack_from(f"<{cards[i]}H", buf, cpos)
            values.extend(hi | v for v in vals)
            cpos += 2 * cards[i]
        if offsets is None:
            pos = cpos
    if offsets is not None:
        # next bitmap starts after the furthest container
        ends = []
        for i in range(n):
            c0 = base + offsets[i]
            if run_flags[i]:
                (n_runs,) = struct.unpack_from("<H", buf, c0)
                ends.append(c0 + 2 + 4 * n_runs)
            elif cards[i] > 4096:
                ends.append(c0 + 8192)
            else:
                ends.append(c0 + 2 * cards[i])
        pos = max(ends) if ends else pos
    return sorted(values), pos


def roaring64_positions(buf: bytes) -> list[int]:
    """Decode a portable-format 64-bit RoaringBitmapArray into its
    sorted member positions."""
    (n_buckets,) = struct.unpack_from("<q", buf, 0)
    if n_buckets < 0:
        raise ValueError(f"negative roaring bucket count {n_buckets}")
    pos = 8
    out: list[int] = []
    for _ in range(n_buckets):
        (key,) = struct.unpack_from("<I", buf, pos)
        pos += 4
        vals, pos = _decode_rb32(buf, pos)
        hi = key << 32
        out.extend(hi | v for v in vals)
        if len(out) > _MAX_POSITIONS:
            raise NotImplementedError(
                f"deletion vector carries more than {_MAX_POSITIONS} "
                "positions — this driver-side decoder refuses; use a "
                "full Delta client (or executor-side bitmap evaluation)"
            )
    return out


def _dv_payload(blob: bytes, offset: int | None) -> bytes:
    """Extract one vector's DATA bytes from a DV file/inline blob:
    ``<dataSize: int32 BE> <data> <CRC-32(data): int32 BE>`` at
    ``offset`` — checksum verified (silently corrupt positions would
    resurrect/over-delete rows)."""
    if offset is None:
        return blob  # inline: pathOrInlineDv IS the data
    (size,) = struct.unpack_from(">i", blob, offset)
    data = blob[offset + 4 : offset + 4 + size]
    if len(data) != size:
        raise ValueError("truncated deletion vector data")
    (crc,) = struct.unpack_from(">I", blob, offset + 4 + size)
    if zlib.crc32(data) & 0xFFFFFFFF != crc:
        raise ValueError("deletion vector checksum mismatch")
    return data


def _dv_bitmap(data: bytes) -> list[int]:
    (magic,) = struct.unpack_from("<i", data, 0)
    if magic != _DV_MAGIC:
        raise ValueError(
            f"deletion vector magic {magic} != {_DV_MAGIC} — corrupt or "
            "an unknown serialization"
        )
    return roaring64_positions(data[4:])


def dv_file_path(table_path: str, path_or_uuid: str) -> str:
    """Resolve a storageType='u' descriptor: the LAST 20 chars are the
    z85-encoded UUID, anything before is the random prefix directory
    (the spec's S3-key-spreading trick)."""
    import uuid as _uuid

    if len(path_or_uuid) < 20:
        raise ValueError(
            f"storageType=u pathOrInlineDv {path_or_uuid!r} is shorter "
            "than a z85 uuid"
        )
    prefix, enc = path_or_uuid[:-20], path_or_uuid[-20:]
    u = _uuid.UUID(bytes=z85_decode(enc))
    name = f"deletion_vector_{u}.bin"
    return os.path.join(table_path, prefix, name) if prefix else os.path.join(
        table_path, name
    )


def dv_positions(table_path: str, dv: dict) -> list[int]:
    """Deleted row ordinals for one add action's deletionVector
    descriptor — the sorted positions the scan must drop."""
    st = dv.get("storageType")
    if st == "i":
        data = _dv_payload(z85_decode(dv["pathOrInlineDv"]), None)
        size = dv.get("sizeInBytes")
        if size is not None and len(data) > int(size):
            # z85 pads to 4-byte groups; sizeInBytes is the true length
            data = data[: int(size)]
    elif st in ("u", "p"):
        fpath = (
            dv["pathOrInlineDv"]
            if st == "p"
            else dv_file_path(table_path, dv["pathOrInlineDv"])
        )
        with open(fpath, "rb") as f:
            blob = f.read()
        if not blob or blob[0] != 1:
            raise ValueError(
                f"deletion vector file {fpath} has format version "
                f"{blob[0] if blob else 'EMPTY'} (expected 1)"
            )
        data = _dv_payload(blob, int(dv["offset"]))
    else:
        raise NotImplementedError(
            f"deletionVector storageType {st!r} — the spec defines "
            "i/u/p only; use a full Delta client"
        )
    positions = _dv_bitmap(data)
    card = dv.get("cardinality")
    if card is not None and int(card) != len(positions):
        raise ValueError(
            f"deletion vector cardinality {card} != decoded "
            f"{len(positions)} positions — corrupt descriptor"
        )
    return positions


# -- encode half (round 11): merge-on-read DELETE writes vectors ----------
#
# The writer is the schema-driven twin of the decoder above, emitting the
# same three published layouts (official RoaringFormatSpec with the NO_RUN
# cookie — run containers are a size optimization the spec makes optional
# for writers; every compliant reader, including ours, accepts both).
# Round-trip agreement with the decoder is NOT the correctness argument —
# the decoder was pinned against hand-encoded byte fixtures, so the writer
# is proven against an independently-validated reader (the established
# two-path codec methodology), plus its own byte-level pins in tests.


def _encode_rb32(values: list[int]) -> bytes:
    """One standard 32-bit RoaringBitmap (sorted distinct uint32 in;
    official format out, cookie 12346 — offset header always present)."""
    buckets: dict[int, list[int]] = {}
    for v in values:
        buckets.setdefault(v >> 16, []).append(v & 0xFFFF)
    keys = sorted(buckets)
    n = len(keys)
    head = struct.pack("<II", _SERIAL_COOKIE_NO_RUN, n)
    desc = b"".join(
        struct.pack("<HH", k, len(buckets[k]) - 1) for k in keys
    )
    payloads = []
    for k in keys:
        lows = buckets[k]
        if len(lows) > 4096:  # bitmap container: fixed 8 KiB bitset
            bits = bytearray(8192)
            for lo in lows:
                bits[lo >> 3] |= 1 << (lo & 7)
            payloads.append(bytes(bits))
        else:  # array container
            payloads.append(struct.pack(f"<{len(lows)}H", *lows))
    offsets = []
    at = len(head) + len(desc) + 4 * n
    for p in payloads:
        offsets.append(at)
        at += len(p)
    return (
        head + desc
        + b"".join(struct.pack("<I", o) for o in offsets)
        + b"".join(payloads)
    )


def roaring64_serialize(positions: list[int]) -> bytes:
    """Portable-format 64-bit RoaringBitmapArray from sorted distinct
    row ordinals — the payload a Delta deletion vector frames."""
    buckets: dict[int, list[int]] = {}
    for p in positions:
        if p < 0:
            raise ValueError(f"negative row ordinal {p}")
        buckets.setdefault(p >> 32, []).append(p & 0xFFFFFFFF)
    out = [struct.pack("<q", len(buckets))]
    for key in sorted(buckets):
        out.append(struct.pack("<I", key))
        out.append(_encode_rb32(sorted(set(buckets[key]))))
    return b"".join(out)


def dv_data(positions: list[int]) -> bytes:
    """The DATA bytes of one vector: the little-endian magic framing
    the serialized 64-bit roaring bitmap (what CRC-32 covers and what
    ``sizeInBytes`` measures)."""
    return struct.pack("<i", _DV_MAGIC) + roaring64_serialize(
        sorted(set(positions))
    )


def write_dv_file(table_path: str, vectors: list[list[int]]) -> tuple[str, list[dict]]:
    """Write one on-disk DV FILE holding ``vectors`` (one per mutated
    data file, sharing the blob like production writers do) and return
    (pathOrInlineDv for storageType='u', one descriptor dict per
    vector). Layout per PROTOCOL.md: 1-byte format version, then per
    vector ``<dataSize: int32 BE> <data> <CRC-32(data): int32 BE>``."""
    import uuid as _uuid

    u = _uuid.uuid4()
    blob = bytearray(b"\x01")
    descs: list[dict] = []
    enc = z85_encode(u.bytes)
    for pos in vectors:
        data = dv_data(pos)
        offset = len(blob)
        blob += struct.pack(">i", len(data))
        blob += data
        blob += struct.pack(">I", zlib.crc32(data) & 0xFFFFFFFF)
        descs.append({
            "storageType": "u",
            "pathOrInlineDv": enc,
            "offset": offset,
            "sizeInBytes": len(data),
            "cardinality": len(set(pos)),
        })
    fpath = os.path.join(table_path, f"deletion_vector_{u}.bin")
    with open(fpath, "xb") as f:
        f.write(bytes(blob))
    return enc, descs


def inline_dv_descriptor(positions: list[int]) -> dict:
    """A storageType='i' descriptor — the vector rides the add action
    itself (z85 pads to 4-byte groups; ``sizeInBytes`` records the
    true length the decoder trims to)."""
    data = dv_data(positions)
    padded = data + b"\x00" * (-len(data) % 4)
    return {
        "storageType": "i",
        "pathOrInlineDv": z85_encode(padded),
        "sizeInBytes": len(data),
        "cardinality": len(set(positions)),
    }


# --- Iceberg v3 Puffin deletion vectors (round 14) -----------------------
#
# Formats implemented from the PUBLIC specs, nothing else:
# - Puffin file format (https://iceberg.apache.org/puffin-spec/):
#   ``Magic Blob₁ … Blobₙ Footer`` with Magic = "PFA1"; Footer =
#   ``Magic FooterPayload FooterPayloadSize(int32 LE) Flags(4 bytes)
#   Magic``. FooterPayload is JSON: {"blobs": [{type, fields,
#   snapshot-id, sequence-number, offset, length, compression-codec?,
#   properties?}, …], "properties"?: {…}}. Flags bit 0 of byte 0 =
#   footer payload is LZ4-compressed (refused — optional per spec and
#   no lz4 in this container).
# - Iceberg spec v3 "Position Delete Vectors": the deletion-vector-v1
#   blob is ``<len(magic+vector): int32 BE> <magic: 0xD1D33964 stored
#   little-endian> <vector: 64-bit RoaringBitmapArray "portable">
#   <CRC-32(magic+vector): int32 BE>`` — byte-identical framing to a
#   Delta DV (same magic, same bitmap serialization), so the Delta
#   helpers above decode it; the blob's ``properties`` carry
#   ``referenced-data-file`` and ``cardinality``, and the v3 manifest
#   entry mirrors them in ``referenced_data_file`` /
#   ``content_offset`` / ``content_size_in_bytes``.

PUFFIN_MAGIC = b"PFA1"


def puffin_footer(path: str) -> dict:
    """Parse a Puffin file's footer payload (blob index + properties).
    Loud on every malformed shape — a misread index would apply the
    wrong rows' deletes."""
    import json as _json

    with open(path, "rb") as f:
        raw = f.read()
    if len(raw) < 20 or raw[:4] != PUFFIN_MAGIC or raw[-4:] != PUFFIN_MAGIC:
        raise ValueError(f"{path}: not a Puffin file (bad magic)")
    flags = raw[-8:-4]
    (payload_size,) = struct.unpack_from("<i", raw, len(raw) - 12)
    if flags[0] & 0x01:
        raise NotImplementedError(
            f"{path}: Puffin footer payload is compressed — this "
            "reader only decodes uncompressed footers"
        )
    if flags[0] & ~0x01 or any(flags[1:]):
        raise NotImplementedError(
            f"{path}: unknown Puffin footer flags {flags.hex()} — "
            "refusing to guess their semantics"
        )
    start = len(raw) - 12 - payload_size
    if start < 8 or raw[start - 4:start] != PUFFIN_MAGIC:
        raise ValueError(
            f"{path}: Puffin footer payload size {payload_size} does "
            "not land on the footer magic — corrupt"
        )
    return _json.loads(raw[start:start + payload_size].decode("utf-8"))


def puffin_dv_positions(path: str, offset: int, size: int | None) -> list[int]:
    """Deleted row ordinals from ONE deletion-vector-v1 blob at
    ``offset`` (the manifest entry's ``content_offset``); ``size``
    (``content_size_in_bytes``) is verified against the framed length
    when given. CRC-verified via the shared Delta framing decoder."""
    with open(path, "rb") as f:
        f.seek(offset)
        head = f.read(4)
        if len(head) != 4:
            raise ValueError(f"{path}: truncated DV blob at {offset}")
        (dlen,) = struct.unpack(">i", head)
        rest = f.read(dlen + 4)
    if size is not None and dlen + 8 != int(size):
        raise ValueError(
            f"{path}: DV blob at {offset} frames {dlen + 8} bytes but "
            f"the manifest records content_size_in_bytes={size} — "
            "corrupt metadata"
        )
    return _dv_bitmap(_dv_payload(head + rest, 0))


def puffin_dvs(path: str) -> dict[str, list[int]]:
    """referenced-data-file → deleted positions for every
    deletion-vector-v1 blob in the file (the footer-driven fallback
    when a manifest entry omits content_offset). Unknown blob types
    are SKIPPED per the Puffin spec (readers ignore blobs they don't
    understand); a DV blob without referenced-data-file refuses."""
    out: dict[str, list[int]] = {}
    for blob in puffin_footer(path).get("blobs", []):
        if blob.get("type") != "deletion-vector-v1":
            continue
        if blob.get("compression-codec"):
            raise NotImplementedError(
                f"{path}: DV blob compressed with "
                f"{blob['compression-codec']} — refusing"
            )
        ref = (blob.get("properties") or {}).get("referenced-data-file")
        if not ref:
            raise ValueError(
                f"{path}: deletion-vector-v1 blob without "
                "referenced-data-file — its reach is undefined"
            )
        pos = puffin_dv_positions(
            path, int(blob["offset"]), blob.get("length")
        )
        if ref in out and sorted(out[ref]) != sorted(pos):
            raise ValueError(
                f"{path}: two different DVs reference {ref} — at most "
                "one DV per data file may be live (corrupt index)"
            )
        out[ref] = pos
    return out


def write_puffin_dv_file(
    path: str, dvs: dict[str, list[int]], snapshot_id: int = 0,
    sequence_number: int = 0,
) -> dict[str, tuple[int, int]]:
    """Write a Puffin file holding one deletion-vector-v1 blob per
    referenced data file; returns referenced-uri → (content_offset,
    content_size_in_bytes) for manifest entries. The write half of the
    v3 DV story (and the tests' independent round-trip partner is the
    READER's two-path fixtures, which hand-encode frames without this
    function)."""
    import json as _json

    blobs_meta = []
    body = bytearray(PUFFIN_MAGIC)
    out: dict[str, tuple[int, int]] = {}
    for ref in sorted(dvs):
        pos = sorted(set(dvs[ref]))
        data = dv_data(pos)
        offset = len(body)
        framed = (
            struct.pack(">i", len(data)) + data
            + struct.pack(">I", zlib.crc32(data) & 0xFFFFFFFF)
        )
        body += framed
        out[ref] = (offset, len(framed))
        blobs_meta.append({
            "type": "deletion-vector-v1",
            "fields": [],
            "snapshot-id": snapshot_id,
            "sequence-number": sequence_number,
            "offset": offset,
            "length": len(framed),
            "properties": {
                "referenced-data-file": ref,
                "cardinality": str(len(pos)),
            },
        })
    payload = _json.dumps({"blobs": blobs_meta}).encode("utf-8")
    body += PUFFIN_MAGIC
    body += payload
    body += struct.pack("<i", len(payload))
    body += b"\x00\x00\x00\x00"
    body += PUFFIN_MAGIC
    with open(path, "xb") as f:
        f.write(bytes(body))
    return out
