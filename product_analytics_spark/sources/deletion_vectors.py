"""Delta Lake deletion-vector storage (protocol v3 ``deletionVector``
descriptors): pure-Python encoder/decoder for the on-disk DV format.

Everything here implements PUBLIC specifications:

* Delta PROTOCOL.md, "Deletion Vectors" — the ``deletionVector``
  descriptor on ``add`` actions (storageType / pathOrInlineDv /
  offset / sizeInBytes / cardinality), the ``deletion_vector_<uuid>
  .bin`` file layout (1-byte format version, then per-DV
  ``[dataSize: int32 BE][data][checksum: int32 BE = CRC-32 of
  data]``, where ``data`` = 4-byte little-endian magic ``1681511377``
  + the serialized bitmap), and the Z85 text encoding of the UUID in
  ``pathOrInlineDv``.
* The RoaringBitmap interoperable serialization spec
  (RoaringFormatSpec) — the 32-bit "portable" container format
  (cookie 12346, descriptive headers, offset headers, array/bitset
  containers), extended to 64 bits the way Delta's
  ``RoaringBitmapArray`` "portable" flavor does: an 8-byte
  little-endian bucket count, then per bucket a 4-byte little-endian
  high-32-bit key followed by a standard 32-bit roaring bitmap of the
  low 32 bits.
* ZeroMQ Z85 (spec 32) — the base-85 alphabet Delta uses for
  ``pathOrInlineDv``.

The encoder always writes array or bitset containers (never run
containers) — a valid choice under the spec; the decoder accepts all
three so it can read run-optimized bitmaps too.

Scale note: a DV is O(deleted positions) bytes and rides in the
commit (one small sidecar file per commit, many DVs packed by
offset), so MoR DML against a 100 TB table costs bytes-per-tombstone
instead of a rewrite; readers get (file, row_index) pairs back and
apply them as a broadcast anti-join bounded by DV cardinality.

Reference: the reference materializes every model as Delta
(dbt_project.yml:39 ``+file_format: delta``), where DVs are the
engine's MERGE/UPDATE/DELETE fast path on modern writer versions.
"""

from __future__ import annotations

import os
import struct
import uuid as _uuid
import zlib

DV_MAGIC = 1681511377  # little-endian int32 at the start of DV data
DV_FORMAT_VERSION = 1  # first byte of a DV file

_SERIAL_COOKIE_NO_RUN = 12346
_SERIAL_COOKIE_RUN = 12347
_NO_OFFSET_THRESHOLD = 4
_ARRAY_MAX = 4096  # container cardinality above this ⇒ bitset

_Z85_CHARS = (
    "0123456789abcdefghijklmnopqrstuvwxyz"
    "ABCDEFGHIJKLMNOPQRSTUVWXYZ.-:+=^!/*?&<>()[]{}@%$#"
)
_Z85_INDEX = {c: i for i, c in enumerate(_Z85_CHARS)}


def z85_encode(data: bytes) -> str:
    """ZeroMQ Z85: 4 bytes -> 5 chars; input length must be % 4."""
    if len(data) % 4:
        raise ValueError("z85 input length must be a multiple of 4")
    out = []
    for i in range(0, len(data), 4):
        (word,) = struct.unpack(">I", data[i : i + 4])
        chunk = []
        for _ in range(5):
            word, rem = divmod(word, 85)
            chunk.append(_Z85_CHARS[rem])
        out.extend(reversed(chunk))
    return "".join(out)


def z85_decode(text: str) -> bytes:
    if len(text) % 5:
        raise ValueError("z85 input length must be a multiple of 5")
    out = bytearray()
    for i in range(0, len(text), 5):
        word = 0
        for ch in text[i : i + 5]:
            word = word * 85 + _Z85_INDEX[ch]
        out += struct.pack(">I", word)
    return bytes(out)


# ------------------------------------------------------------------
# RoaringBitmapArray ("portable" 64-bit) serialization
# ------------------------------------------------------------------


def _serialize_rb32(values: list[int]) -> bytes:
    """One 32-bit roaring bitmap, portable format, no run containers.
    ``values``: sorted unique ints in [0, 2^32)."""
    containers: list[tuple[int, list[int]]] = []
    cur_key = None
    cur: list[int] = []
    for v in values:
        k = v >> 16
        if k != cur_key:
            if cur:
                containers.append((cur_key, cur))
            cur_key, cur = k, []
        cur.append(v & 0xFFFF)
    if cur:
        containers.append((cur_key, cur))

    n = len(containers)
    head = struct.pack("<II", _SERIAL_COOKIE_NO_RUN, n)
    desc = b"".join(
        struct.pack("<HH", key, len(vals) - 1) for key, vals in containers
    )
    # offset header: byte position of each container from stream start
    payloads = [
        (
            struct.pack(f"<{len(vals)}H", *vals)
            if len(vals) <= _ARRAY_MAX
            else _bitset_payload(vals)
        )
        for _key, vals in containers
    ]
    base = len(head) + len(desc) + 4 * n
    offsets = []
    pos = base
    for p in payloads:
        offsets.append(pos)
        pos += len(p)
    offs = struct.pack(f"<{n}I", *offsets) if n else b""
    return head + desc + offs + b"".join(payloads)


def _bitset_payload(vals: list[int]) -> bytes:
    words = [0] * 1024
    for v in vals:
        words[v >> 6] |= 1 << (v & 63)
    return struct.pack("<1024Q", *words)


def _deserialize_rb32(buf: bytes, base: int) -> tuple[list[int], int]:
    """Decode one 32-bit roaring bitmap starting at ``base``; returns
    (values, bytes consumed). Accepts run, array and bitset
    containers per RoaringFormatSpec."""
    (first,) = struct.unpack_from("<I", buf, base)
    cookie = first & 0xFFFF
    run_flags = b""
    if cookie == _SERIAL_COOKIE_RUN:
        n = (first >> 16) + 1
        pos = base + 4
        nflag = (n + 7) // 8
        run_flags = buf[pos : pos + nflag]
        pos += nflag
        has_offsets = n >= _NO_OFFSET_THRESHOLD
    elif cookie == _SERIAL_COOKIE_NO_RUN:
        (n,) = struct.unpack_from("<I", buf, base + 4)
        pos = base + 8
        has_offsets = True
    else:
        raise ValueError(f"bad roaring cookie {cookie}")
    desc = struct.unpack_from(f"<{2 * n}H", buf, pos)
    pos += 4 * n
    if has_offsets:
        pos += 4 * n  # offsets are redundant for a sequential reader
    values: list[int] = []
    for i in range(n):
        key, card_m1 = desc[2 * i], desc[2 * i + 1]
        card = card_m1 + 1
        is_run = bool(run_flags and (run_flags[i >> 3] >> (i & 7)) & 1)
        hi = key << 16
        if is_run:
            (n_runs,) = struct.unpack_from("<H", buf, pos)
            pos += 2
            runs = struct.unpack_from(f"<{2 * n_runs}H", buf, pos)
            pos += 4 * n_runs
            for r in range(n_runs):
                start, length = runs[2 * r], runs[2 * r + 1]
                values.extend(hi | v for v in range(start, start + length + 1))
        elif card <= _ARRAY_MAX:
            arr = struct.unpack_from(f"<{card}H", buf, pos)
            pos += 2 * card
            values.extend(hi | v for v in arr)
        else:
            words = struct.unpack_from("<1024Q", buf, pos)
            pos += 8192
            for wi, w in enumerate(words):
                while w:
                    b = w & -w
                    values.append(hi | (wi << 6) | b.bit_length() - 1)
                    w ^= b
    return values, pos - base


def serialize_roaring64(positions) -> bytes:
    """RoaringBitmapArray portable bytes for a set of non-negative
    64-bit ints: [n_buckets: int64 LE] then per bucket
    [high32: int32 LE][32-bit roaring of the low32 values]."""
    buckets: dict[int, list[int]] = {}
    for p in sorted(set(positions)):
        buckets.setdefault(p >> 32, []).append(p & 0xFFFFFFFF)
    out = [struct.pack("<q", len(buckets))]
    for key in sorted(buckets):
        out.append(struct.pack("<I", key))
        out.append(_serialize_rb32(buckets[key]))
    return b"".join(out)


def deserialize_roaring64(data: bytes) -> list[int]:
    (n_buckets,) = struct.unpack_from("<q", data, 0)
    pos = 8
    values: list[int] = []
    for _ in range(n_buckets):
        (key,) = struct.unpack_from("<I", data, pos)
        pos += 4
        vals, used = _deserialize_rb32(data, pos)
        pos += used
        values.extend((key << 32) | v for v in vals)
    return values


# ------------------------------------------------------------------
# DV file (sidecar) + descriptors
# ------------------------------------------------------------------


def write_dv_file(
    table_dir: str, positions_by_key: dict[str, list[int]]
) -> dict[str, dict]:
    """Write ONE ``deletion_vector_<uuid>.bin`` under ``table_dir``
    packing every entry's bitmap at its own offset (the descriptor's
    ``offset`` points at that entry's dataSize word — multiple DVs
    share a file exactly so that one commit costs one sidecar), and
    return key -> protocol-conformant descriptor:

      {"storageType": "u", "pathOrInlineDv": <z85(uuid bytes)>,
       "offset": ..., "sizeInBytes": <len(data)>,
       "cardinality": <positions>}

    storageType "u": the on-disk name is derived from the descriptor
    (``deletion_vector_<uuid>.bin`` in the table root; we use an
    empty random prefix — the spec's prefix exists to spread object-
    store keys)."""
    dv_uuid = _uuid.uuid4()
    fname = f"deletion_vector_{dv_uuid}.bin"
    blob = bytearray([DV_FORMAT_VERSION])
    descriptors: dict[str, dict] = {}
    for key in sorted(positions_by_key):
        pos_list = positions_by_key[key]
        data = struct.pack("<i", DV_MAGIC) + serialize_roaring64(pos_list)
        offset = len(blob)
        blob += struct.pack(">i", len(data))
        blob += data
        blob += struct.pack(">I", zlib.crc32(data) & 0xFFFFFFFF)
        descriptors[key] = {
            "storageType": "u",
            "pathOrInlineDv": z85_encode(dv_uuid.bytes),
            "offset": offset,
            "sizeInBytes": len(data),
            "cardinality": len(set(pos_list)),
        }
    tmp = os.path.join(table_dir, f"_tmp_{dv_uuid.hex[:8]}.bin")
    with open(tmp, "wb") as fh:
        fh.write(blob)
    os.replace(tmp, os.path.join(table_dir, fname))
    return descriptors


def dv_file_path(table_dir: str, descriptor: dict) -> str:
    """Assemble the absolute DV file path from a storageType-"u"/"p"
    descriptor (spec: the last 20 chars of pathOrInlineDv are the z85
    UUID, anything before is the random prefix directory)."""
    st = descriptor.get("storageType")
    if st == "p":
        return descriptor["pathOrInlineDv"]
    if st != "u":
        raise ValueError(f"unsupported DV storageType {st!r}")
    enc = descriptor["pathOrInlineDv"]
    prefix, enc_uuid = enc[:-20], enc[-20:]
    dv_uuid = _uuid.UUID(bytes=z85_decode(enc_uuid))
    name = f"deletion_vector_{dv_uuid}.bin"
    return (
        os.path.join(table_dir, prefix, name)
        if prefix
        else os.path.join(table_dir, name)
    )


def read_dv(table_dir: str, descriptor: dict) -> list[int]:
    """Decode one descriptor back to its row positions, verifying the
    format version, size, magic and CRC."""
    if descriptor.get("storageType") == "i":
        data = z85_decode(descriptor["pathOrInlineDv"])
    else:
        path = dv_file_path(table_dir, descriptor)
        with open(path, "rb") as fh:
            head = fh.read(1)
            if not head or head[0] != DV_FORMAT_VERSION:
                raise ValueError(f"bad DV file version in {path}")
            fh.seek(descriptor["offset"])
            (size,) = struct.unpack(">i", fh.read(4))
            if size != descriptor["sizeInBytes"]:
                raise ValueError(
                    f"DV size mismatch in {path}: file says {size}, "
                    f"descriptor says {descriptor['sizeInBytes']}"
                )
            data = fh.read(size)
            (crc,) = struct.unpack(">I", fh.read(4))
            if crc != (zlib.crc32(data) & 0xFFFFFFFF):
                raise ValueError(f"DV checksum mismatch in {path}")
    (magic,) = struct.unpack_from("<i", data, 0)
    if magic != DV_MAGIC:
        raise ValueError(f"bad DV magic {magic}")
    values = deserialize_roaring64(data[4:])
    card = descriptor.get("cardinality")
    if card is not None and card != len(values):
        raise ValueError(
            f"DV cardinality mismatch: descriptor {card}, bitmap "
            f"{len(values)}"
        )
    return values
