"""Delta Lake deletion-vector binary format: Z85 + RoaringBitmapArray.

Implements the PUBLIC format from delta.io PROTOCOL.md ("Deletion Vector
Descriptor Schema" / "Deletion Vector Format") so ``delta_interop.read_delta``
can apply DV-bearing snapshots instead of raising ``UnsupportedDeltaFeature``:

- descriptors live on ``add.deletionVector`` with ``storageType`` one of
  ``u`` (UUID-named sidecar file relative to the table root, path encoded as
  optional random prefix + Z85 of the 16-byte UUID), ``p`` (absolute path),
  ``i`` (inline — ``pathOrInlineDv`` IS the Z85 of the bitmap bytes);
- a sidecar file starts with a 1-byte format version (= 1); each stored DV
  is ``<int32 BE size><bitmap bytes><int32 BE CRC-32 of bitmap bytes>`` at
  the descriptor's ``offset`` (the size field's position);
- the bitmap bytes are a "RoaringBitmapArray" in PORTABLE serialization:
  ``<int32 LE magic 1681511377><int64 LE number of 32-bit bitmaps>`` then
  each 32-bit bitmap in the standard RoaringFormatSpec portable layout
  (cookie 12346/12347, array/bitmap/run containers); bitmap ``i`` covers
  row indexes ``[i * 2^32, (i+1) * 2^32)``.

The parser accepts all three container kinds; the serializer (used by the
fixture writer and ``delta_interop.delete_where_delta``) emits array or
bitmap containers (runs are an optional optimization the cookie negotiates,
never required). Round-trip is property-tested against random index sets.

Nothing here touches Spark: pure bytes -> sorted row indexes, so the module
is unit-testable without a session and usable from the driver only — the
row positions then travel to executors as an ordinary broadcast DataFrame
(see delta_interop._dv_exclusions).
"""

from __future__ import annotations

import os
import struct
import uuid as _uuid
import zlib

_Z85_ALPHABET = (
    "0123456789abcdefghijklmnopqrstuvwxyz"
    "ABCDEFGHIJKLMNOPQRSTUVWXYZ.-:+=^!/*?&<>()[]{}@%$#"
)
_Z85_INDEX = {c: i for i, c in enumerate(_Z85_ALPHABET)}

MAGIC = 1681511377  # RoaringBitmapArray portable magic (delta.io)
_SERIAL_COOKIE_NO_RUN = 12346
_SERIAL_COOKIE = 12347
_NO_OFFSET_THRESHOLD = 4


def z85_decode(text: str) -> bytes:
    """ZeroMQ Z85 decode (the alphabet PROTOCOL.md prescribes — NOT RFC-1924
    base85, which the stdlib's ``base64.b85decode`` implements)."""
    if len(text) % 5:
        raise ValueError(f"Z85 length {len(text)} not a multiple of 5")
    out = bytearray()
    for i in range(0, len(text), 5):
        acc = 0
        for ch in text[i : i + 5]:
            try:
                acc = acc * 85 + _Z85_INDEX[ch]
            except KeyError:
                raise ValueError(f"invalid Z85 character {ch!r}") from None
        if acc > 0xFFFFFFFF:
            raise ValueError("Z85 group overflows 32 bits")
        out += acc.to_bytes(4, "big")
    return bytes(out)


def z85_encode(data: bytes) -> str:
    if len(data) % 4:
        raise ValueError(f"Z85 input length {len(data)} not a multiple of 4")
    out = []
    for i in range(0, len(data), 4):
        acc = int.from_bytes(data[i : i + 4], "big")
        group = []
        for _ in range(5):
            acc, rem = divmod(acc, 85)
            group.append(_Z85_ALPHABET[rem])
        out += reversed(group)
    return "".join(out)


def _parse_roaring32(buf: bytes, pos: int) -> tuple[list[int], int]:
    """One standard portable 32-bit RoaringBitmap at ``pos``; returns
    (sorted values, next position)."""
    (cookie16,) = struct.unpack_from("<H", buf, pos)
    values: list[int] = []
    if cookie16 == _SERIAL_COOKIE:
        (n_minus_1,) = struct.unpack_from("<H", buf, pos + 2)
        size = n_minus_1 + 1
        pos += 4
        run_bytes = (size + 7) // 8
        run_flags = buf[pos : pos + run_bytes]
        pos += run_bytes
        has_offsets = size >= _NO_OFFSET_THRESHOLD
    elif cookie16 == _SERIAL_COOKIE_NO_RUN:
        (size,) = struct.unpack_from("<i", buf, pos + 4)
        pos += 8
        run_flags = b""
        has_offsets = True
    else:
        raise ValueError(f"bad roaring cookie {cookie16}")
    keys: list[int] = []
    cards: list[int] = []
    for i in range(size):
        k, c_minus_1 = struct.unpack_from("<HH", buf, pos)
        keys.append(k)
        cards.append(c_minus_1 + 1)
        pos += 4
    if has_offsets:
        pos += 4 * size  # offsets are redundant for a sequential parse
    for i in range(size):
        base = keys[i] << 16
        is_run = bool(run_flags) and (run_flags[i // 8] >> (i % 8)) & 1
        if is_run:
            (n_runs,) = struct.unpack_from("<H", buf, pos)
            pos += 2
            for _ in range(n_runs):
                start, length_minus_1 = struct.unpack_from("<HH", buf, pos)
                pos += 4
                values.extend(range(base | start, (base | start) + length_minus_1 + 1))
        elif cards[i] > 4096:  # bitmap container: 1024 * uint64
            words = struct.unpack_from("<1024Q", buf, pos)
            pos += 8192
            for wi, w in enumerate(words):
                while w:
                    low = w & -w
                    values.append(base | (wi << 6) | low.bit_length() - 1)
                    w ^= low
        else:  # array container
            vals = struct.unpack_from(f"<{cards[i]}H", buf, pos)
            pos += 2 * cards[i]
            values.extend(base | v for v in vals)
    return values, pos


def parse_bitmap_array(data: bytes) -> list[int]:
    """RoaringBitmapArray portable bytes -> sorted 64-bit row indexes."""
    if len(data) < 12:
        raise ValueError(f"bitmap array too short ({len(data)} bytes)")
    magic, n_bitmaps = struct.unpack_from("<iq", data, 0)
    if magic != MAGIC:
        raise ValueError(f"bad RoaringBitmapArray magic {magic}")
    pos = 12
    out: list[int] = []
    for i in range(n_bitmaps):
        vals, pos = _parse_roaring32(data, pos)
        high = i << 32
        out.extend(high | v for v in vals)
    if pos != len(data):
        raise ValueError(f"{len(data) - pos} trailing bytes after bitmaps")
    return out


def serialize_bitmap_array(indexes: list[int]) -> bytes:
    """Sorted 64-bit row indexes -> RoaringBitmapArray portable bytes
    (array containers <= 4096 entries, bitmap containers above — the
    standard layout every roaring reader accepts)."""
    by_bitmap: dict[int, dict[int, list[int]]] = {}
    for ix in indexes:
        if ix < 0:
            raise ValueError(f"negative row index {ix}")
        by_bitmap.setdefault(ix >> 32, {}).setdefault((ix >> 16) & 0xFFFF, []).append(
            ix & 0xFFFF
        )
    n_bitmaps = max(by_bitmap) + 1 if by_bitmap else 0
    out = bytearray(struct.pack("<iq", MAGIC, n_bitmaps))
    for b in range(n_bitmaps):
        containers = by_bitmap.get(b, {})
        keys = sorted(containers)
        # cookie is a full int32 (low half 12346, high half 0), then int32 size
        out += struct.pack("<ii", _SERIAL_COOKIE_NO_RUN, len(keys))
        bodies: list[bytes] = []
        for k in keys:
            vals = sorted(set(containers[k]))
            if len(vals) > 4096:
                words = [0] * 1024
                for v in vals:
                    words[v >> 6] |= 1 << (v & 63)
                bodies.append(struct.pack("<1024Q", *words))
            else:
                bodies.append(struct.pack(f"<{len(vals)}H", *vals))
            out += struct.pack("<HH", k, len(vals) - 1)
        # offsets section: each container's position counted from this
        # bitmap's cookie byte (cookie 4 + size 4 + 4*desc + 4*offsets)
        pos0 = 8 + 4 * len(keys) + 4 * len(keys)
        for body in bodies:
            out += struct.pack("<i", pos0)
            pos0 += len(body)
        for body in bodies:
            out += body
    return bytes(out)


def read_dv_descriptor(table_root: str, dv: dict) -> list[int]:
    """Resolve one ``add.deletionVector`` descriptor to sorted row indexes.

    Fails loud on every malformed case (size/CRC/magic mismatch, unknown
    storageType) — a silently-wrong DV un-deletes rows."""
    storage = dv.get("storageType")
    # Validate required descriptor fields up front with a diagnosis — a
    # foreign writer omitting e.g. the nominally-optional ``offset`` would
    # otherwise escape as a bare KeyError from a module whose contract is
    # fail-loud-with-diagnosis (ADVICE r8).
    required = ("pathOrInlineDv", "sizeInBytes") if storage == "i" else (
        "pathOrInlineDv", "offset", "sizeInBytes"
    )
    missing = [k for k in required if dv.get(k) is None]
    if storage in ("i", "u", "p") and missing:
        raise ValueError(
            f"DV descriptor (storageType={storage!r}) missing required "
            f"field(s) {missing}: {sorted(dv)}"
        )
    if storage == "i":
        data = z85_decode(dv["pathOrInlineDv"])[: dv["sizeInBytes"]]
        if len(data) != dv["sizeInBytes"]:
            raise ValueError(
                f"inline DV carries {len(data)} bytes, descriptor says "
                f"{dv['sizeInBytes']}"
            )
    elif storage in ("u", "p"):
        if storage == "u":
            enc = dv["pathOrInlineDv"]
            prefix, uuid_part = enc[:-20], enc[-20:]
            u = _uuid.UUID(bytes=z85_decode(uuid_part))
            fname = f"deletion_vector_{u}.bin"
            fpath = os.path.join(table_root, prefix, fname) if prefix else os.path.join(
                table_root, fname
            )
        else:
            fpath = dv["pathOrInlineDv"]
        with open(fpath, "rb") as fh:
            raw = fh.read()
        if not raw or raw[0] != 1:
            raise ValueError(f"unsupported DV file format version {raw[:1]!r}")
        off = dv["offset"]
        (size,) = struct.unpack_from(">i", raw, off)
        if size != dv["sizeInBytes"]:
            raise ValueError(
                f"DV size field {size} != descriptor sizeInBytes "
                f"{dv['sizeInBytes']} at offset {off}"
            )
        data = raw[off + 4 : off + 4 + size]
        (crc,) = struct.unpack_from(">I", raw, off + 4 + size)
        if zlib.crc32(data) & 0xFFFFFFFF != crc:
            raise ValueError("DV checksum mismatch")
    else:
        raise ValueError(f"unknown DV storageType {storage!r}")
    indexes = parse_bitmap_array(data)
    if dv.get("cardinality") is not None and len(indexes) != dv["cardinality"]:
        raise ValueError(
            f"DV cardinality {len(indexes)} != descriptor {dv['cardinality']}"
        )
    return indexes


def write_dv_file(table_root: str, indexes: list[int]) -> dict:
    """Serialize ``indexes`` as a single-DV sidecar file under ``table_root``
    and return the ``deletionVector`` descriptor for the add action
    (storageType ``u``, version-1 file layout)."""
    data = serialize_bitmap_array(sorted(indexes))
    u = _uuid.uuid4()
    with open(os.path.join(table_root, f"deletion_vector_{u}.bin"), "wb") as fh:
        fh.write(b"\x01")
        offset = fh.tell()
        fh.write(struct.pack(">i", len(data)))
        fh.write(data)
        fh.write(struct.pack(">I", zlib.crc32(data) & 0xFFFFFFFF))
    return {
        "storageType": "u",
        "pathOrInlineDv": z85_encode(u.bytes),
        "offset": offset,
        "sizeInBytes": len(data),
        "cardinality": len(indexes),
    }
