"""Synthesize HFile v3 files for reader tests.

The reference's golden fixtures only carry single-data-block gzip/none
HFiles; these helpers build multi-block files (with root or two-level
block indexes) and snappy/lz4-compressed blocks so the indexed-lookup
and codec paths can be exercised. Layout follows the same public HBase
HFile v3 format the repo reader parses (hudi_rs_spark/hfile/reader.py).

Snappy/LZ4 payloads use literal-only encodings (valid per both block
format specs) wrapped in Hadoop BlockCompressorStream framing.
"""

from __future__ import annotations

import json
import struct
import zlib

TRAILER_SIZE = 4096
BLOCK_HEADER_SIZE = 33
BYTES_PER_CHECKSUM = 16384


# ---------------------------------------------------------------------------
# protobuf encoding (varint + bytes fields only)
# ---------------------------------------------------------------------------
def _pb_varint(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _pb_field_varint(field: int, value: int) -> bytes:
    return _pb_varint(field << 3) + _pb_varint(value)


def _pb_field_bytes(field: int, value: bytes) -> bytes:
    return _pb_varint((field << 3) | 2) + _pb_varint(len(value)) + value


def _vlong(n: int) -> bytes:
    """Hadoop WritableUtils VLong, positive values only."""
    if n <= 127:
        return struct.pack(">b", n)
    payload = n.to_bytes((n.bit_length() + 7) // 8, "big")
    return struct.pack(">b", -112 - len(payload)) + payload


# ---------------------------------------------------------------------------
# codecs (compress side, test-only)
# ---------------------------------------------------------------------------
def _snappy_compress_literal(data: bytes) -> bytes:
    out = bytearray(_pb_varint(len(data)))  # same LE varint shape
    pos = 0
    while pos < len(data):
        chunk = data[pos : pos + 60]
        out.append((len(chunk) - 1) << 2)  # literal tag, len <= 60
        out += chunk
        pos += len(chunk)
    return bytes(out)


def _lz4_compress_literal(data: bytes) -> bytes:
    out = bytearray()
    lit = len(data)
    token_lit = min(lit, 15)
    out.append(token_lit << 4)
    if token_lit == 15:
        rest = lit - 15
        while rest >= 255:
            out.append(255)
            rest -= 255
        out.append(rest)
    out += data
    return bytes(out)  # single last-sequence: literals only, no match


def _hadoop_frame(compressed: bytes, uncompressed_len: int) -> bytes:
    return (
        struct.pack(">i", uncompressed_len)
        + struct.pack(">i", len(compressed))
        + compressed
    )


CODEC_IDS = {"none": 2, "gz": 1, "snappy": 3, "lz4": 4}


def _compress(codec: str, payload: bytes) -> bytes:
    if codec == "none":
        return payload
    if codec == "gz":
        c = zlib.compressobj(wbits=16 + zlib.MAX_WBITS)
        return c.compress(payload) + c.flush()
    if codec == "snappy":
        return _hadoop_frame(_snappy_compress_literal(payload), len(payload))
    if codec == "lz4":
        return _hadoop_frame(_lz4_compress_literal(payload), len(payload))
    raise ValueError(codec)


# ---------------------------------------------------------------------------
# blocks
# ---------------------------------------------------------------------------
def _checksum_count(on_disk_without_checksums: int) -> int:
    c = 0
    while True:
        c2 = -(-(BLOCK_HEADER_SIZE + on_disk_without_checksums + 4 * c) // BYTES_PER_CHECKSUM)
        if c2 == c:
            return c
        c = c2


def _block(magic: bytes, payload: bytes, codec: str) -> bytes:
    body = _compress(codec, payload)
    n_checksums = _checksum_count(len(body))
    on_disk_size = len(body) + 4 * n_checksums
    header = (
        magic
        + struct.pack(">i", on_disk_size)
        + struct.pack(">i", len(payload))
        + struct.pack(">q", -1)
        + bytes([1])  # checksum type CRC32
        + struct.pack(">i", BYTES_PER_CHECKSUM)
        + struct.pack(">i", on_disk_size + BLOCK_HEADER_SIZE)
    )
    return header + body + b"\x00" * (4 * n_checksums)


def _serialize_key(content: bytes) -> bytes:
    return struct.pack(">h", len(content)) + content


def _cell(key: bytes, value: bytes) -> bytes:
    sk = _serialize_key(key)
    return (
        struct.pack(">ii", len(sk), len(value)) + sk + value + b"\x00"
    )  # trailing mvcc byte = 0


def _root_index_payload(entries: list[tuple[bytes, int, int]]) -> bytes:
    out = bytearray()
    for first_key, offset, size in entries:
        sk = _serialize_key(first_key)
        out += struct.pack(">qi", offset, size) + _vlong(len(sk)) + sk
    return bytes(out)


def _nonroot_index_payload(entries: list[tuple[bytes, int, int]]) -> bytes:
    serialized = [
        struct.pack(">qi", off, size) + _serialize_key(fk)
        for fk, off, size in entries
    ]
    rel = [0]
    for s in serialized:
        rel.append(rel[-1] + len(s))
    out = struct.pack(">i", len(entries))
    out += struct.pack(f">{len(rel)}i", *rel)
    return out + b"".join(serialized)


# ---------------------------------------------------------------------------
# whole files
# ---------------------------------------------------------------------------
def write_hfile(
    cells: list[tuple[bytes, bytes]],
    cells_per_block: int = 0,
    codec: str = "none",
    schema: dict | None = None,
    file_info_extra: dict[str, bytes] | None = None,
    index_levels: int = 1,
) -> bytes:
    """Build an HFile v3 byte buffer. ``cells`` must be key-sorted;
    ``cells_per_block`` 0 puts everything in one data block;
    ``index_levels`` 2 emits leaf index blocks under the root."""
    cells = list(cells)
    assert cells == sorted(cells, key=lambda kv: kv[0]), "cells must be sorted"
    per = cells_per_block or len(cells) or 1
    out = bytearray()
    data_entries: list[tuple[bytes, int, int]] = []  # (first_key, off, size)
    first_data_off = last_data_off = 0
    for i in range(0, len(cells), per):
        group = cells[i : i + per]
        payload = b"".join(_cell(k, v) for k, v in group)
        off = len(out)
        if i == 0:
            first_data_off = off
        last_data_off = off
        blk = _block(b"DATABLK*", payload, codec)
        out += blk
        data_entries.append((group[0][0], off, len(blk)))

    if index_levels == 1:
        root_entries = data_entries
    elif index_levels == 2:
        # two leaf blocks under the root
        half = max(1, (len(data_entries) + 1) // 2)
        root_entries = []
        for i in range(0, len(data_entries), half):
            leaf = data_entries[i : i + half]
            off = len(out)
            blk = _block(b"IDXLEAF2", _nonroot_index_payload(leaf), codec)
            out += blk
            root_entries.append((leaf[0][0], off, len(blk)))
    else:
        raise ValueError("index_levels must be 1 or 2")
    load_on_open = len(out)  # load-on-open section starts at the root index
    out += _block(b"IDXROOT2", _root_index_payload(root_entries), codec)

    # file info block
    info: dict[str, bytes] = {}
    if schema is not None:
        info["schema"] = json.dumps(schema).encode()
    info.update(file_info_extra or {})
    pairs = b"".join(
        _pb_field_bytes(1, _pb_field_bytes(1, k.encode()) + _pb_field_bytes(2, v))
        for k, v in info.items()
    )
    file_info_off = len(out)
    out += _block(b"FILEINF2", b"PBUF" + _pb_varint(len(pairs)) + pairs, codec)

    proto = (
        _pb_field_varint(1, file_info_off)
        + _pb_field_varint(2, load_on_open)
        + _pb_field_varint(5, len(root_entries))
        + _pb_field_varint(6, 0)
        + _pb_field_varint(7, len(cells))
        + _pb_field_varint(8, index_levels)
        + _pb_field_varint(9, first_data_off)
        + _pb_field_varint(10, last_data_off)
        + _pb_field_varint(12, CODEC_IDS[codec])
    )
    trailer = b'TRABLK"$' + _pb_varint(len(proto)) + proto
    trailer += b"\x00" * (TRAILER_SIZE - len(trailer) - 4)
    trailer += bytes([0, 0, 0, 3])  # minor 0, major 3
    out += trailer
    return bytes(out)
