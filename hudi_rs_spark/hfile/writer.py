"""Minimal HBase HFile v3 writer — the write-side twin of
``hfile/reader.py`` (same format constants; the reader is pinned against
the reference's real MDT fixtures, so satisfying it means emitting the
real v3 shape: 33-byte block headers, DATABLK* cells, IDXROOT2 root
index, FILEINF2+PBUF file info, 4096-byte protobuf trailer).

Used by write/mdt.py to emit metadata-table ``files`` partition
payloads. Uncompressed (codec NONE), single-level root index, one index
entry per data block; blocks roll at ``block_size`` so indexed point
lookups stay O(log blocks) on large partitions.
"""

from __future__ import annotations

import struct

from hudi_rs_spark.hfile.reader import (
    BLOCK_HEADER_SIZE,
    CODEC_NONE,
    FILEINFO_MAGIC,
    PBUF_MAGIC,
    ROOT_INDEX_MAGIC,
    TRAILER_MAGIC,
    TRAILER_SIZE,
)

DATA_MAGIC = b"DATABLK*"


def _varint(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _pb_field(field: int, value) -> bytes:
    if isinstance(value, int):
        return _varint(field << 3) + _varint(value)
    return _varint((field << 3) | 2) + _varint(len(value)) + bytes(value)


def _write_vlong(n: int) -> bytes:
    """Hadoop WritableUtils VLong (reader's read_hadoop_vlong inverse);
    the writer only needs n >= 0."""
    if n <= 127:
        return struct.pack(">b", n)
    raw = n.to_bytes((n.bit_length() + 7) // 8, "big")
    return struct.pack(">b", -112 - len(raw)) + raw


def _block(magic: bytes, payload: bytes, prev_offset: int) -> bytes:
    header = (
        magic
        + struct.pack(">i", len(payload))       # on-disk size (no checksums)
        + struct.pack(">i", len(payload))       # uncompressed size
        + struct.pack(">q", prev_offset)
        + bytes([0])                            # checksum type NULL
        + struct.pack(">i", 0)                  # bytes per checksum: none
        + struct.pack(">i", BLOCK_HEADER_SIZE + len(payload))
    )
    return header + payload


MAX_KEY_BYTES = 0x7FFF  # the length prefix is a signed 16-bit short


def _serialized_key(content: bytes) -> bytes:
    """Cell key: 2-byte content length + content (key.rs Key::new).
    The format caps keys at 32767 bytes; raise a clear error instead of
    letting struct.pack crash mid-file with an opaque struct.error."""
    if len(content) > MAX_KEY_BYTES:
        raise ValueError(
            f"HFile cell key is {len(content)} bytes; the format's "
            f"signed 16-bit length prefix caps keys at {MAX_KEY_BYTES}"
        )
    return struct.pack(">h", len(content)) + content


def _cell(key_content: bytes, value: bytes) -> bytes:
    key = _serialized_key(key_content)
    return (
        struct.pack(">ii", len(key), len(value)) + key + value + b"\x00"
    )  # trailing mvcc byte (0: no memstore timestamps)


def build_hfile(
    records: list[tuple[bytes, bytes]],
    file_info: dict[str, bytes] | None = None,
    block_size: int = 64 * 1024,
) -> bytes:
    """Serialize sorted (key, value) records as an HFile v3 byte string.

    ``file_info`` entries land in the FILEINF2 block (put the avro
    schema under key "schema" — the MDT reader requires it)."""
    records = sorted(records, key=lambda kv: kv[0])
    out = bytearray()
    index: list[tuple[bytes, int, int]] = []  # (first_key, offset, size)
    prev = -1

    cur: list[bytes] = []
    cur_bytes = 0
    cur_first: bytes | None = None

    def flush_data():
        nonlocal prev, cur, cur_bytes, cur_first
        if not cur:
            return
        payload = b"".join(cur)
        off = len(out)
        blk = _block(DATA_MAGIC, payload, prev)
        index.append((cur_first, off, len(blk)))
        out.extend(blk)
        prev = off
        cur, cur_bytes, cur_first = [], 0, None

    for k, v in records:
        c = _cell(k, v)
        if cur and cur_bytes + len(c) > block_size:
            flush_data()
        if cur_first is None:
            cur_first = k
        cur.append(c)
        cur_bytes += len(c)
    flush_data()

    first_data = index[0][1] if index else 0
    last_data = index[-1][1] if index else 0

    # load-on-open section: root index block
    load_on_open = len(out)
    root_payload = bytearray()
    for first_key, off, size in index:
        sk = _serialized_key(first_key)
        root_payload += struct.pack(">qi", off, size)
        root_payload += _write_vlong(len(sk)) + sk
    out.extend(_block(ROOT_INDEX_MAGIC, bytes(root_payload), prev))

    # file info block
    file_info_offset = len(out)
    pairs = b"".join(
        _pb_field(1, _pb_field(1, k.encode("utf-8")) + _pb_field(2, v))
        for k, v in sorted((file_info or {}).items())
    )
    info_payload = PBUF_MAGIC + _varint(len(pairs)) + pairs
    out.extend(_block(FILEINFO_MAGIC, info_payload, load_on_open))

    # 4096-byte trailer: magic + length-delimited TrailerProto + version
    proto = (
        _pb_field(1, file_info_offset)
        + _pb_field(2, load_on_open)
        + _pb_field(5, len(index))            # data index count
        + _pb_field(7, len(records))          # entry count
        + _pb_field(8, 1)                     # num data index levels
        + _pb_field(9, first_data)
        + _pb_field(10, last_data)
        + _pb_field(12, CODEC_NONE)
    )
    trailer = TRAILER_MAGIC + _varint(len(proto)) + proto
    trailer += b"\x00" * (TRAILER_SIZE - len(trailer) - 4)
    trailer += bytes([0, 0, 0, 3])  # minor=0, major=3
    out.extend(trailer)
    return bytes(out)
