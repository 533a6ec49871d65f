"""HBase HFile v3 reader, scoped to the Hudi metadata-table read path:
full scan of data-block cells (+ key filtering at the caller) and
file-info access for the embedded avro schema.

Re-expresses the format handled by
/root/reference/crates/core/src/hfile/{trailer.rs:66-133, block.rs:62-145,
key.rs:198-280, reader.rs:74-520, proto.rs:28-89}:

  - fixed 4096-byte trailer at EOF: magic "TRABLK\"$", length-delimited
    protobuf TrailerProto, last 4 bytes = [minor, major(3 bytes)]
  - blocks: 33-byte header (magic, on-disk size, uncompressed size, prev
    offset, checksum type, bytes/checksum, on-disk-with-header), payload
    (possibly compressed), per-chunk CRC checksums counted INSIDE the
    on-disk size
  - data-block cells: key_len(i32) value_len(i32) key value mvcc(1B);
    key content = 2-byte length prefix + bytes
  - file info block: "FILEINF2" + "PBUF" + length-delimited InfoProto of
    (key, value) byte pairs; "schema" holds the avro record schema

The driver reads the MDT files partition with this (it is O(partitions)
small); nothing here touches executors.
"""

from __future__ import annotations

import json
import struct
import zlib

TRAILER_SIZE = 4096
BLOCK_HEADER_SIZE = 33
MAGIC_LENGTH = 8
DATA_MAGICS = (b"DATABLK*", b"DATABLKE")
TRAILER_MAGIC = b'TRABLK"$'
FILEINFO_MAGIC = b"FILEINF2"
PBUF_MAGIC = b"PBUF"

# HBase compression ids (compression.rs:26-60)
CODEC_LZO, CODEC_GZ, CODEC_NONE, CODEC_SNAPPY, CODEC_LZ4 = 0, 1, 2, 3, 4


def read_varint(buf: bytes, pos: int) -> tuple[int, int]:
    result, shift = 0, 0
    while pos < len(buf):
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
    return result, pos


def parse_protobuf(buf: bytes) -> dict[int, list]:
    """Minimal protobuf wire-format parse: varint(0) and bytes(2) fields
    (all the Trailer/Info protos use)."""
    out: dict[int, list] = {}
    pos = 0
    while pos < len(buf):
        tag, pos = read_varint(buf, pos)
        field, wire = tag >> 3, tag & 7
        if wire == 0:
            val, pos = read_varint(buf, pos)
        elif wire == 2:
            n, pos = read_varint(buf, pos)
            val = buf[pos : pos + n]
            pos += n
        elif wire == 5:
            val = buf[pos : pos + 4]
            pos += 4
        elif wire == 1:
            val = buf[pos : pos + 8]
            pos += 8
        else:
            raise ValueError(f"unsupported protobuf wire type {wire}")
        out.setdefault(field, []).append(val)
    return out


def _first_int(pb: dict[int, list], field: int, default: int = 0) -> int:
    v = pb.get(field)
    return int(v[0]) if v else default


class BlockHeader:
    __slots__ = (
        "magic", "on_disk_size", "uncompressed_size", "prev_offset",
        "checksum_type", "bytes_per_checksum", "on_disk_with_header",
    )

    def __init__(self, buf: bytes, off: int):
        self.magic = buf[off : off + MAGIC_LENGTH]
        (self.on_disk_size,) = struct.unpack_from(">i", buf, off + 8)
        (self.uncompressed_size,) = struct.unpack_from(">i", buf, off + 12)
        (self.prev_offset,) = struct.unpack_from(">q", buf, off + 16)
        self.checksum_type = buf[off + 24]
        (self.bytes_per_checksum,) = struct.unpack_from(">i", buf, off + 25)
        (self.on_disk_with_header,) = struct.unpack_from(">i", buf, off + 29)

    def checksum_bytes(self) -> int:
        if self.bytes_per_checksum <= 0:
            return 0
        total = BLOCK_HEADER_SIZE + self.on_disk_size
        chunks = -(-total // self.bytes_per_checksum)
        return chunks * 4

    def next_offset(self, off: int) -> int:
        return off + BLOCK_HEADER_SIZE + self.on_disk_size


class HFile:
    """Parsed HFile over an in-memory byte buffer."""

    def __init__(self, data: bytes):
        self.data = data
        if len(data) < TRAILER_SIZE:
            raise ValueError(f"file too small for HFile trailer: {len(data)}")
        t = data[-TRAILER_SIZE:]
        if t[:MAGIC_LENGTH] != TRAILER_MAGIC:
            raise ValueError("bad HFile trailer magic")
        minor, major = t[-4], (t[-3] << 16) | (t[-2] << 8) | t[-1]
        if major != 3:
            raise ValueError(f"unsupported HFile version {major}.{minor}")
        n, pos = read_varint(t, MAGIC_LENGTH)
        pb = parse_protobuf(t[pos : pos + n])
        self.file_info_offset = _first_int(pb, 1)
        self.load_on_open_offset = _first_int(pb, 2)
        self.entry_count = _first_int(pb, 7)
        self.first_data_block_offset = _first_int(pb, 9)
        self.last_data_block_offset = _first_int(pb, 10)
        self.codec = _first_int(pb, 12, CODEC_NONE)
        self.file_info = self._read_file_info()
        self._check_mvcc_support()

    def _check_mvcc_support(self) -> None:
        """Reject HFiles written with MVCC timestamps (reference
        reader.rs:186-221): cells then carry a varint memstore ts, which
        the fixed 1-byte-mvcc cell walk in records() would misparse
        silently. KEY_VALUE_VERSION==1 + MAX_MEMSTORE_TS_KEY>0 == MVCC."""
        ver = self.file_info.get("KEY_VALUE_VERSION")
        if not ver or len(ver) < 4:
            return
        if struct.unpack(">i", ver[:4])[0] != 1:
            return
        ts = self.file_info.get("MAX_MEMSTORE_TS_KEY")
        if ts and len(ts) >= 8 and struct.unpack(">q", ts[:8])[0] > 0:
            raise ValueError(
                "HFile written with MVCC timestamps "
                "(KEY_VALUE_VERSION=1, MAX_MEMSTORE_TS_KEY>0) is unsupported"
            )

    @classmethod
    def from_path(cls, path: str) -> "HFile":
        with open(path, "rb") as f:
            return cls(f.read())

    # -- blocks -----------------------------------------------------------
    def _block_payload(self, off: int) -> tuple[BlockHeader, bytes]:
        h = BlockHeader(self.data, off)
        start = off + BLOCK_HEADER_SIZE
        if self.codec == CODEC_NONE:
            payload = self.data[start : start + h.uncompressed_size]
        else:
            end = start + h.on_disk_size - h.checksum_bytes()
            raw = self.data[start:end]
            if self.codec == CODEC_GZ:
                payload = zlib.decompress(raw, 16 + zlib.MAX_WBITS)
            else:
                raise ValueError(f"unsupported HFile compression id {self.codec}")
            if len(payload) != h.uncompressed_size:
                raise ValueError("HFile block decompressed to unexpected size")
        return h, payload

    def _read_file_info(self) -> dict[str, bytes]:
        if not self.file_info_offset:
            return {}
        h, payload = self._block_payload(self.file_info_offset)
        if h.magic != FILEINFO_MAGIC:
            raise ValueError(f"expected FILEINF2 block, got {h.magic!r}")
        if payload[:4] != PBUF_MAGIC:
            raise ValueError("file info block missing PBUF magic")
        n, pos = read_varint(payload, 4)
        info_pb = parse_protobuf(payload[pos : pos + n])
        out: dict[str, bytes] = {}
        for pair_bytes in info_pb.get(1, []):
            pair = parse_protobuf(pair_bytes)
            key = pair.get(1, [b""])[0].decode("utf-8")
            out[key] = pair.get(2, [b""])[0]
        return out

    def avro_schema(self) -> dict | None:
        raw = self.file_info.get("schema")
        return json.loads(raw.decode("utf-8")) if raw else None

    # -- cells ------------------------------------------------------------
    def records(self):
        """Yield (key_bytes, value_bytes) for every cell, in key order
        (HFile data blocks are sorted). Sequential block walk — the MDT
        files partition is O(table partitions) records, so a full collect
        is the intended access pattern (reader.rs read path)."""
        off = self.first_data_block_offset
        end = self.load_on_open_offset or len(self.data) - TRAILER_SIZE
        while off < end:
            h, payload = self._block_payload(off)
            if h.magic in DATA_MAGICS:
                pos = 0
                while pos + 8 <= len(payload):
                    key_len, val_len = struct.unpack_from(">ii", payload, pos)
                    key_start = pos + 8
                    content_len = struct.unpack_from(">h", payload, key_start)[0]
                    key = payload[key_start + 2 : key_start + 2 + content_len]
                    val_start = key_start + key_len
                    value = payload[val_start : val_start + val_len]
                    yield key, value
                    pos = val_start + val_len + 1  # +1 mvcc byte (always 0)
            off = h.next_offset(off)
