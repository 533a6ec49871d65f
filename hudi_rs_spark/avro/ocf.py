"""Avro Object Container File reader (the `Objavro` format) — used by the
v8+ Hudi timeline for commit/deltacommit metadata files.

Public format: magic "Obj\\x01", file metadata map (avro.schema,
avro.codec), 16-byte sync marker, then blocks of
(record count, byte size, payload, sync). Codecs: null, deflate, snappy
(snappy tables are rare; we raise if the codec is unavailable).
"""

from __future__ import annotations

import json
import zlib
from typing import Any

from hudi_rs_spark.avro.binary import Reader, collect_names, decode, read_bytes, read_long

MAGIC = b"Obj\x01"


def read_ocf(buf: bytes) -> tuple[dict, list[Any]]:
    """Returns (parsed avro schema json, list of decoded records)."""
    if buf[:4] != MAGIC:
        raise ValueError("not an avro object container file")
    r = Reader(buf, 4)
    meta: dict[str, bytes] = {}
    while True:
        n = read_long(r)
        if n == 0:
            break
        if n < 0:
            n = -n
            read_long(r)
        for _ in range(n):
            k = read_bytes(r).decode("utf-8")
            v = read_bytes(r)
            meta[k] = v
    sync = r.read(16)
    schema = json.loads(meta["avro.schema"].decode("utf-8"))
    codec = meta.get("avro.codec", b"null").decode("utf-8")
    names = collect_names(schema)

    records: list[Any] = []
    while not r.at_end():
        count = read_long(r)
        size = read_long(r)
        payload = r.read(size)
        if codec == "deflate":
            payload = zlib.decompress(payload, -15)
        elif codec != "null":
            raise ValueError(f"unsupported avro codec: {codec}")
        block = Reader(payload)
        for _ in range(count):
            records.append(decode(block, schema, names))
        if r.read(16) != sync:
            raise ValueError("avro sync marker mismatch")
    return schema, records


def read_ocf_file(path: str) -> tuple[dict, list[Any]]:
    from hudi_rs_spark.fs.storage import storage_for

    return read_ocf(storage_for(path).read_bytes(path))
