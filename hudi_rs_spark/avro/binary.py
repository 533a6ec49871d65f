"""Pure-Python Avro binary datum decoder.

The environment has no fastavro / spark-avro, and the Hudi formats we must
read embed Avro in three places: commit metadata files (v8+ timeline,
object container files), MOR log AvroData blocks (bare datums with the
writer schema in the block header), and delete-record payloads. This
decoder implements the Avro 1.11 binary spec (public format) for all of
them. Driver/executor-side Python is acceptable here: log/commit payloads
are small relative to base files, and decoded batches are immediately
handed to Spark via Arrow.
"""

from __future__ import annotations

import struct
from datetime import date, datetime, timedelta, timezone
from decimal import Decimal
from typing import Any


class Reader:
    __slots__ = ("buf", "pos")

    def __init__(self, buf: bytes, pos: int = 0):
        self.buf = buf
        self.pos = pos

    def read(self, n: int) -> bytes:
        b = self.buf[self.pos : self.pos + n]
        if len(b) < n:
            raise EOFError(f"avro: need {n} bytes, have {len(b)}")
        self.pos += n
        return b

    def at_end(self) -> bool:
        return self.pos >= len(self.buf)


def read_long(r: Reader) -> int:
    """zigzag varint"""
    shift = 0
    acc = 0
    while True:
        b = r.buf[r.pos]
        r.pos += 1
        acc |= (b & 0x7F) << shift
        if not (b & 0x80):
            break
        shift += 7
    return (acc >> 1) ^ -(acc & 1)


def read_bytes(r: Reader) -> bytes:
    n = read_long(r)
    return r.read(n)


def _decode_logical(value: Any, schema: dict) -> Any:
    lt = schema.get("logicalType")
    if lt is None:
        return value
    if lt == "decimal":
        scale = schema.get("scale", 0)
        unscaled = int.from_bytes(value, byteorder="big", signed=True)
        return Decimal(unscaled).scaleb(-scale)
    if lt == "date":
        return date(1970, 1, 1) + timedelta(days=value)
    if lt == "timestamp-millis":
        return datetime.fromtimestamp(value / 1000.0, tz=timezone.utc).replace(tzinfo=None)
    if lt == "timestamp-micros":
        return (datetime(1970, 1, 1) + timedelta(microseconds=value))
    if lt in ("time-millis", "time-micros"):
        return value
    if lt == "uuid":
        return value
    return value


def decode(r: Reader, schema: Any, names: dict[str, Any]) -> Any:
    """Decode one datum. ``schema`` is the parsed JSON schema (str, list,
    or dict); ``names`` maps fullname -> named schema for refs."""
    if isinstance(schema, str):
        t = schema
        if t == "null":
            return None
        if t == "boolean":
            return r.read(1)[0] != 0
        if t in ("int", "long"):
            return read_long(r)
        if t == "float":
            return struct.unpack("<f", r.read(4))[0]
        if t == "double":
            return struct.unpack("<d", r.read(8))[0]
        if t == "bytes":
            return read_bytes(r)
        if t == "string":
            return read_bytes(r).decode("utf-8")
        if t in names:
            return decode(r, names[t], names)
        raise ValueError(f"unknown avro type: {t}")

    if isinstance(schema, list):  # union
        idx = read_long(r)
        return decode(r, schema[idx], names)

    t = schema["type"]
    if t == "record":
        _register(schema, names)
        out = {}
        for f in schema["fields"]:
            out[f["name"]] = decode(r, f["type"], names)
        return out
    if t == "enum":
        _register(schema, names)
        return schema["symbols"][read_long(r)]
    if t == "array":
        items = []
        while True:
            n = read_long(r)
            if n == 0:
                break
            if n < 0:
                n = -n
                read_long(r)  # block byte size, unused
            for _ in range(n):
                items.append(decode(r, schema["items"], names))
        return items
    if t == "map":
        out = {}
        while True:
            n = read_long(r)
            if n == 0:
                break
            if n < 0:
                n = -n
                read_long(r)
            for _ in range(n):
                k = read_bytes(r).decode("utf-8")
                out[k] = decode(r, schema["values"], names)
        return out
    if t == "fixed":
        _register(schema, names)
        return _decode_logical(r.read(schema["size"]), schema)
    if t in ("bytes", "string", "int", "long", "float", "double", "boolean", "null"):
        v = decode(r, t, names)
        return _decode_logical(v, schema)
    raise ValueError(f"unknown avro schema: {schema!r}")


def _fullname(schema: dict) -> str:
    name = schema.get("name", "")
    ns = schema.get("namespace")
    if ns and "." not in name:
        return f"{ns}.{name}"
    return name


def _register(schema: dict, names: dict[str, Any]) -> None:
    fn = _fullname(schema)
    if fn and fn not in names:
        names[fn] = schema
        names[schema.get("name", fn)] = schema


def collect_names(schema: Any, names: dict[str, Any] | None = None) -> dict[str, Any]:
    """Pre-walk a schema registering all named types (records/enums/fixed)
    so forward/backward references resolve."""
    if names is None:
        names = {}
    if isinstance(schema, dict):
        t = schema.get("type")
        if t in ("record", "enum", "fixed"):
            _register(schema, names)
        if t == "record":
            for f in schema.get("fields", []):
                collect_names(f["type"], names)
        elif t == "array":
            collect_names(schema.get("items"), names)
        elif t == "map":
            collect_names(schema.get("values"), names)
    elif isinstance(schema, list):
        for s in schema:
            collect_names(s, names)
    return names


def decode_datum(buf: bytes, schema: Any) -> Any:
    r = Reader(buf)
    return decode(r, schema, collect_names(schema))
