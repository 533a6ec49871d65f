"""Metadata-table ``column_stats`` / ``partition_stats`` partition
WRITER — per-(file, column) and per-(partition, column) min/max bounds
so written tables hit the repo's stats-pruning fast paths
(plans/file_pruner.py reads column_stats before falling back to O(files)
footer reads; partition-level pruning reads partition_stats before
listing anything).

Record shape mirrors what the readers in metadata/column_stats.py
decode: a HoodieMetadataRecord-style record whose ``ColumnStatsMetadata``
branch carries fileName / columnName / minValue / maxValue (typed
wrapper records or null) / valueCount / nullCount / isDeleted. The HFile
embeds this module's avro schema, so reader and writer stay
self-consistent without depending on Hudi's full wrapper-type zoo.

The min/max union has one wrapper record per supported primitive
(boolean/long/double/string); branch selection happens by PYTHON type
at encode time — the generic ``logblocks.encode_datum`` union matcher
cannot distinguish same-typed record branches, so this module encodes
the stats record by hand (avro binary is plain field concatenation).
"""

from __future__ import annotations

import struct

from hudi_rs_spark.write.logblocks import _zigzag

_WRAPPERS = [
    {"type": "record", "name": "BooleanWrapper",
     "fields": [{"name": "value", "type": "boolean"}]},
    {"type": "record", "name": "LongWrapper",
     "fields": [{"name": "value", "type": "long"}]},
    {"type": "record", "name": "DoubleWrapper",
     "fields": [{"name": "value", "type": "double"}]},
    {"type": "record", "name": "StringWrapper",
     "fields": [{"name": "value", "type": "string"}]},
]

STATS_RECORD_SCHEMA = {
    "type": "record",
    "name": "HoodieMetadataRecord",
    "fields": [
        {"name": "key", "type": "string"},
        {"name": "type", "type": "int"},
        {
            "name": "ColumnStatsMetadata",
            "type": [
                "null",
                {
                    "type": "record",
                    "name": "HoodieMetadataColumnStats",
                    "fields": [
                        {"name": "fileName", "type": ["null", "string"],
                         "default": None},
                        {"name": "columnName", "type": ["null", "string"],
                         "default": None},
                        {"name": "minValue",
                         "type": ["null"] + _WRAPPERS, "default": None},
                        {"name": "maxValue",
                         "type": ["null", "BooleanWrapper", "LongWrapper",
                                  "DoubleWrapper", "StringWrapper"],
                         "default": None},
                        {"name": "valueCount", "type": ["null", "long"],
                         "default": None},
                        {"name": "nullCount", "type": ["null", "long"],
                         "default": None},
                        {"name": "isDeleted", "type": "boolean"},
                    ],
                },
            ],
            "default": None,
        },
    ],
}


def _enc_string(v: str) -> bytes:
    raw = v.encode("utf-8")
    return _zigzag(len(raw)) + raw


def _enc_nullable_string(v: str | None) -> bytes:
    if v is None:
        return _zigzag(0)
    return _zigzag(1) + _enc_string(v)


def _enc_nullable_long(v: int | None) -> bytes:
    if v is None:
        return _zigzag(0)
    return _zigzag(1) + _zigzag(int(v))


def _enc_wrapped(v) -> bytes:
    """minValue/maxValue union: branch by python type (union indices:
    0 null, 1 BooleanWrapper, 2 LongWrapper, 3 DoubleWrapper,
    4 StringWrapper)."""
    if v is None:
        return _zigzag(0)
    if isinstance(v, bool):
        return _zigzag(1) + (b"\x01" if v else b"\x00")
    if isinstance(v, int):
        return _zigzag(2) + _zigzag(v)
    if isinstance(v, float):
        return _zigzag(3) + struct.pack("<d", v)
    if isinstance(v, str):
        return _zigzag(4) + _enc_string(v)
    raise TypeError(f"unsupported stats value type {type(v).__name__}")


def encode_stats_record(
    key: str,
    file_name: str,
    column: str,
    min_value,
    max_value,
    value_count: int | None,
    null_count: int | None,
    rec_type: int = 3,
    is_deleted: bool = False,
) -> tuple[bytes, bytes]:
    """(key_bytes, value_bytes) for one column-stats record, encoded to
    STATS_RECORD_SCHEMA by hand (see module docstring for why)."""
    out = _enc_string(key)
    out += _zigzag(rec_type)
    out += _zigzag(1)  # ColumnStatsMetadata present
    out += _enc_nullable_string(file_name)
    out += _enc_nullable_string(column)
    out += _enc_wrapped(min_value)
    out += _enc_wrapped(max_value)
    out += _enc_nullable_long(value_count)
    out += _enc_nullable_long(null_count)
    out += b"\x01" if is_deleted else b"\x00"
    return key.encode(), out


_STATS_TYPES = ("bool", "int", "long", "float", "double", "string")


def compute_column_stats(table, skip_columns: frozenset = frozenset()) -> dict:
    """{column: {"min", "max", "nulls", "values"}} for the eligible
    top-level primitive columns of a pyarrow Table. Values are plain
    python bool/int/float/str (what _enc_wrapped accepts)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    out: dict = {}
    for name, col in zip(table.column_names, table.columns):
        if name in skip_columns or name.startswith("_hoodie"):
            continue
        t = col.type
        if not (
            pa.types.is_integer(t) or pa.types.is_floating(t)
            or pa.types.is_string(t) or pa.types.is_large_string(t)
            or pa.types.is_boolean(t)
        ):
            continue
        nulls = col.null_count
        values = len(col) - nulls
        if values == 0:
            out[name] = {"min": None, "max": None,
                         "nulls": nulls, "values": values}
            continue
        mm = pc.min_max(col)
        mn, mx = mm["min"].as_py(), mm["max"].as_py()
        out[name] = {"min": mn, "max": mx, "nulls": nulls, "values": values}
    return out
