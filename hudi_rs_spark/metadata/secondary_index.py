r"""Metadata-table secondary indexes: value -> record keys, composing with
the record index for point lookups on NON-key columns.

Partition name pattern ``secondary_index_{name}``; cell key is
``{column_value}${record_key}`` with a SecondaryIndexMetadata {isDeleted}
payload. Merge: later cells replace, tombstones drop.

Scale story: `WHERE rider = 'rider-A'` on a 100 TB table becomes two tiny
HFile-slice reads (secondary index -> record keys, record index -> file
groups) plus a scan of exactly those file slices — no full-table scan,
no shuffle.

Key encoding (Hudi SecondaryIndexKeyUtils semantics): both halves escape
'\' as '\\' and '$' as '\$' before joining with a bare '$', so exactly
one UNESCAPED separator exists per cell key; we split there and unescape
both halves, so values/record keys containing '$' round-trip correctly.
"""

from __future__ import annotations

from hudi_rs_spark.avro.binary import Reader, collect_names, decode
from hudi_rs_spark.metadata.files_partition import iter_partition_hfiles

SECONDARY_INDEX_PREFIX = "secondary_index_"


def _unescape(s: str) -> str:
    """Drop one level of backslash escaping ('\\$'->'$', '\\\\'->'\\')."""
    out: list[str] = []
    i, n = 0, len(s)
    while i < n:
        if s[i] == "\\" and i + 1 < n:
            out.append(s[i + 1])
            i += 2
        else:
            out.append(s[i])
            i += 1
    return "".join(out)


def split_secondary_index_key(raw: str) -> tuple[str, str] | None:
    """Split '{escaped_value}${escaped_record_key}' at the single
    unescaped '$', honoring '\\' escapes; returns the UNESCAPED
    (column_value, record_key), or None for a malformed key with no
    unescaped separator."""
    sep = -1
    i, n = 0, len(raw)
    while i < n:
        c = raw[i]
        if c == "\\":
            i += 2  # escaped char: skip whatever follows
            continue
        if c == "$":
            sep = i
            break
        i += 1
    if sep < 0:
        return None
    return _unescape(raw[:sep]), _unescape(raw[sep + 1 :])


def list_secondary_indexes(config) -> list[str]:
    """Secondary-index partition names from table config."""
    parts = config.props.get("hoodie.table.metadata.partitions", "")
    return [
        p.strip()
        for p in parts.split(",")
        if p.strip().startswith(SECONDARY_INDEX_PREFIX)
    ]


def _escape(s: str) -> str:
    """Apply one level of backslash escaping ('$'->'\\$', '\\'->'\\\\'),
    the writer-side twin of _unescape."""
    return s.replace("\\", "\\\\").replace("$", "\\$")


def read_secondary_index(
    data_table_base_path: str,
    index_partition: str,
    values: set[str] | None = None,
) -> dict[str, set[str]]:
    """{column_value: {record_key, ...}} for live index entries.

    With ``values`` given, each index HFile is probed by PREFIX
    ('{escaped_value}$' — hfile/reader.py records_by_prefix; reference
    reader.rs:972 collect_records_by_prefix parity): the sorted index
    maps each value to a contiguous block range, so only those blocks
    decompress instead of the whole index."""
    state: dict[tuple[str, str], bool] = {}  # (value, record_key) -> deleted
    schema = names = None
    for is_base, hf in iter_partition_hfiles(data_table_base_path, index_partition):
        if schema is None:
            schema = hf.avro_schema()
            names = collect_names(schema) if schema else None
        if values is not None:
            pairs = []
            for val in sorted(values):
                pairs.extend(hf.records_by_prefix(_escape(val) + "$"))
        else:
            pairs = hf.records()
        for k, v in pairs:
            raw = k.decode("utf-8", errors="replace")
            parts = split_secondary_index_key(raw)
            if parts is None:
                continue
            val, rec_key = parts
            if values is not None and val not in values:
                continue
            deleted = False
            if v and schema is not None:
                d = decode(Reader(v), schema, names)
                meta = d.get("SecondaryIndexMetadata")
                deleted = bool(meta and meta.get("isDeleted"))
            state[(val, rec_key)] = deleted
    out: dict[str, set[str]] = {}
    for (val, rec_key), deleted in state.items():
        if not deleted:
            out.setdefault(val, set()).add(rec_key)
    return out
