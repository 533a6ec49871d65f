"""Metadata-table secondary indexes: value -> record keys, composing with
the record index for point lookups on NON-key columns.

Partition name pattern ``secondary_index_{name}``; cell key is
``{column_value}${record_key}`` with a SecondaryIndexMetadata {isDeleted}
payload. Merge: later cells replace, tombstones drop.

Scale story: `WHERE rider = 'rider-A'` on a 100 TB table becomes two tiny
HFile-slice reads (secondary index -> record keys, record index -> file
groups) plus a scan of exactly those file slices — no full-table scan,
no shuffle.

Limitation: the separator split assumes record keys contain no '$'
(true for Hudi's uuid/composed keys); escaped separators are not handled.
"""

from __future__ import annotations

from hudi_rs_spark.avro.binary import Reader, collect_names, decode
from hudi_rs_spark.metadata.files_partition import iter_partition_hfiles

SECONDARY_INDEX_PREFIX = "secondary_index_"


def list_secondary_indexes(config) -> list[str]:
    """Secondary-index partition names from table config."""
    parts = config.props.get("hoodie.table.metadata.partitions", "")
    return [
        p.strip()
        for p in parts.split(",")
        if p.strip().startswith(SECONDARY_INDEX_PREFIX)
    ]


def read_secondary_index(
    data_table_base_path: str,
    index_partition: str,
    values: set[str] | None = None,
) -> dict[str, set[str]]:
    """{column_value: {record_key, ...}} for live index entries."""
    state: dict[tuple[str, str], bool] = {}  # (value, record_key) -> deleted
    schema = names = None
    for is_base, hf in iter_partition_hfiles(data_table_base_path, index_partition):
        if schema is None:
            schema = hf.avro_schema()
            names = collect_names(schema) if schema else None
        for k, v in hf.records():
            raw = k.decode("utf-8", errors="replace")
            val, sep, rec_key = raw.rpartition("$")
            if not sep:
                continue
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
