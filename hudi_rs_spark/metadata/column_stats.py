"""Metadata-table ``column_stats`` partition reader: per-(file, column)
min/max/null/value counts for file-level pruning WITHOUT footer reads.

The reference scopes its MDT use to the ``files`` partition
(metadata/table/mod.rs:111 "TODO: support more partitions"); this goes one
step further because it changes planner complexity at scale: footer-based
stats pruning reads O(candidate files) parquet footers on the driver,
while the column_stats partition is one tiny HFile slice read — the same
O(partitions)-not-O(files) argument as the listing fast path.

Record shape (decoded HoodieMetadataRecord.ColumnStatsMetadata):
  fileName, columnName, minValue/maxValue ({"value": X} wrappers or null),
  nullCount, valueCount, isDeleted.
Merge: later records replace earlier ones per record key; isDeleted drops.
"""

from __future__ import annotations

from hudi_rs_spark.avro.binary import Reader, collect_names, decode
from hudi_rs_spark.metadata.files_partition import iter_partition_hfiles

COLUMN_STATS_PARTITION = "column_stats"


def _unwrap(v):
    if isinstance(v, dict) and set(v) == {"value"}:
        return v["value"]
    return v


def read_column_stats(
    data_table_base_path: str,
    columns: set[str] | None = None,
    partition: str = COLUMN_STATS_PARTITION,
) -> dict[str, dict[str, tuple]]:
    """{file_name: {column: (min, max)}} for live entries carrying both
    bounds; ``columns`` filters early (why read stats for columns no
    filter mentions). ``partition`` selects the stats-shaped MDT
    partition — column_stats by default, or an ``expr_index_{name}``
    partition (write/expr_index.py), whose records carry the expression
    string in the column field."""
    by_key: dict[str, tuple] = {}  # record key -> (file, col, min, max, deleted)
    schema = names = None
    for is_base, hf in iter_partition_hfiles(
        data_table_base_path, partition
    ):
        if schema is None:
            schema = hf.avro_schema()
            if schema is None:
                raise ValueError("MDT column_stats HFile carries no avro schema")
            names = collect_names(schema)
        for k, v in hf.records():
            raw = k.decode("utf-8", errors="replace")
            if not v:
                continue
            d = decode(Reader(v), schema, names)
            cs = d.get("ColumnStatsMetadata")
            if cs is None:
                continue
            col = cs.get("columnName")
            if columns is not None and col not in columns:
                continue
            by_key[raw] = (
                cs.get("fileName"),
                col,
                _unwrap(cs.get("minValue")),
                _unwrap(cs.get("maxValue")),
                bool(cs.get("isDeleted")),
            )
    out: dict[str, dict[str, tuple]] = {}
    for fname, col, mn, mx, deleted in by_key.values():
        if deleted or fname is None or col is None or mn is None or mx is None:
            continue
        out.setdefault(fname, {})[col] = (mn, mx)
    return out


def has_column_stats_partition(config) -> bool:
    parts = config.props.get("hoodie.table.metadata.partitions", "")
    return COLUMN_STATS_PARTITION in [p.strip() for p in parts.split(",") if p.strip()]


PARTITION_STATS_PARTITION = "partition_stats"


def has_partition_stats_partition(config) -> bool:
    parts = config.props.get("hoodie.table.metadata.partitions", "")
    return PARTITION_STATS_PARTITION in [p.strip() for p in parts.split(",") if p.strip()]


def read_partition_stats(
    data_table_base_path: str,
    columns: set[str] | None = None,
) -> dict[str, dict[str, tuple]]:
    """{partition_path: {column: (min, max)}} — bounds for pruning whole
    PARTITIONS before any file is listed or planned.

    Records arrive per write (fileName field = partition path), so bounds
    are UNION-merged per (partition, column): min of mins, max of maxes.
    Union covers every file ever written there — base and log — which
    makes exclusion pruning safe even for MOR (updates live in log files
    whose stats are included; deletes only remove rows, never widen the
    true range beyond the recorded bounds). Wider-than-true bounds cost
    pruning opportunity, never correctness."""
    out: dict[str, dict[str, tuple]] = {}
    schema = names = None
    for is_base, hf in iter_partition_hfiles(
        data_table_base_path, PARTITION_STATS_PARTITION
    ):
        if schema is None:
            schema = hf.avro_schema()
            if schema is None:
                raise ValueError("MDT partition_stats HFile carries no avro schema")
            names = collect_names(schema)
        for k, v in hf.records():
            if not v:
                continue
            d = decode(Reader(v), schema, names)
            cs = d.get("ColumnStatsMetadata")
            if cs is None or cs.get("isDeleted"):
                continue
            col = cs.get("columnName")
            if columns is not None and col not in columns:
                continue
            part = cs.get("fileName")  # partition path rides in fileName
            mn, mx = _unwrap(cs.get("minValue")), _unwrap(cs.get("maxValue"))
            if part is None or col is None or mn is None or mx is None:
                continue
            cur = out.setdefault(part, {}).get(col)
            if cur is None:
                out[part][col] = (mn, mx)
            else:
                out[part][col] = (min(cur[0], mn), max(cur[1], mx))
    return out
