"""File-level min/max stats pruning — behavior of
/root/reference/crates/core/src/table/file_pruner.rs:38-273.

Reads per-column min/max from parquet footers (driver-side, cheap: one
footer read per candidate file) and drops a file iff NO row can match —
the same conservative truth table as the reference:

  =  : prune iff v < min or v > max
  != : prune iff min == max == v
  <  : prune iff min >= v          <= : prune iff min > v
  >  : prune iff max <= v          >= : prune iff max < v
  IN : prune iff every value is outside [min, max]

Missing stats => keep (fail-open). Only applied when the scan is
base-files-only (COW or read-optimized): log files can contradict base
stats, so MOR snapshot skips this (safety gate, table/mod.rs:485-491).
Spark's row-group pushdown still applies either way — this is the
file-granularity skip above it, saving footer/scan task setup.
"""

from __future__ import annotations

from datetime import date, datetime

from hudi_rs_spark.plans.partition_pruner import Filter


def parquet_column_stats(path: str) -> dict[str, tuple]:
    """{column: (min, max)} from the footer; absent entries mean no stats."""
    return parquet_footer_stats(path)[0]


def parquet_footer_stats(path: str) -> tuple[dict[str, tuple], int]:
    """({column: (min, max)}, num_rows) from one footer read — the row
    count rides along so pruning can attach it to the slice for free."""
    import pyarrow.parquet as pq

    from hudi_rs_spark.fs.storage import storage_for

    with storage_for(path).open_seekable(path) as f:
        md = pq.ParquetFile(f).metadata
    acc: dict[str, list] = {}  # name -> [min, max] or None (no stats)
    for rg in range(md.num_row_groups):
        g = md.row_group(rg)
        for ci in range(g.num_columns):
            col = g.column(ci)
            name = col.path_in_schema
            st = col.statistics
            if st is None or not st.has_min_max:
                acc[name] = None  # any group without stats voids the column
                continue
            cur = acc.get(name)
            if name in acc and cur is None:
                continue
            if cur is None:
                acc[name] = [st.min, st.max]
            else:
                cur[0] = min(cur[0], st.min)
                cur[1] = max(cur[1], st.max)
    return (
        {k: (v[0], v[1]) for k, v in acc.items() if v is not None},
        md.num_rows,
    )


def _coerce_to(value: str, exemplar):
    if isinstance(exemplar, bool):
        return value.lower() == "true"
    if isinstance(exemplar, int):
        return int(value)
    if isinstance(exemplar, float):
        return float(value)
    if isinstance(exemplar, datetime):
        return datetime.fromisoformat(value)
    if isinstance(exemplar, date):
        return date.fromisoformat(value)
    if isinstance(exemplar, bytes):
        return value.encode()
    return value


def should_include_file(stats: dict[str, tuple], filters: list[Filter]) -> bool:
    """True iff the file may contain matching rows (fail-open)."""
    for f in filters:
        if f.field not in stats:
            continue  # no stats -> keep
        mn, mx = stats[f.field]
        try:
            if f.op in ("IN",):
                vals = [_coerce_to(v, mn) for v in f.values()]
                if all(v < mn or v > mx for v in vals):
                    return False
                continue
            if f.op == "NOT IN":
                continue  # can never prove all rows excluded from stats alone
            v = _coerce_to(f.value, mn)
            if f.op == "=" and (v < mn or v > mx):
                return False
            if f.op == "!=" and mn == mx == v:
                return False
            if f.op == "<" and mn >= v:
                return False
            if f.op == "<=" and mn > v:
                return False
            if f.op == ">" and mx <= v:
                return False
            if f.op == ">=" and mx < v:
                return False
        except (TypeError, ValueError):
            continue  # uncomparable -> keep
    return True


def estimate_table_stats(paths: list[str]) -> tuple[int, int]:
    """(est_rows, est_bytes) from parquet footers — op 23
    (table/mod.rs:895-952 uses MDT sizes x sampled compression; footer
    row counts are strictly better when listing is already done)."""
    import pyarrow.parquet as pq

    from hudi_rs_spark.fs.storage import storage_for

    rows = 0
    size = 0
    for p in paths:
        st = storage_for(p)
        if p.endswith(".lance"):
            from hudi_rs_spark.lance.reader import LanceFile

            rows += LanceFile.num_rows_from_path(p)
        else:
            with st.open_seekable(p) as f:
                rows += pq.ParquetFile(f).metadata.num_rows
        size += st.size(p)
    return rows, size
