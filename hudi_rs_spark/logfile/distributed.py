"""Executor-side MOR log decoding (scale path).

Driver-side decode is fine while log payloads are small next to base
files, but a log-heavy table (frequent upserts between compactions) can
carry GBs of deltas: decoding must happen on executors. This module
ships (file_group, log_path) tasks through ``mapInPandas`` — each
executor reads and decodes its log files locally (Arrow-batched, one
Python worker per core) and emits rows in the unified table schema.

Delete records ride in the same output with ``__is_delete = true`` (their
key/commit/ordering fields populated, data columns null), so one
distributed pass yields both merge inputs; the caller splits with two
cheap filters.

Parity: block validity (instant range, rollback voiding, pending-commit
filtering) uses the same logfile.reader functions as the driver path —
tests force both paths and assert identical results.
"""

from __future__ import annotations

from collections.abc import Iterator
from decimal import Decimal

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

DELETE_FLAG = "__is_delete"

# below this many log files the rollback-target pre-scan stays a driver
# loop (header-only seeks — cheap); above it the extra Spark job beats
# the linear driver I/O
SCAN_TARGETS_DISTRIBUTED_THRESHOLD = 256


def scan_targets_distributed(
    spark: SparkSession,
    tasks: list[tuple[str, str]],  # (group key, absolute log path)
    storage_options: dict | None = None,
) -> dict[str, set[str]]:
    """Executor-side rollback-target pre-scan: rollback voiding is
    cross-file within a group (a command block in file N voids blocks in
    file M), so per-file decode tasks need the group's full target set
    up front. The driver loop is O(files) sequential header reads — at
    millions of log files that is the one linear-driver-I/O step left in
    the distributed decode paths, so above the threshold this ships the
    header scan through mapInPandas and collects only the (group,
    target) pairs (tiny: one row per rollback command)."""
    from hudi_rs_spark.logfile import reader as logreader

    if len(tasks) <= SCAN_TARGETS_DISTRIBUTED_THRESHOLD:
        out: dict[str, set[str]] = {}
        for grp, path in tasks:
            try:
                out.setdefault(grp, set()).update(
                    logreader.scan_rollback_targets(path)
                )
            except (FileNotFoundError, OSError):
                continue
        return out

    st_options = dict(storage_options) if storage_options else None
    n_part = min(len(tasks), spark.sparkContext.defaultParallelism) or 1
    tasks_df = spark.createDataFrame(
        tasks,
        T.StructType(
            [T.StructField("grp", T.StringType()), T.StructField("path", T.StringType())]
        ),
    ).repartition(n_part)

    def scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from hudi_rs_spark.fs.storage import storage_for
        from hudi_rs_spark.logfile import reader as lr

        primed = False
        for pdf in batches:
            grps, targets = [], []
            for grp, path in zip(pdf["grp"], pdf["path"]):
                if not primed:
                    storage_for(path, st_options)
                    primed = True
                try:
                    found = lr.scan_rollback_targets(path)
                except (FileNotFoundError, OSError):
                    continue
                for t in found:
                    grps.append(grp)
                    targets.append(t)
            yield pd.DataFrame({"grp": grps, "target": targets})

    out_schema = T.StructType(
        [T.StructField("grp", T.StringType()), T.StructField("target", T.StringType())]
    )
    out: dict[str, set[str]] = {}
    for row in tasks_df.mapInPandas(scan, out_schema).collect():
        out.setdefault(row.grp, set()).add(row.target)
    return out


def decode_logs_distributed(
    spark: SparkSession,
    tasks: list[tuple[str, str]],  # (file_group_id, absolute log path)
    out_schema: T.StructType,  # table schema incl. __fg; we add __is_delete
    ordering_field: str | None,
    valid_instants: set[str],
    start_exclusive: str | None,
    end_inclusive: str | None,
    rollback_targets_by_fg: dict[str, frozenset[str]] | None = None,
    archival_boundary: str | None = None,
    pending_instants: frozenset[str] | None = None,
    storage_options: dict | None = None,
    renames: dict[str, list[str]] | None = None,
) -> DataFrame:
    full_schema = T.StructType(
        list(out_schema.fields) + [T.StructField(DELETE_FLAG, T.BooleanType(), False)]
    )
    n_part = min(len(tasks), spark.sparkContext.defaultParallelism) or 1
    tasks_df = spark.createDataFrame(
        tasks, T.StructType([T.StructField("fg", T.StringType()), T.StructField("path", T.StringType())])
    ).repartition(n_part)

    field_names = [f.name for f in full_schema.fields]
    valid = frozenset(valid_instants)
    ordering = ordering_field
    # Slice-level rollback voiding: each executor sees ONE log file, but a
    # rollback command in a later file of the same group must void earlier
    # files' blocks — the driver pre-scans command headers (cheap, seeks
    # past content) and ships the per-group target sets into the closure.
    fg_targets = {k: frozenset(v) for k, v in (rollback_targets_by_fg or {}).items()}

    st_options = dict(storage_options) if storage_options else None

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # imports inside: runs on executors
        from hudi_rs_spark.fs.storage import storage_for
        from hudi_rs_spark.logfile import reader as logreader
        from hudi_rs_spark.sources.conform import apply_renames, conform_row

        primed = False
        for pdf in batches:
            rows: list[dict] = []
            for fg, path in zip(pdf["fg"], pdf["path"]):
                if not primed:
                    # executor processes have their own storage cache;
                    # register the table's backend options once
                    storage_for(path, st_options)
                    primed = True
                blocks = logreader.read_log_file(path)
                for b in logreader.valid_blocks(
                    blocks, start_exclusive, end_inclusive, valid,
                    rollback_targets_override=fg_targets.get(fg),
                    archival_boundary=archival_boundary,
                    pending_instants=pending_instants,
                ):
                    for r in b.records:
                        r["__fg"] = fg
                        r[DELETE_FLAG] = False
                        rows.append(
                            conform_row(apply_renames(r, renames), full_schema)
                        )
                    for key, part, ordering_val in b.delete_records:
                        d = {name: None for name in field_names}
                        d.update(
                            {
                                "__fg": fg,
                                "_hoodie_commit_time": b.instant_time,
                                "_hoodie_record_key": key,
                                "_hoodie_partition_path": part,
                                DELETE_FLAG: True,
                            }
                        )
                        if ordering is not None and ordering in d:
                            d[ordering] = _conform_ordering(
                                ordering_val, full_schema[ordering].dataType
                            )
                        rows.append(d)
            yield pd.DataFrame(rows, columns=field_names)

    return tasks_df.mapInPandas(decode, full_schema)


CDC_SCHEMA = T.StructType(
    [
        T.StructField("commit_time", T.StringType(), True),
        T.StructField("op", T.StringType(), True),
        T.StructField("ts_ms", T.StringType(), True),
        T.StructField("before", T.StringType(), True),
        T.StructField("after", T.StringType(), True),
    ]
)


def decode_cdc_distributed(
    spark: SparkSession,
    tasks: list[tuple[str, str]],  # (group key, absolute log/cdc path)
    valid_instants: set[str],
    start_exclusive: str | None,
    end_inclusive: str | None,
    rollback_targets_by_group: dict[str, frozenset[str]] | None = None,
    archival_boundary: str | None = None,
    pending_instants: frozenset[str] | None = None,
    storage_options: dict | None = None,
) -> DataFrame:
    """Executor-side CDC block decode (scale path of
    ``HudiTable.read_changes``): each executor reads its CDC/log files
    locally and emits typed change rows (commit_time, op, ts_ms,
    before, after) — the change feed never materializes on the driver.
    Block validity uses the same ``logfile.reader`` gates as the driver
    decode; cross-file rollback voiding ships in via the pre-scanned
    per-group target sets (same contract as ``decode_logs_distributed``).
    """
    n_part = min(len(tasks), spark.sparkContext.defaultParallelism) or 1
    tasks_df = spark.createDataFrame(
        tasks,
        T.StructType(
            [T.StructField("grp", T.StringType()), T.StructField("path", T.StringType())]
        ),
    ).repartition(n_part)

    valid = frozenset(valid_instants)
    grp_targets = {
        k: frozenset(v) for k, v in (rollback_targets_by_group or {}).items()
    }
    st_options = dict(storage_options) if storage_options else None

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from hudi_rs_spark.fs.storage import storage_for
        from hudi_rs_spark.logfile import reader as logreader

        primed = False
        cols = [f.name for f in CDC_SCHEMA.fields]
        for pdf in batches:
            rows: list[tuple] = []
            for grp, path in zip(pdf["grp"], pdf["path"]):
                if not primed:
                    storage_for(path, st_options)
                    primed = True
                try:
                    blocks = logreader.read_log_file(path)
                except (FileNotFoundError, OSError):
                    continue  # cleaned after the commit wrote it
                for b in logreader.valid_blocks(
                    blocks, start_exclusive, end_inclusive, valid,
                    rollback_targets_override=grp_targets.get(grp),
                    archival_boundary=archival_boundary,
                    pending_instants=pending_instants,
                ):
                    if b.block_type != logreader.BLOCK_CDC_DATA:
                        continue
                    for r in b.records or []:
                        rows.append(
                            (
                                b.instant_time,
                                r.get("op"),
                                r.get("ts_ms"),
                                r.get("before"),
                                r.get("after"),
                            )
                        )
            yield pd.DataFrame(rows, columns=cols)

    return tasks_df.mapInPandas(decode, CDC_SCHEMA)


def _conform_ordering(v, dtype: T.DataType):
    if v is None:
        return None
    if isinstance(dtype, T.DecimalType) and not isinstance(v, Decimal):
        return Decimal(str(v))
    if isinstance(dtype, (T.LongType, T.IntegerType)) and isinstance(v, float):
        return int(v)
    if isinstance(dtype, T.DoubleType) and isinstance(v, int):
        return float(v)
    return v
