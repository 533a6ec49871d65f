"""Schema DDL: ALTER TABLE ADD COLUMNS / DROP COLUMNS as metadata-only
schema commits.

The reference resolves the table schema from the LATEST commit metadata
(``crates/core/src/schema/resolver.rs:41-47``), so evolving the schema
is publishing one empty commit carrying the new schema — zero data I/O
at any table size:

* ADD COLUMNS appends nullable fields; every reader backfills nulls for
  files written before (the add-column read path pinned by
  tests/test_schema_evolution.py).
* DROP COLUMNS removes fields from the published schema; old files keep
  the bytes on storage but the per-epoch scan conformance projects the
  column out everywhere (time travel BEFORE the drop still shows it —
  schema resolution is latest-wins, same as the reference, so as-of
  reads use the latest schema with the column gone; the bytes are
  reclaimable by rewrite services).

A later upsert whose frame still carries a dropped column re-adds it
via the commit-schema union (add-column evolution) — the same behavior
Hudi exhibits with overwrite payloads.
"""

from __future__ import annotations


class DdlError(ValueError):
    """The DDL statement cannot apply to this table."""


def _schema_commit(path: str, schema_json: dict, instant: str | None) -> None:
    """Publish one empty commit whose only payload is the new schema."""
    from hudi_rs_spark.config.table_config import HudiTableConfig
    from hudi_rs_spark.write.concurrency import claim_instant, release_instant
    from hudi_rs_spark.write.config import WriteConfig, new_instant
    from hudi_rs_spark.write.writer import commit_instant

    tc = HudiTableConfig.from_base_path(path)
    cfg = WriteConfig(
        path=path,
        table_name=tc.table_name,
        record_key_fields=tuple(tc.record_key_fields) or ("id",),
        partition_fields=tuple(tc.partition_fields),
        table_type=tc.table_type.value,
        table_version=tc.table_version,
        instant=instant or new_instant(),
        instant_pinned=instant is not None,
        operation="alter_schema",
    )
    claim_instant(cfg)
    try:
        commit_instant(cfg, [], schema_json)
    finally:
        release_instant(cfg)


def _current_schema(path: str) -> dict:
    from hudi_rs_spark.sources.hudi import HudiTable

    sj = HudiTable(path, spark=None, listing="direct").schema_json()
    if sj is None or not isinstance(sj.get("fields"), list):
        raise DdlError(f"cannot resolve the current schema of {path}")
    return sj


def add_columns(
    path: str, columns: dict[str, str], instant: str | None = None
) -> None:
    """ALTER TABLE ADD COLUMNS: ``columns`` maps name -> Spark DDL type
    (``"score double"`` style values like ``int``/``bigint``/``string``/
    ``array<double>``). New columns are nullable; existing rows read
    null."""
    from pyspark.sql.types import _parse_datatype_string

    from hudi_rs_spark.write.writer import _spark_to_avro

    if not columns:
        raise DdlError("ADD COLUMNS needs at least one column")
    sj = _current_schema(path)
    have = {f.get("name") for f in sj["fields"]}
    new_fields = []
    for name, ddl in columns.items():
        if name in have:
            raise DdlError(f"column {name!r} already exists")
        try:
            dt = _parse_datatype_string(ddl)
        except Exception as e:
            raise DdlError(f"cannot parse type {ddl!r} for {name!r}: {e}") from e
        new_fields.append(
            {
                "name": name,
                "type": ["null", _spark_to_avro(dt, name)],
                "default": None,
            }
        )
    _schema_commit(
        path, {**sj, "fields": [*sj["fields"], *new_fields]}, instant
    )


def drop_columns(
    path: str, columns, instant: str | None = None
) -> None:
    """ALTER TABLE DROP COLUMN(S): remove fields from the published
    schema. Key, partition, and ordering columns are load-bearing and
    cannot be dropped."""
    from hudi_rs_spark.config.table_config import HudiTableConfig

    cols = [str(c) for c in (columns if not isinstance(columns, str) else [columns])]
    if not cols:
        raise DdlError("DROP COLUMNS needs at least one column")
    tc = HudiTableConfig.from_base_path(path)
    protected = set(tc.record_key_fields) | set(tc.partition_fields) | set(
        tc.ordering_fields or []
    )
    sj = _current_schema(path)
    have = {f.get("name") for f in sj["fields"]}
    for c in cols:
        if c not in have:
            raise DdlError(f"column {c!r} does not exist")
        if c in protected:
            raise DdlError(
                f"column {c!r} is a key/partition/ordering column and "
                "cannot be dropped"
            )
    drop = set(cols)
    kept = [f for f in sj["fields"] if f.get("name") not in drop]
    if not kept:
        raise DdlError("cannot drop every column")
    _schema_commit(path, {**sj, "fields": kept}, instant)
