"""MERGE INTO for hudi_py tables — Spark SQL MERGE semantics composed
from one snapshot join plus one upsert.

Hudi proper exposes MERGE INTO through Spark SQL; the reference
(hudi-rs) is read-only, so this surface is the write-side dual of its
merge-read contract (``crates/core/src/merge/record_merger.rs``): the
rows this emits are exactly the upsert/tombstone shapes that merger
resolves.

Plan shape (one pass, no driver loops):

1. target snapshot aliased ``t`` LEFT-joined from source aliased ``s``
   on the ``on`` columns — Catalyst picks broadcast vs shuffle join
   and prunes target columns to those the clauses reference.
2. each row takes the FIRST matching clause (Spark SQL MERGE order:
   matched+delete, matched+update, not-matched+insert) via a single
   ``when`` chain — no second join, no re-read.
3. the routed frame goes through ``write.upsert`` (tombstones carry
   ``_hoodie_is_deleted``), which tags, shuffles once per file group
   and appends log blocks — at 100 TB the cost is the tag join plus
   the touched groups, never a table rewrite.

Update/delete rows keep the TARGET's partition values, so a source row
whose partition columns drifted still routes to the record's existing
file group (no cross-partition duplicate); insert rows take the
source's.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from hudi_rs_spark.write.config import DELETE_COL


def _cond(c) -> Column | None:
    if c is None:
        return None
    return F.expr(c) if isinstance(c, str) else c


def _val(v) -> Column:
    return F.expr(v) if isinstance(v, str) else v


def merge_into(
    source: DataFrame,
    path: str,
    on: str | list[str] | None = None,
    when_matched_update: dict | str | None = "all",
    when_matched_delete: str | Column | None = None,
    when_not_matched_insert: dict | str | None = "all",
    matched_condition: str | Column | None = None,
    **options,
) -> None:
    """Merge ``source`` into the MOR table at ``path``.

    - ``on``: join column name(s); defaults to the table's record key
      fields. Columns must exist on both sides.
    - ``when_matched_update``: ``"all"`` (take the source's value for
      every data column it carries, target's otherwise), a
      ``{column: sql-expr-or-Column}`` dict (referencing ``s.<col>`` /
      ``t.<col>``), or ``None`` (matched rows without a delete are
      left untouched).
    - ``when_matched_delete``: optional condition (sql string or
      Column over ``s.``/``t.``); matching rows become tombstones.
      Evaluated BEFORE the update clause (Spark SQL MERGE order).
    - ``when_not_matched_insert``: ``"all"``, a column dict, or
      ``None`` (unmatched source rows dropped).
    - ``matched_condition``: extra gate on the update clause.
    - ``options``: forwarded to ``write.upsert``.
    """
    from hudi_rs_spark.config.table_config import HudiTableConfig
    from hudi_rs_spark.sources.hudi import HudiTable
    from hudi_rs_spark.write.upsert import upsert

    spark = source.sparkSession
    tc = HudiTableConfig.from_base_path(path)
    if on is None:
        on_cols = list(tc.record_key_fields)
    else:
        on_cols = [on] if isinstance(on, str) else list(on)
    missing = [c for c in on_cols if c not in source.columns]
    if missing:
        raise ValueError(f"merge source lacks join column(s) {missing}")

    target = HudiTable(path, spark).read()
    data_cols = [c for c in target.columns if not c.startswith("_hoodie")]
    part_cols = list(tc.partition_fields)
    precombine = (tc.ordering_fields or [None])[0]

    t = target.withColumn("__t_matched", F.lit(True)).alias("t")
    s = source.alias("s")
    joined = s.join(
        t, [F.col(f"s.{c}") == F.col(f"t.{c}") for c in on_cols], "left"
    )
    matched = F.col("t.__t_matched").isNotNull()

    del_cond = _cond(when_matched_delete)
    upd_gate = _cond(matched_condition)

    def source_or_target(c: str) -> Column:
        if c in source.columns:
            return F.col(f"s.{c}")
        return F.col(f"t.{c}")

    def update_value(c: str) -> Column:
        if isinstance(when_matched_update, dict):
            if c in when_matched_update:
                return _val(when_matched_update[c])
            return F.col(f"t.{c}")
        return source_or_target(c)  # "all"

    def insert_value(c: str) -> Column:
        if isinstance(when_not_matched_insert, dict):
            if c in when_not_matched_insert:
                return _val(when_not_matched_insert[c])
            return F.lit(None)
        if c in source.columns:
            return F.col(f"s.{c}")
        return F.lit(None)

    is_delete = matched & del_cond if del_cond is not None else F.lit(False)
    is_update = matched & ~is_delete
    if when_matched_update is None:
        is_update = F.lit(False)
    elif upd_gate is not None:
        is_update = is_update & upd_gate
    is_insert = (
        ~matched if when_not_matched_insert is not None else F.lit(False)
    )

    out_cols = []
    for c in data_cols:
        # update/delete rows keep the TARGET partition (and key) values
        # so they route to the record's existing file group; precombine
        # prefers the source's ordering value so the update wins merge
        if c in part_cols or c in on_cols:
            upd = F.col(f"t.{c}")
        elif c == precombine:
            upd = source_or_target(c)
        else:
            upd = update_value(c)
        if c == precombine:
            # the delete's ordering value is the SOURCE's when it has
            # one ("delete as of s.ts"), the record's own otherwise
            dele = source_or_target(c)
        elif c in part_cols or c in on_cols:
            dele = F.col(f"t.{c}")
        else:
            dele = F.col(f"t.{c}")
        out_cols.append(
            F.when(is_delete, dele)
            .when(is_update, upd)
            .otherwise(insert_value(c))
            .alias(c)
        )
    out_cols.append(is_delete.alias(DELETE_COL))
    # matched rows where no clause fires are dropped (their current
    # values stand); everything else routes through ONE upsert
    routed = joined.filter(is_delete | is_update | is_insert).select(*out_cols)
    upsert(routed, path, **options)
