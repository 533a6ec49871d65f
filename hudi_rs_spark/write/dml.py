"""Predicate DML — SQL ``UPDATE ... WHERE`` / ``DELETE ... WHERE`` for
hudi_py tables, composed from one pruned snapshot scan plus one upsert.

Spark-first shape: the WHERE clause is a plain Catalyst expression over
the snapshot read, so partition pruning / stats pruning / record-index
pruning all apply before any row is touched; matching rows route
through ``write.upsert`` as updates or tombstones (MOR log appends —
never a table rewrite). At 100 TB the cost is the pruned scan plus the
touched file groups.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from hudi_rs_spark.write.config import DELETE_COL


def _where(cond) -> Column:
    return F.expr(cond) if isinstance(cond, str) else cond


def delete_where(spark, path: str, where: str | Column, **options) -> int:
    """Delete every row matching ``where``; returns the matched count.
    SQL twin: ``DELETE FROM t WHERE ...``."""
    from hudi_rs_spark.sources.hudi import HudiTable
    from hudi_rs_spark.write.upsert import upsert

    snap = HudiTable(path, spark).read()
    victims = snap.filter(_where(where)).drop(
        *[c for c in snap.columns if c.startswith("_hoodie")]
    )
    victims = victims.localCheckpoint(eager=True)  # pin pre-write state
    n = victims.count()
    if n:
        upsert(victims.withColumn(DELETE_COL, F.lit(True)), path, **options)
    return n


def update_where(
    spark,
    path: str,
    set: dict[str, str | Column],
    where: str | Column,
    **options,
) -> int:
    """Set ``{column: expression}`` on every row matching ``where``;
    returns the matched count. SQL twin: ``UPDATE t SET ... WHERE ...``.
    Expressions may reference the row's current columns."""
    from hudi_rs_spark.config.table_config import HudiTableConfig
    from hudi_rs_spark.sources.hudi import HudiTable
    from hudi_rs_spark.write.upsert import upsert

    tc = HudiTableConfig.from_base_path(path)
    frozen = frozenset(tuple(tc.record_key_fields) + tuple(tc.partition_fields))
    bad = [c for c in set if c in frozen]
    if bad:
        raise ValueError(
            f"update_where cannot change key/partition column(s) {bad}: "
            "use merge_into/delete+insert to move records"
        )
    snap = HudiTable(path, spark).read()
    matched = snap.filter(_where(where))
    for col, expr in set.items():
        matched = matched.withColumn(
            col, F.expr(expr) if isinstance(expr, str) else expr
        )
    matched = matched.drop(
        *[c for c in matched.columns if c.startswith("_hoodie")]
    )
    matched = matched.localCheckpoint(eager=True)  # pin pre-write state
    n = matched.count()
    if n:
        upsert(matched, path, **options)
    return n
