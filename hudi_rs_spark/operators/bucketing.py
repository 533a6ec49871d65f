"""Bucketed co-located joins: the repeat-join scale lever.

A fact table joined on the same key by many queries pays one shuffle per
query. Writing both sides bucketed (and sorted) by the join key aligns
their physical partitioning with the join's required distribution, so
Catalyst plans a shuffle-FREE sort-merge join: zero Exchange operators,
which at 100 TB is the difference between a network-bound and a
scan-bound join. Bucket counts must match (or divide) across sides.

This wraps the plain Spark bucketing surface (`bucketBy` needs
`saveAsTable` — bucketed layout lives in the session catalog/warehouse).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: Sequence[str],
    num_buckets: int = 32,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` bucketed (and sorted) by ``bucket_cols``.

    Sorting within buckets lets the join skip its per-task sort too
    (SortMergeJoin reads pre-sorted bucket files)."""
    writer = df.write.format("parquet").mode(mode).bucketBy(
        num_buckets, bucket_cols[0], *bucket_cols[1:]
    )
    if sort:
        writer = writer.sortBy(bucket_cols[0], *bucket_cols[1:])
    writer.saveAsTable(table_name)


def bucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: Sequence[str],
    how: str = "inner",
) -> DataFrame:
    """Join two bucketed catalog tables on their bucket key. With equal
    bucket counts the plan contains no Exchange (asserted in
    tests/test_plans.py)."""
    return spark.table(left_table).join(spark.table(right_table), list(on), how)
