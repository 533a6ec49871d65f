"""Token-budget sequence packing / shard assignment.

Training pipelines shard a corpus into units of roughly ``capacity``
tokens (a training shard, a tar file, a sequence-packing bin). The
deterministic contract here: within each stream (``partition_col``),
documents are laid out in ``id_col`` order at their running token
offset, and a document belongs to the shard its *start* offset falls in
(``shard = start_offset div capacity``). Shards can therefore overrun
by at most one document — the standard offset-packing trade that keeps
assignment a pure prefix-sum, with no per-bin sequential state.

Scale notes: the only operation is a window cumulative sum keyed by
``partition_col`` (source / language / date bucket), so the work
parallelizes across streams — there is deliberately NO global-order
variant, which would serialize the prefix sum into one task at 100 TB.
Exact arithmetic throughout (BIGINT sums, integer div) — the SQL oracle
is bit-identical.

Reference scope note: apache/hudi-rs has no packing operator; this is
part of the training-data-pipeline surface this repo adds on top.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def pack_sequences(
    df: DataFrame,
    id_col: str,
    token_col: str,
    capacity: int,
    partition_col: str,
) -> DataFrame:
    """Assign each row a (stream-local) shard id and start offset.

    Returns the input's id/partition columns plus ``start_offset`` (the
    running token offset of this row within its stream) and ``shard``
    (``start_offset div capacity``).
    """
    win = (
        Window.partitionBy(partition_col)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum(F.col(token_col)).over(win).cast("bigint")
    return df.select(
        F.col(id_col),
        F.col(partition_col),
        F.col(token_col).cast("bigint").alias(token_col),
        (cum - F.col(token_col)).alias("start_offset"),
    ).withColumn("shard", F.expr(f"start_offset div {int(capacity)}"))
