"""Skew-handling operators.

AQE's skew-join splitting covers sort-merge joins at runtime; these
helpers cover the aggregation side, where one hot key (a viral document,
a null-ish default, one giant customer) can pin a single reducer at
100 TB scale.

``salted_aggregate`` is the classic two-phase rewrite: spray each hot
key across N salt buckets for a partial aggregate, then combine the N
partials. Results are identical to a direct groupBy (tested), only the
shuffle distribution changes — so it composes with the oracle checks.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# (merge_fn, final_fn) per supported aggregate: phase-2 must combine
# partials correctly — count combines by sum, min by min, etc.
_COMBINERS = {
    "sum": (F.sum, F.sum),
    "count": (F.count, F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}


def salted_aggregate(
    df: DataFrame,
    group_cols: Sequence[str],
    aggs: dict[str, tuple[str, str]],  # out_name -> (fn, col); fn in _COMBINERS
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-phase skew-proof groupBy.

    Phase 1 shuffles on (group_cols..., salt) — the hot key fans out over
    ``salt_buckets`` reducers; phase 2 shuffles only the tiny partials.
    """
    for name, (fn, _) in aggs.items():
        if fn not in _COMBINERS:
            raise ValueError(f"unsupported salted aggregate fn: {fn}")

    salted = df.withColumn(
        "__salt", (F.rand(seed=42) * salt_buckets).cast("int")
    )
    phase1 = salted.groupBy(*group_cols, "__salt").agg(
        *[
            _COMBINERS[fn][0](col).alias(f"__p_{name}")
            for name, (fn, col) in aggs.items()
        ]
    )
    phase2 = phase1.groupBy(*group_cols).agg(
        *[
            _COMBINERS[fn][1](f"__p_{name}").alias(name)
            for name, (fn, _) in aggs.items()
        ]
    )
    return phase2


def top_frequent_keys(
    df: DataFrame, key_cols: Sequence[str], threshold_ratio: float = 0.01
) -> DataFrame:
    """Identify skewed keys: keys carrying more than threshold_ratio of
    all rows, in ONE job over the input.

    The total row count comes from summing the per-key partial counts
    (a windowed sum over the already-aggregated keys — tiny relation)
    instead of a separate df.count() pass, so the input is scanned once."""
    counted = df.groupBy(*key_cols).agg(F.count(F.lit(1)).alias("n"))
    from pyspark.sql.window import Window

    total = F.sum("n").over(Window.partitionBy())
    return (
        counted.withColumn("__total", total)
        .filter(F.col("n") > F.col("__total") * threshold_ratio)
        .drop("__total")
        .orderBy(F.desc("n"))
    )
