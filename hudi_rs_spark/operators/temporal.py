"""Temporal join operators Spark lacks as built-ins: as-of join and
range (interval) join.

Both are named in the brief's custom-operator list and exist in most
timeseries engines; neither is a Catalyst join type, and the naive SQL
formulation (theta-join on an inequality) degenerates to a broadcast
nested loop — O(n*m) per key and a non-starter at 100 TB. These
implementations re-express the semantics as ONE equi-shuffle each:

- ``asof_join``: union the two sides tagged by origin, hash-partition by
  the join key, sort within partition by (time, origin), and forward-fill
  the right side's payload with ``last(ignorenulls)`` over an unbounded-
  preceding window. Every row moves exactly once; there is no join node
  in the plan at all. This is the classic log-merge formulation
  (pandas merge_asof semantics, direction="backward", allow_exact=True).

- ``range_join``: coarse time-bucketing. The probe side lands in exactly
  one bucket of width ``window``; the build side (interval [start,
  start+window)) is exploded to the <=2 buckets its interval overlaps;
  the join becomes an equi-join on (key, bucket) followed by the exact
  range predicate. Candidate fan-out is bounded by interval/bucket
  ratio, independent of data volume — the same trick Databricks' range
  join optimization and PostGIS bucket joins use.

Scale notes: both shuffle on (key) or (key, bucket) — data-volume
linear, no per-key quadratic blowup unless one key+bucket truly holds
the volume (then AQE skew-join splits it).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_time: str,
    right_time: str,
    payload: list[str],
) -> DataFrame:
    """For each left row, attach ``payload`` from the right row with the
    greatest ``right_time`` <= ``left_time`` for the same key(s); left
    rows with no earlier right row keep null payload (left as-of join).

    The right side must be unique per (key, right_time) — pre-aggregate
    ties (e.g. keep max id) before calling, or the fill picks the last
    row in the (deterministically sorted) tie group.

    Single hash-shuffle on the key, window sort within partitions, no
    join node. Output: all left columns + payload columns.
    """
    from pyspark.sql import types as T

    keys = [on] if isinstance(on, str) else list(on)
    left_cols = [c for c in left.columns]

    # The payload travels as ONE struct so the fill always resolves to a
    # single right row: per-column last(ignorenulls) would back-fill a
    # legitimate NULL in one payload column from an OLDER right row,
    # fabricating a mixed row that never existed.
    pay_type = T.StructType([T.StructField(c, right.schema[c].dataType) for c in payload])
    l_tag = left.select(
        *keys,
        F.col(left_time).alias("_t"),
        F.lit(1).alias("_is_left"),
        *[F.col(c) for c in left_cols if c not in keys],
        F.lit(None).cast(pay_type).alias("_pay"),
    )
    r_tag = right.select(
        *keys,
        F.col(right_time).cast(left.schema[left_time].dataType).alias("_t"),
        F.lit(0).alias("_is_left"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in left_cols if c not in keys],
        F.struct(*payload).alias("_pay"),
    )
    # right rows sort BEFORE left rows at the same timestamp (_is_left
    # ascending) so an exact-time match is visible to the fill
    w = (
        Window.partitionBy(*keys)
        .orderBy("_t", "_is_left")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = r_tag.unionByName(l_tag).select(
        "*", F.last("_pay", ignorenulls=True).over(w).alias("_f_pay")
    )
    return filled.filter(F.col("_is_left") == 1).select(
        *keys,
        *[c for c in left_cols if c not in keys],
        *[F.col(f"_f_pay.{c}").alias(c) for c in payload],
    )


def range_join(
    probe: DataFrame,
    build: DataFrame,
    on: tuple[str, str],
    probe_time: str,
    build_start: str,
    window_seconds: int,
) -> DataFrame:
    """Equi-join ``probe`` rows to every ``build`` row whose interval
    [build_start, build_start + window_seconds) contains ``probe_time``
    and whose key matches. Returns the joined DataFrame (all columns of
    both sides) for the caller to aggregate/project.

    Bucketing: bucket width == window width, so a build interval spans
    at most 2 buckets (explode factor <= 2) and each probe row lands in
    exactly 1 — every matching pair meets in exactly one bucket, no
    dedup needed afterwards.
    """
    probe_key, build_key = on
    w_us = F.lit(int(window_seconds) * 1_000_000)
    p = probe.withColumn(
        "_bucket", F.floor(F.unix_micros(F.col(probe_time)) / w_us)
    )
    start_us = F.unix_micros(F.col(build_start).cast(probe.schema[probe_time].dataType))
    b = (
        build.withColumn("_b0", F.floor(start_us / w_us))
        # last bucket holding any in-range instant: floor((end-1)/W)
        .withColumn("_b1", F.floor((start_us + w_us - 1) / w_us))
        .withColumn("_bucket", F.explode(F.sequence(F.col("_b0"), F.col("_b1"))))
        .drop("_b0", "_b1")
    )
    joined = p.join(
        b,
        (p["_bucket"] == b["_bucket"]) & (p[probe_key] == b[build_key]),
    )
    in_range = (
        F.unix_micros(p[probe_time]) >= F.unix_micros(b[build_start].cast(p.schema[probe_time].dataType))
    ) & (
        F.unix_micros(p[probe_time])
        < F.unix_micros(b[build_start].cast(p.schema[probe_time].dataType)) + w_us
    )
    return joined.filter(in_range).drop("_bucket")
