"""Incremental materialized-view maintenance from the CDC feed.

A count/sum aggregate over a 100 TB table should not be recomputed
because one commit touched 0.01% of its rows. This operator refreshes a
materialized ``GROUP BY`` state from the table's typed change feed
(``HudiTable.read_changes`` — op i/u/d with JSON images, the engine's
CDC surface, reference analog ``hoodie.datasource.query.incremental
.format=cdc``):

- the change window is reduced to the NET effect per record key (last
  change wins — a key updated five times contributes one +row);
- "+" rows come from the final after-images of surviving keys;
- "−" rows come from the PRE-window snapshot (time travel to the window
  start) restricted to the touched keys — our CDC blocks carry key-only
  before-images for deletes (Hudi's OP_KEY_ONLY class), so the prior
  values are read back from the table itself. At scale that read is a
  point-lookup-prunable scan (record-index tagging keeps it
  O(changed files), not O(table));
- the ± deltas aggregate per group (ONE shuffle proportional to the
  CHANGE volume) and merge into the existing state with a full outer
  join keyed on the group columns.

Supported aggregates: count + sum (and anything derivable from them —
avg, rates). min/max are NOT incrementally maintainable under deletes
without per-group history; recompute those.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hudi_rs_spark.operators.pin import pin

# above this many changed keys the IN-pushdown fast path stops paying
# (driver collect + filter size); the refresh falls back to the join
_MAX_KEY_PUSHDOWN = 10_000


def agg_state(
    df: DataFrame,
    group_cols: list[str],
    sum_cols: list[str],
    minmax_cols: list[str] | tuple[str, ...] = (),
) -> DataFrame:
    """Full recompute of the maintained state shape:
    (group_cols..., n_rows, sum_<c> per sum col, min_<c>/max_<c> per
    min/max col)."""
    return df.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_rows"),
        *[F.sum(c).alias(f"sum_{c}") for c in sum_cols],
        *[
            a
            for c in minmax_cols
            for a in (F.min(c).alias(f"min_{c}"), F.max(c).alias(f"max_{c}"))
        ],
    )


def _extract(image_col: str, name: str, typ: str):
    return F.get_json_object(F.col(image_col), f"$.{name}").cast(typ)


def incremental_agg_refresh(
    spark,
    table_path: str,
    state: DataFrame,
    group_cols: dict[str, str],
    sum_cols: dict[str, str],
    key_col: str,
    key_type: str,
    from_instant: str,
    to_instant: str | None = None,
    minmax_cols: dict[str, str] | None = None,
) -> DataFrame:
    """Merge the (from_instant, to_instant] change window into ``state``
    (shape of ``agg_state``; column types as declared in the dicts —
    name -> Spark type string). Returns the refreshed state, equal to a
    full recompute over the end-of-window snapshot.

    ``minmax_cols`` opts into min/max maintenance: counts and sums are
    pure ± arithmetic, but a delete can retire the current extremum, so
    min/max are RECOMPUTED — only for the groups the window touched,
    from the end-of-window snapshot restricted to those groups (a
    group-pruned scan: with group columns = partition columns that is a
    partition-pruned read). Untouched groups keep their stored
    extremes; work stays proportional to the changed groups' data."""
    from pyspark.sql import Window

    from hudi_rs_spark.config.read_config import HudiReadOptions
    from hudi_rs_spark.sources.hudi import HudiTable

    table = HudiTable(table_path, spark)
    feed = table.read_changes(from_instant, to_instant)

    key = F.coalesce(
        _extract("after", key_col, key_type),
        F.get_json_object(F.col("before"), "$._hoodie_record_key").cast(
            key_type
        ),
    ).alias("_key")
    keyed = feed.select("commit_time", "op", "after", key)

    # net effect per key: the LAST change in the window decides whether
    # the key survives and with which image
    w = Window.partitionBy("_key").orderBy(F.desc("commit_time"))
    last = (
        keyed.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    cols = {**group_cols, **sum_cols}
    plus = last.filter(F.col("op") != "d").select(
        *[_extract("after", c, t).alias(c) for c, t in cols.items()],
        F.lit(1).alias("_sign"),
    )

    # pre-window rows of the touched keys. Fast path: when the change
    # set is small (the normal case — that is the point of incremental
    # maintenance), collect the keys and push an IN filter into the
    # time-travel read, so partition pruning + column-stats file
    # skipping bound the scan to the files that can hold those keys.
    # Past the threshold, fall back to a distributed join (change
    # volume that large is near-recompute territory anyway).
    touched = pin(keyed.select("_key").distinct())
    sample = touched.limit(_MAX_KEY_PUSHDOWN + 1).collect()
    small = len(sample) <= _MAX_KEY_PUSHDOWN
    if small:
        keys = [r["_key"] for r in sample if r["_key"] is not None]
        if not keys:
            return state  # empty window: nothing changes
        val = ",".join(
            str(k).replace("\\", "\\\\").replace(",", "\\,") for k in keys
        )
        pre = table.read(
            HudiReadOptions(
                as_of_timestamp=from_instant,
                filters=[(key_col, "IN", val)],
            )
        )
        minus = pre.select(
            *[F.col(c).cast(t).alias(c) for c, t in cols.items()],
            F.lit(-1).alias("_sign"),
        )
    else:
        pre = table.read(HudiReadOptions(as_of_timestamp=from_instant))
        minus = (
            pre.join(touched, pre[key_col] == touched["_key"], "inner")
            .select(
                *[F.col(c).cast(t).alias(c) for c, t in cols.items()],
                F.lit(-1).alias("_sign"),
            )
        )

    gcols = list(group_cols)
    delta = (
        plus.unionByName(minus)
        .groupBy(*gcols)
        .agg(
            F.sum("_sign").alias("_dn"),
            *[
                F.sum(F.col(c) * F.col("_sign")).alias(f"_d_{c}")
                for c in sum_cols
            ],
        )
    )
    mm = dict(minmax_cols or {})
    merged = state.join(delta, gcols, "full").select(
        *gcols,
        (
            F.coalesce(F.col("n_rows"), F.lit(0))
            + F.coalesce(F.col("_dn"), F.lit(0))
        ).alias("n_rows"),
        *[
            (
                F.coalesce(F.col(f"sum_{c}"), F.lit(0).cast(t))
                + F.coalesce(F.col(f"_d_{c}"), F.lit(0).cast(t))
            ).alias(f"sum_{c}")
            for c, t in sum_cols.items()
        ],
        *[F.col(f"min_{c}") for c in mm],
        *[F.col(f"max_{c}") for c in mm],
    )
    merged = merged.filter(F.col("n_rows") > 0)
    if not mm:
        return merged
    end = table.read(
        HudiReadOptions(as_of_timestamp=to_instant) if to_instant else None
    )
    affected = delta.select(*gcols).distinct()
    fresh = (
        end.join(affected, gcols, "inner")
        .groupBy(*gcols)
        .agg(
            F.lit(True).alias("_touched"),
            *[
                a
                for c, t in mm.items()
                for a in (
                    F.min(F.col(c).cast(t)).alias(f"_f_min_{c}"),
                    F.max(F.col(c).cast(t)).alias(f"_f_max_{c}"),
                )
            ],
        )
    )
    return merged.join(fresh, gcols, "left").select(
        *gcols,
        "n_rows",
        *[f"sum_{c}" for c in sum_cols],
        *[
            c2
            for c in mm
            for c2 in (
                F.when(F.col("_touched"), F.col(f"_f_min_{c}"))
                .otherwise(F.col(f"min_{c}"))
                .alias(f"min_{c}"),
                F.when(F.col("_touched"), F.col(f"_f_max_{c}"))
                .otherwise(F.col(f"max_{c}"))
                .alias(f"max_{c}"),
            )
        ],
    )
