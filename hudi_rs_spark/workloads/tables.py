"""Load the driver-provided parquet tables (TESTDATA.md) as DataFrames.

At 100 TB these reads stay scan-shaped: we hand Spark the parquet paths and
let the vectorized reader + Catalyst handle pushdown/pruning. Small dims
(region, nation, supplier, part, customer) are broadcast-join candidates at
any scale factor, so join builders use ``F.broadcast`` on them explicitly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimensions small enough (bounded cardinality: 5 regions, 25 nations; and
# part/supplier/customer grow ~linearly but stay << lineitem) that a
# broadcast hint is right at bench scale. On a true 100 TB run customer may
# exceed the broadcast threshold; AQE will demote the hint to shuffle join.
BROADCAST_DIMS = {"region", "nation", "supplier", "part"}


def normalize_event_ts(df: DataFrame) -> DataFrame:
    """Coerce events.ts to TimestampType regardless of how the parquet file
    stores it. The driver's generator has shipped both timestamp[ns] (which
    Spark reads as long under the nanosAsLong conf) and timestamp[us] (which
    Spark 4 reads natively as TIMESTAMP_NTZ), so this adapts by dtype instead
    of assuming one encoding. The session timezone is pinned to UTC
    (session.py), so the NTZ->TZ cast preserves the stored micros exactly and
    matches what DuckDB's reader yields for the oracle comparison.
    """
    from pyspark.sql import functions as F

    ts_type = dict(df.dtypes).get("ts")
    if ts_type == "bigint":  # legacy nanos-as-long encoding
        return df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    if ts_type == "timestamp_ntz":
        return df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


# Lazy-DataFrame memo, keyed by (Spark application, sf_dir, table). Each
# spark.read.parquet() call pays ~0.1s of driver-side setup (file listing
# + footer schema read) — multiplied across every query build and bench
# repeat of the same immutable input table. Reusing the DataFrame object
# reuses its InMemoryFileIndex/schema, the same economy Spark's own
# catalog tables get. NO results are cached: the plan is lazy and every
# action still scans the parquet files.
#
# CONTRACT (ADVICE r13): the memo assumes the sf_dir inputs are
# IMMUTABLE for the lifetime of the Spark application — true for the
# driver/bench test data this registry exists for. Regenerating a
# parquet input in-place within one application would leave the pinned
# file listing stale (FileNotFoundException or stale rows); call
# invalidate_table_memo() after doing that. The memo is also scoped by
# applicationId, so sibling SparkSessions of one application share
# DataFrames — fine for reads of immutable inputs, which is all this
# loader serves.
_DF_MEMO: dict[tuple[str, str, str], DataFrame] = {}


def invalidate_table_memo(sf_dir: str | None = None) -> None:
    """Drop memoized DataFrames (all, or those under ``sf_dir``) — the
    escape hatch for the immutable-input contract above."""
    if sf_dir is None:
        _DF_MEMO.clear()
        return
    for key in [k for k in _DF_MEMO if k[1] == sf_dir]:
        del _DF_MEMO[key]


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    key = (spark.sparkContext.applicationId, sf_dir, name)
    df = _DF_MEMO.get(key)
    if df is None:
        if name == "events":
            # Harmless when the file is timestamp[us]; required so that a
            # timestamp[ns] file reads as long instead of erroring.
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
            df = normalize_event_ts(
                spark.read.parquet(f"{sf_dir}/events.parquet")
            )
        else:
            df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        _DF_MEMO[key] = df
    return df


def load_tables(spark: SparkSession, sf_dir: str, names=TABLES) -> dict[str, DataFrame]:
    return {name: load(spark, sf_dir, name) for name in names}
