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


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        # events.ts is parquet timestamp[ns]; Spark's reader rejects nanos.
        # Read as long nanos and truncate to micros (exactly what DuckDB's
        # reader does), keeping the scan vectorized.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        from pyspark.sql import functions as F

        df = spark.read.parquet(f"{sf_dir}/events.parquet")
        return df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_tables(spark: SparkSession, sf_dir: str, names=TABLES) -> dict[str, DataFrame]:
    return {name: load(spark, sf_dir, name) for name in names}
