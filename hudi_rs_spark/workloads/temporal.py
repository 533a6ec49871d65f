"""Temporal-join workload queries (as-of join, range join), oracle-checked.

The Spark side runs the scalable single-shuffle formulations from
``operators/temporal.py``; the DuckDB oracle states the same semantics
as a plain inequality join + window rank, which is fine at oracle scale
and proves the rewrite exact.

The as-of join pairs events (probe) with orders (build) on user_id ==
o_custkey; the driver's generator dates orders 1995-2001 and events
2024, so every event resolves to the customer's LAST order — still a
non-trivial per-key fill, and exact either way. The range join is an
events self-join (purchase anchors vs the same user's following hour),
which keeps both interval endpoints inside one table's time domain.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hudi_rs_spark.workloads import QuerySpec, register
from hudi_rs_spark.workloads.tables import load

_RANGE_HOURS = 1


def ops_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each event annotated with the customer's most recent order at or
    before the event time (null when none): the state-at-event-time
    lookup every feature-backfill pipeline runs."""
    from hudi_rs_spark.operators.temporal import asof_join

    e = load(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    o = load(spark, sf_dir, "orders").select(
        "o_custkey", F.col("o_orderdate").cast("timestamp").alias("o_ts"),
        "o_orderkey", "o_totalprice",
    )
    # unique right rows per (key, time): deterministic tie-break on max
    # orderkey, carrying that order's price (one extra agg shuffle)
    o1 = o.groupBy("o_custkey", "o_ts").agg(
        F.max("o_orderkey").alias("o_orderkey"),
        F.max_by("o_totalprice", "o_orderkey").alias("o_totalprice"),
    )
    joined = asof_join(
        e.withColumnRenamed("user_id", "o_custkey"),
        o1,
        on="o_custkey",
        left_time="ts",
        right_time="o_ts",
        payload=["o_orderkey", "o_totalprice"],
    )
    return joined.select(
        "event_id",
        F.col("o_custkey").alias("user_id"),
        "ts",
        "o_orderkey",
        "o_totalprice",
    ).orderBy("event_id")


ASOF_SQL = """
WITH ranked AS (
  SELECT e.event_id, e.user_id, e.ts, o.o_orderkey, o.o_totalprice,
         row_number() OVER (
           PARTITION BY e.event_id
           ORDER BY o.o_orderdate DESC, o.o_orderkey DESC
         ) AS rn
  FROM events e
  LEFT JOIN orders o
    ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
)
SELECT event_id, user_id, ts, o_orderkey, o_totalprice
FROM ranked
WHERE rn = 1
ORDER BY event_id
"""


def ops_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Post-purchase attribution: for each purchase event, count + value
    sum of the same user's OTHER events in the hour after it — an
    interval-containment self-join bucketed to an equi-join
    (operators/temporal.py), then a plain aggregate. Anchors with no
    follow-up activity drop out (inner semantics, mirrored in SQL)."""
    from hudi_rs_spark.operators.temporal import range_join

    e = load(spark, sf_dir, "events")
    probe = e.select("user_id", "ts", "event_id", "value")
    anchors = e.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
        F.col("event_id").alias("anchor_id"),
    )
    pairs = range_join(
        probe,
        anchors,
        on=("user_id", "p_user"),
        probe_time="ts",
        build_start="p_ts",
        window_seconds=_RANGE_HOURS * 3600,
    ).filter(F.col("event_id") != F.col("anchor_id"))
    return (
        pairs.groupBy("anchor_id")
        .agg(
            F.count(F.lit(1)).alias("n_follow"),
            F.sum(F.col("value").cast("decimal(20,6)")).alias("value_sum"),
        )
        .select(
            "anchor_id",
            "n_follow",
            F.col("value_sum").cast("double").alias("value_sum"),
        )
        .orderBy("anchor_id")
    )


RANGE_SQL = f"""
SELECT p.event_id AS anchor_id,
       CAST(count(*) AS BIGINT) AS n_follow,
       CAST(sum(CAST(e.value AS DECIMAL(20,6))) AS DOUBLE) AS value_sum
FROM events p
JOIN events e
  ON e.user_id = p.user_id
 AND e.ts >= p.ts
 AND e.ts < p.ts + INTERVAL {_RANGE_HOURS} HOUR
 AND e.event_id <> p.event_id
WHERE p.event_type = 'purchase'
GROUP BY p.event_id
ORDER BY anchor_id
"""


for _n, _f, _s, _d in [
    ("ops_asof_join", ops_asof_join, ASOF_SQL, "as-of join via union+window fill"),
    ("ops_range_join", ops_range_join, RANGE_SQL, "interval join via bucketed equi-join"),
]:
    register(QuerySpec(name=_n, build=_f, oracle=_s, tags=("temporal",), doc=_d))
