"""Window-function battery over the events table.

Covers the window category from SURVEY.md §2.B (row_number / rank /
lag / cumulative frames / gap-based sessionization). The engine's own MOR
merge (operators/merge.py) is built on the same primitive.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hudi_rs_spark.workloads import QuerySpec, register
from hudi_rs_spark.workloads.tables import load
from hudi_rs_spark.workloads.sqlutil import dec, round2


def top3_events_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.desc("value"), F.asc("event_id"))
    return (
        e.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("user_id", "event_id", "rnk", "value")
        .orderBy("user_id", "rnk")
    )


TOP3_SQL = """
SELECT user_id, event_id, CAST(rnk AS INTEGER) AS rnk, value
FROM (SELECT user_id, event_id, value,
             row_number() OVER (PARTITION BY user_id ORDER BY value DESC, event_id ASC) AS rnk
      FROM events)
WHERE rnk <= 3
ORDER BY user_id, rnk
"""


def running_total_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return e.select(
        "user_id",
        "event_id",
        round2(F.sum(dec("value")).over(w)).alias("running_value"),
    ).orderBy("user_id", "event_id")


RUNNING_SQL = """
SELECT user_id, event_id,
       ROUND(SUM(CAST(value AS DECIMAL(18,6))) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)::DOUBLE AS running_value
FROM events
ORDER BY user_id, event_id
"""


def lag_delta_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    delta = F.col("value") - F.lag("value").over(w)
    return e.select("user_id", "event_id", delta.alias("delta")).orderBy(
        "user_id", "event_id"
    )


LAG_SQL = """
SELECT user_id, event_id,
       value - lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS delta
FROM events
ORDER BY user_id, event_id
"""


def user_rank_by_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    totals = e.groupBy("user_id").agg(F.sum(dec("value")).alias("total_dec"))
    w = Window.orderBy(F.desc("total_dec"), F.asc("user_id"))
    return totals.select(
        "user_id",
        round2(F.col("total_dec")).alias("total_value"),
        F.dense_rank().over(w).alias("rnk"),
    ).orderBy("rnk", "user_id")


RANK_SQL = """
SELECT user_id, ROUND(total_dec, 2)::DOUBLE AS total_value,
       CAST(dense_rank() OVER (ORDER BY total_dec DESC, user_id ASC) AS INTEGER) AS rnk
FROM (SELECT user_id, SUM(CAST(value AS DECIMAL(18,6))) AS total_dec FROM events GROUP BY user_id)
ORDER BY rnk, user_id
"""


def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-minute inactivity gap) without
    Structured Streaming: new-session flags cumulate into session ids.
    This is the batch form of session_window(); the streaming form lives
    in hudi_rs_spark/streaming."""
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(w)
    flagged = e.withColumn(
        "new_session",
        F.when(gap.isNull() | (gap > 1800), F.lit(1)).otherwise(F.lit(0)),
    )
    ws = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sess = flagged.withColumn("session_id", F.sum("new_session").over(ws))
    return (
        sess.groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            round2(F.sum(dec("value"))).alias("session_value"),
        )
        .orderBy("user_id", "session_id")
    )


SESSION_SQL = """
WITH flagged AS (
  SELECT user_id, ts, event_id, value,
         CASE WHEN (epoch_us(ts) // 1000000) - lag(epoch_us(ts) // 1000000) OVER (PARTITION BY user_id ORDER BY ts, event_id) > 1800
                   OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM events),
sess AS (
  SELECT user_id, value,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM flagged)
SELECT user_id, CAST(session_id AS BIGINT) AS session_id, CAST(count(*) AS BIGINT) AS n_events,
       ROUND(SUM(CAST(value AS DECIMAL(18,6))), 2)::DOUBLE AS session_value
FROM sess
GROUP BY user_id, session_id
ORDER BY user_id, session_id
"""


for _n, _f, _s, _d in [
    ("win_top3_events_per_user", top3_events_per_user, TOP3_SQL, "row_number top-k per key"),
    ("win_running_total", running_total_per_user, RUNNING_SQL, "cumulative frame sum"),
    ("win_lag_delta", lag_delta_per_user, LAG_SQL, "lag/lead"),
    ("win_user_rank", user_rank_by_total, RANK_SQL, "dense_rank global"),
    ("win_sessionize", sessionize_events, SESSION_SQL, "gap sessionization"),
]:
    register(QuerySpec(name=_n, build=_f, oracle=_s, tags=("window",), doc=_d))
