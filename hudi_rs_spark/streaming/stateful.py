"""Custom stateful streaming operator: gap-based sessionization with
``applyInPandasWithState``.

The batch form lives in workloads/windows.py (win_sessionize); this is
the unbounded-stream form: per-user state carries the open session
(start, last event, counters) across micro-batches, and a session closes
when a later event arrives more than ``gap_seconds`` after the previous
one. Closed sessions are APPENDED downstream; the open session stays in
the state store until a newer event closes it.

State is kept as epoch-microsecond longs (exact, no tz pitfalls crossing
the Arrow/pandas boundary). Per-user ordering within the stream is the
caller's contract, as with any event-time state machine; out-of-order
events inside one micro-batch are sorted before folding.

Scale: state is partitioned by user_id across executors by the streaming
state store; each micro-batch shuffles only its own rows on user_id.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start_us", T.LongType()),
        T.StructField("session_end_us", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("session_start_us", T.LongType()),
        T.StructField("last_ts_us", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)


def sessionize_stateful(events: DataFrame, gap_seconds: int = 1800) -> DataFrame:
    """events: streaming DataFrame with (user_id long, ts timestamp,
    value double). Returns the closed-session stream."""
    import pandas as pd

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    gap_us = gap_seconds * 1_000_000

    def fold(key, pdfs: Iterator["pd.DataFrame"], state: GroupState):
        (user_id,) = key
        if state.exists:
            sess_start, last_ts, n, total = state.get
        else:
            sess_start, last_ts, n, total = None, None, 0, 0.0
        closed: list[tuple] = []
        # one user's micro-batch rows may span multiple Arrow chunks;
        # concatenate and sort ONCE so out-of-order events across chunk
        # boundaries can't spuriously close or mis-bound a session
        # (per-group volume per micro-batch is bounded)
        frames = [pdf for pdf in pdfs if not pdf.empty]
        if frames:
            pdf = frames[0] if len(frames) == 1 else pd.concat(frames)
            pdf = pdf.sort_values("ts")
            ts_us = (pdf["ts"].astype("int64") // 1000).tolist()
            vals = pdf["value"].tolist()
            for t_us, v in zip(ts_us, vals):
                if last_ts is not None and t_us - last_ts > gap_us:
                    closed.append((user_id, sess_start, last_ts, n, total))
                    sess_start, n, total = None, 0, 0.0
                if sess_start is None:
                    sess_start = t_us
                last_ts = t_us
                n += 1
                total += float(v)
        state.update((sess_start, last_ts, n, total))
        if closed:
            yield pd.DataFrame(
                closed,
                columns=[
                    "user_id", "session_start_us", "session_end_us",
                    "n_events", "total_value",
                ],
            )

    return (
        events.select("user_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            fold,
            OUTPUT_SCHEMA,
            STATE_SCHEMA,
            "append",
            GroupStateTimeout.NoTimeout,
        )
    )


def sessionize_batch_closed(events: DataFrame, gap_seconds: int = 1800) -> DataFrame:
    """Bounded-input reference for tests: the sessions the streaming
    operator would have CLOSED — i.e. every session except each user's
    final (still-open) one. Built from the same window logic as the
    batch workload."""
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts")
    gap = F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(w)
    flagged = events.withColumn(
        "new_session",
        F.when(gap.isNull() | (gap > gap_seconds), F.lit(1)).otherwise(F.lit(0)),
    )
    ws = Window.partitionBy("user_id").orderBy("ts").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    sess = flagged.withColumn("session_id", F.sum("new_session").over(ws))
    agg = sess.groupBy("user_id", "session_id").agg(
        (F.min(F.col("ts").cast("long")) * 1_000_000).alias("session_start_us"),
        (F.max(F.col("ts").cast("long")) * 1_000_000).alias("session_end_us"),
        F.count(F.lit(1)).alias("n_events"),
        F.sum("value").alias("total_value"),
    )
    last = agg.groupBy("user_id").agg(F.max("session_id").alias("last_sid"))
    return (
        agg.join(last, "user_id")
        .filter(F.col("session_id") != F.col("last_sid"))
        .select(
            "user_id", "session_start_us", "session_end_us", "n_events", "total_value"
        )
    )
