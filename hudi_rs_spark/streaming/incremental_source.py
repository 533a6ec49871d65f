"""Commit-offset incremental source — the idiomatic upgrade the reference
lacks (its CDC-ish surface is the batch incremental query, SURVEY §2 op 3).

``HudiIncrementalFeed`` drives repeated incremental reads using completed
commit timestamps as offsets: each ``next_batch()`` returns the rows
changed in (last_offset, next_target] exactly once — the contract a
Structured Streaming micro-batch source implements with its own offset
log. Offsets are plain strings, so callers can checkpoint them anywhere.

For native Structured Streaming over the *events* table (watermarks,
windowed aggregation, late data), see ``windowed_event_counts`` below —
that path is pure `readStream`, no Hudi involvement.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass
class HudiIncrementalFeed:
    table: object  # HudiTable
    last_offset: str | None = None  # exclusive start; None = from beginning

    def available_offsets(self) -> list[str]:
        return [i.timestamp for i in self.table.timeline.instants]

    def next_batch(self, max_commits: int = 1) -> DataFrame | None:
        """DataFrame of rows changed in (last_offset, target], advancing
        the offset by up to ``max_commits`` completed commits. None when
        caught up."""
        offsets = self.available_offsets()
        pending = [
            o for o in offsets if self.last_offset is None or o > self.last_offset
        ]
        if not pending:
            return None
        target = pending[min(max_commits, len(pending)) - 1]
        df = self.table.read_incremental(self.last_offset, target)
        self.last_offset = target
        return df


def windowed_event_counts(
    spark: SparkSession,
    events_path: str,
    window: str = "1 hour",
    watermark: str = "2 hours",
):
    """Structured Streaming: tumbling-window event counts with a
    watermark for late data. Returns the streaming DataFrame; callers
    attach a sink (tests use format('memory') + availableNow trigger).

    The batch equivalent (same semantics on bounded input) is
    ``windowed_event_counts_batch`` — tests assert they agree.
    """
    static = spark.read.parquet(events_path)
    stream = (
        spark.readStream.schema(static.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(events_path.rsplit("/", 1)[0] if events_path.endswith(".parquet") else events_path)
    )
    stream = _normalize_ts(stream)
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("win"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("win.start").alias("window_start"),
            "event_type",
            "n",
        )
    )


def windowed_event_counts_batch(
    spark: SparkSession, events_path: str, window: str = "1 hour"
) -> DataFrame:
    df = _normalize_ts(spark.read.parquet(events_path))
    return (
        df.groupBy(F.window("ts", window).alias("win"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("win.start").alias("window_start"), "event_type", "n")
    )


def _normalize_ts(df: DataFrame) -> DataFrame:
    # events.ts encoding varies by generator version (long nanos under the
    # nanosAsLong conf, or native timestamp[us] read as NTZ) — share the
    # dtype-adaptive coercion with the batch loaders.
    from hudi_rs_spark.workloads.tables import normalize_event_ts

    return normalize_event_ts(df)
