"""Streaming deduplication + stream-static enrichment.

Two Structured Streaming building blocks every ingestion pipeline needs
in front of the batch operators:

- ``dedup_stream``: at-least-once sources (Kafka, file drops, CDC
  replays) re-deliver records; ``dropDuplicatesWithinWatermark`` keeps
  per-key state only until the watermark passes, so state is bounded by
  (keys arriving within the delay window), not all keys ever seen —
  the difference between a pipeline that runs for months and one whose
  state store grows without bound. Exactly the engine-native upgrade of
  the batch ``operators/dedup.py::exact_dedup``.

- ``enrich_stream``: stream-static join against a small dimension.
  Spark plans the static side as a broadcast per micro-batch (subject
  to the autoBroadcastJoinThreshold), so the stream never shuffles.

Both return unbounded DataFrames; callers attach sinks (tests use
``format("memory")`` + ``availableNow``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dedup_stream(
    stream: DataFrame,
    keys: list[str],
    watermark_col: str,
    delay: str = "10 minutes",
) -> DataFrame:
    """Drop re-deliveries of the same key(s) arriving within ``delay``
    of each other; per-key state expires with the watermark."""
    return stream.withWatermark(watermark_col, delay).dropDuplicatesWithinWatermark(
        keys
    )


def enrich_stream(
    stream: DataFrame,
    dim: DataFrame,
    on: list[str] | str,
    how: str = "left",
) -> DataFrame:
    """Stream-static dimension join; the static side is broadcast into
    each micro-batch (explicit hint — provably small dims only)."""
    return stream.join(F.broadcast(dim), on, how)
