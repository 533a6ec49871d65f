"""Bucket index — Hudi's ``hoodie.index.type=BUCKET`` (simple bucket
engine): record keys hash to a FIXED number of buckets, each bucket is
exactly one file group per partition, and upsert tagging becomes a pure
map-side hash — no record-index read, no bloom probe, no tag join
against table state. The scale point: tagging cost is O(incoming rows)
regardless of table size, and the only shuffle is the existing
route-by-file-group exchange.

Mechanics (mirrors Hudi's Flink/Spark bucket writers):

- bucket(key) = ``pmod(xxhash64(key), N)`` — computed JVM-side from the
  same key expression the writer uses; N is pinned at table creation
  (``hoodie.bucket.index.num.buckets``) and immutable (rescaling a
  bucket table requires a rewrite — Hudi's own constraint).
- file id encodes the bucket as its first 8 digits
  (``{bucket:08d}-0000-4000-8000-000000000000-0``), so routing needs
  only the fileId, exactly like Hudi's bucket-prefixed file groups.
- EVERY bucket-routed row (insert or update or tombstone) is a log
  append to its bucket's file group; the first touch creates the group
  LOG-ONLY (the readers' log-only-slice support makes it immediately
  queryable) and compaction folds it into a base. Bucket tables are
  therefore written through ``write.upsert`` — the raw batch writer
  rejects untagged inserts to them (it cannot guarantee the
  one-group-per-bucket invariant across tasks).

At 100 TB: size N so a bucket's slice stays near the base-file target
(Hudi guidance); too few buckets = giant groups, too many = small
files. The bucket count is a per-table knob, not auto-tuned here.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

BUCKET_FID_SUFFIX = "-0000-4000-8000-000000000000-0"
NUM_BUCKETS_PROP = "hoodie.bucket.index.num.buckets"
INDEX_TYPE_PROP = "hoodie.index.type"


def is_bucket_table(props: dict) -> bool:
    return str(props.get(INDEX_TYPE_PROP, "")).upper() == "BUCKET"


def num_buckets(props: dict) -> int:
    return int(props.get(NUM_BUCKETS_PROP, "0"))


def bucket_file_id(bucket: int) -> str:
    return f"{bucket:08d}{BUCKET_FID_SUFFIX}"


def parse_bucket(file_id: str) -> int | None:
    """Bucket number from a bucket-prefixed file id (None when the file
    group is not bucket-named)."""
    head = file_id[:8]
    if len(head) == 8 and head.isdigit():
        return int(head)
    return None


def bucket_expr(key_expr: Column, n: int) -> Column:
    """The bucket of each row, JVM-side: ``pmod(xxhash64(key), N)``."""
    return F.pmod(F.xxhash64(key_expr.cast("string")), F.lit(n)).cast("int")


def bucket_file_id_expr(bucket_col: Column) -> Column:
    return F.concat(
        F.lpad(bucket_col.cast("string"), 8, "0"), F.lit(BUCKET_FID_SUFFIX)
    )
