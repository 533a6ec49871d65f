"""Streaming scan surface — op 4 of SURVEY §2.

The reference's "streaming" read is a lazy batch iterator over the
snapshot (table/mod.rs:814-893): batch_size rows per batch, snapshot
only (incremental unsupported there either, table/mod.rs:821-824).

``iter_batches`` is columnar end-to-end (parity with the reference's
Arrow RecordBatch stream, file_group/reader.rs:317-547): Spark's
Arrow collection hands over per-partition RecordBatches — data crosses
the JVM/Python boundary ONCE, as Arrow buffers — which are then
re-chunked to exactly ``batch_size`` rows by zero-copy slicing. The old
row-at-a-time path (toLocalIterator + per-row dicts) serialized every
value through Python objects; it survives only as ``_iter_rows_fallback``
for environments without Arrow collection support.
"""

from __future__ import annotations

from collections.abc import Iterator

import pyarrow as pa
from pyspark.sql import DataFrame


def _arrow_partition_batches(df: DataFrame) -> Iterator[pa.RecordBatch]:
    """RecordBatches from the JVM in partition order.

    ``_collect_as_arrow(split_batches=True)`` streams each partition's
    serialized Arrow ipc payload straight from the JVM socket (buffers
    are NOT shared across batches, so earlier batches are GC-able as the
    consumer advances); ``toArrow()`` is the public fallback."""
    try:
        yield from df._collect_as_arrow(split_batches=True)
    except AttributeError:  # pragma: no cover - API moved
        yield from df.toArrow().to_batches()


def iter_batches(df: DataFrame, batch_size: int = 1024) -> Iterator[pa.RecordBatch]:
    """Row-accurate batching (the reference slices its last batch the same
    way: LimitBatchStream, hudi_exec.rs:127-168). Slicing is zero-copy;
    only batch assembly from multiple pieces concatenates."""
    if batch_size < 1:
        # reference parity (test_batch_size_zero_errors): a zero batch
        # size must error loudly, not spin yielding empty batches
        raise ValueError(f"batch_size must be >= 1, got {batch_size}")
    pending: list[pa.RecordBatch] = []
    n_pending = 0
    for rb in _arrow_partition_batches(df):
        while rb.num_rows > 0:
            take = min(batch_size - n_pending, rb.num_rows)
            pending.append(rb.slice(0, take))
            n_pending += take
            rb = rb.slice(take)
            if n_pending >= batch_size:
                yield _combine(pending)
                pending, n_pending = [], 0
    if pending:
        yield _combine(pending)


def _combine(pieces: list[pa.RecordBatch]) -> pa.RecordBatch:
    if len(pieces) == 1:
        return pieces[0]
    table = pa.Table.from_batches(pieces).combine_chunks()
    batches = table.to_batches()
    if len(batches) == 1:
        return batches[0]
    # combine_chunks guarantees one chunk per column; defensive anyway
    return pa.concat_tables([pa.Table.from_batches([b]) for b in batches]).combine_chunks().to_batches()[0]


def _iter_rows_fallback(df: DataFrame, batch_size: int = 1024) -> Iterator[pa.RecordBatch]:
    """Legacy row-at-a-time path (kept for the throughput regression test
    and as a last-resort fallback): every value crosses the JVM/Python
    boundary as a Python object — 10-100x slower than the Arrow path."""
    from pyspark.sql.pandas.types import to_arrow_schema

    schema = to_arrow_schema(df.schema)
    buf: list = []
    for row in df.toLocalIterator(prefetchPartitions=True):
        buf.append(row.asDict())
        if len(buf) >= batch_size:
            yield _to_batch(buf, schema)
            buf = []
    if buf:
        yield _to_batch(buf, schema)


def _to_batch(rows: list[dict], schema: pa.Schema) -> pa.RecordBatch:
    cols = {name: [r.get(name) for r in rows] for name in schema.names}
    return pa.RecordBatch.from_pydict(cols, schema=schema)


def read_stream(table, options=None, batch_size: int | None = None):
    """Table::read_stream analog: snapshot scan as a batch iterator."""
    from hudi_rs_spark.config.read_config import HudiReadOptions

    options = options or HudiReadOptions()
    if options.query_type == "incremental":
        # parity: the reference rejects incremental streaming reads
        raise ValueError("streaming read supports snapshot queries only")
    df = table.read(options)
    # explicit None check: batch_size=0 must reach the validator and
    # error, not silently fall back to the default
    return iter_batches(
        df, options.batch_size if batch_size is None else batch_size
    )
