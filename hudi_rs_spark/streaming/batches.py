"""Streaming scan surface — op 4 of SURVEY §2.

The reference's "streaming" read is a lazy batch iterator over the
snapshot (table/mod.rs:814-893): batch_size rows per batch, snapshot
only (incremental unsupported there either, table/mod.rs:821-824).

Here: ``iter_batches`` yields pyarrow RecordBatches of ``batch_size``
rows from any engine DataFrame without collecting the whole result on
the driver (toLocalIterator streams partition-by-partition).
"""

from __future__ import annotations

from collections.abc import Iterator

import pyarrow as pa
from pyspark.sql import DataFrame


def iter_batches(df: DataFrame, batch_size: int = 1024) -> Iterator[pa.RecordBatch]:
    """Row-accurate batching (the reference slices its last batch the same
    way: LimitBatchStream, hudi_exec.rs:127-168)."""
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
    return iter_batches(df, batch_size or options.batch_size)
