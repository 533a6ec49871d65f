"""EXPERIMENTAL write-side API: synthesize Hudi tables file-by-file.

The reference is read-only (hudi-rs has no writer; its fixtures come
from Spark/Hudi jobs). This package is the repo's own minimal writer —
promoted from the test fixture generator once it became the de-facto
way to build tables for round-trip verification (write -> read ->
oracle): log-block framing and avro encoding per the public Hudi spec
as re-expressed in ``logfile/reader.py``, timeline file naming per
``timeline/instant.py``.

Scope: driver-side, local-filesystem, MOR tables at versions 6 and 8 —
fixture generation and round-trip testing, NOT a production ingest
path (no concurrency control, no marker files, no MDT maintenance).
"""

from hudi_rs_spark.write.logblocks import (  # noqa: F401
    CDC_SCHEMA,
    LSM_HISTORY_SCHEMA,
    avro_data_block,
    avro_schema,
    cdc_block,
    delete_block,
    encode_datum,
    frame_block,
    ocf_bytes,
    parquet_bytes,
    parquet_data_block,
    rollback_block,
    write_lsm_history,
)
from hudi_rs_spark.write.table import META_COLS, HudiTableWriter  # noqa: F401
