"""Synthesize minimal Hudi tables / log files for tests.

The generator was promoted into the package as the experimental writer
API (``hudi_rs_spark.write``) — this module stays as a re-export shim so
the existing test imports keep working; ``SynthTable`` is the historical
name of ``HudiTableWriter``.
"""

from __future__ import annotations

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
from hudi_rs_spark.write.table import META_COLS  # noqa: F401
from hudi_rs_spark.write.table import HudiTableWriter as SynthTable  # noqa: F401
