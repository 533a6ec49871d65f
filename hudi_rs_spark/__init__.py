"""hudi_rs_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of apache/hudi-rs.

The reference (apache/hudi-rs) is a Hudi *table-format reader* library:
timeline parsing, file-slice planning, pruning, Parquet/Avro log reading,
and merge-on-read record merging, with relational operators delegated to a
host engine. Here the host engine is Spark SQL/Catalyst: the planner runs
driver-side in Python, execution is DataFrame pipelines.

Public API (mirrors /root/reference/docs/reader-spec.md):

    from hudi_rs_spark import HudiTable, HudiReadOptions

    table = HudiTable("/path/to/table")          # needs an active SparkSession
    df = table.read()                            # snapshot -> DataFrame
    df = table.read(HudiReadOptions(as_of_timestamp="20240402123035233"))
    df = table.read_incremental("t1", "t2")      # (t1, t2] changed rows
"""

from hudi_rs_spark.builder import HudiTableBuilder
from hudi_rs_spark.config import keys as config_keys
from hudi_rs_spark.config.keys import (
    HudiPlanConfig,
    HudiReadConfig,
)
from hudi_rs_spark.config.keys import HudiTableConfig as HudiTableConfigKey
from hudi_rs_spark.config.table_config import HudiTableConfig, TableType
from hudi_rs_spark.config.read_config import HudiReadOptions
from hudi_rs_spark.sources.hudi import (
    HudiFileGroupReader,
    HudiTable,
    build_hudi_table,
)
from hudi_rs_spark.util import split_into_chunks

__version__ = "0.1.0"

__all__ = [
    "HudiTable",
    "HudiTableBuilder",
    "HudiReadOptions",
    "HudiTableConfig",  # typed hoodie.properties view
    "HudiTableConfigKey",  # reference-style config-key enum
    "HudiReadConfig",
    "HudiPlanConfig",
    "HudiFileGroupReader",
    "TableType",
    "build_hudi_table",
    "config_keys",
    "split_into_chunks",
]
