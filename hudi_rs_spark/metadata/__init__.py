from hudi_rs_spark.metadata.files_partition import (
    FilesPartitionRecord,
    list_partition_files_via_mdt,
    read_files_partition,
)

__all__ = [
    "FilesPartitionRecord",
    "list_partition_files_via_mdt",
    "read_files_partition",
]
