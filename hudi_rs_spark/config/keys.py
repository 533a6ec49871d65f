"""Config-key enums — the reference's ``hudi._config`` surface
(python/hudi/_config.py builds these from the Rust core's
``_config_keys()``; here the key strings are transcribed from
crates/core/src/config/{table.rs:153-177, read.rs:115-122, plan.rs:59}).

Members are ``str`` subclasses, so ``HudiReadConfig.QueryType`` is
usable anywhere a plain key string is expected (option bags, builders).
"""

from __future__ import annotations

from enum import Enum


class HudiTableConfig(str, Enum):
    """Configurations for Hudi tables, most persisted in hoodie.properties."""

    BaseFileFormat = "hoodie.table.base.file.format"
    BasePath = "hoodie.base.path"
    Checksum = "hoodie.table.checksum"
    CreateSchema = "hoodie.table.create.schema"
    DatabaseName = "hoodie.database.name"
    DropsPartitionFields = "hoodie.datasource.write.drop.partition.columns"
    IsHiveStylePartitioning = "hoodie.datasource.write.hive_style_partitioning"
    IsPartitionPathUrlencoded = "hoodie.datasource.write.partitionpath.urlencode"
    KeyGeneratorClass = "hoodie.table.keygenerator.class"
    KeyGeneratorType = "hoodie.table.keygenerator.type"
    PartitionFields = "hoodie.table.partition.fields"
    OrderingFields = "hoodie.table.ordering.fields"
    PopulatesMetaFields = "hoodie.populate.meta.fields"
    RecordKeyFields = "hoodie.table.recordkey.fields"
    RecordMergeStrategy = "hoodie.table.record.merge.strategy"
    TableName = "hoodie.table.name"
    TableType = "hoodie.table.type"
    TableVersion = "hoodie.table.version"
    TimelineLayoutVersion = "hoodie.timeline.layout.version"
    TimelineTimezone = "hoodie.table.timeline.timezone"
    ArchiveLogFolder = "hoodie.archivelog.folder"
    TimelinePath = "hoodie.timeline.path"
    TimelineHistoryPath = "hoodie.timeline.history.path"
    MetadataTableEnabled = "hoodie.metadata.enable"
    MetadataTablePartitions = "hoodie.table.metadata.partitions"


class HudiReadConfig(str, Enum):
    """Configurations for reading Hudi tables."""

    QueryType = "hoodie.read.query.type"
    AsOfTimestamp = "hoodie.read.as.of.timestamp"
    StartTimestamp = "hoodie.read.start.timestamp"
    EndTimestamp = "hoodie.read.end.timestamp"
    InputPartitions = "hoodie.read.input.partitions"
    UseReadOptimizedMode = "hoodie.read.use.read_optimized.mode"
    StreamBatchSize = "hoodie.read.stream.batch_size"
    FileSliceReadConcurrency = "hoodie.read.file.slice.read.concurrency"


class HudiPlanConfig(str, Enum):
    """Configurations for query planning in Hudi."""

    ListingParallelism = "hoodie.plan.listing.parallelism"


def _pascal_to_screaming_snake(name: str) -> str:
    """'UseReadOptimizedMode' -> 'USE_READ_OPTIMIZED_MODE' — the same
    transform the reference applies to its Rust variant names
    (python/src/internal.rs pascal_to_screaming_snake)."""
    out = []
    for i, ch in enumerate(name):
        if ch.isupper() and i > 0 and not name[i - 1].isupper():
            out.append("_")
        out.append(ch.upper())
    return "".join(out)


def _config_keys() -> dict[str, list[tuple[str, str]]]:
    """(variant_name, key_string) pairs per enum — the reference's
    ``hudi._internal._config_keys()`` (python/src/internal.rs), which its
    ``hudi._config`` uses to build these enums dynamically. Variant names
    are SCREAMING_SNAKE exactly as the reference emits them (e.g.
    ``('TABLE_NAME', 'hoodie.table.name')``); the PascalCase enums above
    remain this repo's source of truth."""
    return {
        cls.__name__: [(_pascal_to_screaming_snake(m.name), m.value) for m in cls]
        for cls in (HudiTableConfig, HudiReadConfig, HudiPlanConfig)
    }
