"""Fluent table construction — the reference's ``HudiTableBuilder``
(python/hudi/table/builder.py): accumulate hudi / storage / mixed
options, then build a :class:`HudiTable`. Keys may be plain strings or
the :mod:`hudi_rs_spark.config.keys` enum members."""

from __future__ import annotations

from dataclasses import dataclass, field
from enum import Enum

from pyspark.sql import SparkSession

from hudi_rs_spark.sources.hudi import HudiTable, build_hudi_table


def _coerce_key(k) -> str:
    return k.value if isinstance(k, Enum) else str(k)


@dataclass
class HudiTableBuilder:
    base_uri: str
    hudi_options: dict[str, str] = field(default_factory=dict)
    storage_options: dict[str, str] = field(default_factory=dict)
    options: dict[str, str] = field(default_factory=dict)

    @classmethod
    def from_base_uri(cls, base_uri: str) -> "HudiTableBuilder":
        return cls(base_uri)

    def with_hudi_option(self, k, v: str) -> "HudiTableBuilder":
        self.hudi_options[_coerce_key(k)] = str(v)
        return self

    def with_hudi_options(self, opts: dict) -> "HudiTableBuilder":
        for k, v in opts.items():
            self.with_hudi_option(k, v)
        return self

    def with_storage_option(self, k: str, v: str) -> "HudiTableBuilder":
        self.storage_options[str(k)] = str(v)
        return self

    def with_storage_options(self, opts: dict) -> "HudiTableBuilder":
        for k, v in opts.items():
            self.with_storage_option(k, v)
        return self

    def with_option(self, k, v: str) -> "HudiTableBuilder":
        self.options[_coerce_key(k)] = str(v)
        return self

    def with_options(self, opts: dict) -> "HudiTableBuilder":
        for k, v in opts.items():
            self.with_option(k, v)
        return self

    def build(self, spark: SparkSession | None = None) -> HudiTable:
        """Construct the table: ``options`` split by ``hoodie.`` prefix,
        explicit hudi/storage dicts winning on conflicts (the same merge
        as :func:`build_hudi_table`)."""
        return build_hudi_table(
            self.base_uri,
            hudi_options=self.hudi_options or None,
            storage_options=self.storage_options or None,
            options=self.options or None,
            spark=spark,
        )
