"""Workload registry: every query the engine claims, with its DuckDB oracle.

Each module registers :class:`QuerySpec` entries into ``REGISTRY``. The
driver contract (``__spark_entry__.py``) and ``bench.py`` are thin views
over this registry.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


@dataclass
class QuerySpec:
    name: str
    build: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB SQL over the same parquet views; None -> rows-only check
    tags: tuple[str, ...] = field(default_factory=tuple)
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}


def register(spec: QuerySpec) -> QuerySpec:
    if spec.name in REGISTRY:
        raise ValueError(f"duplicate query name: {spec.name}")
    REGISTRY[spec.name] = spec
    return spec


def load_all() -> dict[str, QuerySpec]:
    """Import every workload module (side effect: populates REGISTRY)."""
    from hudi_rs_spark.workloads import relational  # noqa: F401
    from hudi_rs_spark.workloads import relational2  # noqa: F401
    from hudi_rs_spark.workloads import windows  # noqa: F401
    from hudi_rs_spark.workloads import aggregates  # noqa: F401
    from hudi_rs_spark.workloads import merge_semantics  # noqa: F401
    from hudi_rs_spark.workloads import dedup  # noqa: F401
    from hudi_rs_spark.workloads import text  # noqa: F401
    from hudi_rs_spark.workloads import similarity  # noqa: F401
    from hudi_rs_spark.workloads import quantiles  # noqa: F401
    from hudi_rs_spark.workloads import sampling  # noqa: F401
    from hudi_rs_spark.workloads import packing  # noqa: F401
    from hudi_rs_spark.workloads import pipeline  # noqa: F401
    from hudi_rs_spark.workloads import multimodal  # noqa: F401
    from hudi_rs_spark.workloads import temporal  # noqa: F401
    from hudi_rs_spark.workloads import decontam  # noqa: F401
    from hudi_rs_spark.workloads import mor  # noqa: F401
    from hudi_rs_spark.workloads import write_path  # noqa: F401

    return REGISTRY
