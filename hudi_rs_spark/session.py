"""SparkSession factory tuned for this engine.

Defaults follow the scale guidance: AQE on (runtime re-planning, skew-join
handling, partition coalescing), Arrow transfer for any Python exchange,
UTC session time so timestamp semantics are deterministic across engines.
On a real cluster only ``master`` / memory knobs change; everything else is
scale-neutral.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "hudi-rs-spark", cpus: int | None = None) -> SparkSession:
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(max(cpus, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.parquet.enableVectorizedReader", "true")
        # Python DataSource connector (sources/pyds.py): let pushFilters
        # receive filters for partition/stats pruning
        .config("spark.sql.python.filterPushdown.enabled", "true")
    )
    return builder.getOrCreate()


def configure_session(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable confs to an externally provided session.

    The driver hands us its own SparkSession; static confs (memory, master)
    cannot change, but SQL confs can, and deterministic timestamps matter
    for oracle comparison.
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.execution.arrow.pyspark.enabled", "true")
    # shuffle parallelism derived from the session's core count (NOT a
    # constant): an externally created session otherwise runs Spark's
    # default 200 reduce partitions regardless of cores — at bench scale
    # that is ~6x task overhead per exchange, on a cluster it underuses
    # it. AQE coalescing still right-sizes per stage; this sets the
    # pre-AQE ceiling proportional to the machine. Matches get_spark.
    spark.conf.set(
        "spark.sql.shuffle.partitions",
        str(max(8, spark.sparkContext.defaultParallelism)),
    )
    # same broadcast ceiling as get_spark: without it an external
    # session plans the SAME query differently (10 MB default demotes
    # mid-size dimension broadcasts to shuffle joins) — the explicit
    # F.broadcast hints on known-small dims are unaffected either way
    spark.conf.set(
        "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
    )
    try:
        spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    except Exception:
        pass  # static in some deployments; connector degrades to no pushdown
    return spark
