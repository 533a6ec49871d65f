"""Session configuration probes.

The 64 MB autoBroadcastJoinThreshold measurement (VERDICT r13 item 7):
a build side Spark ESTIMATES just under 64 MB must broadcast and
complete inside a deliberately small (2 GiB heap) JVM — the memory
bound configure_session's docstring states. Runs in a subprocess so the
constrained driver memory is a real static conf, not a wish; marked
slow (one extra JVM boot, ~40 s)."""

from __future__ import annotations

import subprocess
import sys
import textwrap

import pytest

PROBE = textwrap.dedent(
    """
    import shutil, sys, time
    from pyspark.sql import SparkSession, functions as F

    spark = (
        SparkSession.builder.appName("bcast-probe").master("local[8]")
        .config("spark.driver.memory", "2g")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    p = sys.argv[1]
    (
        spark.range(0, 440_000)
        .select(
            F.col("id").alias("k"),
            F.sha2(F.col("id").cast("string"), 512).alias("p1"),
        )
        .write.mode("overwrite").parquet(p)
    )
    dim = spark.read.parquet(p)
    est = int(dim._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
    assert 40 * 1024**2 < est < 64 * 1024**2, f"probe estimate off: {est}"
    big = spark.range(0, 5_000_000).select(
        F.pmod(F.col("id"), F.lit(440_000)).alias("k"), F.col("id").alias("x")
    )
    j = big.join(dim, "k")
    j.write.format("noop").mode("overwrite").save()
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan
    heap = (
        spark.sparkContext._jvm.java.lang.Runtime.getRuntime().maxMemory()
        // 1048576
    )
    assert heap <= 2200, f"probe heap not constrained: {heap} MB"
    print(f"OK est={est // 1048576}MB heap={heap}MB")
    """
)


@pytest.mark.slow
def test_64mb_broadcast_fits_2g_heap(tmp_path):
    out = subprocess.run(
        [sys.executable, "-c", PROBE, str(tmp_path / "dim.parquet")],
        capture_output=True, text=True, timeout=600,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "OK est=" in out.stdout, out.stdout
