#!/usr/bin/env python
"""Host-speed-independent metrics for one query or probe: run it in a
UI-enabled session and print jobs / stages / tasks / shuffle bytes from
the Spark UI REST API (localhost) — the r13/r14 adjudication tool for
"did the plan get structurally cheaper" when wall clock is noisy.

Usage:
    python tools/job_metrics.py query <name> [...]   # registry queries
    python tools/job_metrics.py apply_upserts        # lifecycle pair probe

Environment: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
SPARK_GRAFT_CPUS (default 32).
"""

from __future__ import annotations

import json
import os
import sys
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _get(base: str, path: str):
    with urllib.request.urlopen(f"{base}{path}") as r:
        return json.loads(r.read())


def _session():
    from pyspark.sql import SparkSession

    from hudi_rs_spark.session import get_spark

    # a fresh UI-enabled session (get_spark disables the UI)
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    SparkSession.builder.config("spark.ui.enabled", "true")
    spark = (
        SparkSession.builder.appName("job-metrics")
        .master(f"local[{cpus}]")
        .config("spark.ui.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(max(cpus, 8)))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.python.filterPushdown.enabled", "true")
        .getOrCreate()
    )
    get_spark  # keep import referenced
    return spark


def _snapshot(base: str, app: str) -> dict:
    jobs = _get(base, f"/api/v1/applications/{app}/jobs")
    stages = _get(base, f"/api/v1/applications/{app}/stages?status=COMPLETE")
    return {
        "jobs": len(jobs),
        "stages": len(stages),
        "tasks": sum(s.get("numCompleteTasks", 0) for s in stages),
        "shuffle_read": sum(s.get("shuffleReadBytes", 0) for s in stages),
        "shuffle_write": sum(s.get("shuffleWriteBytes", 0) for s in stages),
        "input": sum(s.get("inputBytes", 0) for s in stages),
    }


def _diff(a: dict, b: dict) -> dict:
    return {k: b[k] - a[k] for k in a}


def main() -> None:
    mode = sys.argv[1]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = _session()
    base = f"http://localhost:{spark.sparkContext.uiWebUrl.rsplit(':', 1)[1]}"
    app = spark.sparkContext.applicationId

    if mode == "query":
        from hudi_rs_spark.workloads import load_all
        from hudi_rs_spark.workloads.tables import load

        specs = load_all()
        for t in ("region", "nation", "customer", "supplier", "part",
                  "orders", "lineitem", "events", "documents", "embeddings"):
            load(spark, sf_dir, t).count()
        for name in sys.argv[2:]:
            # one untimed warmup so python-worker spinup is not counted
            specs[name].build(spark, sf_dir).count()
            before = _snapshot(base, app)
            specs[name].build(spark, sf_dir).count()
            after = _snapshot(base, app)
            print(json.dumps({"name": name, **_diff(before, after)}))
    elif mode == "apply_upserts":
        import shutil
        import tempfile

        from hudi_rs_spark.workloads.write_path import (
            _apply_upserts,
            _docs,
            _register,
            _seed_options,
        )

        _register(spark)
        for round_ix in range(2):  # first run pays worker bootstrap
            tmp = tempfile.mkdtemp(prefix="hudi_metrics_")
            path = os.path.join(tmp, "t")
            w = _docs(spark, sf_dir).write.format("hudi_py").option("path", path)
            for k, v in _seed_options().items():
                w = w.option(k, v)
            w.mode("append").save()
            before = _snapshot(base, app)
            _apply_upserts(spark, sf_dir, path)
            after = _snapshot(base, app)
            shutil.rmtree(tmp, ignore_errors=True)
            if round_ix:
                print(json.dumps({"name": "apply_upserts", **_diff(before, after)}))
    else:
        raise SystemExit(f"unknown mode {mode}")


if __name__ == "__main__":
    main()
