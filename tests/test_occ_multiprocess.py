"""Cross-PROCESS OCC: two separate Python interpreters (each with its
own SparkSession/JVM) race upserts of overlapping keys on one table.
Exactly one commits; the loser gets ConcurrentWriteError end-to-end
through the conditional-PUT claim + the commit-lock critical section
(write/concurrency.py commit_lock — check-then-publish is atomic under
the table lock, so the loser's conflict check re-lists the timeline
AFTER the winner's commit and fails deterministically).

The in-process races (tests/test_instant_uniqueness.py, test_nbcc.py)
pin the protocol pieces; this is the scenario OCC exists for — two
real processes on one table, no shared interpreter state."""

from __future__ import annotations

import os
import subprocess
import sys

import pytest

WORKER = r"""
import sys, time, os

path, wid, barrier_dir, mode = sys.argv[1:5]

from hudi_rs_spark.session import get_spark
from hudi_rs_spark.sources.pyds import HudiPyDataSource
from hudi_rs_spark.write.concurrency import (
    ConcurrentWriteError, completed_instant_set,
)
from hudi_rs_spark.write.upsert import upsert

spark = get_spark(f"occ-worker-{wid}", cpus=2)
spark.conf.set("spark.sql.shuffle.partitions", "2")
spark.dataSource.register(HudiPyDataSource)

# capture the read point BEFORE the barrier: both workers then write
# against the SAME table state, so the second publish MUST conflict
rp = ",".join(sorted(completed_instant_set(path)))

open(os.path.join(barrier_dir, f"ready_{wid}"), "w").close()
deadline = time.time() + 120
want = {"ready_a", "ready_b"}
while not want <= set(os.listdir(barrier_dir)):
    if time.time() > deadline:
        print("RESULT:BARRIER_TIMEOUT", flush=True)
        sys.exit(3)
    time.sleep(0.05)

df = spark.createDataFrame(
    [(i, f"w{wid}-{i}", 2) for i in range(10)],
    "id int, name string, ts int",
)
try:
    upsert(df, path, **{
        "occ.readpoint": rp,
        "hoodie.write.concurrency.mode": mode,
    })
    print("RESULT:COMMITTED", flush=True)
except ConcurrentWriteError as e:
    print(f"RESULT:CONFLICT {type(e).__name__}", flush=True)
except Exception as e:  # noqa: BLE001 — the assertion needs the type
    print(f"RESULT:ERROR {type(e).__name__}: {e}", flush=True)
    sys.exit(2)
"""


def _seed(spark, path, **extra):
    from hudi_rs_spark.sources.pyds import HudiPyDataSource

    spark.dataSource.register(HudiPyDataSource)
    df = spark.createDataFrame(
        [(i, f"n{i}", 1) for i in range(10)],
        "id int, name string, ts int",
    )
    w = (
        df.write.format("hudi_py").option("path", path)
        .option("recordkey.field", "id")
        .option("precombine.field", "ts")
        .option("table.type", "MERGE_ON_READ")
        .option("table.version", "8")
        .option("hoodie.table.name", "occ")
    )
    for k, v in extra.items():
        w = w.option(k, v)
    w.mode("append").save()


def _race(tmp_path, path, mode):
    barrier = str(tmp_path / "barrier")
    os.makedirs(barrier, exist_ok=True)
    script = str(tmp_path / "worker.py")
    with open(script, "w") as f:
        f.write(WORKER)
    env = {**os.environ, "PYTHONPATH": "/root/repo"}
    procs = {
        wid: subprocess.Popen(
            [sys.executable, script, path, wid, barrier, mode],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            text=True, env=env, cwd="/root/repo",
        )
        for wid in ("a", "b")
    }
    results = {}
    for wid, p in procs.items():
        out, err = p.communicate(timeout=600)
        line = next(
            (ln for ln in out.splitlines() if ln.startswith("RESULT:")),
            f"NO_RESULT rc={p.returncode} stderr_tail={err[-500:]}",
        )
        results[wid] = line
    return results


@pytest.mark.slow
class TestTwoProcessOcc:
    def test_exactly_one_wins_occ(self, spark, tmp_path):
        path = str(tmp_path / "t")
        _seed(spark, path)
        results = _race(tmp_path, path, "occ")
        outcomes = sorted(v.split()[0] for v in results.values())
        assert outcomes == [
            "RESULT:COMMITTED", "RESULT:CONFLICT",
        ], results
        # the winner's rows are the snapshot; the loser left no trace
        snap = {
            r.id: r.name
            for r in spark.read.format("hudi_py").option("path", path)
            .load().collect()
        }
        winner = next(
            w for w, v in results.items() if v.startswith("RESULT:COMMITTED")
        )
        assert snap == {i: f"w{winner}-{i}" for i in range(10)}
        from hudi_rs_spark.sources.hudi import HudiTable

        # timeline: seed + exactly one upsert deltacommit
        assert len(HudiTable(path, spark).timeline.instants) == 2

    def test_nbcc_both_append(self, spark, tmp_path):
        # NON_BLOCKING_CONCURRENCY_CONTROL: both processes only APPEND
        # log blocks — neither is a lost update, both must commit, and
        # the merge linearizes by ordering field + instant order
        path = str(tmp_path / "t")
        _seed(spark, path)
        results = _race(tmp_path, path, "nbcc")
        outcomes = sorted(v.split()[0] for v in results.values())
        assert outcomes == [
            "RESULT:COMMITTED", "RESULT:COMMITTED",
        ], results
        snap = {
            r.id: r.name
            for r in spark.read.format("hudi_py").option("path", path)
            .load().collect()
        }
        # same ts=2 on both: the merge picks ONE writer's rows per key
        # deterministically (instant order breaks the precombine tie) —
        # every row comes from the same race, none from the seed
        assert set(snap) == set(range(10))
        assert all(v.startswith("w") for v in snap.values())

    def test_nbcc_with_mdt_and_record_index(self, spark, tmp_path):
        # executor-side MDT/record-index log appends happen OUTSIDE the
        # commit lock: two processes appending to the same shard file
        # group must emit distinct names (instant-stamped tokens) and
        # leave a consistent index — point routing and the validator
        # stay green after the race
        from hudi_rs_spark.write.validate import validate_table

        path = str(tmp_path / "t")
        _seed(
            spark, path,
            **{
                "metadata.enable": "true",
                "metadata.recordindex.enable": "true",
            },
        )
        results = _race(tmp_path, path, "nbcc")
        outcomes = sorted(v.split()[0] for v in results.values())
        assert outcomes == [
            "RESULT:COMMITTED", "RESULT:COMMITTED",
        ], results
        snap = {
            r.id: r.name
            for r in spark.read.format("hudi_py").option("path", path)
            .load().collect()
        }
        assert set(snap) == set(range(10))
        assert all(v.startswith("w") for v in snap.values())
        report = validate_table(path, spark=spark)
        assert report["healthy"], report["checks"]
