"""Driver-decode vs executor-decode (mapInPandas) differential: the two
MOR log-decode paths must produce identical merged results."""

from __future__ import annotations

import pytest

from hudi_rs_spark import HudiReadOptions, HudiTable
from tests.conftest import extract_fixture

CASES = [
    "quickstart_trips_table/mor/avro/v8_trips_8i3u1d.zip",
    "quickstart_trips_table/mor/avro/v6_trips_8i3d.zip",
    "sample_table/mor/parquet/v6_nonpartitioned.zip",
    "sample_table/mor/parquet/v6_nonpartitioned_rollback.zip",
    "sample_table/mor/avro/v9_txns_simple_meta.zip",
    "sample_table/mor/avro/v9_nonpartitioned_rollback.zip",
]


def _canon(df):
    rows = []
    for r in df.collect():
        d = r.asDict(recursive=True)
        for k, v in list(d.items()):
            if isinstance(v, dict):
                d[k] = sorted(v.items())
            if isinstance(v, bytearray):
                d[k] = bytes(v)
        rows.append(str(sorted(d.items(), key=lambda kv: kv[0])))
    return sorted(rows)


@pytest.mark.parametrize("zip_rel", CASES, ids=[c.split("/")[-1] for c in CASES])
def test_distributed_equals_driver(spark, zip_rel):
    t = HudiTable(extract_fixture(zip_rel), spark)
    drv = t.read(HudiReadOptions(log_decode="driver"))
    dst = t.read(HudiReadOptions(log_decode="distributed"))
    assert _canon(drv) == _canon(dst)


class TestDistributedTargetScan:
    """The rollback-target pre-scan's executor path (mapInPandas header
    scan above SCAN_TARGETS_DISTRIBUTED_THRESHOLD) must match the
    driver loop, and the decode that consumes it must stay correct on
    rollback-carrying tables."""

    def test_forced_distributed_scan_parity(self, spark, monkeypatch):
        zip_rel = "sample_table/mor/parquet/v6_nonpartitioned_rollback.zip"
        import hudi_rs_spark.logfile.distributed as dist
        from hudi_rs_spark.logfile.distributed import scan_targets_distributed

        t = HudiTable(extract_fixture(zip_rel), spark)
        tasks = []
        for s in t.get_file_slices():
            for lf in s.log_files:
                rel = (
                    f"{s.partition_path}/{lf.file_name}"
                    if s.partition_path else lf.file_name
                )
                tasks.append((s.file_id, f"{t.base_path}/{rel}"))
        assert tasks
        driver = scan_targets_distributed(spark, tasks)  # under threshold
        monkeypatch.setattr(dist, "SCAN_TARGETS_DISTRIBUTED_THRESHOLD", 0)
        dist_scan = scan_targets_distributed(spark, tasks)
        assert driver == dist_scan
        assert any(driver.values())  # the fixture really has targets
        # end-to-end: forced-distributed decode with the forced-
        # distributed pre-scan still voids the rolled-back blocks
        drv = t.read(HudiReadOptions(log_decode="driver"))
        dst = t.read(HudiReadOptions(log_decode="distributed"))
        assert _canon(drv) == _canon(dst)
