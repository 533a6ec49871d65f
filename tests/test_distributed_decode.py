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
