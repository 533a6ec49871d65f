"""Schema evolution on read: the latest commit-metadata schema wins
(resolver.rs:41-47 priority), and old base files missing newly-added
columns read with nulls backfilled."""

from __future__ import annotations

import os

import pytest

from tests.synth import SynthTable, avro_schema

C1 = "20240101000000000"
C2 = "20240102000000000"

BASE_FIELDS = [("id", "string"), ("ts", "long"), ("val", "string")]
EVOLVED_FIELDS = BASE_FIELDS + [("extra", "double")]


@pytest.fixture()
def evolved_table(tmp_path):
    base = os.path.join(tmp_path, "tbl")
    t = SynthTable(base)
    t.write_base("g1-0", C1, {"id": ["a"], "ts": [1], "val": ["v1"]}, ["a"])
    t.commit(C1, schema=avro_schema(BASE_FIELDS))
    t.write_base(
        "g2-0", C2, {"id": ["b"], "ts": [2], "val": ["v2"], "extra": [1.5]}, ["b"]
    )
    t.commit(C2, schema=avro_schema(EVOLVED_FIELDS))
    return base


def test_latest_schema_wins(spark, evolved_table):
    from hudi_rs_spark.sources.hudi import HudiTable

    ht = HudiTable(evolved_table, spark)
    schema = ht.get_schema()
    assert "extra" in schema.fieldNames()
    # types for storage-backed columns come from the footer
    assert schema["ts"].dataType.simpleString() == "bigint"
    assert schema["extra"].dataType.simpleString() == "double"
    # meta fields prepended (commit schema carries data fields only)
    assert schema.fieldNames()[0] == "_hoodie_commit_time"


def test_old_files_backfill_nulls(spark, evolved_table):
    from hudi_rs_spark.sources.hudi import HudiTable

    rows = {
        r["id"]: (r["val"], r["extra"])
        for r in HudiTable(evolved_table, spark).read().collect()
    }
    assert rows == {"a": ("v1", None), "b": ("v2", 1.5)}


def test_time_travel_uses_latest_schema(spark, evolved_table):
    # reference resolves the LATEST schema regardless of as-of (schema is
    # not versioned per query in hudi-rs); old snapshot just backfills
    from hudi_rs_spark.config.read_config import HudiReadOptions
    from hudi_rs_spark.sources.hudi import HudiTable

    df = HudiTable(evolved_table, spark).read(HudiReadOptions(as_of_timestamp=C1))
    assert "extra" in df.columns
    assert [r["id"] for r in df.collect()] == ["a"]
