"""Write-side type-widening schema evolution (write/schema_evolve.py).

Pins the other half of the reference's resolver contract
(crates/core/src/schema/resolver.rs:41-114 + the avro promotion rules
in schema.rs:63-150): a frame carrying int where the table has long
upcasts in-plan; a frame carrying long where the table has int widens
the published schema (old base files cast up per-epoch on read);
anything else is rejected before any file lands."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hudi_rs_spark.write.schema_evolve import (
    SchemaEvolutionError,
    union_commit_schema,
    _widens,
)
from hudi_rs_spark.write.upsert import upsert


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    from hudi_rs_spark.sources.pyds import HudiPyDataSource

    spark.dataSource.register(HudiPyDataSource)


def _seed(spark, path, ddl, rows):
    df = spark.createDataFrame(rows, ddl)
    (
        df.write.format("hudi_py").option("path", path)
        .option("recordkey.field", "id")
        .option("precombine.field", "ts")
        .option("partitionpath.field", "city")
        .option("table.type", "MERGE_ON_READ")
        .option("table.version", "8")
        .mode("append").save()
    )


def _read(spark, path):
    return spark.read.format("hudi_py").option("path", path).load()


def _types(spark, path):
    return {
        f.name: f.dataType.simpleString()
        for f in _read(spark, path).schema.fields
    }


class TestNarrowerFrameUpcasts:
    def test_int_frame_into_long_table(self, spark, tmp_path):
        path = str(tmp_path / "t")
        _seed(
            spark, path, "id int, val long, city string, ts int",
            [(1, 10, "a", 1), (2, 20, "b", 1)],
        )
        # frame carries int where the table declared long: upcast, no
        # schema change published
        upsert(
            spark.createDataFrame(
                [(1, 99, "a", 2)], "id int, val int, city string, ts int"
            ),
            path,
        )
        assert _types(spark, path)["val"] == "bigint"
        got = {r["id"]: r["val"] for r in _read(spark, path).collect()}
        assert got == {1: 99, 2: 20}

    def test_float_frame_into_double_table(self, spark, tmp_path):
        path = str(tmp_path / "t")
        _seed(
            spark, path, "id int, score double, city string, ts int",
            [(1, 1.5, "a", 1)],
        )
        upsert(
            spark.createDataFrame(
                [(1, 2.5, "a", 2)], "id int, score float, city string, ts int"
            ),
            path,
        )
        assert _types(spark, path)["score"] == "double"
        assert _read(spark, path).collect()[0]["score"] == 2.5


class TestWiderFrameWidensTable:
    BIG = 5_000_000_000  # > 2^31: only representable as long

    def test_long_frame_widens_int_table(self, spark, tmp_path):
        path = str(tmp_path / "t")
        _seed(
            spark, path, "id int, val int, city string, ts int",
            [(1, 10, "a", 1), (2, 20, "b", 1)],
        )
        upsert(
            spark.createDataFrame(
                [(1, self.BIG, "a", 2)],
                "id int, val long, city string, ts int",
            ),
            path,
        )
        # published schema widened; OLD base rows (int files) cast up
        assert _types(spark, path)["val"] == "bigint"
        got = {r["id"]: r["val"] for r in _read(spark, path).collect()}
        assert got == {1: self.BIG, 2: 20}

    def test_float_frame_widens_to_double(self, spark, tmp_path):
        path = str(tmp_path / "t")
        _seed(
            spark, path, "id int, score float, city string, ts int",
            [(1, 1.5, "a", 1), (2, 0.25, "b", 1)],
        )
        upsert(
            spark.createDataFrame(
                [(1, 3.75, "a", 2)],
                "id int, score double, city string, ts int",
            ),
            path,
        )
        assert _types(spark, path)["score"] == "double"
        got = {r["id"]: r["score"] for r in _read(spark, path).collect()}
        assert got == {1: 3.75, 2: 0.25}

    def test_time_travel_before_widening(self, spark, tmp_path):
        from hudi_rs_spark.config.read_config import HudiReadOptions
        from hudi_rs_spark.sources.hudi import HudiTable

        path = str(tmp_path / "t")
        _seed(
            spark, path, "id int, val int, city string, ts int",
            [(1, 10, "a", 1)],
        )
        pre = HudiTable(path, spark).timeline.instants[-1].timestamp
        upsert(
            spark.createDataFrame(
                [(1, self.BIG, "a", 2)],
                "id int, val long, city string, ts int",
            ),
            path,
        )
        old = HudiTable(path, spark).read(
            HudiReadOptions(as_of_timestamp=pre)
        )
        assert [r["val"] for r in old.collect()] == [10]

    def test_incremental_across_widen_boundary(self, spark, tmp_path):
        from hudi_rs_spark.sources.hudi import HudiTable

        path = str(tmp_path / "t")
        _seed(
            spark, path, "id int, val int, city string, ts int",
            [(1, 10, "a", 1), (2, 20, "b", 1)],
        )
        t = HudiTable(path, spark)
        seed_ts = t.timeline.instants[-1].timestamp
        upsert(
            spark.createDataFrame(
                [(1, self.BIG, "a", 2)],
                "id int, val long, city string, ts int",
            ),
            path,
        )
        t = HudiTable(path, spark)
        # full-history incremental spans the widen boundary: old int
        # epoch + new long epoch union under the widened schema
        full = {r["id"]: r["val"] for r in t.read_incremental(None).collect()}
        assert full == {1: self.BIG, 2: 20}
        # window starting AFTER the seed sees only the widened row
        inc = {
            r["id"]: r["val"]
            for r in t.read_incremental(seed_ts).collect()
        }
        assert inc == {1: self.BIG}

    def test_compaction_after_widening(self, spark, tmp_path):
        from hudi_rs_spark.write.compact import compact

        path = str(tmp_path / "t")
        _seed(
            spark, path, "id int, val int, city string, ts int",
            [(1, 10, "a", 1), (2, 20, "a", 1)],
        )
        upsert(
            spark.createDataFrame(
                [(1, self.BIG, "a", 2)],
                "id int, val long, city string, ts int",
            ),
            path,
        )
        compact(spark, path)
        assert _types(spark, path)["val"] == "bigint"
        got = {r["id"]: r["val"] for r in _read(spark, path).collect()}
        assert got == {1: self.BIG, 2: 20}


class TestBareAppendNarrowFrame:
    def test_append_with_narrow_frame_reads_wide(self, spark, tmp_path):
        # the bare DataSource append path has no driver-side reconcile:
        # its files land with the frame's narrow physical type while
        # the commit-schema union keeps the table's wide declared type.
        # The epoch-grouped scan must still read those files (upcast at
        # scan) — pins that the union never produces unreadable commits.
        path = str(tmp_path / "t")
        _seed(
            spark, path, "id int, val long, city string, ts int",
            [(1, 10, "a", 1)],
        )
        (
            spark.createDataFrame(
                [(2, 20, "a", 1)], "id int, val int, city string, ts int"
            )
            .write.format("hudi_py").option("path", path)
            .mode("append").save()
        )
        assert _types(spark, path)["val"] == "bigint"
        got = {r["id"]: r["val"] for r in _read(spark, path).collect()}
        assert got == {1: 10, 2: 20}


class TestIncompatibleRejected:
    def test_string_into_int_rejected_before_write(self, spark, tmp_path):
        from hudi_rs_spark.sources.hudi import HudiTable

        path = str(tmp_path / "t")
        _seed(
            spark, path, "id int, val int, city string, ts int",
            [(1, 10, "a", 1)],
        )
        with pytest.raises(SchemaEvolutionError, match="val"):
            upsert(
                spark.createDataFrame(
                    [(1, "oops", "a", 2)],
                    "id int, val string, city string, ts int",
                ),
                path,
            )
        # nothing landed: timeline still one commit, value untouched
        assert len(HudiTable(path, spark).timeline.instants) == 1
        assert _read(spark, path).collect()[0]["val"] == 10

    def test_long_into_int_key_upcast_not_rejected(self, spark, tmp_path):
        # record-key columns follow the same lattice (keys are compared
        # as strings internally, but the stored column must widen too)
        path = str(tmp_path / "t")
        _seed(
            spark, path, "id int, val int, city string, ts int",
            [(1, 10, "a", 1)],
        )
        upsert(
            spark.createDataFrame(
                [(1, 11, "a", 2)], "id long, val int, city string, ts int"
            ),
            path,
        )
        assert _types(spark, path)["id"] == "bigint"
        assert {r["id"]: r["val"] for r in _read(spark, path).collect()} == {
            1: 11
        }


class TestSparseFrameNeverNarrows:
    def test_missing_column_kept_in_published_schema(self, spark, tmp_path):
        # non-partial payload, frame omits 'score': commit-schema union
        # keeps the column (newest record wins wholesale -> null value,
        # Hudi overwrite-latest semantics), the SCHEMA must not narrow
        path = str(tmp_path / "t")
        _seed(
            spark, path,
            "id int, val int, score double, city string, ts int",
            [(1, 10, 1.5, "a", 1), (2, 20, 2.5, "b", 1)],
        )
        upsert(
            spark.createDataFrame(
                [(1, 99, "a", 2)], "id int, val int, city string, ts int"
            ),
            path,
        )
        t = _types(spark, path)
        assert t["score"] == "double"
        got = {
            r["id"]: (r["val"], r["score"])
            for r in _read(spark, path).collect()
        }
        assert got[2] == (20, 2.5)
        assert got[1][0] == 99


class TestUnits:
    def test_widening_lattice(self):
        assert _widens("int", "bigint")
        assert _widens("int", "double")
        assert _widens("float", "double")
        assert _widens("smallint", "bigint")
        assert not _widens("bigint", "int")
        assert not _widens("double", "float")
        assert not _widens("int", "int")
        assert not _widens("string", "bigint")
        assert not _widens("int", "string")

    def test_union_commit_schema(self):
        table = {
            "type": "record", "name": "t",
            "fields": [
                {"name": "id", "type": ["null", "int"]},
                {"name": "val", "type": ["null", "int"]},
                {"name": "score", "type": ["null", "double"]},
            ],
        }
        frame = {
            "type": "record", "name": "t",
            "fields": [
                {"name": "id", "type": ["null", "int"]},
                {"name": "val", "type": ["null", "long"]},  # widened
                {"name": "extra", "type": ["null", "string"]},  # added
            ],
        }
        out = union_commit_schema(table, frame)
        by = {f["name"]: f for f in out["fields"]}
        assert list(by) == ["id", "val", "score", "extra"]
        assert by["val"]["type"] == ["null", "long"]
        assert by["score"]["type"] == ["null", "double"]
