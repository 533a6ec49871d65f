"""Bootstrap (write/bootstrap.py): adopt an existing parquet dataset
as a Hudi table. metadata_only = hard-linked bases + one commit with
real write stats (zero data bytes moved); full_record = one distributed
rewrite through the normal writer.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from hudi_rs_spark.sources.hudi import HudiTable
from hudi_rs_spark.write.bootstrap import bootstrap_table


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    from hudi_rs_spark.sources.pyds import HudiPyDataSource

    spark.dataSource.register(HudiPyDataSource)


def _src(spark, path, partitioned=False, n=40):
    df = spark.createDataFrame(
        [(i, f"n{i}", ["x", "y"][i % 2], 1) for i in range(n)],
        "id int, name string, part string, ts int",
    )
    w = df.repartition(3).write
    if partitioned:
        w = df.write.partitionBy("part")
    w.parquet(path)
    return df


def _snap(spark, path):
    return sorted(
        tuple(r)
        for r in spark.read.format("hudi_py").option("path", path).load()
        .select("id", "name", "part").collect()
    )


class TestMetadataOnly:
    def test_unpartitioned_roundtrip(self, spark, tmp_path):
        src, tgt = str(tmp_path / "src"), str(tmp_path / "t")
        df = _src(spark, src)
        n = bootstrap_table(src, tgt, "id")
        assert n == 3
        expected = sorted(
            tuple(r) for r in df.select("id", "name", "part").collect()
        )
        assert _snap(spark, tgt) == expected
        # eager read too
        got = sorted(
            tuple(r)
            for r in HudiTable(tgt, spark).read()
            .select("id", "name", "part").collect()
        )
        assert got == expected

    def test_zero_copy_hard_links(self, spark, tmp_path):
        import glob

        src, tgt = str(tmp_path / "src"), str(tmp_path / "t")
        _src(spark, src)
        bootstrap_table(src, tgt, "id")
        srcs = {
            os.stat(p).st_ino
            for p in glob.glob(os.path.join(src, "*.parquet"))
        }
        adopted = [
            p for p in glob.glob(os.path.join(tgt, "**", "*.parquet"),
                                 recursive=True)
            if "/.hoodie/" not in p
        ]
        assert adopted and {os.stat(p).st_ino for p in adopted} <= srcs

    def test_partitioned_values_restored_and_pruned(self, spark, tmp_path):
        src, tgt = str(tmp_path / "src"), str(tmp_path / "t")
        df = _src(spark, src, partitioned=True)
        bootstrap_table(src, tgt, "id", partition_fields=("part",))
        assert _snap(spark, tgt) == sorted(
            tuple(r) for r in df.select("id", "name", "part").collect()
        )
        # partition filter returns only that partition (values restored
        # from paths: the files themselves lack the column)
        got = (
            spark.read.format("hudi_py").option("path", tgt).load()
            .filter(F.col("part") == "x")
        )
        assert got.count() == 20
        assert {r.part for r in got.collect()} == {"x"}

    def test_commit_stats_and_time_travel(self, spark, tmp_path):
        src, tgt = str(tmp_path / "src"), str(tmp_path / "t")
        _src(spark, src)
        bootstrap_table(src, tgt, "id")
        t = HudiTable(tgt, spark)
        insts = t.timeline.instants
        assert len(insts) == 1 and insts[0].is_completed
        meta = t.timeline.metadata_for(insts[0])
        assert len(meta.write_stats) == 3  # one stat per adopted file
        assert all(ws.size > 0 for ws in meta.write_stats)

    def test_append_after_bootstrap(self, spark, tmp_path):
        src, tgt = str(tmp_path / "src"), str(tmp_path / "t")
        _src(spark, src)
        bootstrap_table(src, tgt, "id")
        more = spark.createDataFrame(
            [(100, "new", "x", 2)], "id int, name string, part string, ts int"
        )
        (
            more.write.format("hudi_py").option("path", tgt)
            .option("recordkey.field", "id").mode("append").save()
        )
        assert (100, "new", "x") in _snap(spark, tgt)
        assert len(_snap(spark, tgt)) == 41

    def test_insert_overwrite_partition_after_bootstrap(self, spark, tmp_path):
        src, tgt = str(tmp_path / "src"), str(tmp_path / "t")
        _src(spark, src, partitioned=True)
        bootstrap_table(src, tgt, "id", partition_fields=("part",))
        repl = spark.createDataFrame(
            [(1000, "only", "x", 2)], "id int, name string, part string, ts int"
        )
        (
            repl.write.format("hudi_py").option("path", tgt)
            .option("recordkey.field", "id")
            .option("partitionpath.field", "part")
            .option("operation", "insert_overwrite")
            .mode("append").save()
        )
        snap = _snap(spark, tgt)
        xs = [r for r in snap if r[2] == "x"]
        assert xs == [(1000, "only", "x")]
        assert len([r for r in snap if r[2] == "y"]) == 20


class TestFullRecord:
    def test_upsert_ready(self, spark, tmp_path):
        from hudi_rs_spark.write.upsert import upsert

        src, tgt = str(tmp_path / "src"), str(tmp_path / "t")
        _src(spark, src, partitioned=True)
        n = bootstrap_table(
            src, tgt, "id", spark=spark, mode="full_record",
            partition_fields=("part",), precombine="ts",
            **{"table.type": "MERGE_ON_READ"},
        )
        assert n > 0
        upsert(
            spark.createDataFrame(
                [(0, "updated", "x", 2)],
                "id int, name string, part string, ts int",
            ),
            tgt,
        )
        snap = dict(
            (r[0], r[1]) for r in _snap(spark, tgt)
        )
        assert snap[0] == "updated" and len(snap) == 40


class TestValidation:
    def test_missing_key_column(self, spark, tmp_path):
        src, tgt = str(tmp_path / "src"), str(tmp_path / "t")
        _src(spark, src)
        with pytest.raises(ValueError, match="record key"):
            bootstrap_table(src, tgt, "nope")

    def test_existing_table_rejected(self, spark, tmp_path):
        src, tgt = str(tmp_path / "src"), str(tmp_path / "t")
        _src(spark, src)
        bootstrap_table(src, tgt, "id")
        with pytest.raises(ValueError, match="already a Hudi table"):
            bootstrap_table(src, tgt, "id")

    def test_partition_mismatch(self, spark, tmp_path):
        src, tgt = str(tmp_path / "src"), str(tmp_path / "t")
        _src(spark, src, partitioned=True)
        with pytest.raises(ValueError, match="partition"):
            bootstrap_table(src, tgt, "id")  # dirs but no declaration

    def test_bad_mode(self, spark, tmp_path):
        src, tgt = str(tmp_path / "src"), str(tmp_path / "t")
        _src(spark, src)
        with pytest.raises(ValueError, match="bootstrap mode"):
            bootstrap_table(src, tgt, "id", mode="sideways")
