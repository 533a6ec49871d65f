"""Lance v2 WRITER (lance/writer.py): byte-level round trips through
the same reader that decodes the reference's golden Lance fixtures,
plus the end-to-end v9 Hudi table with Lance base files."""

from __future__ import annotations

import decimal

import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from hudi_rs_spark.lance.reader import LanceFile
from hudi_rs_spark.lance.writer import write_lance


def _round_trip(tbl: pa.Table) -> pa.Table:
    lf = LanceFile(write_lance(tbl))
    assert lf.num_rows == len(tbl)
    back = lf.to_table()
    assert back.schema.names == tbl.schema.names
    return back


class TestRoundTrip:
    def test_every_supported_type(self):
        tbl = pa.table(
            {
                "i32": pa.array([1, None, 3], pa.int32()),
                "i64": pa.array([10, 20, None], pa.int64()),
                "f32": pa.array([1.5, None, 2.5], pa.float32()),
                "f64": pa.array([0.1, 0.2, 0.3], pa.float64()),
                "b": pa.array([True, None, False], pa.bool_()),
                "s": pa.array(["a", None, "ccc"], pa.string()),
                "bin": pa.array([b"\x00\x01", b"", None], pa.binary()),
                "d": pa.array([1, 2, 3], pa.date32()),
                "ts": pa.array([1000, None, 3000], pa.timestamp("us", tz="UTC")),
                "ts_ntz": pa.array([5, 6, 7], pa.timestamp("us")),
                "dec": pa.array(
                    [decimal.Decimal("1.23"), None, decimal.Decimal("-9.87")],
                    pa.decimal128(10, 2),
                ),
                "lst": pa.array([[1, 2], None, []], pa.list_(pa.int64())),
                "lst_s": pa.array([["x"], ["y", None], None], pa.list_(pa.string())),
                "allnull": pa.array([None] * 3, pa.int32()),
            }
        )
        back = _round_trip(tbl)
        for name in tbl.column_names:
            assert (
                back[name].combine_chunks().to_pylist()
                == tbl[name].combine_chunks().to_pylist()
            ), name

    def test_schema_preserved(self):
        tbl = pa.table(
            {
                "a": pa.array([1], pa.int64()),
                "ts": pa.array([1], pa.timestamp("us", tz="UTC")),
                "dec": pa.array([decimal.Decimal("1.00")], pa.decimal128(12, 2)),
            }
        )
        lf = LanceFile(write_lance(tbl))
        got = lf.arrow_schema()
        assert got.field("a").type == pa.int64()
        assert got.field("ts").type == pa.timestamp("us", tz="UTC")
        assert got.field("dec").type == pa.decimal128(12, 2)

    def test_empty_and_unicode(self):
        tbl = pa.table({"s": pa.array(["", "héllo✓", None], pa.string())})
        assert _round_trip(tbl)["s"].to_pylist() == ["", "héllo✓", None]
        empty = pa.table({"x": pa.array([], pa.int64())})
        assert _round_trip(empty).num_rows == 0

    @settings(max_examples=25, deadline=None)
    @given(
        st.lists(
            st.tuples(
                st.one_of(st.none(), st.integers(-(2**62), 2**62)),
                st.one_of(st.none(), st.text(max_size=40)),
                st.one_of(st.none(), st.floats(allow_nan=False, width=64)),
                st.one_of(
                    st.none(),
                    st.lists(st.integers(-(2**31), 2**31), max_size=5),
                ),
            ),
            max_size=60,
        )
    )
    def test_property_round_trip(self, rows):
        tbl = pa.table(
            {
                "i": pa.array([r[0] for r in rows], pa.int64()),
                "s": pa.array([r[1] for r in rows], pa.string()),
                "f": pa.array([r[2] for r in rows], pa.float64()),
                "l": pa.array([r[3] for r in rows], pa.list_(pa.int64())),
            }
        )
        back = _round_trip(tbl)
        for name in tbl.column_names:
            assert (
                back[name].combine_chunks().to_pylist()
                == tbl[name].combine_chunks().to_pylist()
            ), name

    def test_rejects_unsupported_type(self):
        tbl = pa.table({"m": pa.array([{"k": 1}], pa.map_(pa.string(), pa.int64()))})
        with pytest.raises(ValueError, match="unsupported arrow type"):
            write_lance(tbl)


class TestHudiLanceBase:
    _OPTS = {
        "recordkey.field": "id", "precombine.field": "ts",
        "table.version": "9", "base.file.format": "lance",
    }

    def _register(self, spark):
        from hudi_rs_spark.sources.pyds import HudiPyDataSource

        try:
            spark.dataSource.register(HudiPyDataSource)
        except Exception:
            pass

    def test_v9_lance_table_round_trip(self, spark, tmp_path):
        import os

        from hudi_rs_spark.config.table_config import HudiTableConfig
        from hudi_rs_spark.sources.hudi import HudiTable

        self._register(spark)
        tdir = str(tmp_path / "t")
        df = spark.createDataFrame(
            [(i, f"n{i}", ["a", "b"][i % 2], float(i) / 2, i) for i in range(30)],
            "id long, name string, city string, score double, ts long",
        )
        (df.repartition(2).write.format("hudi_py").option("path", tdir)
         .options(**self._OPTS).mode("append").save())
        tc = HudiTableConfig.from_base_path(tdir)
        assert tc.props["hoodie.table.base.file.format"] == "LANCE"
        names = [
            n for n in os.listdir(tdir) if not n.startswith(".")
        ]
        assert names and all(n.endswith(".lance") for n in names)
        want = sorted(map(tuple, df.collect()))
        eager = HudiTable(tdir, spark).read()
        assert sorted(
            map(tuple, eager.select("id", "name", "city", "score", "ts").collect())
        ) == want
        conn = (
            spark.read.format("hudi_py").option("path", tdir).load()
            .select("id", "name", "city", "score", "ts")
        )
        assert sorted(map(tuple, conn.collect())) == want

    def test_lance_requires_v9(self, spark, tmp_path):
        self._register(spark)
        df = spark.createDataFrame([(1, 1)], "id long, ts long")
        with pytest.raises(Exception, match="table version 9"):
            (df.write.format("hudi_py")
             .option("path", str(tmp_path / "t"))
             .option("recordkey.field", "id")
             .option("table.version", "8")
             .option("base.file.format", "lance")
             .mode("append").save())

    def test_lance_appends_and_time_travel(self, spark, tmp_path):
        from hudi_rs_spark.config.read_config import HudiReadOptions
        from hudi_rs_spark.sources.hudi import HudiTable

        self._register(spark)
        tdir = str(tmp_path / "t")
        for c in range(2):
            df = spark.createDataFrame(
                [(100 * c + i, f"v{c}", c + 1) for i in range(8)],
                "id long, name string, ts long",
            )
            (df.write.format("hudi_py").option("path", tdir)
             .options(**self._OPTS).mode("append").save())
        t = HudiTable(tdir, spark)
        assert t.read().count() == 16
        first = t.timeline.instants[0].timestamp
        old = t.read(HudiReadOptions(as_of_timestamp=first))
        assert old.count() == 8
