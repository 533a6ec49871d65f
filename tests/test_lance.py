"""Lance v2 base-file reading, pinned against the reference's golden
fixtures and their ``.sql`` expected operations.

Reference parity targets:
- decoder: crates/core/src/file_group/base_file/lance.rs:56-271 (the
  reference delegates to the lance-file crate; ``lance/reader.py``
  re-derives the published Lance v2 layout in pure python)
- expected rows: crates/core/tests/table_read_tests.rs
  test_v9_lance_nonpartitioned_cow_snapshot_applies_hudi_updates_deletes_and_inserts (:2473),
  test_v9_lance_txns_simple_cow_snapshot_applies_updates_deletes_and_inserts (:2551),
  test_v9_trips_lance_cow_snapshot_applies_updates_deletes_and_inserts (:2563),
  test_v9_trips_lance_mor_snapshot_merges_available_log_update_and_base_files (:2636),
  test_v9_lance_nonhivestyle_mor_snapshot_merges_available_log_update_and_base_files (:2592)
"""

from __future__ import annotations

import glob
import os

import pytest

from tests.conftest import extract_fixture


@pytest.fixture(scope="session")
def lance_cow_nonpartitioned():
    return extract_fixture("sample_table/cow/v9_lance_nonpartitioned.zip")


@pytest.fixture(scope="session")
def lance_cow_txns_simple():
    return extract_fixture("sample_table/cow/v9_lance_txns_simple.zip")


@pytest.fixture(scope="session")
def lance_cow_trips():
    return extract_fixture("quickstart_trips_table/cow/v9_trips_lance.zip")


@pytest.fixture(scope="session")
def lance_mor_trips():
    return extract_fixture("quickstart_trips_table/mor/avro/v9_trips_lance.zip")


@pytest.fixture(scope="session")
def lance_mor_nonhivestyle():
    return extract_fixture("sample_table/mor/avro/v9_lance_nonhivestyle.zip")


# ---------------------------------------------------------------------------
# decoder unit level
# ---------------------------------------------------------------------------
class TestLanceFileDecoder:
    def _newest_file(self, table_path: str) -> str:
        files = [
            p
            for p in glob.glob(table_path + "/**/*.lance", recursive=True)
            if ".hoodie" not in p
        ]
        assert files, "fixture has no lance files"
        # newest commit ts is the suffix before .lance
        return max(files, key=lambda p: p.rsplit("_", 1)[-1])

    def test_schema_and_rows(self, lance_cow_nonpartitioned):
        import pyarrow as pa

        from hudi_rs_spark.lance.reader import LanceFile

        path = self._newest_file(lance_cow_nonpartitioned)
        lf = LanceFile.from_path(path)
        schema = lf.arrow_schema()
        assert schema.names == [
            "_hoodie_commit_time",
            "_hoodie_commit_seqno",
            "_hoodie_record_key",
            "_hoodie_partition_path",
            "_hoodie_file_name",
            "id",
            "name",
            "category",
            "score",
            "tags",
            "updated_at",
        ]
        assert schema.field("score").type == pa.float64()
        assert pa.types.is_list(schema.field("tags").type)
        tbl = lf.to_table()
        assert tbl.num_rows == lf.num_rows

    def test_nested_list_values(self, lance_cow_nonpartitioned):
        from hudi_rs_spark.lance.reader import LanceFile

        # the newest file of file group fc1774fb holds the final insert
        files = glob.glob(lance_cow_nonpartitioned + "/fc1774fb*.lance")
        assert len(files) == 1
        tbl = LanceFile.from_path(files[0]).to_table()
        d = tbl.to_pydict()
        assert d["id"] == [9, 10]
        assert d["tags"] == [
            ["clip", "contrastive"],
            ["sam", "segmentation", "foundation"],
        ]

    def test_projection_and_count_only(self, lance_cow_nonpartitioned):
        from hudi_rs_spark.lance.reader import LanceFile

        lf = LanceFile.from_path(self._newest_file(lance_cow_nonpartitioned))
        proj = lf.to_table(columns=["score", "id"])
        assert proj.column_names == ["score", "id"]  # caller order
        # ADVICE r6: empty projection must keep num_rows (count-only scans)
        empty = lf.to_table(columns=[])
        assert empty.num_columns == 0
        assert empty.num_rows == lf.num_rows

    def test_arrow_fast_path_matches_fallback_everywhere(
        self,
        lance_cow_nonpartitioned,
        lance_cow_txns_simple,
        lance_cow_trips,
        lance_mor_nonhivestyle,
    ):
        """The zero-copy Arrow decode must agree with the per-value
        python decoder on EVERY column of EVERY fixture file (the
        fallback is the authoritative semantics)."""
        import pyarrow as pa

        from hudi_rs_spark.lance.reader import LanceFile, _arrow_type

        roots = [
            lance_cow_nonpartitioned, lance_cow_txns_simple,
            lance_cow_trips, lance_mor_nonhivestyle,
        ]
        files = [
            p
            for root in roots
            for p in glob.glob(root + "/**/*.lance", recursive=True)
            if ".hoodie" not in p
        ]
        assert files
        checked = 0
        for path in files:
            lf = LanceFile.from_path(path)
            col_idx = {id(fld): i for i, fld in enumerate(lf._flat_fields)}
            for fld in lf.fields:
                typ = _arrow_type(fld)
                slow = pa.array(
                    lf._field_values(fld, col_idx[id(fld)]), type=typ
                )
                fast = lf._field_array(fld, col_idx[id(fld)])
                assert fast is not None, (path, fld.name)  # fast path used
                assert fast.combine_chunks() == slow, (path, fld.name)
                checked += 1
        assert checked > 40  # many (file, column) pairs actually compared

    def test_footer_only_num_rows(self, lance_cow_nonpartitioned):
        """num_rows_from_path must agree with the full decode while
        reading only footer-adjacent ranges (review fix r7)."""
        from hudi_rs_spark.lance.reader import LanceFile

        for p in glob.glob(lance_cow_nonpartitioned + "/*.lance"):
            assert LanceFile.num_rows_from_path(p) == LanceFile.from_path(p).num_rows

    def test_rejects_non_lance_bytes(self):
        from hudi_rs_spark.lance.reader import LanceFile

        with pytest.raises(ValueError, match="magic"):
            LanceFile(b"PAR1" + b"\x00" * 64)


# ---------------------------------------------------------------------------
# table level — eager scan, pinned to the reference's expected snapshots
# ---------------------------------------------------------------------------
class TestLanceCowSnapshot:
    def test_nonpartitioned_updates_deletes_inserts(
        self, spark, lance_cow_nonpartitioned
    ):
        from hudi_rs_spark.sources.hudi import HudiTable

        t = HudiTable(lance_cow_nonpartitioned, spark)
        rows = {
            r.id: r
            for r in t.read().select("id", "name", "score", "tags", "updated_at").collect()
        }
        assert sorted(rows) == [1, 2, 3, 5, 6, 7, 8, 9, 10]  # id 4 deleted
        assert rows[1].score == pytest.approx(0.96)
        assert rows[1].updated_at == 1700100000000
        assert rows[2].score == pytest.approx(0.93)
        assert rows[2].tags == ["bert", "transformer", "finetuned"]
        assert rows[9].name == "feature-set-iota"
        assert rows[10].name == "feature-set-kappa"

    def test_txns_simple_partitioned(self, spark, lance_cow_txns_simple):
        from hudi_rs_spark.sources.hudi import HudiTable

        t = HudiTable(lance_cow_txns_simple, spark)
        rows = {
            r.txn_id: r
            for r in t.read().select("txn_id", "txn_type", "txn_ts", "region").collect()
        }
        assert sorted(rows) == [
            "TXN-001", "TXN-003", "TXN-004", "TXN-006", "TXN-007", "TXN-008",
            "TXN-009", "TXN-010", "TXN-011", "TXN-012", "TXN-013", "TXN-014",
            "TXN-015", "TXN-016",
        ]
        assert rows["TXN-001"].txn_type == "reversal"
        assert rows["TXN-001"].txn_ts == 1700100000001
        assert rows["TXN-007"].txn_ts == 1700300000007
        assert rows["TXN-016"].txn_type == "debit"
        assert rows["TXN-001"].region == "us"
        assert rows["TXN-004"].region == "eu"
        assert rows["TXN-007"].region == "apac"

    def test_txns_nonpart(self, spark):
        from hudi_rs_spark.sources.hudi import HudiTable

        path = extract_fixture("sample_table/cow/v9_lance_txns_nonpart.zip")
        t = HudiTable(path, spark)
        rows = {
            r.txn_id: r
            for r in t.read().select("txn_id", "txn_type", "txn_ts").collect()
        }
        assert len(rows) == 14
        assert "TXN-002" not in rows and "TXN-005" not in rows
        assert rows["TXN-001"].txn_type == "reversal"
        assert rows["TXN-001"].txn_ts == 1700100000001
        assert rows["TXN-016"].txn_type == "debit"

    def test_trips_cow(self, spark, lance_cow_trips):
        from hudi_rs_spark.sources.hudi import HudiTable

        t = HudiTable(lance_cow_trips, spark)
        rows = {
            r.rider: r for r in t.read().select("rider", "driver", "fare", "ts").collect()
        }
        assert sorted(rows) == [
            "rider-A", "rider-C", "rider-D", "rider-E", "rider-G", "rider-I",
            "rider-J", "rider-K", "rider-L", "rider-M", "rider-N",
        ]  # rider-F deleted
        assert rows["rider-A"].fare == pytest.approx(0.0)
        assert rows["rider-A"].ts == 1695200000000
        assert rows["rider-G"].fare == pytest.approx(0.0)
        assert rows["rider-K"].driver == "driver-U"
        assert rows["rider-N"].driver == "driver-X"

    def test_partition_pruning_on_lance_table(self, spark, lance_cow_trips):
        """Partition pruning is format-agnostic: a city filter must cut
        the planned slice set BEFORE any lance file is decoded."""
        from hudi_rs_spark.plans.partition_pruner import Filter
        from hudi_rs_spark.sources.hudi import HudiReadOptions, HudiTable

        t = HudiTable(lance_cow_trips, spark)
        all_slices = t.get_file_slices()
        pruned = t.get_file_slices(
            filters=[Filter("city", "=", "san_francisco")]
        )
        assert len(pruned) < len(all_slices)
        assert all("san_francisco" in s.partition_path for s in pruned)
        got = t.read(
            HudiReadOptions(filters=[("city", "=", "san_francisco")])
        ).select("rider").collect()
        assert sorted(r.rider for r in got) == [
            "rider-A", "rider-C", "rider-D", "rider-E", "rider-M", "rider-N",
        ]

    def test_fluent_read_options(self, spark, lance_cow_nonpartitioned):
        """Reference with_* builder parity (_internal.pyi:67-79)."""
        from hudi_rs_spark.sources.hudi import HudiReadOptions, HudiTable

        base = HudiReadOptions()
        opts = (
            base.with_filters([("category", "=", "vision")])
            .with_projection(["id"])
            .with_limit(2)
        )
        assert base.filters == [] and base.projection is None  # copies
        t = HudiTable(lance_cow_nonpartitioned, spark)
        df = t.read(opts)
        assert df.columns == ["id"] and df.count() == 2

    def test_filter_projection_limit(self, spark, lance_cow_nonpartitioned):
        from hudi_rs_spark.sources.hudi import HudiReadOptions, HudiTable

        t = HudiTable(lance_cow_nonpartitioned, spark)
        df = t.read(
            HudiReadOptions(
                filters=[("category", "=", "vision")],
                projection=["id", "category"],
            )
        )
        assert df.columns == ["id", "category"]
        got = sorted(r.id for r in df.collect())
        assert got == [1, 3, 7, 10]

    def test_table_stats(self, spark, lance_cow_nonpartitioned):
        from hudi_rs_spark.sources.hudi import HudiTable

        t = HudiTable(lance_cow_nonpartitioned, spark)
        rows, size = t.compute_table_stats(exact=True)
        assert rows == 9  # current snapshot slices
        assert size > 0
        est_rows, est_size = t.compute_table_stats(exact=False)
        assert est_size == size
        assert est_rows > 0


class TestLanceMorSnapshot:
    def test_trips_mor_avro_log_merge(self, spark, lance_mor_trips):
        from hudi_rs_spark.sources.hudi import HudiReadOptions, HudiTable

        t = HudiTable(lance_mor_trips, spark)
        rows = {
            r.rider: r for r in t.read().select("rider", "driver", "fare", "ts").collect()
        }
        assert sorted(rows) == [
            "rider-A", "rider-C", "rider-D", "rider-E", "rider-F", "rider-G",
            "rider-I", "rider-J", "rider-M", "rider-N", "rider-O", "rider-P",
        ]
        # rider-A's update IS in a log file; rider-G's update commit
        # recorded no files, so G stays at the insert fare (the reference
        # test pins exactly this "available log" semantic)
        assert rows["rider-A"].fare == pytest.approx(0.0)
        assert rows["rider-A"].ts == 1695200000000
        assert rows["rider-C"].fare == pytest.approx(27.70)
        assert rows["rider-G"].fare == pytest.approx(43.40)
        assert rows["rider-O"].driver == "driver-Y"
        assert rows["rider-P"].driver == "driver-Z"
        # read-optimized: base-only, rider-A at pre-update fare
        ro = {
            r.rider: r
            for r in t.read(HudiReadOptions(use_read_optimized_mode=True))
            .select("rider", "fare")
            .collect()
        }
        assert ro["rider-A"].fare == pytest.approx(19.10)

    def test_nonhivestyle_mor(self, spark, lance_mor_nonhivestyle):
        from hudi_rs_spark.sources.hudi import HudiTable

        t = HudiTable(lance_mor_nonhivestyle, spark)
        rows = {
            r.event_id: r
            for r in t.read()
            .select("event_id", "user_id", "payload", "event_ts", "event_date")
            .collect()
        }
        assert sorted(rows) == [f"evt-{i:03d}" for i in range(1, 15)]
        assert rows["evt-001"].payload == '{"page": "/home", "session": "sess-abc123"}'
        assert rows["evt-001"].event_ts == 1700000000001
        # evt-002's update commit wrote no log file -> original payload
        assert rows["evt-002"].payload == '{"button": "signup"}'
        assert rows["evt-013"].user_id == "user-100"
        assert rows["evt-014"].user_id == "user-101"
        # non-hive-style partition paths resolved
        assert rows["evt-001"].event_date == "2023-11-14"
        assert rows["evt-013"].event_date == "2023-11-17"


# ---------------------------------------------------------------------------
# connector parity — the Python Data Source must read lance bases too
# ---------------------------------------------------------------------------
class TestLanceTimeTravel:
    def test_as_of_first_commit(self, spark, lance_cow_nonpartitioned):
        """Time travel to the insert commit: all 8 originals, pre-update
        scores, id 4 still present."""
        from hudi_rs_spark.sources.hudi import HudiReadOptions, HudiTable

        t = HudiTable(lance_cow_nonpartitioned, spark)
        first = t.get_timeline().instants[0].timestamp
        rows = {
            r.id: r
            for r in t.read(HudiReadOptions(as_of_timestamp=first))
            .select("id", "score")
            .collect()
        }
        assert sorted(rows) == [1, 2, 3, 4, 5, 6, 7, 8]
        assert rows[1].score == pytest.approx(0.92)  # pre-update
        assert rows[4].score == pytest.approx(0.78)  # pre-delete

    def test_incremental_window(self, spark, lance_cow_nonpartitioned):
        """Incremental (first, latest]: only rows written after the
        insert commit — the updates and the final inserts."""
        from hudi_rs_spark.sources.hudi import HudiTable

        t = HudiTable(lance_cow_nonpartitioned, spark)
        first = t.get_timeline().instants[0].timestamp
        rows = {
            r.id: r.score
            for r in t.read_incremental(first).select("id", "score").collect()
        }
        assert sorted(rows) == [1, 2, 9, 10]
        assert rows[1] == pytest.approx(0.96)
        assert rows[2] == pytest.approx(0.93)


class TestLanceStreaming:
    def test_readstream_over_lance_mor(self, spark, tmp_path, lance_mor_trips):
        """Connector streaming source over a Lance MOR table: the
        availableNow run must deliver every commit's rows, landing at
        the merged snapshot state."""
        import time

        from hudi_rs_spark.sources.pyds import HudiPyDataSource

        spark.dataSource.register(HudiPyDataSource)
        out = os.path.join(str(tmp_path), "out")
        ckpt = os.path.join(str(tmp_path), "ckpt")
        df = spark.readStream.format("hudi_py").option("path", lance_mor_trips).load()
        q = (
            df.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        deadline = time.time() + 240
        while q.isActive and time.time() < deadline:
            time.sleep(2)
        assert not q.isActive and q.exception() is None
        got = spark.read.parquet(out)
        # latest version per key across the streamed batches == snapshot
        from pyspark.sql import Window
        from pyspark.sql import functions as F

        w = Window.partitionBy("uuid").orderBy(
            F.desc("ts"), F.desc("_hoodie_commit_time")
        )
        latest = (
            got.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
        )
        fares = {r.rider: r.fare for r in latest.select("rider", "fare").collect()}
        assert fares["rider-A"] == pytest.approx(0.0)
        assert fares["rider-G"] == pytest.approx(43.40)
        assert len(fares) == 12


class TestLanceConnector:
    def _register(self, spark):
        from hudi_rs_spark.sources.pyds import HudiPyDataSource

        spark.dataSource.register(HudiPyDataSource)

    def test_connector_equals_eager_cow(self, spark, lance_cow_nonpartitioned):
        from hudi_rs_spark.sources.hudi import HudiTable

        self._register(spark)
        con = (
            spark.read.format("hudi_py")
            .option("path", lance_cow_nonpartitioned)
            .load()
        )
        eager = HudiTable(lance_cow_nonpartitioned, spark).read()
        cols = ["id", "name", "category", "score", "tags", "updated_at"]
        got = sorted((tuple(r) for r in con.select(*cols).collect()))
        want = sorted((tuple(r) for r in eager.select(*cols).collect()))
        assert got == want and len(got) == 9

    def test_connector_equals_eager_mor(self, spark, lance_mor_trips):
        from hudi_rs_spark.sources.hudi import HudiTable

        self._register(spark)
        con = spark.read.format("hudi_py").option("path", lance_mor_trips).load()
        eager = HudiTable(lance_mor_trips, spark).read()
        cols = ["uuid", "rider", "driver", "fare", "ts", "city"]
        got = sorted((tuple(r) for r in con.select(*cols).collect()))
        want = sorted((tuple(r) for r in eager.select(*cols).collect()))
        assert got == want and len(got) == 12

    def test_extension_fallback_without_format_config(self, spark, tmp_path):
        """Reference table_read_tests.rs:2663: discovery and read must
        work purely from the .lance extension when
        hoodie.table.base.file.format is absent from the config."""
        import shutil

        from hudi_rs_spark.sources.hudi import HudiTable

        src = extract_fixture("sample_table/cow/v9_lance_nonpartitioned.zip")
        table = os.path.join(str(tmp_path), "nofmt")
        shutil.copytree(src, table)
        props = os.path.join(table, ".hoodie", "hoodie.properties")
        with open(props) as f:
            lines = [
                ln for ln in f.read().splitlines()
                if not ln.startswith("hoodie.table.base.file.format=")
            ]
        with open(props, "w") as f:
            f.write("\n".join(lines) + "\n")
        t = HudiTable(table, spark)
        slices = t.get_file_slices()
        assert any(
            (s.base_file_relative_path() or "").endswith(".lance")
            for s in slices
        )
        assert t.read().select("id").count() == 9

    def test_point_lookup_via_record_index(self, spark, lance_cow_nonpartitioned):
        """The v9 lance fixtures write the MDT record index; a point
        lookup must resolve keys through it and decode only the target
        lance slices."""
        from hudi_rs_spark.sources.hudi import HudiTable

        t = HudiTable(lance_cow_nonpartitioned, spark)
        got = {r.id: r.name for r in t.point_lookup(["9", "2"]).collect()}
        assert got == {9: "feature-set-iota", 2: "feature-set-beta"}

    def test_per_slice_read(self, spark, lance_cow_nonpartitioned):
        from hudi_rs_spark.sources.hudi import HudiTable

        t = HudiTable(lance_cow_nonpartitioned, spark)
        slices = t.get_file_slices()
        total = 0
        for s in slices:
            total += t.read_file_slice(s).count()
        assert total == 9


class TestSyntheticNullablePages:
    """The golden fixtures carry no NULL values, so the nullable decode
    branches (all_nulls / some_nulls / binary null-adjustment) are
    pinned against hand-built Lance files (tests/synth_lance.py), with
    the Arrow fast path checked against the python fallback on each."""

    def _build(self):
        import struct

        from tests.synth_lance import (
            binary_enc,
            build_lance_file,
            flat_enc,
            nullable_all_nulls,
            nullable_some_nulls,
        )

        fields = [
            ("a", "int64", True),   # some_nulls
            ("b", "int64", True),   # all_nulls
            ("c", "string", True),  # binary with null adjustment
            ("d", "bool", False),   # bit-packed flat
            ("e", "int64", False),  # two flat pages (chunking)
        ]
        pages = [
            [{
                "rows": 4,
                "buffers": [bytes([0b1101]), struct.pack("<4q", 1, 0, 3, 4)],
                "encoding": nullable_some_nulls(flat_enc(1, 0), flat_enc(64, 1)),
            }],
            [{"rows": 4, "buffers": [], "encoding": nullable_all_nulls()}],
            [{
                "rows": 4,
                # ends for ["ab", NULL, "c", "dd"]: 2, 2+100, 3, 5
                "buffers": [struct.pack("<4Q", 2, 102, 3, 5), b"abcdd"],
                "encoding": binary_enc(flat_enc(64, 0), flat_enc(8, 1), 100),
            }],
            [{
                "rows": 4,
                "buffers": [bytes([0b0101])],
                "encoding": flat_enc(1, 0),
            }],
            [
                {"rows": 2, "buffers": [struct.pack("<2q", 10, 20)],
                 "encoding": flat_enc(64, 0)},
                {"rows": 2, "buffers": [struct.pack("<2q", 30, 40)],
                 "encoding": flat_enc(64, 0)},
            ],
        ]
        return build_lance_file(fields, pages)

    def test_decodes_expected_values(self):
        from hudi_rs_spark.lance.reader import LanceFile

        lf = LanceFile(self._build())
        d = lf.to_table().to_pydict()
        assert d["a"] == [1, None, 3, 4]
        assert d["b"] == [None, None, None, None]
        assert d["c"] == ["ab", None, "c", "dd"]
        assert d["d"] == [True, False, True, False]
        assert d["e"] == [10, 20, 30, 40]

    def test_fast_path_agrees_with_fallback(self):
        import pyarrow as pa

        from hudi_rs_spark.lance.reader import LanceFile, _arrow_type

        lf = LanceFile(self._build())
        for i, fld in enumerate(lf.fields):
            slow = pa.array(lf._field_values(fld, i), type=_arrow_type(fld))
            fast = lf._field_array(fld, i)
            assert fast is not None, fld.name
            assert fast.combine_chunks() == slow, fld.name


class TestSyntheticMultiPageList:
    """ADVICE r6 pinned: a list column spanning >1 page must slice the
    child at a RUNNING base offset (page-local offsets + per-page
    num_items), and the child may itself span multiple pages."""

    def _build(self, bad_num_items: bool = False):
        import struct

        from tests.synth_lance import build_lance_file, flat_enc, list_enc

        fields = [("L", "list", True), (">item", "int64", True)]
        # page 1: [1,2], [], [3,4,5]      ends 2,2,5  num_items 5
        # page 2: [6], NULL, [7,8]        ends 1,101,3 (adj=100) num_items 3
        pages = [
            [
                {
                    "rows": 3,
                    "buffers": [struct.pack("<3Q", 2, 2, 5)],
                    "encoding": list_enc(flat_enc(64, 0), 0, 5),
                },
                {
                    "rows": 3,
                    "buffers": [struct.pack("<3Q", 1, 101, 3)],
                    "encoding": list_enc(
                        flat_enc(64, 0), 100, 4 if bad_num_items else 3
                    ),
                },
            ],
            [
                {"rows": 5, "buffers": [struct.pack("<5q", 1, 2, 3, 4, 5)],
                 "encoding": flat_enc(64, 0)},
                {"rows": 3, "buffers": [struct.pack("<3q", 6, 7, 8)],
                 "encoding": flat_enc(64, 0)},
            ],
        ]
        return build_lance_file(fields, pages)

    EXPECT = [[1, 2], [], [3, 4, 5], [6], None, [7, 8]]

    def test_cross_page_slicing(self):
        from hudi_rs_spark.lance.reader import LanceFile

        lf = LanceFile(self._build())
        assert lf.num_rows == 6
        assert lf.to_table().to_pydict()["L"] == self.EXPECT

    def test_both_decode_paths_agree(self):
        import pyarrow as pa

        from hudi_rs_spark.lance.reader import LanceFile, _arrow_type

        lf = LanceFile(self._build())
        fld = lf.fields[0]
        slow = pa.array(lf._field_values(fld, 0), type=_arrow_type(fld))
        fast = lf._field_array(fld, 0)
        assert fast is not None
        assert fast.combine_chunks() == slow
        assert slow.to_pylist() == self.EXPECT

    def test_num_items_mismatch_raises(self):
        import pytest

        from hudi_rs_spark.lance.reader import LanceFile

        lf = LanceFile(self._build(bad_num_items=True))
        with pytest.raises(ValueError, match="num_items|consumed"):
            lf.to_table()
