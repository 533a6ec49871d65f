"""Space-filling-curve layout (write/layout.py) + clustering wiring:
Morton order pinned against hand-interleaved values, the Hilbert index
pinned by the curve's DEFINING property (successive points are grid
neighbors — exhaustive over small grids), locality payoff measured
against linear sort, and the cluster(layout=...) end-to-end path.
"""

from __future__ import annotations

import itertools

import numpy as np
import pyarrow as pa
import pytest


class TestMorton:
    def test_known_2d_interleave(self):
        from hudi_rs_spark.write.layout import morton_index

        # (x, y) with bits=2, MSB-first across dims (x above y)
        coords = np.array(
            [[0, 0], [0, 1], [1, 0], [1, 1], [2, 3], [3, 3]], np.uint64
        )
        got = morton_index(coords, 2).tolist()
        # manual interleave: bit layout x1 y1 x0 y0
        def z(x, y):
            return ((x >> 1) & 1) << 3 | ((y >> 1) & 1) << 2 | (x & 1) << 1 | (y & 1)

        assert got == [z(x, y) for x, y in coords.tolist()]

    def test_bijective_on_full_grid(self):
        from hudi_rs_spark.write.layout import morton_index

        for d, bits in ((2, 3), (3, 2)):
            grid = np.array(
                list(itertools.product(range(1 << bits), repeat=d)), np.uint64
            )
            idx = morton_index(grid, bits)
            assert sorted(idx.tolist()) == list(range((1 << bits) ** d))


class TestHilbert:
    @pytest.mark.parametrize("d,bits", [(2, 1), (2, 2), (2, 3), (3, 1), (3, 2)])
    def test_unit_step_adjacency_exhaustive(self, d, bits):
        """The Hilbert curve visits every grid cell exactly once and
        every consecutive pair differs by ONE unit step in ONE dim."""
        from hudi_rs_spark.write.layout import hilbert_index

        grid = np.array(
            list(itertools.product(range(1 << bits), repeat=d)), np.uint64
        )
        idx = hilbert_index(grid, bits)
        n_cells = (1 << bits) ** d
        assert sorted(idx.tolist()) == list(range(n_cells))  # bijection
        walk = grid[np.argsort(idx)]
        steps = np.abs(np.diff(walk.astype(np.int64), axis=0))
        assert (steps.sum(axis=1) == 1).all()

    def test_locality_beats_linear_sort(self):
        """Partition a 2-d uniform grid into contiguous chunks by curve
        position: each chunk's bounding box must cover a strict subrange
        of BOTH dims (linear sort leaves dim-2 spanning the full range)."""
        from hudi_rs_spark.write.layout import hilbert_index, morton_index

        side = 32
        grid = np.array(
            list(itertools.product(range(side), repeat=2)), np.uint64
        )
        for fn in (hilbert_index, morton_index):
            order = np.argsort(fn(grid, 5))
            chunks = np.array_split(grid[order], 16)
            for ch in chunks:
                assert ch[:, 0].max() - ch[:, 0].min() < side - 1
                assert ch[:, 1].max() - ch[:, 1].min() < side - 1


class TestCurveSort:
    def test_rank_normalization_handles_strings_and_nulls(self):
        from hudi_rs_spark.write.layout import column_ranks

        col = pa.chunked_array([pa.array(["b", None, "a", "c"])])
        r = column_ranks(col, 2).tolist()
        assert r[1] == 0  # null first
        assert r[2] < r[0] < r[3]

    def test_curve_order_is_permutation(self):
        from hudi_rs_spark.write.layout import curve_order

        t = pa.table(
            {
                "x": pa.array(np.random.default_rng(7).permutation(100)),
                "y": pa.array(np.random.default_rng(8).permutation(100)),
            }
        )
        for m in ("zorder", "hilbert"):
            out = curve_order(t, ["x", "y"], m)
            assert sorted(out["x"].to_pylist()) == sorted(t["x"].to_pylist())
            assert len(out) == 100

    def test_unknown_layout_rejected(self):
        from hudi_rs_spark.write.layout import curve_sort_indices

        with pytest.raises(ValueError, match="layout"):
            curve_sort_indices(pa.table({"x": [1]}), ["x"], "diagonal")


class TestClusterLayouts:
    @pytest.fixture(scope="module", autouse=True)
    def _register(self, spark):
        from hudi_rs_spark.sources.pyds import HudiPyDataSource

        spark.dataSource.register(HudiPyDataSource)

    def _seed(self, spark, path, n=256):
        rng = np.random.default_rng(11)
        xs = rng.permutation(n).tolist()
        ys = rng.permutation(n).tolist()
        df = spark.createDataFrame(
            [(i, xs[i], ys[i], 1) for i in range(n)],
            "id long, x long, y long, ts long",
        )
        (
            df.write.format("hudi_py").option("path", path)
            .option("recordkey.field", "id")
            .option("precombine.field", "ts")
            .option("table.type", "MERGE_ON_READ")
            .option("table.version", "8")
            .mode("append").save()
        )

    @pytest.mark.parametrize("layout", ["zorder", "hilbert"])
    def test_clustered_rows_follow_curve(self, spark, tmp_path, layout):
        import pyarrow.parquet as pq

        from hudi_rs_spark.sources.hudi import HudiTable
        from hudi_rs_spark.write.cluster import cluster
        from hudi_rs_spark.write.layout import curve_sort_indices

        t = str(tmp_path / layout)
        self._seed(spark, t)
        before = {
            r.id: (r.x, r.y) for r in HudiTable(t, spark).read().collect()
        }
        n = cluster(
            spark, t, sort_columns=("x", "y"), layout=layout,
            min_group_slices=1,
        )
        assert n >= 1
        after = {
            r.id: (r.x, r.y) for r in HudiTable(t, spark).read().collect()
        }
        assert after == before  # clustering transparency
        # the rewritten base file's physical row order follows the curve
        slices = HudiTable(t, spark=None, listing="direct").get_file_slices()
        newest = max(s.base_file.commit_timestamp for s in slices)
        base = next(
            s.base_file for s in slices
            if s.base_file.commit_timestamp == newest
        )
        tbl = pq.read_table(f"{t}/{base.file_name}", columns=["x", "y"])
        perm = curve_sort_indices(tbl, ["x", "y"], layout)
        assert perm.tolist() == list(range(len(tbl)))

    def test_linear_default_unchanged(self, spark, tmp_path):
        from hudi_rs_spark.sources.hudi import HudiTable
        from hudi_rs_spark.write.cluster import cluster

        t = str(tmp_path / "lin")
        self._seed(spark, t, n=64)
        cluster(spark, t, sort_columns=("x",), min_group_slices=1)
        rows = (
            HudiTable(t, spark).read().select("x").collect()
        )
        # snapshot equality is pinned elsewhere; here: service ran fine
        assert len(rows) == 64
