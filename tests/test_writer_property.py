"""Property tests for the DataFrame writer: hypothesis-generated row
sets must round-trip ``df.write.format("hudi_py")`` -> ``HudiTable.read``
bit-exactly, and random MOR upsert sequences must merge to the same
latest-wins state a reference python fold computes.

Spark round trips are seconds each, so example counts stay small; the
value is in hypothesis exploring the edges (empty strings, unicode,
negative/extreme ints, NaN-free doubles, null columns, duplicate keys
across batches) rather than in volume."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

TEXT = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), max_size=20
)
I64 = st.integers(min_value=-(2**62), max_value=2**62 - 1)
F64 = st.floats(allow_nan=False, allow_infinity=False, width=64)

ROW = st.tuples(TEXT | st.none(), I64 | st.none(), F64 | st.none(),
                st.booleans() | st.none())

_SLOW = settings(
    max_examples=5, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture,
                           HealthCheck.too_slow],
)


def _register(spark):
    from hudi_rs_spark.sources.pyds import HudiPyDataSource

    try:
        spark.dataSource.register(HudiPyDataSource)
    except Exception:
        pass


def _write(df, path, **options):
    w = df.write.format("hudi_py").option("path", path)
    for k, v in options.items():
        w = w.option(k, v)
    w.mode("append").save()


class TestCowRoundTripProperty:
    @given(rows=st.lists(ROW, min_size=0, max_size=25), version=st.sampled_from([6, 8]))
    @_SLOW
    def test_write_read_identity(self, spark, tmp_path_factory, rows, version):
        from hudi_rs_spark.sources.hudi import HudiTable

        _register(spark)
        tdir = str(tmp_path_factory.mktemp("prop") / "t")
        df = spark.createDataFrame(
            [(i, s, n, d, b) for i, (s, n, d, b) in enumerate(rows)],
            "id long, s string, n long, d double, b boolean",
        )
        _write(df, tdir, **{
            "recordkey.field": "id", "table.version": str(version),
        })
        if not rows:
            # zero-row write publishes nothing readable; an empty dir or
            # empty table are both acceptable
            return
        back = sorted(
            map(tuple, HudiTable(tdir, spark).read()
                .select("id", "s", "n", "d", "b").collect())
        )
        want = sorted(map(tuple, df.collect()))
        assert back == want


class TestMorUpsertProperty:
    @given(
        base=st.dictionaries(st.integers(0, 9), st.tuples(TEXT, I64), max_size=8),
        batches=st.lists(
            st.dictionaries(st.integers(0, 9), st.tuples(TEXT, I64), max_size=5),
            max_size=2,
        ),
    )
    @_SLOW
    def test_upsert_fold_matches_reference(
        self, spark, tmp_path_factory, base, batches
    ):
        from hudi_rs_spark.write.upsert import upsert

        if not base:
            return
        _register(spark)
        tdir = str(tmp_path_factory.mktemp("prop") / "t")
        schema = "id long, s string, ts long"
        _write(
            spark.createDataFrame(
                [(k, s, ts) for k, (s, ts) in base.items()], schema
            ),
            tdir,
            **{
                "recordkey.field": "id", "precombine.field": "ts",
                "table.type": "MERGE_ON_READ",
            },
        )
        # reference fold: arrival order, later batch wins ties and
        # replaces only when its ordering value is >= current
        state = dict(base)
        for b in batches:
            if not b:
                continue
            upsert(
                spark.createDataFrame(
                    [(k, s, ts) for k, (s, ts) in b.items()], schema
                ),
                tdir,
            )
            for k, (s, ts) in b.items():
                cur = state.get(k)
                if cur is None or ts >= cur[1]:
                    state[k] = (s, ts)
        got = {
            r.id: (r.s, r.ts)
            for r in spark.read.format("hudi_py").option("path", tdir)
            .load().select("id", "s", "ts").collect()
        }
        assert got == state


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
