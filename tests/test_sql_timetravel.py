"""SQL time travel through the plain-SELECT router: ``SELECT ... FROM t
TIMESTAMP AS OF '<ts>'`` / ``VERSION AS OF`` rewrite to time-traveled
temp views over the connector read (write/sql.py::_rewrite_time_travel).

Parity target: the DataFrame path ``HudiTable.read(HudiReadOptions(
as_of_timestamp=...))``; accepted literal formats are the reader's
(reference docs/reader-spec.md:311-319 — hudi instant, unix epoch,
RFC 3339 with offset).
"""

from __future__ import annotations

from datetime import datetime, timedelta, timezone

import pytest


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    from hudi_rs_spark.sources.pyds import HudiPyDataSource

    spark.dataSource.register(HudiPyDataSource)


OPTS = {
    "recordkey.field": "id", "precombine.field": "ts",
    "partitionpath.field": "part", "table.type": "MERGE_ON_READ",
    "table.version": "8",
}


def _rows(spark, n, start=0, ts=1, name="n"):
    return spark.createDataFrame(
        [
            (start + i, f"{name}{start + i}", ts,
             "a" if (start + i) % 2 else "b")
            for i in range(n)
        ],
        "id long, name string, ts long, part string",
    )


def _write(df, t):
    w = df.write.format("hudi_py").option("path", t)
    for k, v in OPTS.items():
        w = w.option(k, v)
    w.mode("append").save()


@pytest.fixture(scope="module")
def table(spark, tmp_path_factory):
    """Three commits: 10 inserts, 5 more inserts, 5 upserts renaming."""
    t = str(tmp_path_factory.mktemp("ttsql") / "t")
    _write(_rows(spark, 10), t)
    _write(_rows(spark, 5, start=10), t)
    from hudi_rs_spark.write.upsert import upsert

    upsert(_rows(spark, 5, ts=2, name="upd"), t)
    from hudi_rs_spark.sources.hudi import HudiTable

    instants = sorted(
        i.timestamp for i in HudiTable(t, spark).timeline.instants
    )
    assert len(instants) == 3
    return t, instants


def _ids_names(df):
    return sorted((r.id, r.name) for r in df.select("id", "name").collect())


def _df_asof(spark, t, ts):
    from hudi_rs_spark.config.read_config import HudiReadOptions
    from hudi_rs_spark.sources.hudi import HudiTable

    return HudiTable(t, spark).read(HudiReadOptions(as_of_timestamp=ts))


def _parse_instant(ts: str) -> datetime:
    fmt = "%Y%m%d%H%M%S%f" if len(ts) == 17 else "%Y%m%d%H%M%S"
    return datetime.strptime(ts, fmt).replace(tzinfo=timezone.utc)


class TestTimestampAsOf:
    def test_matches_dataframe_asof(self, spark, table):
        from hudi_rs_spark.write.sql import hudi_sql

        t, instants = table
        for inst in instants:
            got = hudi_sql(
                spark,
                f"SELECT id, name FROM t TIMESTAMP AS OF '{inst}' ORDER BY id",
                tables={"t": t},
            )
            assert _ids_names(got) == _ids_names(_df_asof(spark, t, inst))
        # first commit really is the 10-row state, last the merged 15
        first = hudi_sql(
            spark,
            f"SELECT id FROM t TIMESTAMP AS OF '{instants[0]}'",
            tables={"t": t},
        )
        assert first.count() == 10

    def test_all_literal_formats(self, spark, table):
        """Epoch ms / RFC 3339 forms of a point between commits 1 and 2
        all resolve to the commit-1 state (reader-spec formats)."""
        from hudi_rs_spark.write.sql import hudi_sql

        t, instants = table
        t1 = _parse_instant(instants[0])
        t2 = _parse_instant(instants[1])
        mid = t1 + (t2 - t1) / 2
        assert t1 < mid < t2
        epoch_ms = int(mid.timestamp() * 1000)
        forms = [
            str(epoch_ms),  # unix epoch ms, unquoted
            f"'{epoch_ms}'",  # quoted epoch
            "'" + mid.strftime("%Y-%m-%dT%H:%M:%S.%f")[:-3] + "Z'",  # RFC3339
            "'" + mid.strftime("%Y-%m-%dT%H:%M:%S.%f")[:-3] + "+00:00'",
        ]
        want = _ids_names(_df_asof(spark, t, instants[0]))
        for lit in forms:
            got = hudi_sql(
                spark,
                f"SELECT id, name FROM t TIMESTAMP AS OF {lit}",
                tables={"t": t},
            )
            assert _ids_names(got) == want, lit

    def test_version_as_of_and_system_time(self, spark, table):
        from hudi_rs_spark.write.sql import hudi_sql

        t, instants = table
        # VERSION AS OF <instant>: a hudi version IS the commit instant
        v = hudi_sql(
            spark,
            f"SELECT id FROM t VERSION AS OF '{instants[1]}'",
            tables={"t": t},
        )
        assert v.count() == 15
        s = hudi_sql(
            spark,
            f"SELECT id FROM t FOR SYSTEM_TIME AS OF '{instants[0]}'",
            tables={"t": t},
        )
        assert s.count() == 10

    def test_subquery_and_join_mix(self, spark, table):
        """AS OF inside a derived table, joined to the live snapshot."""
        from hudi_rs_spark.write.sql import hudi_sql

        t, instants = table
        got = hudi_sql(
            spark,
            "SELECT cur.id, cur.name AS new_name, old.name AS old_name "
            "FROM t cur JOIN (SELECT id, name FROM t TIMESTAMP AS OF "
            f"'{instants[0]}') old ON cur.id = old.id "
            "WHERE cur.name != old.name ORDER BY cur.id",
            tables={"t": t},
        )
        rows = got.collect()
        assert len(rows) == 5  # the five upserted rows changed names
        assert all(r.new_name.startswith("upd") for r in rows)
        assert all(r.old_name.startswith("n") for r in rows)

    def test_string_literal_not_rewritten(self, spark, table):
        from hudi_rs_spark.write.sql import hudi_sql

        t, _ = table
        got = hudi_sql(
            spark,
            "SELECT 't TIMESTAMP AS OF 123' AS s FROM t LIMIT 1",
            tables={"t": t},
        )
        assert got.collect()[0].s == "t TIMESTAMP AS OF 123"

    def test_time_travel_sees_pre_delete_rows(self, spark, table, tmp_path):
        """AS OF before a delete still reads the deleted rows."""
        from hudi_rs_spark.write.sql import hudi_sql

        t, instants = table
        hudi_sql(spark, "DELETE FROM t WHERE id >= 10", tables={"t": t})
        live = hudi_sql(spark, "SELECT id FROM t", tables={"t": t})
        assert live.count() == 10
        old = hudi_sql(
            spark,
            f"SELECT id FROM t TIMESTAMP AS OF '{instants[2]}'",
            tables={"t": t},
        )
        assert old.count() == 15
