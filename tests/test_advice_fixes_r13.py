"""Regression tests for the r13 ADVICE items (fixed in r14).

1. record_index fold streams with per-instant buffering (no global
   collect) and falls back to the r13 collected/global-sort fold when
   block instants regress within a slice — identical results either way.
2. tables.load memo: immutable-input contract documented + an
   invalidation hook.
3. configure_session no longer clobbers deliberate user settings of
   shuffle.partitions / autoBroadcastJoinThreshold (only Spark defaults
   are overridden).
4. iter_partition_hfiles(with_instants=True) asserts non-None instants
   (covered structurally: valid_blocks filters them; the assert guards
   the cross-module invariant).
"""

from __future__ import annotations

import pytest


def _mk_index_hfile(entries):
    """HFile whose records map key -> encoded location (or tombstone)."""
    import json

    from hudi_rs_spark.hfile import HFile
    from hudi_rs_spark.hfile.writer import build_hfile
    from hudi_rs_spark.write.record_index import (
        RECORD_INDEX_SCHEMA,
        encode_location,
    )

    recs = []
    for key, loc in sorted(entries.items()):
        if loc is None:
            recs.append((key.encode(), b""))
        else:
            recs.append(encode_location(key, loc[0], loc[1]))
    return HFile(
        build_hfile(
            recs, {"schema": json.dumps(RECORD_INDEX_SCHEMA).encode()}
        )
    )


class TestStreamingFold:
    def test_multi_slice_stream_does_not_fall_back(self, monkeypatch):
        """Two shards (slices) each instant-ordered: the streaming fold
        must handle the cross-slice instant reset without the collected
        fallback (keys never span slices)."""
        import hudi_rs_spark.metadata.record_index as ri

        s0_base = _mk_index_hfile({"k0": ("p", "f0")})
        s0_log = _mk_index_hfile({"k0": ("p", "f1")})
        s1_base = _mk_index_hfile({"k9": ("p", "g0")})
        s1_log = _mk_index_hfile({"k9": None})

        monkeypatch.setattr(
            ri, "iter_partition_hfiles",
            lambda *a, **k: iter(
                [
                    (True, s0_base, "001", 0),
                    (False, s0_log, "005", 0),
                    (True, s1_base, "001", 1),  # instant regresses at slice boundary
                    (False, s1_log, "003", 1),
                ]
            ),
        )

        def boom(*a, **k):
            raise AssertionError("collected fallback must not trigger")

        monkeypatch.setattr(ri, "_fold_collected", boom)
        out = ri.read_record_index("unused")
        assert out == {"k0": ("p", "f1")}

    def test_out_of_order_within_slice_falls_back_identically(self, monkeypatch):
        """A stream whose instants regress WITHIN a slice folds through
        the collected path and still applies instant order (later commit
        wins), not arrival order."""
        import hudi_rs_spark.metadata.record_index as ri

        newer = _mk_index_hfile({"k0": ("p", "new")})
        older = _mk_index_hfile({"k0": ("p", "old")})
        feed = [
            (True, _mk_index_hfile({}), "001", 0),
            (False, newer, "007", 0),
            (False, older, "003", 0),  # out of order
        ]
        monkeypatch.setattr(
            ri, "iter_partition_hfiles", lambda *a, **k: iter(list(feed))
        )
        out = ri.read_record_index("unused")
        assert out == {"k0": ("p", "new")}

    def test_same_instant_delete_before_add_streams(self, monkeypatch):
        """The r13 twin rule survives the streaming rewrite: tombstone +
        add at ONE instant nets to the add in either arrival order."""
        import hudi_rs_spark.metadata.record_index as ri

        tomb = _mk_index_hfile({"k0": None})
        add = _mk_index_hfile({"k0": ("p2", "fnew")})
        base = _mk_index_hfile({"k0": ("p1", "fold")})
        for order in ([tomb, add], [add, tomb]):
            monkeypatch.setattr(
                ri, "iter_partition_hfiles",
                lambda *a, _o=order, **k: iter(
                    [(True, base, "001", 0)]
                    + [(False, hf, "009", 0) for hf in _o]
                ),
            )
            out = ri.read_record_index("unused")
            assert out == {"k0": ("p2", "fnew")}, order


class TestTableMemoInvalidation:
    def test_invalidate_drops_keys(self, spark, sf_dir):
        from hudi_rs_spark.workloads import tables

        df1 = tables.load(spark, sf_dir, "nation")
        assert tables.load(spark, sf_dir, "nation") is df1
        tables.invalidate_table_memo(sf_dir)
        df2 = tables.load(spark, sf_dir, "nation")
        assert df2 is not df1
        assert df2.count() == df1.count()


class TestConfigureSessionRespectsUserSettings:
    def _with_conf(self, spark, key, value):
        old = spark.conf.get(key)
        spark.conf.set(key, value)
        return old

    def test_user_tuned_confs_survive(self, spark):
        from hudi_rs_spark.session import configure_session

        old_sp = self._with_conf(spark, "spark.sql.shuffle.partitions", "37")
        old_bt = self._with_conf(
            spark, "spark.sql.autoBroadcastJoinThreshold", "-1"
        )
        try:
            configure_session(spark)
            assert spark.conf.get("spark.sql.shuffle.partitions") == "37"
            assert (
                spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
                == "-1"
            )
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", old_sp)
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_bt)

    def test_spark_defaults_are_overridden(self, spark):
        from hudi_rs_spark.session import configure_session

        old_sp = self._with_conf(spark, "spark.sql.shuffle.partitions", "200")
        old_bt = self._with_conf(
            spark, "spark.sql.autoBroadcastJoinThreshold", "10485760b"
        )
        try:
            configure_session(spark)
            expect = str(max(8, spark.sparkContext.defaultParallelism))
            assert spark.conf.get("spark.sql.shuffle.partitions") == expect
            assert spark.conf.get(
                "spark.sql.autoBroadcastJoinThreshold"
            ) == str(64 * 1024 * 1024)
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", old_sp)
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_bt)
