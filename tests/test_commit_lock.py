"""StorageLockProvider + commit_lock unit behavior (no Spark): the
conditional-create claim, crashed-holder stale-break, and the
ownership-token guard that keeps a broken lock's ORIGINAL holder from
releasing the breaker's lock."""

from __future__ import annotations

import os
import time

import pytest

from hudi_rs_spark.write.concurrency import (
    ConcurrentWriteError,
    StorageLockProvider,
)


def _table(tmp_path):
    base = str(tmp_path / "t")
    os.makedirs(os.path.join(base, ".hoodie"), exist_ok=True)
    return base


class TestStorageLock:
    def test_mutual_exclusion(self, tmp_path):
        t = _table(tmp_path)
        a = StorageLockProvider(t, "commit")
        b = StorageLockProvider(t, "commit")
        assert a.try_lock()
        assert not b.try_lock()
        a.unlock()
        assert b.try_lock()
        b.unlock()

    def test_context_manager_and_timeout(self, tmp_path):
        t = _table(tmp_path)
        a = StorageLockProvider(t, "commit")
        with a:
            b = StorageLockProvider(t, "commit")
            with pytest.raises(ConcurrentWriteError, match="acquire"):
                b.lock(timeout_s=0.3, poll_s=0.05)
        # released on exit
        b2 = StorageLockProvider(t, "commit")
        assert b2.try_lock()
        b2.unlock()

    def test_stale_break_after_crash(self, tmp_path):
        # a "crashed" holder never unlocks; a breaker with a stale
        # window claims through it
        t = _table(tmp_path)
        crashed = StorageLockProvider(t, "commit")
        assert crashed.try_lock()
        fresh = StorageLockProvider(t, "commit", stale_s=3600)
        assert not fresh.try_lock()  # not stale yet
        breaker = StorageLockProvider(t, "commit", stale_s=0.05)
        time.sleep(0.1)
        assert breaker.try_lock()  # broke the stale lock
        # the ORIGINAL holder's unlock must NOT release the breaker's
        # lock (ownership token mismatch)
        crashed.unlock()
        third = StorageLockProvider(t, "commit")
        assert not third.try_lock()
        breaker.unlock()
        assert third.try_lock()
        third.unlock()

    def test_unreadable_payload_not_broken(self, tmp_path):
        # a lock file with a garbage payload (partial write) is NOT
        # breakable — fail safe toward mutual exclusion
        t = _table(tmp_path)
        os.makedirs(os.path.join(t, ".hoodie", ".locks"), exist_ok=True)
        with open(os.path.join(t, ".hoodie", ".locks", "commit.lock"), "w") as f:
            f.write("garbage")
        b = StorageLockProvider(t, "commit", stale_s=0.0)
        assert not b.try_lock()


class TestCommitLockFactory:
    def test_commit_lock_shape(self, tmp_path):
        from hudi_rs_spark.write.concurrency import commit_lock
        from hudi_rs_spark.write.config import WriteConfig

        t = _table(tmp_path)
        cfg = WriteConfig(
            path=t, table_name="x", record_key_fields=("id",),
            instant="20240101000000000",
        )
        lk = commit_lock(cfg)
        with lk:
            assert os.path.exists(
                os.path.join(t, ".hoodie", ".locks", "commit.lock")
            )
        assert not os.path.exists(
            os.path.join(t, ".hoodie", ".locks", "commit.lock")
        )
