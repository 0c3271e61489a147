"""Unit tests for tools/_scale_common.ensure_replica's lock protocol.

The scale scripts serialize their shared sf1 replica build through an
O_EXCL lock file (ADVICE r15); ADVICE r16 flagged that a SIGKILLed
builder's orphan lock pinned every later run into the full 1800s wait.
These tests pin the reclaim behavior with a fake builder — no Spark
session needed, so they run in milliseconds.
"""

from __future__ import annotations

import os

import pytest

from tools._scale_common import ensure_replica


class _FakeDF:
    """Quacks like DataFrame.write.mode().parquet() and lays down the
    same completion markers Spark's committer would."""

    def __init__(self):
        self.write = self

    def mode(self, _mode):
        return self

    def parquet(self, path):
        os.makedirs(path, exist_ok=True)
        open(os.path.join(path, "part-00000.parquet"), "w").close()
        open(os.path.join(path, "_SUCCESS"), "w").close()


def _lock_of(path: str) -> str:
    return path.rstrip("/") + ".lock"


def test_builds_once_and_removes_lock(tmp_path):
    path = str(tmp_path / "replica")
    calls = []

    def build():
        calls.append(1)
        return _FakeDF()

    ensure_replica(path, build)
    assert calls == [1]
    assert os.path.exists(os.path.join(path, "_SUCCESS"))
    assert not os.path.exists(_lock_of(path))
    # Second call sees the complete replica and never rebuilds.
    ensure_replica(path, build)
    assert calls == [1]


def test_reclaims_lock_of_dead_builder(tmp_path):
    path = str(tmp_path / "replica")
    lock = _lock_of(path)
    # An orphan lock whose recorded builder PID no longer exists: the
    # waiter must unlink it and take over instead of raising at the
    # deadline. PID from the unreachable end of pid-space.
    dead = 2**22 - 3
    with pytest.raises(ProcessLookupError):
        os.kill(dead, 0)
    with open(lock, "w") as f:
        f.write(str(dead))
    calls = []

    def build():
        calls.append(1)
        return _FakeDF()

    ensure_replica(path, build)
    assert calls == [1]
    assert os.path.exists(os.path.join(path, "_SUCCESS"))
    assert not os.path.exists(lock)


def test_reclaims_expired_lock_of_live_pid(tmp_path):
    path = str(tmp_path / "replica")
    lock = _lock_of(path)
    # Live PID (ours) but the lock has outlived the 1800s build
    # deadline — e.g. the PID was recycled by an unrelated process.
    with open(lock, "w") as f:
        f.write(str(os.getpid()))
    old = os.stat(lock).st_mtime - 3600
    os.utime(lock, (old, old))
    calls = []

    def build():
        calls.append(1)
        return _FakeDF()

    ensure_replica(path, build)
    assert calls == [1]
    assert not os.path.exists(lock)


def test_fresh_live_lock_waits_for_success(tmp_path):
    path = str(tmp_path / "replica")
    lock = _lock_of(path)
    # A fresh lock held by a live PID must NOT be reclaimed: the waiter
    # polls until the builder's _SUCCESS appears, then returns without
    # ever invoking its own build.
    with open(lock, "w") as f:
        f.write(str(os.getpid()))

    def build():
        raise AssertionError("waiter must not build while lock is fresh")

    import threading
    import time

    def finish():
        time.sleep(0.5)
        _FakeDF().parquet(path)
        os.unlink(lock)

    t = threading.Thread(target=finish)
    t.start()
    try:
        ensure_replica(path, build)
    finally:
        t.join()
    assert os.path.exists(os.path.join(path, "_SUCCESS"))
