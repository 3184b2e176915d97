"""Unit tests for the filesystem lock protocol primitives (no Spark needed):
stale-lock breaking by rename, identity-checked restore, inode-safe release,
and orphaned .broken sweeper — the pieces behind OCC publish and props saves.
"""

from __future__ import annotations

import json
import os
import threading
import time

from hudi_examples_spark.table.core import (
    _acquire_lock,
    _break_stale_lock,
    _release_lock,
    _sweep_broken_locks,
)

TTL = 5.0


def _make_lock(path: str, age: float = 0.0) -> None:
    fd = os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
    os.write(fd, json.dumps({"pid": os.getpid()}).encode())
    os.close(fd)
    if age:
        old = time.time() - age
        os.utime(path, (old, old))


def test_stale_lock_is_broken(tmp_path):
    lock = str(tmp_path / "_lock")
    _make_lock(lock, age=TTL + 1)
    assert _break_stale_lock(lock, TTL) is True
    assert not os.path.exists(lock)


def test_fresh_lock_is_not_broken(tmp_path):
    lock = str(tmp_path / "_lock")
    _make_lock(lock)
    assert _break_stale_lock(lock, TTL) is False
    assert os.path.exists(lock)


def test_missing_lock_is_not_broken(tmp_path):
    assert _break_stale_lock(str(tmp_path / "nope"), TTL) is False


def test_release_never_deletes_another_holders_lock(tmp_path):
    """A displaced holder's release must not unlink a lock someone else
    re-created at the same path (inode check)."""
    lock = str(tmp_path / "_lock")
    fd = os.open(lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
    # simulate displacement: our lock renamed away, a new holder re-creates
    os.rename(lock, lock + ".broken.x")
    _make_lock(lock)  # the new holder's lock
    new_ino = os.stat(lock).st_ino
    _release_lock(fd, lock)  # closes fd; must NOT unlink the new lock
    assert os.path.exists(lock) and os.stat(lock).st_ino == new_ino
    os.unlink(lock + ".broken.x")


def test_release_unlinks_own_lock(tmp_path):
    lock = str(tmp_path / "_lock")
    fd = os.open(lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
    _release_lock(fd, lock)
    assert not os.path.exists(lock)


def test_sweeper_removes_only_aged_broken_files(tmp_path):
    lock = str(tmp_path / "_lock")
    old = str(tmp_path / "_lock.broken.1.1")
    fresh = str(tmp_path / "_lock.broken.2.2")
    other = str(tmp_path / "other_file")
    for p in (old, fresh, other):
        with open(p, "w") as f:
            f.write("x")
    t = time.time() - (TTL + 1)
    os.utime(old, (t, t))
    _sweep_broken_locks(lock, TTL)
    assert not os.path.exists(old)
    assert os.path.exists(fresh) and os.path.exists(other)


def test_acquire_is_mutually_exclusive_under_contention(tmp_path):
    """16 threads × 20 critical sections through one lock file: the guarded
    counter must equal the number of sections (no lost updates), and the
    stale-break path must never fire for live holders."""
    lock = str(tmp_path / "_lock")
    counter = str(tmp_path / "counter")
    with open(counter, "w") as f:
        f.write("0")
    errors: list[Exception] = []

    def worker():
        try:
            for _ in range(20):
                fd = _acquire_lock(lock, ttl_seconds=30.0, timeout_seconds=60.0)
                try:
                    with open(counter) as f:
                        v = int(f.read())
                    time.sleep(0.0005)  # widen the race window
                    with open(counter, "w") as f:
                        f.write(str(v + 1))
                finally:
                    _release_lock(fd, lock)
        except Exception as e:  # pragma: no cover - failure reporting
            errors.append(e)

    threads = [threading.Thread(target=worker) for _ in range(16)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=120)
    assert not errors, errors
    with open(counter) as f:
        assert int(f.read()) == 16 * 20
