"""Cross-PROCESS OCC: the failure mode ADVICE flagged (same-millisecond
instant ids from different processes, lock contention, lost commits) cannot
be exercised by threads — new_instant() is only monotonic per process. These
tests hammer one timeline from real processes and assert nothing is lost.

The publish protocol itself is pure Python (lock file + conflict scan + one
rename), so workers need no SparkSession."""

from __future__ import annotations

import json
import multiprocessing as mp
import os

from hudi_examples_spark.table import Table, TableConfig
from hudi_examples_spark.table.core import ConcurrentWriteConflict
from hudi_examples_spark.table.timeline import Instant, new_instant


def _make_table(base: str) -> None:
    os.makedirs(base, exist_ok=True)
    with open(os.path.join(base, "_props.json"), "w") as f:
        json.dump(
            {
                "config": TableConfig(
                    record_key=["k"], partition_by=["p"]
                ).__dict__,
                "schema": {
                    "type": "struct",
                    "fields": [
                        {"name": "k", "type": "string", "nullable": True, "metadata": {}},
                        {"name": "p", "type": "string", "nullable": True, "metadata": {}},
                    ],
                },
            },
            f,
            default=list,
        )


def _disjoint_writer(base: str, pid: int, n: int, out: mp.Queue) -> None:
    tbl = Table(None, base)
    done = 0
    for i in range(n):
        for _attempt in range(50):
            try:
                files, latest = tbl.timeline.live_files()
                tbl._publish_occ(
                    Instant(new_instant(), "commit", [f"p={pid}/f_{pid}_{i}.parquet"], [], {}),
                    since=latest,
                    partitions={f"p={pid}"},
                )
                done += 1
                break
            except ConcurrentWriteConflict:
                continue  # re-mint and retry
    out.put((pid, done))


def _racing_replacer(base: str, pid: int, out: mp.Queue, barrier) -> None:
    """Everyone plans against the SAME snapshot (barrier after the read),
    then races to publish a replace of it — exactly one may win."""
    tbl = Table(None, base)
    _files, latest = tbl.timeline.live_files()  # shared snapshot: the seed
    barrier.wait(timeout=30)
    try:
        tbl._publish_occ(
            Instant(new_instant(), "replacecommit", [f"p=x/win_{pid}.parquet"], ["p=x/seed.parquet"], {}),
            since=latest,
            partitions={"p=x"},
        )
        out.put((pid, "won"))
    except ConcurrentWriteConflict:
        out.put((pid, "conflict"))


def test_disjoint_partition_writers_never_lose_commits(tmp_path):
    base = str(tmp_path / "t")
    _make_table(base)
    n_procs, n_each = 6, 12
    q: mp.Queue = mp.Queue()
    procs = [
        mp.Process(target=_disjoint_writer, args=(base, pid, n_each, q))
        for pid in range(n_procs)
    ]
    for p in procs:
        p.start()
    for p in procs:
        p.join(timeout=120)
        assert p.exitcode == 0
    results = dict(q.get() for _ in range(n_procs))
    assert all(done == n_each for done in results.values()), results
    tbl = Table(None, base)
    insts = tbl.timeline.completed_data_instants()
    # every commit landed, all instant ids unique, every file referenced once
    assert len(insts) == n_procs * n_each
    ids = [i.instant for i in insts]
    assert len(set(ids)) == len(ids)
    files, _ = tbl.timeline.live_files()
    assert len(files) == n_procs * n_each


def test_competing_full_replace_single_winner(tmp_path):
    base = str(tmp_path / "t")
    _make_table(base)
    seed_tbl = Table(None, base)
    seed_tbl.timeline.write(Instant(new_instant(), "commit", ["p=x/seed.parquet"], [], {}))
    q: mp.Queue = mp.Queue()
    barrier = mp.Barrier(6)
    procs = [mp.Process(target=_racing_replacer, args=(base, pid, q, barrier)) for pid in range(6)]
    for p in procs:
        p.start()
    for p in procs:
        p.join(timeout=60)
        assert p.exitcode == 0
    outcomes = [q.get()[1] for _ in range(6)]
    assert outcomes.count("won") == 1, outcomes
    files, _ = Table(None, base).timeline.live_files()
    assert len(files) == 1 and list(files)[0].startswith("p=x/win_")
