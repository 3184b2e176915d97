"""Bloom-filter key index (filter phase of Hudi's BLOOM index).

The range index already covers clustered keys; these tests use RANDOM keys —
the workload where every file's [min, max] spans the whole key space, range
pruning keeps everything, and only the bloom can make a keyed write's location
scan O(touched files). We assert (a) pruning evidence via ``last_key_prune``
(bloom_pruned > 0, candidates << total), (b) results identical to a bloom-less
table across the same op sequence (pruning is never lossy), (c) the advertised
false-positive bound holds, (d) sidecars are GC'd with their files.

Reference anchor: hoodie.index.type=BLOOM is the default index the reference
quickstart writes with (/root/reference/spark/src/main/scala/com/hudi/spark/
QuickstartExample.scala upsert path); our sidecar plays the role of the
org.apache.hudi.bloomfilter footer blob.
"""

from __future__ import annotations

import os
import random

import pytest

from hudi_examples_spark.table import Table, TableConfig
from hudi_examples_spark.table.bloom import bloom_contains, build_bloom

SCHEMA = "id STRING, v BIGINT"


def _keys(seed: int, n: int) -> list[str]:
    # random hex keys: lexicographic ranges of any file subset span the space
    rng = random.Random(seed)
    return [f"{rng.getrandbits(64):016x}" for _ in range(n)]


def _df(spark, keys: list[str], v0: int = 0):
    return spark.createDataFrame([(k, v0 + i) for i, k in enumerate(keys)], SCHEMA)


@pytest.fixture(scope="module")
def bloom_table(spark, tmp_path_factory):
    base = str(tmp_path_factory.mktemp("bloom") / "t")
    tbl = Table.create(
        spark, base, SCHEMA, TableConfig(record_key=["id"], bloom_index=True)
    )
    # three commits of disjoint random key sets -> >= 3 files with
    # fully-overlapping key ranges (range pruning alone keeps all of them)
    for c in range(3):
        tbl.insert(_df(spark, _keys(seed=c, n=300), v0=c * 1000))
    return tbl


def test_sidecars_written(bloom_table):
    d = os.path.join(bloom_table.base, Table.BLOOMS_DIR)
    assert os.path.isdir(d)
    blooms = bloom_table._load_blooms()
    files, _ = bloom_table.timeline.live_files()
    assert set(blooms) == set(files)  # every live file carries a filter
    for b in blooms.values():
        assert b["n"] > 0 and b["m"] >= 8 and b["k"] >= 1


def test_upsert_of_one_commits_keys_prunes_other_files(spark, bloom_table):
    # touch only commit-0 keys: the bloom must rule out commit-1/2 files that
    # range pruning cannot (random keys -> every range matches)
    batch = _df(spark, _keys(seed=0, n=300)[:50], v0=9000)
    bloom_table.upsert(batch)
    prune = bloom_table.last_key_prune
    assert prune["bloom_pruned"] >= 1
    assert prune["candidates"] < prune["total"]
    # updated rows visible, everything else untouched
    got = {r["id"]: r["v"] for r in bloom_table.read().collect()}
    assert len(got) == 900
    assert got[_keys(seed=0, n=300)[0]] == 9000


def test_absent_keys_prune_everything(spark, bloom_table):
    fresh = _df(spark, _keys(seed=99, n=40), v0=5)
    bloom_table.upsert(fresh)
    # none of the incoming keys exists in any file: the location scan should
    # have touched (almost) nothing — allow the fpp-scale false-positive slack
    prune = bloom_table.last_key_prune
    assert prune["candidates"] <= max(1, prune["total"] // 4)
    assert bloom_table.read().count() == 940


def test_results_match_bloomless_table(spark, tmp_path):
    cfgs = {
        "bloom": TableConfig(record_key=["id"], bloom_index=True),
        "plain": TableConfig(record_key=["id"]),
    }
    finals = {}
    for name, cfg in cfgs.items():
        tbl = Table.create(spark, str(tmp_path / name), SCHEMA, cfg)
        for c in range(2):
            tbl.insert(_df(spark, _keys(seed=c, n=200), v0=c * 1000))
        tbl.upsert(_df(spark, _keys(seed=0, n=200)[:30], v0=7000))
        tbl.delete(_df(spark, _keys(seed=1, n=200)[:20]))
        finals[name] = sorted(map(tuple, tbl.read().collect()))
    assert finals["bloom"] == finals["plain"]


def test_fpp_bound():
    present = _keys(seed=1, n=2000)
    bloom = build_bloom(present, fpp=0.01)
    assert bloom_contains(bloom, present).all()  # no false negatives, ever
    absent = _keys(seed=2, n=20000)
    absent = [k for k in absent if k not in set(present)]
    fp_rate = bloom_contains(bloom, absent).mean()
    assert fp_rate < 0.03  # 3x slack over the 1% design point


def test_mor_logs_and_compaction_keep_blooms_current(spark, tmp_path):
    tbl = Table.create(
        spark,
        str(tmp_path / "mor"),
        SCHEMA,
        TableConfig(record_key=["id"], table_type="mor", bloom_index=True),
    )
    tbl.insert(_df(spark, _keys(seed=3, n=200)))
    tbl.upsert(_df(spark, _keys(seed=3, n=200)[:40], v0=4000))  # delta log
    tbl.compact()
    blooms = tbl._load_blooms()
    files, _ = tbl.timeline.live_files()
    assert set(files) <= set(blooms)  # compaction outputs re-indexed
    got = {r["id"]: r["v"] for r in tbl.read().collect()}
    assert got[_keys(seed=3, n=200)[0]] == 4000


def test_clean_gcs_bloom_sidecars(spark, tmp_path):
    tbl = Table.create(
        spark, str(tmp_path / "gc"), SCHEMA, TableConfig(record_key=["id"], bloom_index=True)
    )
    ks = _keys(seed=4, n=100)
    for c in range(6):
        tbl.upsert(_df(spark, ks, v0=c))  # COW: each upsert rewrites the file
    removed = tbl.clean(retain_commits=2)
    assert removed
    blooms = tbl._load_blooms()
    assert not (set(removed) & set(blooms))  # dead files' filters dropped
    files, _ = tbl.timeline.live_files()
    assert set(files) <= set(blooms)  # live ones retained
