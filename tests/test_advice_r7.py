"""Round-7 ADVICE regressions.

1. Archived-vs-archived completion ties: two archived instants share rank 0
   in the divergent-history rank map; begin order must break the tie so an
   archived re-insert after an archived tombstone stays alive (read AND
   compaction).
2. export_snapshot (hudi mode) must carry the SOURCE's completion stamps
   into the clone timeline — re-stamping flips a divergent NBCC history back
   to begin order on the clone.
3. CALL run_compaction('t','schedule', <budget>) must error on a malformed
   budget instead of silently scheduling unbounded.
4. validate(): all-unstamped legacy tables are healthy ('legacy', not
   'fail'); files referenced only by archived instants are not orphans.
5. Timeline.archive() keeps committed_at in the audit JSONL.
"""

from __future__ import annotations

import json
import os

import pytest

from hudi_examples_spark.table import Table, TableConfig
from hudi_examples_spark.table.timeline import TIMELINE_DIR, Timeline

SCHEMA = "k BIGINT, val STRING, v INT"


def _swap_completion(base: str, ia: str, ib: str) -> None:
    """Make instant ``ia`` (minted first) COMPLETE after ``ib``."""
    d = os.path.join(base, TIMELINE_DIR)
    paths = {}
    for fn in os.listdir(d):
        for inst in (ia, ib):
            if fn.startswith(inst + ".") and fn.endswith(".json"):
                paths[inst] = os.path.join(d, fn)
    assert set(paths) == {ia, ib}
    docs = {}
    for inst, p in paths.items():
        with open(p) as f:
            docs[inst] = json.load(f)
    docs[ia]["committed_at"], docs[ib]["committed_at"] = (
        docs[ib]["committed_at"] + 1.0,
        docs[ib]["committed_at"],
    )
    for inst, p in paths.items():
        with open(p, "w") as f:
            json.dump(docs[inst], f, indent=1)


def test_archived_tombstone_then_archived_reinsert_survives(spark, tmp_path):
    """Both the tombstone and the re-insert for k=1 fold past the archive
    boundary; the active window then diverges (rank map engages). The two
    archived instants both rank 0 — begin order must break the tie, so
    the re-insert's cseq > the tombstone's cseq and k=1 stays alive."""
    t = Table.create(
        spark,
        str(tmp_path / "aa"),
        SCHEMA,
        TableConfig(record_key=["k"], precombine="v", table_type="mor"),
    )
    t.insert(spark.createDataFrame([(1, "base", 1), (2, "x", 1)], SCHEMA))
    Table(spark, t.base).delete(spark.createDataFrame([(1,)], "k BIGINT"))
    Table(spark, t.base).upsert(
        spark.createDataFrame([(1, "re-inserted", 1)], SCHEMA)
    )
    for b in range(24):  # push tombstone + re-insert past the boundary
        Table(spark, t.base).upsert(spark.createDataFrame([(2, f"w{b}", 1)], SCHEMA))
    assert Table(spark, t.base).archive_timeline(retain_instants=20) >= 3
    # force divergence in the active window so the rank map engages
    t2 = Table(spark, t.base)
    ia = t2.upsert(spark.createDataFrame([(2, "late-completer", 1)], SCHEMA))
    ib = Table(spark, t.base).upsert(
        spark.createDataFrame([(2, "early-completer", 1)], SCHEMA)
    )
    _swap_completion(t.base, ia, ib)
    t3 = Table(spark, t.base)
    assert t3.timeline.completion_order() is not None
    rows = {r["k"]: r["val"] for r in t3.read().collect()}
    assert rows.get(1) == "re-inserted", rows
    assert rows[2] == "late-completer"
    # compaction must not bake in the loss either
    t3.compact()
    rows2 = {r["k"]: r["val"] for r in Table(spark, t.base).read().collect()}
    assert rows2.get(1) == "re-inserted", rows2


def test_export_snapshot_preserves_completion_stamps(spark, tmp_path):
    """A divergent NBCC history must clone into a table whose merged view
    matches the source snapshot — stamps travel, begin order does not win."""
    t = Table.create(
        spark,
        str(tmp_path / "src"),
        SCHEMA,
        TableConfig(record_key=["k"], precombine="v", table_type="mor"),
    )
    t.insert(spark.createDataFrame([(1, "base", 1), (2, "keep", 1)], SCHEMA))
    # same precombine: recency (completion order) is the tiebreak under test
    ia = Table(spark, t.base).upsert(
        spark.createDataFrame([(1, "minted-early-completed-late", 2)], SCHEMA)
    )
    ib = Table(spark, t.base).upsert(
        spark.createDataFrame([(1, "minted-late-completed-early", 2)], SCHEMA)
    )
    _swap_completion(t.base, ia, ib)
    src = Table(spark, t.base)
    assert src.timeline.completion_order() is not None
    src_rows = sorted(map(tuple, src.read().collect()))
    assert {r["k"]: r["val"] for r in src.read().collect()}[1] == (
        "minted-early-completed-late"
    )
    dest = str(tmp_path / "clone")
    src.export_snapshot(dest)
    clone = Table(spark, dest)
    # the divergence itself must survive the clone, not just the row values
    assert clone.timeline.completion_order() is not None
    assert sorted(map(tuple, clone.read().collect())) == src_rows


def test_export_snapshot_legacy_stamps_stay_epoch_zero(spark, tmp_path):
    """An unstamped legacy source instant must not be re-stamped 'now' on
    the clone (that would hoist it past the source's stamped instants)."""
    t = Table.create(
        spark,
        str(tmp_path / "leg"),
        SCHEMA,
        TableConfig(record_key=["k"], precombine="v", table_type="mor"),
    )
    first = t.insert(spark.createDataFrame([(1, "old", 5)], SCHEMA))
    # strip the first instant's stamp — a pre-upgrade commit
    d = os.path.join(t.base, TIMELINE_DIR)
    for fn in os.listdir(d):
        if fn.startswith(first + ".") and fn.endswith(".json"):
            p = os.path.join(d, fn)
            with open(p) as f:
                doc = json.load(f)
            doc.pop("committed_at", None)
            with open(p, "w") as f:
                json.dump(doc, f, indent=1)
    Table(spark, t.base).upsert(spark.createDataFrame([(1, "new", 5)], SCHEMA))
    dest = str(tmp_path / "legclone")
    Table(spark, t.base).export_snapshot(dest)
    clone_tl = Timeline(dest)
    stamps = {i.instant: i.committed_at for i in clone_tl.instants()}
    assert stamps[first] == 0.0  # pinned to epoch 0, not time.time()
    assert {r["k"]: r["val"] for r in Table(spark, dest).read().collect()}[1] == "new"


def test_call_run_compaction_rejects_malformed_budget(spark, tmp_path):
    from hudi_examples_spark.sql import Engine

    eng = Engine(spark, str(tmp_path / "wh"))
    eng.sql(
        "CREATE TABLE cb (k BIGINT, val STRING, v INT) USING hudi "
        "TBLPROPERTIES (primaryKey = 'k', preCombineField = 'v', type = 'mor')"
    )
    eng.sql("INSERT INTO cb VALUES (1, 'a', 1)")
    with pytest.raises(ValueError, match="positive integer"):
        eng.sql("CALL run_compaction('cb', 'schedule', '128MB')")
    with pytest.raises(ValueError, match="positive integer"):
        eng.sql("CALL run_compaction('cb', 'schedule', '-5')")
    eng.sql("CALL run_compaction('cb', 'schedule', '1048576')")  # valid


def test_validate_legacy_unstamped_table_is_not_a_failure(spark, tmp_path):
    t = Table.create(
        spark,
        str(tmp_path / "v"),
        SCHEMA,
        TableConfig(record_key=["k"], precombine="v"),
    )
    t.insert(spark.createDataFrame([(1, "a", 1)], SCHEMA))
    t.upsert(spark.createDataFrame([(1, "b", 2)], SCHEMA))
    d = os.path.join(t.base, TIMELINE_DIR)
    for fn in os.listdir(d):
        if not fn.endswith(".json"):
            continue
        p = os.path.join(d, fn)
        with open(p) as f:
            doc = json.load(f)
        doc.pop("committed_at", None)
        with open(p, "w") as f:
            json.dump(doc, f, indent=1)
    rep = {r["check"]: r["status"] for r in Table(spark, t.base).validate().collect()}
    assert rep["timeline_completion_stamps"] == "legacy"
    # a MIXED history (some stamped, some not) is still an integrity fail
    Table(spark, t.base).upsert(spark.createDataFrame([(1, "c", 3)], SCHEMA))
    rep2 = {r["check"]: r["status"] for r in Table(spark, t.base).validate().collect()}
    assert rep2["timeline_completion_stamps"] == "fail"


def test_validate_archived_era_files_are_not_orphans(spark, tmp_path):
    """COW rewrites leave superseded base files on disk until clean; once
    their adding/removing instants archive, only the audit log references
    them — validate must not flag them."""
    t = Table.create(
        spark,
        str(tmp_path / "o"),
        SCHEMA,
        TableConfig(record_key=["k"], precombine="v"),
    )
    t.insert(spark.createDataFrame([(1, "a", 1)], SCHEMA))
    for b in range(24):  # each COW upsert rewrites, superseding the old file
        Table(spark, t.base).upsert(spark.createDataFrame([(1, f"w{b}", 1)], SCHEMA))
    assert Table(spark, t.base).archive_timeline(retain_instants=5) > 0
    rep = {r["check"]: (r["status"], r["detail"])
           for r in Table(spark, t.base).validate().collect()}
    assert rep["no_orphan_files"][0] == "ok", rep["no_orphan_files"]
    # a genuinely unreferenced parquet is still caught
    with open(os.path.join(t.base, "zzz_orphan.parquet"), "wb") as f:
        f.write(b"x")
    rep2 = {r["check"]: r["status"] for r in Table(spark, t.base).validate().collect()}
    assert rep2["no_orphan_files"] == "fail"


def test_archive_audit_keeps_completion_stamps(spark, tmp_path):
    t = Table.create(
        spark,
        str(tmp_path / "s"),
        SCHEMA,
        TableConfig(record_key=["k"], precombine="v"),
    )
    t.insert(spark.createDataFrame([(1, "a", 1)], SCHEMA))
    for b in range(24):
        Table(spark, t.base).upsert(spark.createDataFrame([(1, f"w{b}", 1)], SCHEMA))
    assert Table(spark, t.base).archive_timeline(retain_instants=5) > 0
    audit = Timeline(t.base).archived_audit()
    assert audit
    data = [i for i in audit if i.is_data_commit]
    assert data and all(i.committed_at is not None for i in data)
    # stamps are monotone with begin order here (single writer)
    stamps = [i.committed_at for i in data]
    assert stamps == sorted(stamps)
