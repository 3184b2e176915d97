"""Incremental rollup maintenance: after every refresh the rollup table must
equal the batch aggregate of the current source snapshot — through inserts,
updates (retraction + re-add), deletes, and group disappearance."""

from __future__ import annotations

from hudi_examples_spark.streaming.rollup import IncrementalRollup, rollup_matches_source
from hudi_examples_spark.table import Table, TableConfig

SCHEMA = "ts BIGINT, uuid STRING, fare DOUBLE, city STRING"


def make_src(spark, tmp_path):
    return Table.create(
        spark,
        str(tmp_path / "src"),
        SCHEMA,
        TableConfig(record_key=["uuid"], precombine="ts", partition_by=["city"]),
    )


def df(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def assert_consistent(rollup):
    got = sorted(map(tuple, rollup.dst.read().collect()))
    want = sorted(map(tuple, rollup_matches_source(rollup).collect()))
    assert got == want, f"rollup={got}\nbatch={want}"


def test_rollup_tracks_source_through_dml(spark, tmp_path):
    src = make_src(spark, tmp_path)
    roll = IncrementalRollup(src, str(tmp_path / "agg"), ["city"], ["fare"])

    src.insert(df(spark, [(1, "a", 10.0, "sf"), (1, "b", 20.0, "sf"), (1, "c", 5.0, "la")]))
    assert roll.refresh() is True
    assert_consistent(roll)

    # update moves value AND partition (retraction from sf, add to la)
    src.upsert(df(spark, [(2, "a", 50.0, "la"), (2, "d", 7.0, "ny")]))
    assert roll.refresh() is True
    assert_consistent(roll)

    # delete the only ny row: its group must vanish from the rollup
    src.delete(spark.createDataFrame([("d",)], "uuid STRING"))
    assert roll.refresh() is True
    assert_consistent(roll)
    assert roll.dst.read().filter("city = 'ny'").count() == 0

    # idempotent when nothing changed
    assert roll.refresh() is False
    assert_consistent(roll)


def test_rollup_multi_sum_cols(spark, tmp_path):
    src = Table.create(
        spark,
        str(tmp_path / "s2"),
        "ts BIGINT, uuid STRING, fare DOUBLE, tip DOUBLE, city STRING",
        TableConfig(record_key=["uuid"], precombine="ts"),
    )
    src.insert(
        spark.createDataFrame(
            [(1, "a", 10.0, 1.0, "sf"), (1, "b", 20.0, 2.0, "sf")],
            "ts BIGINT, uuid STRING, fare DOUBLE, tip DOUBLE, city STRING",
        )
    )
    roll = IncrementalRollup(src, str(tmp_path / "agg2"), ["city"], ["fare", "tip"])
    roll.refresh()
    row = roll.dst.read().collect()[0]
    assert (row["sum_fare"], row["sum_tip"], row["n_rows"]) == (30.0, 3.0, 2)


def _forge_legacy_offset_meta(dst, legacy_meta):
    """Rewrite the newest data commit's metadata on ``dst`` to the
    PRE-migration shape (begin-id offsets, no completion-stamp key) —
    simulating a view table written by the round-8 consumer code."""
    import json
    import os

    tl_dir = dst.timeline.dir
    newest = sorted(
        fn for fn in os.listdir(tl_dir)
        if fn.endswith(".json")
        and fn.split(".")[1] in ("commit", "deltacommit", "replacecommit")
    )[-1]
    p = os.path.join(tl_dir, newest)
    d = json.load(open(p))
    for k in ("src_offset_ct", "src_offsets_ct"):
        d["meta"].pop(k, None)
    d["meta"].update(legacy_meta)
    json.dump(d, open(p, "w"))


def test_legacy_begin_id_offset_migrates_or_fails_loudly(spark, tmp_path):
    """ADVICE r9 #3: a dst written before the completion-cursor migration
    carries begin-id ``src_offset``; recovery must map it to that source
    instant's completion stamp (resuming exactly where the legacy consumer
    stopped) — or raise when the instant is unresolvable. It must NEVER
    silently restart from 0.0 and re-fold all history onto existing
    aggregates (double counting)."""
    import pytest

    src = make_src(spark, tmp_path)
    roll = IncrementalRollup(src, str(tmp_path / "agg"), ["city"], ["fare"])
    src.insert(df(spark, [(1, "a", 10.0, "sf"), (1, "b", 20.0, "sf")]))
    assert roll.refresh() is True
    consumed_begin_id = src.latest_instant()
    _forge_legacy_offset_meta(roll.dst, {"src_offset": consumed_begin_id})

    roll2 = IncrementalRollup(src, str(tmp_path / "agg"), ["city"], ["fare"])
    # begin-id mapped to the SAME completion stamp the new protocol stores
    assert roll2._offset == roll._offset > 0.0
    assert roll2.refresh() is False  # nothing new — and no double-fold
    assert_consistent(roll2)
    src.upsert(df(spark, [(2, "a", 50.0, "sf")]))
    assert roll2.refresh() is True
    assert_consistent(roll2)

    # unresolvable legacy cursor (instant gone / foreign timeline): loud stop
    _forge_legacy_offset_meta(roll2.dst, {"src_offset": "19990101000000000000"})
    with pytest.raises(ValueError, match="cannot migrate"):
        IncrementalRollup(src, str(tmp_path / "agg"), ["city"], ["fare"])


def test_rollup_restart_resumes_from_durable_offset(spark, tmp_path):
    """A rebuilt rollup (process restart) must NOT re-apply already-folded
    history: the consumed source offset rides in dst's commit metadata."""
    src = make_src(spark, tmp_path)
    roll = IncrementalRollup(src, str(tmp_path / "agg"), ["city"], ["fare"])
    src.insert(df(spark, [(1, "a", 10.0, "sf"), (1, "b", 20.0, "sf")]))
    assert roll.refresh() is True
    assert_consistent(roll)

    # simulate a crash: new instance over the same warehouse paths
    roll2 = IncrementalRollup(src, str(tmp_path / "agg"), ["city"], ["fare"])
    assert roll2._offset == roll._offset
    # nothing new: refresh is a no-op, aggregates unchanged (no double-fold)
    assert roll2.refresh() is False
    assert_consistent(roll2)

    # new source commits fold exactly once after the restart
    src.upsert(df(spark, [(2, "a", 50.0, "sf"), (2, "z", 7.0, "la")]))
    assert roll2.refresh() is True
    assert_consistent(roll2)
