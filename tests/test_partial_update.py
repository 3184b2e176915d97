"""MOR partial updates (Hudi 1.0 partial update payloads).

A partial-update commit logs ONLY the provided columns; the merged read
resolves each data column to the newest version that SET it. The tests pin
the contract: untouched columns survive, stacked partials compose, an
explicitly-provided null IS a set (the META_PARTIAL list disambiguates it
from "absent"), precombine ordering still governs, partials can't create or
resurrect keys, and compaction resolves everything back to full rows (after
which the cheap row-level merge path re-engages).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hudi_examples_spark.table import Table, TableConfig
from hudi_examples_spark.table.core import META_PARTIAL

SCHEMA = "id STRING, a STRING, b BIGINT, c DOUBLE, ts BIGINT"


def _full(spark, n=20, ts=1):
    rows = [(f"k{i:03d}", f"a{i}", i, float(i), ts) for i in range(n)]
    return spark.createDataFrame(rows, SCHEMA)


@pytest.fixture()
def mor(spark, tmp_path):
    tbl = Table.create(
        spark,
        str(tmp_path / "t"),
        SCHEMA,
        TableConfig(record_key=["id"], precombine="ts", table_type="mor"),
    )
    tbl.insert(_full(spark))
    return tbl


def _row(tbl, key):
    return tbl.read().filter(F.col("id") == key).first()


def test_partial_updates_only_provided_columns(spark, mor):
    mor.update_partial(
        spark.createDataFrame([("k003", 999, 2)], "id STRING, b BIGINT, ts BIGINT")
    )
    r = _row(mor, "k003")
    assert r["b"] == 999 and r["ts"] == 2
    assert r["a"] == "a3" and r["c"] == 3.0  # untouched columns survive
    assert mor.read().count() == 20


def test_stacked_partials_compose(spark, mor):
    mor.update_partial(
        spark.createDataFrame([("k005", 111, 2)], "id STRING, b BIGINT, ts BIGINT")
    )
    mor.update_partial(
        spark.createDataFrame([("k005", 9.5, 3)], "id STRING, c DOUBLE, ts BIGINT")
    )
    r = _row(mor, "k005")
    assert (r["a"], r["b"], r["c"], r["ts"]) == ("a5", 111, 9.5, 3)


def test_provided_null_is_a_set(spark, mor):
    mor.update_partial(
        spark.createDataFrame([("k007", None, 2)], "id STRING, a STRING, ts BIGINT")
    )
    r = _row(mor, "k007")
    assert r["a"] is None  # explicitly set to null
    assert r["b"] == 7  # absent column untouched


def test_stale_partial_loses_by_precombine(spark, mor):
    mor.upsert(_full(spark, ts=5))  # bump every row to ts=5
    mor.update_partial(
        spark.createDataFrame([("k001", 42, 2)], "id STRING, b BIGINT, ts BIGINT")
    )
    assert _row(mor, "k001")["b"] == 1  # ts=2 < 5: stale partial must lose


def test_partial_cannot_create_or_resurrect(spark, mor):
    mor.update_partial(
        spark.createDataFrame([("zzz", 1, 9)], "id STRING, b BIGINT, ts BIGINT")
    )
    assert mor.read().filter("id = 'zzz'").count() == 0  # no base row to patch
    mor.delete(spark.createDataFrame([("k004",)], "id STRING"))
    mor.update_partial(
        spark.createDataFrame([("k004", 5, 9)], "id STRING, b BIGINT, ts BIGINT")
    )
    assert mor.read().filter("id = 'k004'").count() == 0  # tombstone wins


def test_compaction_resolves_partials(spark, mor):
    mor.update_partial(
        spark.createDataFrame([("k009", 777, 2)], "id STRING, b BIGINT, ts BIGINT")
    )
    before = sorted(map(tuple, mor.read().collect()))
    mor.compact()
    assert sorted(map(tuple, mor.read().collect())) == before
    files, _ = mor.timeline.live_files()
    assert not mor._partial_in(files)  # flag drops: row-level path re-engages
    assert _row(mor, "k009")["b"] == 777


def test_full_tables_never_see_partial_column(spark, mor):
    mor.upsert(_full(spark, ts=2))
    files, _ = mor.timeline.live_files()
    assert not mor._partial_in(files)
    merged = mor._merge_mor_pruned(
        [r for r, (_, a) in files.items() if a != "deltacommit"],
        [r for r, (_, a) in files.items() if a == "deltacommit"],
    )
    assert META_PARTIAL not in merged.columns


def test_partial_requires_mor_key_and_precombine(spark, tmp_path):
    cow = Table.create(
        spark, str(tmp_path / "cow"), SCHEMA, TableConfig(record_key=["id"], precombine="ts")
    )
    with pytest.raises(ValueError):
        cow.update_partial(spark.createDataFrame([("k", 1, 1)], "id STRING, b BIGINT, ts BIGINT"))
    mor = Table.create(
        spark,
        str(tmp_path / "m"),
        SCHEMA,
        TableConfig(record_key=["id"], precombine="ts", table_type="mor"),
    )
    with pytest.raises(ValueError):
        mor.update_partial(spark.createDataFrame([("k", 1)], "id STRING, b BIGINT"))  # no ts


def test_partial_maintains_indexes_correctly(spark, mor):
    """Index completeness under partials: a plain index on the PROVIDED column
    gets the new mapping; an index on an ABSENT column stays complete without
    appends (values unchanged); a mixed-reference expression index is
    rejected up front rather than silently going stale."""
    mor.create_secondary_index("a")  # absent in the partial below
    mor.create_secondary_index("b")  # provided
    mor.update_partial(
        spark.createDataFrame([("k002", 555, 2)], "id STRING, b BIGINT, ts BIGINT")
    )
    got = mor.lookup("b", 555)
    assert [r["id"] for r in got.collect()] == ["k002"]
    assert _row(mor, "k002")["a"] == "a2"
    assert [r["id"] for r in mor.lookup("a", "a2").collect()] == ["k002"]
    mor.create_expression_index("mix", "concat(a, cast(b as string))")
    with pytest.raises(ValueError, match="mixes provided and absent"):
        mor.update_partial(
            spark.createDataFrame([("k002", 556, 3)], "id STRING, b BIGINT, ts BIGINT")
        )
    # providing every referenced column makes the same batch acceptable
    mor.update_partial(
        spark.createDataFrame(
            [("k002", "az", 556, 3)], "id STRING, a STRING, b BIGINT, ts BIGINT"
        )
    )
    assert [r["id"] for r in mor.lookup_indexed("mix", "az556").collect()] == ["k002"]


def test_incremental_and_cdc_resolve_partials(spark, mor):
    """Changes queries are built on MERGED snapshots, so a partial commit's
    rows come out fully resolved — never with nulls for absent columns."""
    t0 = mor.latest_instant()
    mor.update_partial(
        spark.createDataFrame([("k006", 606, 2)], "id STRING, b BIGINT, ts BIGINT")
    )
    inc = mor.table_changes(start=t0).collect()
    assert len(inc) == 1
    r = inc[0]
    assert (r["id"], r["a"], r["b"], r["c"], r["ts"]) == ("k006", "a6", 606, 6.0, 2)
    cdc = mor.table_changes_cdc(start=t0).collect()
    assert len(cdc) == 1
    assert cdc[0]["op"] == "U"
    assert cdc[0]["after"]["a"] == "a6" and cdc[0]["after"]["b"] == 606
    assert cdc[0]["before"]["b"] == 6
