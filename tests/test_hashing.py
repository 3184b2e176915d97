"""Pin the driver-side xxhash64 to Spark's JVM implementation, value by value."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from hudi_examples_spark.table.hashing import spark_xxhash64


def _spark_hash(spark, cols_exprs):
    return spark.range(1).select(F.xxhash64(*cols_exprs).alias("h")).collect()[0]["h"]


def test_longs_match_spark(spark):
    for v in [0, 1, -1, 42, 2**31, -(2**31) - 7, 2**62, -(2**63), 2**63 - 1]:
        got = spark_xxhash64([(v, "bigint")])
        want = _spark_hash(spark, [F.lit(v).cast("long")])
        assert got == want, v


def test_ints_shorts_bools_match_spark(spark):
    assert spark_xxhash64([(7, "int")]) == _spark_hash(spark, [F.lit(7).cast("int")])
    assert spark_xxhash64([(-3, "smallint")]) == _spark_hash(spark, [F.lit(-3).cast("smallint")])
    assert spark_xxhash64([(True, "boolean")]) == _spark_hash(spark, [F.lit(True)])
    assert spark_xxhash64([(False, "boolean")]) == _spark_hash(spark, [F.lit(False)])


def test_strings_match_spark_all_tail_lengths(spark):
    # cover every tail path: empty, <4, 4..7, 8..31, >=32 bytes, multibyte UTF-8
    cases = ["", "a", "abc", "abcd", "abcdefg", "abcdefgh", "k" * 31, "k" * 32, "k" * 57,
             "uuid-334e26e9-8355", "héllø wörld ✓" , "0-0001:2"]
    for s in cases:
        got = spark_xxhash64([(s, "string")])
        want = _spark_hash(spark, [F.lit(s)])
        assert got == want, repr(s)


def test_doubles_and_floats_match_spark(spark):
    for v in [0.0, -0.0, 1.5, -273.15, 1e300]:
        assert spark_xxhash64([(v, "double")]) == _spark_hash(spark, [F.lit(v).cast("double")]), v
        got_f = spark_xxhash64([(v if abs(v) < 1e30 else 0.0, "float")])
        want_f = _spark_hash(spark, [F.lit(v if abs(v) < 1e30 else 0.0).cast("float")])
        assert got_f == want_f, v


def test_date_matches_spark(spark):
    d = datetime.date(2026, 8, 13)
    assert spark_xxhash64([(d, "date")]) == _spark_hash(spark, [F.lit(d)])


def test_multi_column_seed_chaining_matches_spark(spark):
    got = spark_xxhash64([("rider-A", "string"), (99, "bigint"), ("sf", "string")])
    want = _spark_hash(spark, [F.lit("rider-A"), F.lit(99).cast("long"), F.lit("sf")])
    assert got == want


def test_null_skips_column_like_spark(spark):
    got = spark_xxhash64([("x", "string"), (None, "bigint"), ("y", "string")])
    want = _spark_hash(
        spark, [F.lit("x"), F.lit(None).cast("long"), F.lit("y")]
    )
    assert got == want
