"""Source-format coverage beyond the parity harness: ORC declared-schema
reads and the environment-blocked Avro gate."""

from __future__ import annotations

import pytest

from hudi_examples_spark.sources.readers import read_avro, read_orc
from tests.conftest import SF_SMALL


def test_orc_declared_schema_roundtrip(spark, tmp_path):
    df = spark.createDataFrame([(1, "a", 1.5), (2, "b", -2.0)], "k INT, s STRING, v DOUBLE")
    df.write.orc(str(tmp_path / "o"))
    got = read_orc(spark, str(tmp_path / "o"), "k INT, s STRING, v DOUBLE")
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, df.collect()))


def test_avro_raises_clear_environment_error(spark, tmp_path):
    with pytest.raises(ImportError, match="spark-avro"):
        read_avro(spark, str(tmp_path / "nope"))
