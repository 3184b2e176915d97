"""DeltaStreamer-style ingestion loop + Avro schema provider."""

from __future__ import annotations

import json

import pytest

from hudi_examples_spark.streaming.ingestion import DeltaStreamer, schema_from_avsc
from tests.test_table_cow import make_table, trips_df

AVSC = {
    "type": "record",
    "name": "trip",
    "fields": [
        {"name": "ts", "type": "long"},
        {"name": "uuid", "type": "string"},
        {"name": "rider", "type": ["null", "string"]},
        {"name": "driver", "type": ["null", "string"]},
        {"name": "fare", "type": "double"},
        {"name": "city", "type": "string"},
    ],
}


def test_schema_from_avsc(tmp_path):
    p = tmp_path / "trip.avsc"
    p.write_text(json.dumps(AVSC))
    schema = schema_from_avsc(str(p))
    assert [f.name for f in schema.fields] == ["ts", "uuid", "rider", "driver", "fare", "city"]
    assert schema["rider"].nullable and not schema["ts"].nullable
    assert schema["fare"].dataType.simpleString() == "double"


def test_deltastreamer_continuous_with_services(spark, tmp_path):
    p = tmp_path / "trip.avsc"
    p.write_text(json.dumps(AVSC))
    tbl = make_table(spark, tmp_path, table_type="mor")

    batches = [
        trips_df(spark),
        trips_df(spark, [(9999999999999, "334e26e9", "rider-A", "driver-K", 71.0, "san_francisco")]),
        None,  # empty poll
        trips_df(spark, [(9999999999999, "zz-1", "rider-Z", "driver-Z", 5.0, "chennai")]),
    ]
    it = iter(batches)
    streamer = DeltaStreamer(
        tbl,
        source=lambda: next(it, None),
        schema=schema_from_avsc(str(p)),
        compact_every=2,
        clean_retain=10,
    )
    n = streamer.run_continuous(max_batches=4)
    assert n == 3
    assert tbl.count() == 9
    assert tbl.read().filter("uuid='334e26e9'").collect()[0]["fare"] == 71.0
    actions = [i.action for i in tbl.timeline.completed_data_instants()]
    assert "replacecommit" in actions  # inline compaction fired


def test_deltastreamer_validator_aborts(spark, tmp_path):
    tbl = make_table(spark, tmp_path)

    def validator(df):
        if df.filter("fare < 0").count() > 0:
            raise ValueError("negative fares rejected")

    bad = trips_df(spark, [(1, "bad", "r", "d", -5.0, "chennai")])
    it = iter([bad])
    streamer = DeltaStreamer(tbl, source=lambda: next(it, None), validator=validator)
    with pytest.raises(ValueError):
        streamer.run_once()
    assert tbl.count() == 0  # nothing committed
