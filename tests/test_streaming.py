"""Structured Streaming metric evaluation: the stream must converge to
the batch metric answer over the same static data."""

from __future__ import annotations

import shutil

import pytest

from dbt_metrics_ingestion_script_spark.sources.tables import load_table
from dbt_metrics_ingestion_script_spark.streaming.metrics_stream import (
    read_events_stream,
    run_stream_to_memory,
    windowed_event_metrics,
)


@pytest.fixture(scope="module")
def events_dir(tmp_path_factory):
    # file-source streams read a directory; stage the events file alone
    d = tmp_path_factory.mktemp("events_stream")
    shutil.copy("/root/testdata/sf0.001/events.parquet", d / "events.parquet")
    return str(d)


def test_stream_converges_to_batch(spark, sf_dir, events_dir):
    batch = load_table(spark, sf_dir, "events")
    stream = read_events_stream(spark, events_dir)
    # nanos ts arrives as bigint in the staged copy; watermarks require
    # TIMESTAMP (not NTZ), so build one from epoch micros (session tz is
    # pinned to UTC by the session factory)
    from pyspark.sql import functions as F

    if dict(stream.dtypes).get("ts") == "bigint":
        stream = stream.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    result = windowed_event_metrics(stream, grain="day")
    run_stream_to_memory(result, "stream_daily")

    got = {
        (str(r["ts"]), r["event_type"]): (r["n_events"], round(r["total_value"], 4))
        for r in spark.sql("SELECT * FROM stream_daily").collect()
    }
    expected = {
        (str(r["ts"]), r["event_type"]): (r["n_events"], round(r["total_value"], 4))
        for r in batch.groupBy(
            F.date_trunc("day", "ts").alias("ts"), "event_type"
        )
        .agg(F.count("*").alias("n_events"), F.sum("value").alias("total_value"))
        .collect()
    }
    assert got == expected


def test_streaming_rejects_unknown_grain(spark, events_dir):
    stream = read_events_stream(spark, events_dir)
    with pytest.raises(ValueError, match="grain"):
        windowed_event_metrics(stream, grain="fortnight")
