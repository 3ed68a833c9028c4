"""Metric store: partitioned materialization round-trips and prunes."""

from __future__ import annotations

from pyspark.sql import functions as F

from dbt_metrics_ingestion_script_spark.queries import TOTAL_REVENUE, _compiler
from dbt_metrics_ingestion_script_spark.sinks.metric_store import (
    read_metric,
    read_metric_range,
    write_metric,
)


def test_metric_store_round_trip(spark, sf_dir, tmp_path):
    df = _compiler(spark, sf_dir).compile(TOTAL_REVENUE, "month")
    store = str(tmp_path / "store")
    write_metric(df, store, "total_revenue", "month")
    back = read_metric(spark, store, "total_revenue", "month")
    assert sorted(back.columns) == sorted(df.columns)
    want = {(str(r["ts"]), r["o_custkey"]): round(r["total_revenue"], 4) for r in df.collect()}
    got = {(str(r["ts"]), r["o_custkey"]): round(r["total_revenue"], 4) for r in back.collect()}
    assert got == want


def test_metric_store_range_read_prunes_partitions(spark, sf_dir, tmp_path):
    df = _compiler(spark, sf_dir).compile(TOTAL_REVENUE, "month")
    store = str(tmp_path / "store")
    target = write_metric(df, store, "total_revenue", "month")
    ranged = read_metric_range(
        spark, store, "total_revenue", "month", "1995-01-01", "1995-12-31"
    )
    rows = ranged.collect()
    assert rows and all(str(r["ts"]).startswith("1995") for r in rows)
    # partition pruning: only the 1995 year directory is scanned
    files = {
        r["__f"]
        for r in ranged.withColumn("__f", F.input_file_name())
        .select("__f")
        .distinct()
        .collect()
    }
    assert files and all("__year=1995" in f for f in files), files
    assert target.endswith("total_revenue/month")
