"""Metric store: partitioned parquet materialization of compiled metrics.

The 'DataFrame writes to target' half of the north star: a compiled
metric frame lands as parquet partitioned by the year of its grain
bucket, so time-ranged reads prune whole partitions (the same layout
rule SCALE.md prescribes for 100 TB fact tables). Writes are idempotent
per (metric, grain) via dynamic partition overwrite.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TS_COL = "ts"


def write_metric(
    df: DataFrame,
    store_path: str,
    metric_name: str,
    grain: str,
) -> str:
    """Materialize one (metric, grain) frame under
    {store}/{metric}/{grain}/, partitioned by the grain bucket's year.
    Returns the target path."""
    target = os.path.join(store_path, metric_name, grain)
    out = df
    if TS_COL in df.columns:
        out = df.withColumn("__year", F.year(TS_COL))
        # dynamic overwrite: only the year partitions present in `out`
        # are replaced, so a partial recompute (e.g. just the open year)
        # cannot silently delete the rest of the history.  Set via
        # option() so it scopes to this write, not the whole session.
        (
            out.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("__year")
            .parquet(target)
        )
    else:
        out.write.mode("overwrite").parquet(target)
    return target


def read_metric(
    spark: SparkSession,
    store_path: str,
    metric_name: str,
    grain: str,
) -> DataFrame:
    """Read a materialized metric back; time-range filters on ts prune
    year partitions (filter on year(ts) is derived automatically by the
    caller passing ts bounds -- see read_metric_range)."""
    df = spark.read.parquet(os.path.join(store_path, metric_name, grain))
    return df.drop("__year") if "__year" in df.columns else df


def read_metric_range(
    spark: SparkSession,
    store_path: str,
    metric_name: str,
    grain: str,
    start: str,
    end: str,
) -> DataFrame:
    """Range read with explicit partition pruning: the year-partition
    predicate is derived from the ts bounds so the scan touches only the
    covered year directories."""
    df = spark.read.parquet(os.path.join(store_path, metric_name, grain))
    pruned = df.filter(
        (F.col("__year") >= F.year(F.lit(start).cast("date")))
        & (F.col("__year") <= F.year(F.lit(end).cast("date")))
    ).filter((F.col(TS_COL) >= F.lit(start)) & (F.col(TS_COL) <= F.lit(end)))
    return pruned.drop("__year")
