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

# Reset grains whose date_trunc windows always lie inside one calendar
# year -- the precondition for per-year incremental refresh of
# cumulative metrics.  'week' is excluded: a Monday-start week can
# straddle Dec 31 / Jan 1.  'hour' nests like 'day' does (ADVICE r4:
# date_trunc('hour', ts) never changes the year).
_YEAR_NESTED_RESET_GRAINS = {"year", "quarter", "month", "day", "hour"}


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


def refresh_metric_incremental(
    resolver,
    spec,
    grain: str,
    new_facts: DataFrame,
    store_path: str,
) -> list[int]:
    """Incremental refresh: recompute ONLY the year partitions whose
    grain buckets are touched by `new_facts`, and dynamic-overwrite just
    those under {store}/{metric}/{grain}/.

    The affected unit is the YEAR OF THE GRAIN BUCKET, not of the raw
    event: an early-January fact can land in a week bucket dated the
    previous December, and the store partitions on year(bucket), so the
    bucket year is what must be recomputed.  Recomputation reads the
    FULL fact table filtered to those bucket-years (aggregates are not
    incrementally mergeable in general -- avg/count_distinct can't be
    updated from deltas -- so affected buckets recompute from base;
    with facts laid out per SCALE.md the year filter prunes partitions,
    bounding the rescan to the touched years, typically just the open
    one).  Untouched year partitions are never rewritten (dynamic
    overwrite), so history stays intact.

    Works for any spec the compiler handles whose inputs share the
    spec's timestamp (simple / ratio / cumulative with a year-nested
    reset -- the reset partition then lies inside the refresh unit, so
    resets stay self-contained).  Cumulative specs whose reset windows
    do NOT nest within a calendar year are rejected (ADVICE r2 a): an
    unbounded running total (reset_grain=None) recomputed from one
    year's facts silently loses all prior-year accumulation, and a week
    reset straddles Dec/Jan so the straddled window would recompute
    from partial facts.  Returns the recomputed bucket-years.
    """
    from ..plans.compiler import MetricCompiler, grain_column

    if getattr(spec, "metric_type", None) == "cumulative":
        rg = getattr(spec, "reset_grain", None)
        if rg not in _YEAR_NESTED_RESET_GRAINS:
            raise ValueError(
                f"cumulative metric {spec.name!r}: incremental refresh "
                f"recomputes whole year(bucket) partitions, which is only "
                f"sound when every reset window nests inside one calendar "
                f"year; reset_grain={rg!r} does not "
                f"({sorted(_YEAR_NESTED_RESET_GRAINS)} do). Unbounded or "
                f"week-reset running totals need a full recompute "
                f"(write_metric over the complete fact table) instead."
            )

    bucket_year = F.year(grain_column(spec.timestamp, grain))
    years = sorted(
        r["y"]
        for r in new_facts.select(bucket_year.alias("y")).distinct().collect()
        if r["y"] is not None
    )
    if not years:
        return []
    comp = MetricCompiler(
        lambda model: resolver(model).where(bucket_year.isin(years))
    )
    write_metric(comp.compile(spec, grain), store_path, spec.name, grain)
    return years
