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


def test_incremental_refresh_touches_only_affected_years(spark, sf_dir, tmp_path):
    """Refresh with new facts from one year must (a) make the touched
    partitions equal a full recompute and (b) leave every other year
    partition byte-for-byte alone -- proven by tampering an old year and
    seeing the tamper survive."""
    from dbt_metrics_ingestion_script_spark.sinks.metric_store import (
        refresh_metric_incremental,
    )
    from dbt_metrics_ingestion_script_spark.sources.tables import load_table

    store = str(tmp_path / "store")
    resolver = lambda model: load_table(spark, sf_dir, model)  # noqa: E731
    full = _compiler(spark, sf_dir).compile(TOTAL_REVENUE, "month")
    years = sorted(r["y"] for r in full.select(F.year("ts").alias("y")).distinct().collect())
    assert len(years) >= 3, "fixture needs a multi-year fact table"
    hot = years[-1]

    # initial store: everything except the hot year, plus a TAMPERED row
    # for the oldest year so untouched-partition preservation is provable
    initial = full.where(F.year("ts") != hot)
    tampered = initial.withColumn(
        "total_revenue",
        F.when(F.year("ts") == years[0], F.lit(-1.0)).otherwise(F.col("total_revenue")),
    )
    write_metric(tampered, store, "total_revenue", "month")

    new_facts = resolver("orders").where(F.year("o_orderdate") == hot)
    touched = refresh_metric_incremental(
        resolver, TOTAL_REVENUE, "month", new_facts, store
    )
    assert touched == [hot]

    back = read_metric(spark, store, "total_revenue", "month")
    got_hot = {
        (str(r["ts"]), r["o_custkey"]): round(r["total_revenue"], 4)
        for r in back.where(F.year("ts") == hot).collect()
    }
    want_hot = {
        (str(r["ts"]), r["o_custkey"]): round(r["total_revenue"], 4)
        for r in full.where(F.year("ts") == hot).collect()
    }
    assert got_hot == want_hot  # touched year equals full recompute
    # oldest year kept the tamper: its partition was not rewritten
    assert all(
        r["total_revenue"] == -1.0
        for r in back.where(F.year("ts") == years[0]).collect()
    )


def test_incremental_refresh_empty_delta_is_noop(spark, sf_dir, tmp_path):
    from dbt_metrics_ingestion_script_spark.sinks.metric_store import (
        refresh_metric_incremental,
    )
    from dbt_metrics_ingestion_script_spark.sources.tables import load_table

    resolver = lambda model: load_table(spark, sf_dir, model)  # noqa: E731
    empty = resolver("orders").where(F.lit(False))
    assert refresh_metric_incremental(
        resolver, TOTAL_REVENUE, "month", empty, str(tmp_path / "s")
    ) == []


def test_incremental_refresh_rejects_non_year_nested_cumulative(
    spark, sf_dir, tmp_path
):
    """ADVICE r2 a: per-year refresh of a cumulative metric is only sound
    when every reset window nests inside one calendar year.  An unbounded
    running total (reset_grain=None) or a week reset (straddles Dec/Jan)
    must raise instead of silently dropping prior accumulation."""
    import dataclasses

    import pytest

    from dbt_metrics_ingestion_script_spark.queries import CUMULATIVE_REVENUE
    from dbt_metrics_ingestion_script_spark.sinks.metric_store import (
        refresh_metric_incremental,
    )
    from dbt_metrics_ingestion_script_spark.sources.tables import load_table

    resolver = lambda model: load_table(spark, sf_dir, model)  # noqa: E731
    delta = resolver("orders").limit(1)
    for bad_reset in (None, "week"):
        spec = dataclasses.replace(CUMULATIVE_REVENUE, reset_grain=bad_reset)
        with pytest.raises(ValueError, match="reset"):
            refresh_metric_incremental(
                resolver, spec, "month", delta, str(tmp_path / "s")
            )
    # ADVICE r4 a: 'hour' nests inside a calendar year exactly like
    # 'day', so an hour-reset cumulative must NOT be rejected
    spec = dataclasses.replace(CUMULATIVE_REVENUE, reset_grain="hour")
    touched = refresh_metric_incremental(
        resolver, spec, "day", delta, str(tmp_path / "hr")
    )
    assert len(touched) == 1


def test_incremental_refresh_year_reset_cumulative_is_allowed(
    spark, sf_dir, tmp_path
):
    """The guard must NOT reject the sound case: a year-reset cumulative
    refresh recomputes self-contained partitions and matches the full
    recompute on the touched year."""
    from dbt_metrics_ingestion_script_spark.queries import CUMULATIVE_REVENUE
    from dbt_metrics_ingestion_script_spark.sinks.metric_store import (
        refresh_metric_incremental,
    )
    from dbt_metrics_ingestion_script_spark.sources.tables import load_table

    store = str(tmp_path / "store")
    resolver = lambda model: load_table(spark, sf_dir, model)  # noqa: E731
    full = _compiler(spark, sf_dir).compile(CUMULATIVE_REVENUE, "month")
    hot = max(
        r["y"] for r in full.select(F.year("ts").alias("y")).distinct().collect()
    )
    delta = resolver("orders").where(F.year("o_orderdate") == hot)
    touched = refresh_metric_incremental(
        resolver, CUMULATIVE_REVENUE, "month", delta, store
    )
    assert touched == [hot]
    back = read_metric(spark, store, "cumulative_revenue", "month")
    got = {
        str(r["ts"]): round(r["cumulative_revenue"], 4)
        for r in back.where(F.year("ts") == hot).collect()
    }
    want = {
        str(r["ts"]): round(r["cumulative_revenue"], 4)
        for r in full.where(F.year("ts") == hot).collect()
    }
    assert got == want


def test_incremental_refresh_week_grain_straddles_new_year(spark, sf_dir, tmp_path):
    """A January fact whose WEEK bucket is dated the prior December must
    refresh the PRIOR year partition (the store partitions on
    year(bucket), not year(event))."""
    from dbt_metrics_ingestion_script_spark.sinks.metric_store import (
        refresh_metric_incremental,
    )
    from dbt_metrics_ingestion_script_spark.sources.tables import load_table

    resolver = lambda model: load_table(spark, sf_dir, model)  # noqa: E731
    # 1997-01-01 is a Wednesday: its Monday-start week bucket is 1996-12-30
    delta = resolver("orders").where(
        F.col("o_orderdate").between("1997-01-01", "1997-01-05")
    )
    assert delta.count() > 0, "fixture has no facts in the straddling week"
    touched = refresh_metric_incremental(
        resolver, TOTAL_REVENUE, "week", delta, str(tmp_path / "store")
    )
    assert 1996 in touched, touched
