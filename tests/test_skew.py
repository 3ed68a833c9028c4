"""Salted two-phase aggregation must equal the direct groupBy for every
mergeable measure, including on pathologically skewed keys."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dbt_metrics_ingestion_script_spark.operators.skew import salted_agg
from dbt_metrics_ingestion_script_spark.sources.tables import load_table


def test_salted_agg_matches_direct(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    direct = {
        (r["event_type"],): (r["n"], round(r["s"], 6), r["mn"], r["mx"])
        for r in ev.groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum("value").alias("s"),
            F.min("value").alias("mn"),
            F.max("value").alias("mx"),
        )
        .collect()
    }
    salted = {
        (r["event_type"],): (r["n"], round(r["s"], 6), r["mn"], r["mx"])
        for r in salted_agg(
            ev,
            ["event_type"],
            {
                "n": ("count", "1"),
                "s": ("sum", "value"),
                "mn": ("min", "value"),
                "mx": ("max", "value"),
            },
            salt=8,
        ).collect()
    }
    assert salted == direct


def test_salted_avg_on_single_hot_key(spark):
    # one key owns 99% of rows -- the shape salting exists for
    rows = [("hot", float(i)) for i in range(990)] + [
        ("cold", float(i)) for i in range(10)
    ]
    df = spark.createDataFrame(rows, "k string, v double")
    got = {
        r["k"]: round(r["avg_v"], 9)
        for r in salted_agg(df, ["k"], {"avg_v": ("avg", "v")}, salt=4).collect()
    }
    assert got == {"hot": round(sum(range(990)) / 990, 9), "cold": 4.5}


def test_salted_approx_distinct_merges_sketches(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    exact = ev.select("event_id").distinct().count()
    got = salted_agg(
        ev.withColumn("g", F.lit(1)),
        ["g"],
        {"n_ids": ("count_distinct_approx", "event_id")},
        salt=8,
    ).collect()[0]["n_ids"]
    assert abs(got - exact) / exact < 0.05


def test_salted_rejects_exact_distinct_without_value_salt(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    with pytest.raises(ValueError, match="salt_on"):
        salted_agg(ev, ["event_type"], {"d": ("count_distinct", "event_id")})


def test_salted_rejects_exact_distinct_on_wrong_salt_column(spark, sf_dir):
    """ADVICE r2 c: salting exact count_distinct on anything other than
    the distinct expression spreads one value across buckets and
    double-counts; the operator must reject it, not compute wrong."""
    ev = load_table(spark, sf_dir, "events")
    with pytest.raises(ValueError, match="distinct value space"):
        salted_agg(
            ev,
            ["event_type"],
            {"d": ("count_distinct", "event_id")},
            salt=8,
            salt_on="user_id",  # would double-count event_ids across buckets
        )


def test_salted_exact_distinct_with_value_salt(spark, sf_dir):
    """Salting on the distinct column partitions the value space, so the
    per-bucket exact distinct counts sum exactly."""
    ev = load_table(spark, sf_dir, "events")
    direct = {
        r["event_type"]: r["d"]
        for r in ev.groupBy("event_type")
        .agg(F.count_distinct("event_id").alias("d"))
        .collect()
    }
    salted = {
        r["event_type"]: r["d"]
        for r in salted_agg(
            ev,
            ["event_type"],
            {"d": ("count_distinct", "event_id")},
            salt=8,
            salt_on="event_id",
        ).collect()
    }
    assert salted == direct


def test_skew_demo_salted_matches_unsalted(spark, sf_dir):
    """The bench skew demo's two paths must agree (the bench compares
    their wall-time; this pins their answers)."""
    from dbt_metrics_ingestion_script_spark.queries_ext import (
        skew_demo_salted,
        skew_demo_unsalted,
    )

    a = {(r["k"], r["n_distinct"]) for r in skew_demo_unsalted(spark, sf_dir).collect()}
    b = {(r["k"], r["n_distinct"]) for r in skew_demo_salted(spark, sf_dir).collect()}
    assert a == b


def test_salted_join_equals_plain_join(spark, sf_dir):
    """The salt must never change the join result: inner and left
    flavors equal the plain join on the fixture; invalid how and name
    collisions raise; the physical plan carries a ShuffledHashJoin on
    (keys + salt), never a broadcast."""
    import pytest
    from pyspark.sql import functions as F

    from dbt_metrics_ingestion_script_spark.operators.skew import salted_join
    from dbt_metrics_ingestion_script_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id")
    co = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.col("o_custkey").alias("user_id"))
        .agg(F.count("*").alias("n_orders"))
    )
    for how in ("inner", "left"):
        salted = sorted(
            tuple(r)
            for r in salted_join(
                ev, co, on=["user_id"], salt_key="event_id", n_salts=8, how=how
            ).select("event_id", "user_id", "n_orders").collect()
        )
        plain = sorted(
            tuple(r) for r in ev.join(co, "user_id", how)
            .select("event_id", "user_id", "n_orders").collect()
        )
        assert salted == plain, how
    with pytest.raises(ValueError, match="inner"):
        salted_join(ev, co, on=["user_id"], salt_key="event_id", how="right")
    with pytest.raises(ValueError, match="__salt"):
        salted_join(
            ev.withColumn("__salt", F.lit(1)), co,
            on=["user_id"], salt_key="event_id",
        )
    df = salted_join(ev, co, on=["user_id"], salt_key="event_id", n_salts=8)
    jmode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "simple"
    )
    plan = df._jdf.queryExecution().explainString(jmode)
    assert "ShuffledHashJoin [user_id" in plan, plan
    assert "__salt" in plan.split("ShuffledHashJoin", 1)[1].split("\n")[0]
    assert "BroadcastHashJoin" not in plan


def test_bloom_pruned_join_equals_plain_join(spark, sf_dir):
    """The bloom prefilter must be invisible: identical rows to the
    plain inner join, including under a deliberately tiny filter
    (m_bits=64 -> heavy false positives, all removed by the exact
    join)."""
    from pyspark.sql import functions as F

    from dbt_metrics_ingestion_script_spark.operators.skew import (
        bloom_pruned_join,
    )
    from dbt_metrics_ingestion_script_spark.sources.tables import load_table

    orders = (
        load_table(spark, sf_dir, "orders")
        .where(F.col("o_totalprice") > 400_000.0)
        .select(F.col("o_orderkey").alias("l_orderkey"), "o_totalprice")
    )
    fact = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_extendedprice"
    )
    plain = fact.join(orders, "l_orderkey")
    for m_bits in (64, 1 << 16):
        pruned = bloom_pruned_join(fact, orders, "l_orderkey", m_bits=m_bits)
        a = {tuple(r) for r in pruned.collect()}
        b = {tuple(r) for r in plain.collect()}
        assert a == b and len(a) > 0


def test_bloom_prefilter_is_shuffle_free(spark, sf_dir):
    """The k semi-join probes must run as broadcast joins with no
    exchange on the fact side before the final join."""
    from pyspark.sql import functions as F

    from dbt_metrics_ingestion_script_spark.operators.skew import (
        bloom_pruned_join,
    )
    from dbt_metrics_ingestion_script_spark.sources.tables import load_table

    orders = (
        load_table(spark, sf_dir, "orders")
        .where(F.col("o_totalprice") > 400_000.0)
        .select(F.col("o_orderkey").alias("l_orderkey"), "o_orderdate")
    )
    fact = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice"
    )
    plan = (
        bloom_pruned_join(fact, orders, "l_orderkey")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("BroadcastHashJoin") >= 2  # k probes + final join
    semi = [l for l in plan.splitlines() if "LeftSemi" in l]
    assert len(semi) >= 2
