"""Bucketed layout: a join of two tables bucketed on the key must plan
without any Exchange (the 100 TB co-located-join contract)."""

from __future__ import annotations

import pytest

from dbt_metrics_ingestion_script_spark.sources.bucketed import (
    read_table,
    write_bucketed,
)
from dbt_metrics_ingestion_script_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    write_bucketed(
        orders.withColumnRenamed("o_orderkey", "orderkey"),
        "b_orders", ["orderkey"], n_buckets=8,
    )
    write_bucketed(
        lineitem.withColumnRenamed("l_orderkey", "orderkey"),
        "b_lineitem", ["orderkey"], n_buckets=8,
    )
    yield "b_orders", "b_lineitem"
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    t_orders, t_lineitem = bucketed_tables
    # disable broadcast: at test scale the planner would rightly broadcast
    # the tiny side and ignore buckets; at 100 TB both sides are
    # unbroadcastable and the bucketed layout is what kills the shuffle
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = read_table(spark, t_orders).join(
            read_table(spark, t_lineitem), "orderkey"
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert joined.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_join_matches_plain_join(spark, sf_dir, bucketed_tables):
    t_orders, t_lineitem = bucketed_tables
    bucketed_n = (
        read_table(spark, t_orders)
        .join(read_table(spark, t_lineitem), "orderkey")
        .count()
    )
    plain_n = (
        load_table(spark, sf_dir, "orders")
        .withColumnRenamed("o_orderkey", "orderkey")
        .join(
            load_table(spark, sf_dir, "lineitem").withColumnRenamed(
                "l_orderkey", "orderkey"
            ),
            "orderkey",
        )
        .count()
    )
    assert bucketed_n == plain_n
