"""End-to-end integration queries: dbt manifest records compiled and
EXECUTED over physical tables.

This is the full lifecycle the engine exists for -- the reference
catalogs these metric definitions
(/root/reference/test_manifest.json:252-407); here the same records run:
manifest JSON -> typed metrics frame -> MetricSpec (tolerant extraction)
-> compiled Spark plan over the warehouse table. The fixture's
`fct_orders` model maps onto the driver's `orders` parquet with the
manifest's column names (FIXTURES.md §2 mapping: order_total ->
o_totalprice, order_date -> o_orderdate, customer_id -> o_custkey,
order_id -> o_orderkey).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .plans.manifest_bridge import manifest_compiler
from .queries_layer_a import FIXTURE
from .registry import register, round_cols
from .sources.tables import load_table


def _resolve_fixture_model(spark: SparkSession, sf_dir: str):
    """Map every fixture model/source id onto the driver's orders table,
    renamed to the manifest's column vocabulary."""

    def resolver(model: str) -> DataFrame:
        orders = load_table(spark, sf_dir, "orders")
        return (
            orders.withColumnRenamed("o_orderkey", "order_id")
            .withColumnRenamed("o_custkey", "customer_id")
            .withColumnRenamed("o_totalprice", "order_total")
            .withColumnRenamed("o_orderdate", "order_date")
        )

    return resolver


def _compile(spark, sf_dir, metric_name, grain):
    comp = manifest_compiler(spark, FIXTURE, _resolve_fixture_model(spark, sf_dir))
    return comp.compile(comp.registry[metric_name], grain)


@register(
    "manifest_compiled_total_revenue_month",
    """
    SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS ts,
           o_custkey AS customer_id,
           ROUND(SUM(o_totalprice), 4) AS total_revenue
    FROM orders GROUP BY 1, 2
    """,
)
def manifest_compiled_total_revenue_month(spark, sf_dir):
    return round_cols(
        _compile(spark, sf_dir, "total_revenue", "month"), {"total_revenue": 4}
    )


@register(
    "manifest_compiled_avg_order_value_month",
    """
    SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS ts,
           o_custkey AS customer_id,
           ROUND(AVG(o_totalprice), 4) AS avg_order_value
    FROM orders WHERE o_totalprice > 0 GROUP BY 1, 2
    """,
)
def manifest_compiled_avg_order_value_month(spark, sf_dir):
    """Exercises the manifest filter record {order_total, >, "0"} through
    extraction -> spec -> compiled predicate."""
    return round_cols(
        _compile(spark, sf_dir, "avg_order_value", "month"), {"avg_order_value": 4}
    )


@register(
    "manifest_compiled_revenue_per_customer_month",
    """
    WITH rev AS (
      SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS ts,
             o_custkey AS customer_id,
             SUM(o_totalprice) AS total_revenue
      FROM orders GROUP BY 1, 2
    ), cust AS (
      SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS ts,
             COUNT(DISTINCT o_custkey) AS customer_count
      FROM orders GROUP BY 1
    )
    SELECT ts, customer_id,
           ROUND(total_revenue / customer_count, 6) AS revenue_per_customer
    FROM rev FULL JOIN cust USING (ts)
    """,
)
def manifest_compiled_revenue_per_customer_month(spark, sf_dir):
    """Derived manifest metric: inputs (total_revenue, customer_count)
    resolved from the same manifest registry, composed per
    `expression: total_revenue / customer_count`."""
    return round_cols(
        _compile(spark, sf_dir, "revenue_per_customer", "month"),
        {"revenue_per_customer": 6},
    )
