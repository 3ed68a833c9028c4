"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All real logic lives in ``dbt_metrics_ingestion_script_spark``; this
module is a thin adapter.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from dbt_metrics_ingestion_script_spark import queries as _q

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: the engine's full lifecycle in one plan -- a dbt
    manifest's DERIVED metric record (revenue_per_customer =
    total_revenue / customer_count, the shape of
    /root/reference/test_manifest.json:252-407) extracted from JSON,
    compiled with its input metrics resolved from the same manifest, and
    executed over the physical orders table at sf0.001."""
    _q.queries()  # load all query modules
    return _q.REGISTRY["manifest_compiled_revenue_per_customer_month"].fn(
        spark, SMOKE_SF_DIR
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _q.queries()


def oracle_sql() -> dict[str, str]:
    return _q.oracle_sql()
