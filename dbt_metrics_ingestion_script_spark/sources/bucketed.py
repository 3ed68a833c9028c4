"""Bucketed-table layout for co-located joins (SCALE.md).

At 100 TB the dominant recurring cost of fact-to-fact joins is the
shuffle. Writing both sides bucketed by the join key (same bucket
count) lets Spark plan a SortMergeJoin with NO Exchange on either side:
bucket files are the pre-shuffled layout. Worth it for keys joined
repeatedly (orderkey, doc_id); pointless for one-shot joins.

Bucketing requires the table catalog (saveAsTable) -- bucket metadata
lives in the catalog, not in parquet itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = 32,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Materialize a frame bucketed (and per-bucket sorted) by the join
    key. Sorting at write time lets SortMergeJoin skip its sort too."""
    writer = df.write.mode(mode).format("parquet").bucketBy(n_buckets, *bucket_cols)
    if sort:
        writer = writer.sortBy(*bucket_cols)
    writer.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)
