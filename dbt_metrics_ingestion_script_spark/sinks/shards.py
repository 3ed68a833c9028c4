"""Training-shard writer: deterministic, bounded-size parquet output
(EXT §2.1 sink breadth -- the last stage of a corpus pipeline writes
shards a training loader streams).

At 100 TB the two file-layout failure modes are a few giant files (one
task reads forever) and millions of tiny ones (namenode/listing blowup,
per-file open cost).  The writer bounds both: `partitionBy(shard_col)`
gives the loader per-shard directories, `maxRecordsPerFile` caps file
size, and a `repartition(shard_col)` keeps each shard's rows in as few
tasks as possible so the file count per shard is
ceil(rows / max_records), not tasks x shards.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_corpus_shards(
    df: DataFrame,
    path: str,
    shard_col: str = "lang",
    max_records_per_file: int = 100_000,
    mode: str = "overwrite",
) -> None:
    """Write `df` as parquet training shards partitioned by
    `shard_col`, each file capped at `max_records_per_file` rows.

    The repartition hashes on the shard column so one task writes one
    shard's files (deterministic layout, minimal file count); for a
    shard too large for one task, pre-split with
    repartition(n, shard_col, <salt>) upstream -- the per-file row cap
    still holds, only the file count per task changes.
    """
    if max_records_per_file < 1:
        raise ValueError("max_records_per_file must be >= 1")
    (
        df.repartition(shard_col)
        .write.partitionBy(shard_col)
        .option("maxRecordsPerFile", max_records_per_file)
        .mode(mode)
        .parquet(path)
    )
