"""JSONL document source with corrupt-record quarantine (EXT §2.1
S-family breadth: crawl corpora arrive as JSON-lines, not parquet).

Same quarantine discipline as the Layer A pipeline's row quarantine
(reference behavior `dbt_metrics_to_datahub.py:355-359`: log-and-skip,
never abort): malformed lines are captured by PERMISSIVE-mode parsing
into a corrupt-record column and split into a quarantine frame the
caller can count/persist, while well-formed rows flow on with the
explicit schema (no schema inference pass over 100 TB of JSONL).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

DOCUMENTS_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
        StructField("source", StringType()),
        StructField("n_chars", LongType()),
    ]
)

_CORRUPT = "_corrupt_record"


def read_documents_jsonl(
    spark: SparkSession,
    path: str,
    schema: StructType = DOCUMENTS_SCHEMA,
) -> tuple[DataFrame, DataFrame]:
    """Read JSON-lines documents with an EXPLICIT schema; returns
    (good, quarantined).

    - `good`: rows parsed against `schema` (missing fields null, the
      PERMISSIVE contract).
    - `quarantined`: (raw_line) for every malformed line -- the frame
      an ingestion job counts, logs, and lands next to the data for
      replay, mirroring the Layer A quarantine contract.

    The explicit schema keeps this a single streaming-friendly scan:
    schema inference would read the corpus twice.  The parsed frame is
    CACHED before splitting -- Spark disallows queries whose pruned
    projection references only the internal corrupt column
    (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN), and column
    pruning reduces any quarantine-side action to exactly that; the
    cache is Spark's documented workaround.  At corpus scale don't
    split in memory at all: land the parsed frame (data + corrupt
    column) to storage in one pass and split the materialized table --
    the same contract without driver-managed cache.
    """
    if _CORRUPT in [f.name for f in schema.fields]:
        raise ValueError(f"schema must not predefine {_CORRUPT!r}")
    full = StructType([*schema.fields, StructField(_CORRUPT, StringType())])
    df = (
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", _CORRUPT)
        .json(path)
        .cache()
    )
    good = df.where(F.col(_CORRUPT).isNull()).drop(_CORRUPT)
    quarantined = df.where(F.col(_CORRUPT).isNotNull()).select(
        F.col(_CORRUPT).alias("raw_line"), *[f.name for f in schema.fields]
    )
    return good, quarantined
