"""EXT source/sink breadth: JSONL document ingestion with quarantine,
bounded-size training-shard writing."""

from __future__ import annotations

import glob
import os

import pytest

from pyspark.sql import functions as F

from dbt_metrics_ingestion_script_spark.sinks.shards import write_corpus_shards
from dbt_metrics_ingestion_script_spark.sources.documents import (
    DOCUMENTS_SCHEMA,
    read_documents_jsonl,
)
from dbt_metrics_ingestion_script_spark.sources.tables import load_table


def test_jsonl_quarantine_splits_malformed_lines(spark, tmp_path):
    """Well-formed lines parse against the explicit schema (missing
    fields null), malformed lines land in the quarantine frame
    verbatim, and neither aborts the read."""
    p = tmp_path / "docs.jsonl"
    p.write_text(
        "\n".join(
            [
                '{"doc_id": 1, "text": "hello world", "lang": "en", "source": "s1", "n_chars": 11}',
                '{"doc_id": 2, "text": "missing fields ok"}',
                "{not json at all",
                '["an", "array", "line"]',
                '{"doc_id": 3, "text": "fine", "lang": "de", "source": "s2", "n_chars": 4}',
            ]
        )
    )
    good, bad = read_documents_jsonl(spark, str(p))
    rows = {r["doc_id"]: r for r in good.collect()}
    assert set(rows) == {1, 2, 3}
    assert rows[2]["lang"] is None and rows[2]["n_chars"] is None
    bad_lines = sorted(r["raw_line"] for r in bad.collect())
    assert bad_lines == ['["an", "array", "line"]', "{not json at all"]
    with pytest.raises(ValueError, match="_corrupt_record"):
        from pyspark.sql.types import StringType, StructField, StructType

        read_documents_jsonl(
            spark,
            str(p),
            StructType([StructField("_corrupt_record", StringType())]),
        )


def test_jsonl_round_trip_matches_parquet_table(spark, sf_dir, tmp_path):
    """The fixture documents table written as JSONL and read back
    through the quarantine source must reproduce the table exactly
    (schema-stable ingestion path)."""
    docs = load_table(spark, sf_dir, "documents")
    out = str(tmp_path / "docs_jsonl")
    docs.coalesce(1).write.mode("overwrite").json(out)
    good, bad = read_documents_jsonl(spark, out)
    assert bad.isEmpty()
    a = sorted(tuple(r) for r in good.select(*docs.columns).collect())
    b = sorted(tuple(r) for r in docs.collect())
    assert a == b


def test_shard_writer_bounds_file_sizes(spark, sf_dir, tmp_path):
    """Shard directories per lang; every parquet file holds at most
    max_records_per_file rows; the written data round-trips."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang"
    )
    out = str(tmp_path / "shards")
    write_corpus_shards(docs, out, shard_col="lang", max_records_per_file=40)
    langs = {r["lang"] for r in docs.select("lang").distinct().collect()}
    dirs = {
        os.path.basename(d).split("=", 1)[1]
        for d in glob.glob(f"{out}/lang=*")
    }
    assert dirs == langs
    import pyarrow.parquet as pq

    for f in glob.glob(f"{out}/lang=*/*.parquet"):
        assert pq.read_metadata(f).num_rows <= 40, f
    back = spark.read.parquet(out)
    assert back.count() == docs.count()
    assert sorted(tuple(r) for r in back.select("doc_id", "text", "lang").collect()) == sorted(
        tuple(r) for r in docs.collect()
    )
    with pytest.raises(ValueError, match="max_records_per_file"):
        write_corpus_shards(docs, out, max_records_per_file=0)
