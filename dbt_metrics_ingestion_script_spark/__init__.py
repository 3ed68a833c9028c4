"""PySpark-native analytics engine with the query and data-processing
capabilities of acryldata/dbt-metrics-ingestion-script.

Built from scratch on the Spark DataFrame/SQL API (reference studied at
/root/reference, not copied). Two layers:

- Layer A (pipeline semantics): dbt-manifest frontend -> typed DataFrames
  -> glossary hierarchy / lineage resolution / customProperties synthesis
  -> pluggable sinks.  Mirrors /root/reference/dbt_metrics_to_datahub.py
  behaviorally.
- Layer B (metric-query semantics): a driver-side metric compiler that
  turns declarative dbt metric specs (calculation_method x filters x
  dimensions x time grains x simple/ratio/derived/cumulative types) into
  standard Spark DataFrame plans which Catalyst optimizes.

Plus EXT operators for LLM-scale data pipelines: dedup (exact / MinHash
LSH / SimHash / n-gram Jaccard), vector similarity search, text analysis,
multimodal column plumbing.
"""

__version__ = "0.1.0"
