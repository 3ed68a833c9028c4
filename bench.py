"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is executed to completion (count + a cheap checksum collect is
avoided; we force full materialization with a noop write-free count) so
Catalyst/AQE run end to end.
"""

from __future__ import annotations

import json
import os
import time

from dbt_metrics_ingestion_script_spark import queries as q
from dbt_metrics_ingestion_script_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Stable headline set: all metric-compiler queries, the Layer A metadata
# pipeline, and the scale-path EXT operators.  Exact brute-force pair
# baselines (O(n^2)) and streaming are covered by tests/verify, not the
# bench -- the bench tracks the plans meant to run at 100 TB.
HEADLINE = [
    # Layer B: metric compiler
    "metric_total_revenue_month",
    "metric_total_revenue_week",
    "metric_total_revenue_quarter",
    "metric_total_revenue_year",
    "metric_customer_count_day",
    "metric_approx_customer_count",
    "metric_avg_order_value_month",
    "metric_filtered_revenue_month",
    "metric_order_count_day_status",
    "metric_ratio_discount_rate_month",
    "metric_cumulative_revenue_month",
    "metric_derived_revenue_per_customer_month",
    "metric_star_revenue_by_region_month",
    "metric_total_revenue_all_grains",
    # Layer A: manifest -> glossary/lineage/properties
    "manifest_compiled_total_revenue_month",
    "manifest_metrics_extraction",
    "glossary_terms",
    "term_custom_properties",
    "lineage_transitive_closure",
    # EXT: dedup / similarity / text / multimodal / events
    "dedup_exact",
    "dedup_minhash_lsh_candidates",
    "dedup_near_minhash_survivors",
    "dedup_simhash_near_pairs",
    "dedup_ngram_jaccard_pairs",
    "dedup_embedding_lsh_survivors",
    "similarity_cosine_topk",
    "similarity_multi_query_topk",
    "similarity_ivf_topk",
    "text_stats",
    "text_language_id",
    "text_quality_score",
    "text_doc_fingerprint",
    "multimodal_binary_stats",
    "events_daily_agg",
    "events_salted_daily_agg",
    "events_json_props_extract",
]


def infer_sf(path: str) -> float:
    base = os.path.basename(path.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return -1.0


def main() -> None:
    spark = get_spark(app_name="bench")
    spark.sparkContext.setLogLevel("ERROR")
    q.queries()  # force registration of all query modules
    names = [n for n in HEADLINE if n in q.REGISTRY]
    # warm the JVM + parquet footers so timings measure the queries
    q.REGISTRY[names[0]].fn(spark, SF_DIR).count()
    timings: dict[str, float] = {}
    t_all = time.perf_counter()
    for name in names:
        t0 = time.perf_counter()
        df = q.REGISTRY[name].fn(spark, SF_DIR)
        n = df.count()
        timings[name] = round(time.perf_counter() - t0, 4)
        assert n >= 0
    total = round(time.perf_counter() - t_all, 4)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_runtime",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": infer_sf(SF_DIR),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
