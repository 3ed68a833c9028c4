"""Measured scale slope: time the most expensive registry queries at
sf0.1 (1x) and at the re-keyed x10 upsample (scripts/
make_scale_upsample.py), and emit per-query t10/t1 slopes as ONE JSON
document -- the evidence class VERDICT r10 item 1 asked for ("nothing
has ever been *measured* above sf0.1").

Usage:
  python scripts/scale_slope.py [base_sf_dir] [x10_dir] [out_json]

Interpretation bar (written into the JSON): a slope <= ~12x is
linear-plus-overhead at factor 10; anything above names a superlinear
constant that plan-shape locks alone cannot see.  Both measurements run
in the SAME session back-to-back, so cross-round host drift (SCALE.md
"bench variance") does not contaminate the ratio.

Query-set rule: only queries that never join lineitem->orders/dims
belong here (the upsample re-keys l_orderkey but copies orders
verbatim; see make_scale_upsample.py).  The default set is the top of
BENCHFULL_r10 by cost (documents/embeddings families) plus scan-bound
canaries (tpch_q1 on lineitem alone, events_daily_agg) and the two
round-10 plan-changed queries.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

# local[32] runs everything in ONE JVM whose default heap is 1g -- fine
# at sf0.1, but the x10 measurement needs the heap a real executor
# fleet would have (the 10x semantic-dedup shuffle killed a 1g driver).
# Must be set before the JVM launches, hence here and not in get_spark.
os.environ.setdefault(
    "PYSPARK_SUBMIT_ARGS", "--driver-memory 24g pyspark-shell"
)

from dbt_metrics_ingestion_script_spark.session import get_spark  # noqa: E402
from dbt_metrics_ingestion_script_spark import queries as q  # noqa: E402

# top-of-BENCHFULL cost order; all documents/embeddings/events/lineitem
# -only (no lineitem->orders joins -- see module docstring)
DEFAULT_SET = [
    "dedup_semantic_clusters",
    "corpus_semantic_pipeline",
    "dedup_semantic_survivors",
    "dedup_clusters_incremental_vs_corpus",
    "text_bpe_merges",
    "text_bpe_encoded_lengths",
    "dedup_duplicate_clusters",
    "dedup_duplicate_clusters_star",
    "similarity_ivf_pq_batch_topk",
    "similarity_ivf_pq_topk",
    "dedup_embedding_incremental_vs_corpus",
    "dedup_minhash_eval",
    "embeddings_kmeans_convergence",
    # round-10 plan-changed (checkpoint+join-back de-skew)
    "corpus_substring_extents",
    "corpus_substring_dedup_clean",
    # scan-bound canaries: ~pure scan/agg, slope ~= IO slope
    "tpch_q1_pricing_summary",
    "events_daily_anomaly_zscore",
    "text_repetition_signals",
]


def _time(fn, spark, sf_dir, iters=1):
    best = None
    rows = None
    for _ in range(iters):
        t0 = time.monotonic()
        rows = fn(spark, sf_dir).count()
        dt = time.monotonic() - t0
        best = dt if best is None else min(best, dt)
    return best, rows


def main() -> int:
    base = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    x10 = (
        sys.argv[2] if len(sys.argv) > 2 else "/root/repo/scratch_scale/x10"
    )
    out_path = sys.argv[3] if len(sys.argv) > 3 else "SCALING_r11.json"
    names = sys.argv[4:] or DEFAULT_SET
    # upsample factor, for the slope bar and the JSON labels (a x100
    # dir from make_scale_upsample.py gives a second measured decade)
    factor = int(os.environ.get("SPARK_GRAFT_SLOPE_FACTOR", "10"))

    spark = get_spark(app_name="scale_slope", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    # full registry (driver-exposed AND driver=False bench rows --
    # text_bpe_* are benchmarked but not driver-registered)
    q.queries()
    registry = {n: d.fn for n, d in q.REGISTRY.items()}

    # JVM/codegen warmup so the first measured query is not the one
    # paying JIT cost
    registry["tpch_q1_pricing_summary"](spark, base).count()

    results = {}
    for name in names:
        fn = registry[name]
        t1, rows1 = _time(fn, spark, base, iters=2)
        t10, rows10 = _time(fn, spark, x10, iters=1)
        slope = round(t10 / t1, 2) if t1 else None
        results[name] = {
            "t1_sec": round(t1, 3),
            f"t{factor}_sec": round(t10, 3),
            "slope": slope,
            "rows_1x": rows1,
            f"rows_{factor}x": rows10,
        }
        print(
            f"{name:45s} t1={t1:7.2f}s t{factor}={t10:8.2f}s "
            f"slope={slope:6.2f}x rows {rows1}->{rows10}",
            flush=True,
        )
    spark.stop()

    doc = {
        "base_sf_dir": base,
        "upsample_dir": x10,
        "factor": factor,
        "bar": f"slope <= ~{round(factor * 1.2)}x is "
               f"linear-plus-overhead at factor {factor}",
        "same_session": True,
        "queries": results,
    }
    Path(out_path).write_text(json.dumps(doc, indent=1) + "\n")
    print(json.dumps({"written": out_path, "n": len(results)}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
