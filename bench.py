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


def infer_sf(path: str) -> float:
    base = os.path.basename(path.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return -1.0


def main() -> None:
    spark = get_spark(app_name="bench")
    spark.sparkContext.setLogLevel("ERROR")
    names = sorted(q.REGISTRY.keys())
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
