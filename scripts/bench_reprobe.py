"""Re-probe bench suspects in a fresh isolated session.

Usage: python scripts/bench_reprobe.py [benchfull.json] [query ...]

Reads the bench result file (default BENCHFULL.json), takes its
"suspects" list (queries whose canary-normalized round-over-round ratio
exceeded 2x -- see bench.py) or the explicit query names given on the
command line, re-times each min-of-3 against $SPARK_GRAFT_SF_DIR in this
process's own fresh SparkSession, and writes the measurements back into
the file under "reprobe".  Run it AFTER every other heavy job on the
host has finished: round 8 committed eight ">2x regressions" that were
pure CPU-contention noise (8.25s committed vs 2.70s reproducible for
dedup_graph_triangle_stats), and this step is what would have caught
them before commit.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dbt_metrics_ingestion_script_spark import queries as q  # noqa: E402
from dbt_metrics_ingestion_script_spark.session import get_spark  # noqa: E402

import bench  # noqa: E402


def main() -> int:
    path = sys.argv[1] if len(sys.argv) > 1 else "BENCHFULL.json"
    names = sys.argv[2:]
    with open(path) as f:
        data = json.load(f)
    if not names:
        names = data.get("suspects", [])
    if not names:
        print(json.dumps({"reprobe": {}, "note": "no suspects"}))
        return 0
    spark = get_spark(
        app_name="bench_reprobe",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    q.queries()
    sf_dir = bench.SF_DIR
    fns = dict(bench.EXTRA)
    reprobe: dict[str, float] = {}
    for name in names:
        fn = fns.get(name) or (
            q.REGISTRY[name].fn if name in q.REGISTRY else None
        )
        if fn is None:
            reprobe[name] = -1.0
            continue
        fn(spark, sf_dir).count()  # warm
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            fn(spark, sf_dir).count()
            best = min(best, time.perf_counter() - t0)
        reprobe[name] = round(best, 4)
    spark.stop()
    data["reprobe"] = reprobe
    # auto-close (VERDICT r14 item 6): a suspect whose fresh-session
    # re-probe lands back inside the committed band (<=1.25x the
    # committed time -- the same tolerance the bytes gate uses) was a
    # host spike in the bench session, closed with the measurement
    # attached; a re-probe still above the band stays open.
    suspects = data.get("suspects")
    if isinstance(suspects, dict):
        for name, entry in suspects.items():
            if name not in reprobe or not isinstance(entry, dict):
                continue
            committed = entry.get("committed")
            entry["reprobe"] = reprobe[name]
            if committed:
                ratio = reprobe[name] / committed
                entry["reprobe_ratio_vs_committed"] = round(ratio, 4)
                entry["reprobe_verdict"] = (
                    "in-band: auto-closed transient"
                    if ratio <= 1.25
                    else "still above band in a fresh session: open"
                )
    with open(path, "w") as f:
        f.write(json.dumps(data) + "\n")
    print(json.dumps({"reprobe": reprobe, "file": path}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
