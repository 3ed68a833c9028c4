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

    def time_one(fn, iters=3):
        fn(spark, sf_dir).count()  # warm
        best = float("inf")
        for _ in range(iters):
            t0 = time.perf_counter()
            fn(spark, sf_dir).count()
            best = min(best, time.perf_counter() - t0)
        return round(best, 4)

    reprobe: dict[str, float] = {}
    for name in names:
        fn = fns.get(name) or (
            q.REGISTRY[name].fn if name in q.REGISTRY else None
        )
        if fn is None:
            reprobe[name] = -1.0
            continue
        reprobe[name] = time_one(fn)

    # host-drift normalization for THIS session (r15: the first
    # verdict pass compared raw reprobes against the committed times
    # and kept suspects "open" whenever the whole HOST was slower than
    # the committed round's -- exactly the uniform-drift case canary
    # normalization exists for).  Re-time the canaries here, in the
    # same fresh session, against the SAME baseline file the bench's
    # "committed" values came from (data["canary_prev"]; the on-disk
    # BENCHFULL of this round must not be the reference for itself).
    drift = None
    prev_name = data.get("canary_prev")
    if prev_name and os.path.exists(prev_name):
        with open(prev_name) as f:
            prev_q = json.load(f).get("queries", {})
        shared = [
            n
            for n in bench.CANARIES
            if n in prev_q and (n in q.REGISTRY or n in fns)
        ]
        if shared:
            cr = {
                n: time_one(
                    fns.get(n) or q.REGISTRY[n].fn, iters=2
                )
                for n in shared
            }
            prev_total = sum(prev_q[n] for n in shared)
            if prev_total:
                drift = sum(cr.values()) / prev_total
    spark.stop()
    data["reprobe"] = reprobe
    if drift is not None:
        data["reprobe_canary_drift"] = round(drift, 4)
    # auto-close (VERDICT r14 item 6): a suspect whose fresh-session
    # re-probe lands back inside the committed band (<=1.25x the
    # committed time AFTER dividing out this session's measured canary
    # drift -- the same tolerance the bytes gate uses) was a host
    # spike in the bench session, closed with the measurement
    # attached; a normalized re-probe still above the band stays open.
    suspects = data.get("suspects")
    if isinstance(suspects, dict):
        for name, entry in suspects.items():
            if name not in reprobe or not isinstance(entry, dict):
                continue
            committed = entry.get("committed")
            entry["reprobe"] = reprobe[name]
            if committed:
                ratio = reprobe[name] / committed / (drift or 1.0)
                entry["reprobe_ratio_vs_committed"] = round(ratio, 4)
                if reprobe[name] - committed <= 1.0:
                    # absolute-delta floor (r15): sub-second deltas on
                    # sub-second queries ratio out as 2-7x pure noise;
                    # the bytes verdict governs that scale
                    entry["reprobe_verdict"] = (
                        "absolute delta <= 1 s: wall noise at this "
                        "scale, auto-closed (bytes verdict governs)"
                    )
                elif ratio <= 1.25:
                    entry["reprobe_verdict"] = (
                        "in-band: auto-closed transient"
                    )
                else:
                    entry["reprobe_verdict"] = (
                        "still above band in a fresh session: open"
                    )
    with open(path, "w") as f:
        f.write(json.dumps(data) + "\n")
    print(json.dumps({"reprobe": reprobe, "file": path}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
