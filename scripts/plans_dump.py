"""Dump `.explain("formatted")` for named queries WITHOUT executing
them -- the cheap way to produce plans/r{N}/<name>_{tag}.txt evidence
(guide §7.2).  Frames are built and explained pre-action, matching the
plan_fingerprint convention (AQE's isFinalPlan echo never appears).

Usage:
  python scripts/plans_dump.py --tag before [--dir plans/r16] name ...

Note: a handful of registered queries run store-build ACTIONS inside
frame construction (the materialized-store lifecycle); for those the
idempotent build runs once if the scratch store is missing, and the
dumped plan is the serving plan -- the same thing the bench times
after iteration 1.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dbt_metrics_ingestion_script_spark import queries as q  # noqa: E402
from dbt_metrics_ingestion_script_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    args = sys.argv[1:]
    tag, out_dir = "plan", "plans/r16"
    while args and args[0].startswith("--"):
        if args[0] == "--tag":
            tag = args[1]
        elif args[0] == "--dir":
            out_dir = args[1]
        else:
            raise SystemExit(f"unknown flag {args[0]}")
        args = args[2:]
    names = args
    spark = get_spark(
        app_name="plans_dump",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    q.queries()
    from bench import EXTRA  # noqa: E402

    by_name = {n: d.fn for n, d in q.REGISTRY.items()}
    by_name.update(EXTRA)
    os.makedirs(out_dir, exist_ok=True)
    jexp = spark._jvm.org.apache.spark.sql.execution.ExplainMode
    for name in names:
        df = by_name[name](spark, SF_DIR)
        plan = df._jdf.queryExecution().explainString(
            jexp.fromString("formatted")
        )
        path = f"{out_dir}/{name}_{tag}.txt"
        with open(path, "w") as f:
            f.write(plan)
        print(f"{name}: {len(plan)} chars -> {path}")
    spark.stop()


if __name__ == "__main__":
    main()
