"""Scale-decade plan audit (VERDICT r12 next-round item 1): capture the
AQE FINAL physical plans of the join-anchor queries at 1x (sf0.1), x10,
and x100, and grade each against the plan you'd want at that scale.

Why this exists: every committed PLANAUDIT_r*.txt locks plans at
sf0.01, but the x10/x100 bytes curves (SCALING_r11/r12) prove AQE picks
DIFFERENT physical plans at scale -- broadcast joins demote to shuffled
joins once the build side outgrows the threshold (tpch_q3 212x bytes at
x10; tpch_q9/q12 at x100).  The sf0.01 locks therefore audit the wrong
plan for the 100x posture.  This script runs each anchor TO COMPLETION
(collect -- AdaptiveSparkPlan mutates to its final form only once the
query executes) and reads the executed plan, not the static one.

Grading (PASS/FAIL per query per decade):
  - NEVER (any scale): BroadcastNestedLoopJoin or CartesianProduct.
  - fact-fact anchors (tpch q3/q8/q9/q12/q21, dq_referential_integrity)
    at x100: the lineitem<->orders edge must be a SHUFFLED join
    (>=1 SortMergeJoin or ShuffledHashJoin in the final plan) -- a
    broadcast of a 100x fact side is the 1000-executor OOM.  Dimension
    joins staying broadcast is correct and expected.  At x10 a
    still-broadcast fact edge is REPORTED (bcast@x10), not failed: the
    decision is AQE's, made from the MEASURED post-filter build size at
    runtime (q3/q12 demote at x10, q9/q21/dq at x100 -- each exactly
    when its build side outgrows the threshold), which is the behavior
    the audit exists to confirm.
  - funnel family (events self-pairing) at x100: same shuffled-join
    requirement if any join exists (the batch funnels are window/agg
    plans with zero joins -- reported as such).
  - SinglePartition exchanges PASS only when the plan line directly
    below each one is a partial HashAggregate (the rows entering the
    exchange are already collapsed to per-task partials); anything
    else fails the query at that decade.

Usage:
  python scripts/plan_audit_scale.py [out_txt]
Writes a table: query x decade -> join strategies + verdict.
"""

from __future__ import annotations

import os
import re
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

# x100 runs need a real executor-fleet-sized heap (scale_slope.py
# precedent); must be set before the JVM launches.
os.environ.setdefault(
    "PYSPARK_SUBMIT_ARGS", "--driver-memory 24g pyspark-shell"
)

from dbt_metrics_ingestion_script_spark.session import get_spark  # noqa: E402
from dbt_metrics_ingestion_script_spark import queries as q  # noqa: E402

# the join-anchor set VERDICT r12 named: the fact-fact TPC-H edges, the
# funnel family, and the referential-integrity check
FACT_FACT = [
    "tpch_q3_shipping_priority",
    "tpch_q8_national_market_share",
    "tpch_q9_product_type_profit",
    "tpch_q12_shipmode_priority",
    "tpch_q21_suppliers_kept_waiting",
    "dq_referential_integrity",
]
FUNNELS = [
    "events_funnel_stages",
    "events_funnel_conversion_window",
]

DECADES = [
    ("1x", "/root/testdata/sf0.1"),
    ("x10", "/root/repo/scratch_scale/x10"),
    ("x100", "/root/repo/scratch_scale/x100"),
]

JOIN_NODES = [
    "SortMergeJoin",
    "ShuffledHashJoin",
    "BroadcastHashJoin",
    "BroadcastNestedLoopJoin",
    "CartesianProduct",
]


def final_plan(df) -> str:
    """Execute the frame's OWN queryExecution and return the adaptive
    FINAL plan string.  collect() runs the Dataset's queryExecution in
    place, so the AdaptiveSparkPlan node it holds is the mutated final
    plan -- a fresh action helper (count) would plan its own tree and
    leave this one initial."""
    df._jdf.queryExecution()  # force analysis before timing
    df.collect()
    mode = (
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode
        .fromString("simple")
    )
    return df._jdf.queryExecution().explainString(mode)


def audit_one(plan: str) -> dict:
    counts = {n: len(re.findall(rf"\b{n}\b", plan)) for n in JOIN_NODES}
    # BroadcastHashJoin lines also contain no other join names, so the
    # counts are disjoint by construction of the node names
    counts["SinglePartition"] = plan.count("SinglePartition")
    counts["AQEShuffleRead"] = plan.count("AQEShuffleRead")
    counts["skewed"] = plan.count("skewed=true")
    counts["isFinal"] = "isFinalPlan=true" in plan
    # every SinglePartition exchange must be fed by a partial
    # HashAggregate: the child is the next plan line (tree indentation
    # grows downward), so look one line ahead
    lines = plan.splitlines()
    bad = 0
    for i, ln in enumerate(lines):
        if "SinglePartition" in ln:
            child = lines[i + 1] if i + 1 < len(lines) else ""
            if "HashAggregate" not in child:
                bad += 1
    counts["singlep_unfed"] = bad
    return counts


def verdict(name: str, decade: str, c: dict) -> tuple[str, str]:
    reasons = []
    notes = []
    if c["BroadcastNestedLoopJoin"] or c["CartesianProduct"]:
        reasons.append("nested-loop/cartesian join")
    shuffled = c["SortMergeJoin"] + c["ShuffledHashJoin"]
    if name in FACT_FACT and shuffled == 0:
        if decade == "x100":
            reasons.append("fact-fact edge still broadcast at x100")
        elif decade == "x10":
            notes.append("bcast@x10 (AQE-measured build side)")
    if name in FUNNELS and decade == "x100" and (
        c["SortMergeJoin"] + c["ShuffledHashJoin"] + c["BroadcastHashJoin"]
    ) > 0 and shuffled == 0:
        reasons.append("events self-pair still broadcast at x100")
    if c["singlep_unfed"]:
        reasons.append(
            f"{c['singlep_unfed']} SinglePartition exchange(s) not fed "
            "by partial aggregation"
        )
    if not c["isFinal"]:
        reasons.append("plan not AQE-final")
    v = "PASS" if not reasons else "FAIL"
    return v, "; ".join(reasons or notes) or ""


def main() -> int:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "PLANAUDIT_scale_r13.txt"
    spark = get_spark(app_name="plan_audit_scale", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    q.queries()
    lines = [
        "Scale-decade AQE-final plan audit (VERDICT r12 item 1).",
        "Each query ran TO COMPLETION per decade; join strategies below",
        "are from the executed (isFinalPlan=true) plan, not the static",
        "one the sf0.01 PLANAUDIT locks.  smj=SortMergeJoin,",
        "shj=ShuffledHashJoin, bhj=BroadcastHashJoin, bnl=nested-loop/",
        "cartesian, 1part=SinglePartition exchanges, aqe=AQEShuffleRead",
        "nodes, skew=AQE skew splits.",
        "",
        f"{'query':42s} {'decade':6s} {'smj':>3s} {'shj':>3s} {'bhj':>3s} "
        f"{'bnl':>3s} {'1part':>5s} {'aqe':>3s} {'skew':>4s} {'sec':>7s} "
        f"verdict",
    ]
    failures = 0
    singlep_details: list[str] = []
    for name in FACT_FACT + FUNNELS:
        fn = q.REGISTRY[name].fn
        for decade, sf_dir in DECADES:
            t0 = time.monotonic()
            df = fn(spark, sf_dir)
            plan = final_plan(df)
            dt = time.monotonic() - t0
            c = audit_one(plan)
            v, why = verdict(name, decade, c)
            if v == "FAIL":
                failures += 1
            if c["SinglePartition"]:
                # record what feeds each SinglePartition exchange so
                # the grade is justified by the plan text, not by hand
                for m in re.finditer(r"[^\n]*SinglePartition[^\n]*", plan):
                    singlep_details.append(
                        f"{name} {decade}: {m.group(0).strip()[:120]}"
                    )
            lines.append(
                f"{name:42s} {decade:6s} {c['SortMergeJoin']:3d} "
                f"{c['ShuffledHashJoin']:3d} {c['BroadcastHashJoin']:3d} "
                f"{c['BroadcastNestedLoopJoin'] + c['CartesianProduct']:3d} "
                f"{c['SinglePartition']:5d} {c['AQEShuffleRead']:3d} "
                f"{c['skewed']:4d} {dt:7.1f} {v} {why}"
            )
        lines.append("")
    lines.append(f"failures: {failures}")
    if singlep_details:
        lines.append("")
        lines.append("SinglePartition exchange occurrences (context lines):")
        lines.extend("  " + s for s in singlep_details)
    text = "\n".join(lines) + "\n"
    Path(out_path).write_text(text)
    print(text)
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
