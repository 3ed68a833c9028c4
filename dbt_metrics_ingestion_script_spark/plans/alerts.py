"""Declarative metric alerting (EXT): threshold rules as data.

The last mile of a metrics platform: compiled metric frames flow into
RULES -- (name, severity, SQL condition, reported value) tuples an
operator evaluates declaratively -- instead of ad-hoc dashboard
thresholds.  Rules compile to `F.expr` filters over the metric frame
(the same declarative-filter machinery the metric compiler uses for
P7), so evaluation is one scan per metric frame regardless of how many
rules watch it, and the whole thing stays inside Catalyst.

The z-score anomaly monitor (queries_ext.events_daily_anomaly_zscore)
is the statistical detector; this is the contractual one -- "page me
when MoM revenue drops 20%" -- and the two compose: an anomaly frame
is just another metric frame a rule can watch.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class AlertRule:
    name: str
    severity: str  # 'warn' | 'critical' (free-form, carried through)
    condition: str  # SQL boolean expr over the metric frame's columns
    value_expr: str  # SQL expr reported as the alert's measured value


def evaluate_alerts(
    metric_df: DataFrame,
    rules: list[AlertRule],
    ts_col: str = "ts",
) -> DataFrame:
    """(rule, severity, ts, value) rows for every metric row matching
    a rule's condition.  All rules evaluate in ONE pass genuinely:
    each metric row projects an array of per-rule match structs (NULL
    where the rule doesn't fire), the NULLs filter out array-side, and
    the survivors explode -- a union of per-rule filters would instead
    re-derive the (often aggregated) metric subtree once per rule,
    which the plan test pins against.  NULL conditions (e.g. a growth
    value missing its previous bucket) are not alerts -- `F.when`
    treats NULL as false like every engine's WHERE."""
    if not rules:
        raise ValueError("evaluate_alerts needs at least one rule")
    matches = F.array(
        *[
            F.when(
                F.expr(r.condition),
                F.struct(
                    F.lit(r.name).alias("rule"),
                    F.lit(r.severity).alias("severity"),
                    F.round(F.expr(r.value_expr), 6)
                    .cast("double")
                    .alias("value"),
                ),
            )
            for r in rules
        ]
    )
    return (
        metric_df.select(
            F.col(ts_col).alias("ts"),
            F.explode(
                F.filter(matches, lambda m: m.isNotNull())
            ).alias("__m"),
        )
        .select(
            F.col("__m.rule").alias("rule"),
            F.col("__m.severity").alias("severity"),
            "ts",
            F.col("__m.value").alias("value"),
        )
    )
