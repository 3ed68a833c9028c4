"""Declarative metric-spec model.

This is the metric-query language the reference parses and carries
(dataclass shape: /root/reference/dbt_metrics_to_datahub.py:54-71; filter
struct {field, operator, value}: /root/reference/test_manifest.json:375-381;
metric types simple/ratio/derived/cumulative:
/root/reference/dbt_metrics_to_datahub.py:61 and
/root/reference/example_dbt_metrics.yml:13,31,83; calculation methods
sum/average/count_distinct/count: /root/reference/README.md:208).

The spec is engine-agnostic data; `plans.compiler` turns it into Spark
DataFrame plans.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

VALID_CALC_METHODS = {
    "sum",
    "count",
    "count_distinct",
    "average",
    "min",
    "max",
    "median",
    "percentile",
}

VALID_TYPES = {
    "simple", "ratio", "derived", "cumulative", "expression",
    "trailing", "growth",
}

VALID_GRAINS = {"hour", "day", "week", "month", "quarter", "year", "all_time"}

VALID_FILTER_OPS = {"=", "==", "!=", "<>", ">", ">=", "<", "<=", "in", "not in", "is", "is not"}


@dataclass
class MetricFilter:
    """One conjunctive predicate {field, operator, value}.

    Values may be literals (number / bool / string) or Jinja-templated
    relative-date expressions like
    ``{{ dbt.dateadd('day', -30, 'current_date') }}``
    (/root/reference/example_dbt_metrics.yml:54-56).
    """

    field: str
    operator: str
    value: Any

    def __post_init__(self) -> None:
        op = self.operator.strip().lower()
        if op not in VALID_FILTER_OPS:
            raise ValueError(f"unsupported filter operator {self.operator!r}")
        self.operator = op


@dataclass
class MetricSpec:
    name: str
    calculation_method: str = "count"  # sum | count | count_distinct | average | ...
    expression: str = "*"  # column expression over the model
    metric_type: str = "simple"  # simple | ratio | derived | cumulative
    model: str = ""  # source table name
    timestamp: str | None = None  # event-time column
    time_grains: list[str] = field(default_factory=list)
    dimensions: list[str] = field(default_factory=list)
    filters: list[MetricFilter] = field(default_factory=list)
    # ratio metrics: component measures over the same model
    numerator: "MetricSpec | None" = None
    denominator: "MetricSpec | None" = None
    # derived metrics: expression references other metrics by name
    input_metrics: list[str] = field(default_factory=list)
    # cumulative metrics: running total resets at this grain boundary
    # (fiscal_year reset: /root/reference/example_dbt_metrics.yml:89);
    # None = never reset (all-time running total)
    reset_grain: str | None = None
    # trailing metrics: rolling window width in grain buckets (e.g.
    # grain=day, window_buckets=7 -> trailing 7 days); calendar-correct
    # (a RANGE frame over the bucket index, so missing buckets still
    # consume window width)
    window_buckets: int | None = None
    # percentile metrics: the interpolated quantile for
    # calculation_method="percentile" (dbt metrics `percentile:` key)
    percentile: float | None = None
    # metadata passthrough (Layer A)
    unique_id: str = ""
    description: str = ""
    label: str = ""
    package_name: str = ""
    path: str = ""
    depends_on: list[str] = field(default_factory=list)
    tags: list[str] = field(default_factory=list)
    meta: dict = field(default_factory=dict)

    def __post_init__(self) -> None:
        if self.calculation_method and self.calculation_method not in VALID_CALC_METHODS:
            raise ValueError(
                f"metric {self.name!r}: unsupported calculation_method "
                f"{self.calculation_method!r}"
            )
        if self.metric_type not in VALID_TYPES:
            raise ValueError(f"metric {self.name!r}: unsupported type {self.metric_type!r}")
        for g in self.time_grains:
            if g not in VALID_GRAINS:
                raise ValueError(f"metric {self.name!r}: unsupported grain {g!r}")
        if self.metric_type == "ratio" and not (self.numerator and self.denominator):
            raise ValueError(f"ratio metric {self.name!r} needs numerator and denominator")
        if self.metric_type == "derived" and not self.input_metrics:
            raise ValueError(f"derived metric {self.name!r} needs input_metrics")
        if self.metric_type == "trailing" and (
            self.window_buckets is None or self.window_buckets < 1
        ):
            raise ValueError(
                f"trailing metric {self.name!r} needs window_buckets >= 1"
            )
        if self.calculation_method == "percentile" and (
            self.percentile is None or not 0.0 <= self.percentile <= 1.0
        ):
            raise ValueError(
                f"percentile metric {self.name!r} needs percentile in [0, 1]"
            )

    @classmethod
    def from_manifest_record(cls, record: dict) -> "MetricSpec":
        """Build a spec from one raw manifest metric record.

        Tolerant field access with per-field defaults, matching the
        reference's extraction behavior
        (/root/reference/dbt_metrics_to_datahub.py:125-150).
        """
        filters = [
            MetricFilter(
                field=f.get("field", ""),
                operator=f.get("operator", "="),
                value=f.get("value"),
            )
            for f in record.get("filters", []) or []
        ]
        mtype = record.get("type", record.get("metric_type", "simple")) or "simple"
        if mtype == "expression":
            mtype = "derived"
        raw_reset = record.get("window", {}) or {}
        reset = record.get("reset_period") or raw_reset.get("reset_period")
        if reset == "fiscal_year":
            reset = "year"
        depends = (record.get("depends_on") or {}).get("nodes", []) if isinstance(
            record.get("depends_on"), dict
        ) else (record.get("depends_on") or [])
        return cls(
            name=record.get("name", ""),
            calculation_method=record.get(
                "calculation_method", record.get("calculation", "count")
            )
            or "count",
            expression=record.get("expression", record.get("sql", "*")) or "*",
            metric_type=mtype,
            model=record.get("model", ""),
            timestamp=record.get("timestamp"),
            time_grains=record.get("time_grains", []) or [],
            dimensions=record.get("dimensions", []) or [],
            filters=filters,
            input_metrics=record.get("metrics", []) or [],
            reset_grain=reset,
            unique_id=record.get("unique_id", ""),
            description=record.get("description", ""),
            label=record.get("label", ""),
            package_name=record.get("package_name", ""),
            path=record.get("path", ""),
            depends_on=depends,
            tags=record.get("tags", []) or [],
            meta=record.get("meta", {}) or {},
        )
