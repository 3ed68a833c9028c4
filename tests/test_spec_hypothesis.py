"""Property-based differential testing: random MetricSpecs compiled to
Spark (plans.compiler) and to SQL (plans.sql_oracle) must agree on
DuckDB over the same parquet. Explores the spec space far beyond the
hand-written fixture queries: any divergence is a compiler bug, an
oracle-renderer bug, or a genuine engine-semantics gap."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from dbt_metrics_ingestion_script_spark.plans.compiler import MetricCompiler
from dbt_metrics_ingestion_script_spark.plans.metric_spec import (
    MetricFilter,
    MetricSpec,
)
from dbt_metrics_ingestion_script_spark.plans.sql_oracle import oracle_sql_for
from dbt_metrics_ingestion_script_spark.sources.tables import load_table

from .oracle import assert_matches_oracle

# spec space over the `orders` table
METHODS = ["sum", "count", "count_distinct", "average", "min", "max"]
EXPRESSIONS = ["o_totalprice", "o_custkey", "o_totalprice * 0.9"]
GRAINS = ["day", "week", "month", "quarter", "year", "all_time"]
DIM_POOL = ["o_orderstatus", "o_orderpriority"]
FILTER_POOL = [
    MetricFilter(field="o_totalprice", operator=">", value="5000"),
    MetricFilter(field="o_totalprice", operator="<=", value=250000.0),
    MetricFilter(field="o_orderstatus", operator="=", value="O"),
    MetricFilter(field="o_orderstatus", operator="!=", value="P"),
    MetricFilter(field="o_orderstatus", operator="in", value=["O", "F"]),
    MetricFilter(
        field="o_orderdate",
        operator=">=",
        value="{{ dbt.dateadd('month', -18, '1997-06-15') }}",
    ),
    MetricFilter(field="o_orderdate", operator="<", value="1997-01-01"),
]

simple_specs = st.builds(
    MetricSpec,
    name=st.just("m"),
    calculation_method=st.sampled_from(METHODS),
    expression=st.sampled_from(EXPRESSIONS),
    model=st.just("orders"),
    timestamp=st.just("o_orderdate"),
    dimensions=st.lists(st.sampled_from(DIM_POOL), unique=True, max_size=2),
    filters=st.lists(st.sampled_from(FILTER_POOL), unique_by=id, max_size=3),
)

ratio_specs = st.builds(
    MetricSpec,
    name=st.just("m"),
    metric_type=st.just("ratio"),
    model=st.just("orders"),
    timestamp=st.just("o_orderdate"),
    dimensions=st.lists(st.sampled_from(DIM_POOL), unique=True, max_size=1),
    filters=st.lists(st.sampled_from(FILTER_POOL), unique_by=id, max_size=2),
    numerator=st.builds(
        MetricSpec,
        name=st.just("num"),
        calculation_method=st.sampled_from(["sum", "count", "average"]),
        expression=st.sampled_from(EXPRESSIONS),
        model=st.just("orders"),
        filters=st.lists(st.sampled_from(FILTER_POOL[:4]), unique_by=id, max_size=1),
    ),
    denominator=st.builds(
        MetricSpec,
        name=st.just("den"),
        calculation_method=st.sampled_from(["sum", "count"]),
        expression=st.sampled_from(EXPRESSIONS),
        model=st.just("orders"),
    ),
)

cumulative_specs = st.builds(
    MetricSpec,
    name=st.just("m"),
    metric_type=st.just("cumulative"),
    calculation_method=st.sampled_from(["sum", "count", "min", "max"]),
    expression=st.sampled_from(EXPRESSIONS),
    model=st.just("orders"),
    timestamp=st.just("o_orderdate"),
    dimensions=st.lists(st.sampled_from(DIM_POOL), unique=True, max_size=1),
    filters=st.lists(st.sampled_from(FILTER_POOL), unique_by=id, max_size=2),
    reset_grain=st.sampled_from([None, "year", "quarter"]),
)

_SETTINGS = settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _check(spark, sf_dir, spec, grain):
    comp = MetricCompiler(lambda model: load_table(spark, sf_dir, model))
    df = comp.compile(spec, grain)
    assert_matches_oracle(df, oracle_sql_for(spec, grain), sf_dir)


@_SETTINGS
@given(spec=simple_specs, grain=st.sampled_from(GRAINS))
def test_simple_specs_match_oracle(spark, sf_dir, spec, grain):
    _check(spark, sf_dir, spec, grain)


@_SETTINGS
@given(spec=ratio_specs, grain=st.sampled_from(["month", "year", "all_time"]))
def test_ratio_specs_match_oracle(spark, sf_dir, spec, grain):
    _check(spark, sf_dir, spec, grain)


@_SETTINGS
@given(spec=cumulative_specs, grain=st.sampled_from(["month", "quarter"]))
def test_cumulative_specs_match_oracle(spark, sf_dir, spec, grain):
    _check(spark, sf_dir, spec, grain)


def test_oracle_renderer_needs_registry_for_derived():
    spec = MetricSpec(
        name="d", metric_type="derived", expression="a + 1",
        model="orders", input_metrics=["a"],
    )
    with pytest.raises(ValueError, match="unknown input metric"):
        oracle_sql_for(spec)


derived_specs = st.builds(
    lambda method_a, method_b, dims, grain: (
        MetricSpec(
            name="d",
            metric_type="derived",
            expression="ma / (mb + 1)",
            model="orders",
            timestamp="o_orderdate",
            input_metrics=["ma", "mb"],
        ),
        {
            "ma": MetricSpec(
                name="ma", calculation_method=method_a,
                expression="o_totalprice", model="orders",
                timestamp="o_orderdate", dimensions=dims,
            ),
            "mb": MetricSpec(
                name="mb", calculation_method=method_b,
                expression="o_custkey", model="orders",
                timestamp="o_orderdate", dimensions=dims,
            ),
        },
        grain,
    ),
    method_a=st.sampled_from(["sum", "count", "average"]),
    method_b=st.sampled_from(["count", "count_distinct"]),
    dims=st.lists(st.sampled_from(DIM_POOL), unique=True, max_size=1),
    grain=st.sampled_from(["month", "year", "all_time"]),
)


@_SETTINGS
@given(case=derived_specs)
def test_derived_specs_match_oracle(spark, sf_dir, case):
    spec, registry, grain = case
    comp = MetricCompiler(
        lambda model: load_table(spark, sf_dir, model), registry=registry
    )
    df = comp.compile(spec, grain)
    assert_matches_oracle(
        df, oracle_sql_for(spec, grain, registry=registry), sf_dir
    )


def test_nested_derived_matches_oracle(spark, sf_dir):
    registry = {
        "rev": MetricSpec(
            name="rev", calculation_method="sum", expression="o_totalprice",
            model="orders", timestamp="o_orderdate",
        ),
        "cnt": MetricSpec(
            name="cnt", calculation_method="count", expression="*",
            model="orders", timestamp="o_orderdate",
        ),
        "aov": MetricSpec(
            name="aov", metric_type="derived", expression="rev / cnt",
            model="orders", timestamp="o_orderdate", input_metrics=["rev", "cnt"],
        ),
    }
    spec = MetricSpec(
        name="aov_pct", metric_type="derived", expression="aov * 100",
        model="orders", timestamp="o_orderdate", input_metrics=["aov"],
    )
    comp = MetricCompiler(
        lambda model: load_table(spark, sf_dir, model), registry=registry
    )
    df = comp.compile(spec, "month")
    assert_matches_oracle(
        df, oracle_sql_for(spec, "month", registry=registry), sf_dir
    )
