"""Differential tests: every registered Layer B query vs its DuckDB
oracle at sf0.001 (fast); the driver repeats this at sf0.01."""

from __future__ import annotations

import pytest

from dbt_metrics_ingestion_script_spark import queries as q
from dbt_metrics_ingestion_script_spark.plans.compiler import MetricCompiler
from dbt_metrics_ingestion_script_spark.plans.metric_spec import MetricFilter, MetricSpec

from .oracle import assert_matches_oracle

ORACLE_BACKED = sorted(q.oracle_sql().keys())

# registered with driver=False: outside the driver's 50-slot budget but
# still differential-tested here on every run
DEMOTED = sorted(n for n, qd in q.REGISTRY.items() if not qd.driver and qd.oracle)


@pytest.mark.parametrize("name", ORACLE_BACKED)
def test_query_matches_oracle(spark, sf_dir, name):
    df = q.REGISTRY[name].fn(spark, sf_dir)
    assert_matches_oracle(df, q.REGISTRY[name].oracle, sf_dir)


@pytest.mark.parametrize("name", DEMOTED)
def test_demoted_query_matches_oracle(spark, sf_dir, name):
    df = q.REGISTRY[name].fn(spark, sf_dir)
    assert_matches_oracle(df, q.REGISTRY[name].oracle, sf_dir)


def test_rows_only_queries_run(spark, sf_dir):
    for name, qd in q.REGISTRY.items():
        if qd.oracle is None:
            assert qd.fn(spark, sf_dir).count() >= 0


def test_derived_cycle_detection(spark, sf_dir):
    a = MetricSpec(
        name="a", metric_type="derived", expression="b + 1",
        model="orders", input_metrics=["b"],
    )
    b = MetricSpec(
        name="b", metric_type="derived", expression="a + 1",
        model="orders", input_metrics=["a"],
    )
    comp = MetricCompiler(lambda m: None, registry={"a": a, "b": b})
    with pytest.raises(ValueError, match="cycle"):
        comp.compile(a, None)


def test_unknown_filter_operator_rejected():
    with pytest.raises(ValueError, match="operator"):
        MetricFilter(field="x", operator="like", value="y")


def test_unsupported_template_rejected(spark, sf_dir):
    spec = MetricSpec(
        name="bad", calculation_method="sum", expression="o_totalprice",
        model="orders",
        filters=[MetricFilter(field="o_orderdate", operator=">=",
                              value="{{ weird_macro() }}")],
    )
    comp = MetricCompiler(lambda m: spark.read.parquet(f"{sf_dir}/orders.parquet"))
    with pytest.raises(ValueError, match="templated"):
        comp.compile(spec, None).collect()


def test_cumulative_requires_additive():
    spec = MetricSpec(
        name="cd", metric_type="cumulative", calculation_method="count_distinct",
        expression="o_custkey", model="orders", timestamp="o_orderdate",
    )
    comp = MetricCompiler(lambda m: None)
    with pytest.raises(ValueError, match="re-aggregable"):
        comp.compile(spec, "month")


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_KEYS = ["2024-01-01", "2024-02-01", "2024-03-01", "2024-04-01"]


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    a_keys=st.sets(st.sampled_from(_KEYS), min_size=1),
    b_keys=st.sets(st.sampled_from(_KEYS), min_size=1),
)
def test_derived_disjoint_keys_null_policy(spark, a_keys, b_keys):
    """Derived metrics FULL-join their inputs: output keys = union of
    input keys, value NULL wherever a referenced input has no bucket
    (documented policy in MetricCompiler._compile_derived)."""
    import datetime

    def frame(keys, val):
        return spark.createDataFrame(
            [(datetime.date.fromisoformat(k), float(val)) for k in sorted(keys)],
            "d date, v double",
        )

    def resolver(model):
        return frame(a_keys, 2.0) if model == "ma" else frame(b_keys, 4.0)

    a = MetricSpec(name="a", calculation_method="sum", expression="v",
                   model="ma", timestamp="d", time_grains=["month"])
    b = MetricSpec(name="b", calculation_method="sum", expression="v",
                   model="mb", timestamp="d", time_grains=["month"])
    d = MetricSpec(name="r", metric_type="derived", expression="a / b",
                   model="ma", timestamp="d", time_grains=["month"],
                   input_metrics=["a", "b"])
    comp = MetricCompiler(resolver, registry={"a": a, "b": b})
    got = {str(r["ts"]): r["r"] for r in comp.compile(d, "month").collect()}
    assert set(got) == a_keys | b_keys  # union of keys survives
    for k in a_keys | b_keys:
        if k in a_keys and k in b_keys:
            assert got[k] == 0.5
        else:
            assert got[k] is None  # partial bucket -> visible row, NULL value


@pytest.mark.parametrize("grain", ["week", "quarter", "year"])
def test_total_revenue_grain_matches_oracle(spark, sf_dir, grain):
    """Differential coverage for the grains whose single-grain queries
    were unregistered to stay inside the driver's evaluated-query budget
    (the driver still covers all grains via
    metric_total_revenue_all_grains)."""
    df = q.total_revenue_at_grain(spark, sf_dir, grain)
    assert_matches_oracle(
        df,
        f"""
        SELECT CAST(date_trunc('{grain}', o_orderdate) AS DATE) AS ts,
               o_custkey,
               ROUND(SUM(o_totalprice), 4) AS total_revenue
        FROM orders GROUP BY 1, 2
        """,
        sf_dir,
    )


def test_all_grains(spark, sf_dir):
    comp = MetricCompiler(
        lambda m: spark.read.parquet(f"{sf_dir}/{m}.parquet")
    )
    frames = comp.compile_all_grains(q.TOTAL_REVENUE)
    assert set(frames) == {"day", "week", "month", "quarter", "year"}
    counts = {g: f.count() for g, f in frames.items()}
    assert counts["year"] <= counts["quarter"] <= counts["month"] <= counts["day"]
