"""MetricSpec -> ANSI SQL generator.

The differential twin of `plans.compiler`: the same spec that compiles
to a Spark plan also renders to DuckDB-runnable SQL, so ANY spec --
including randomly generated ones (tests/test_spec_hypothesis.py) --
can be checked engine-against-engine. Keeps the compiler honest beyond
the hand-written fixture queries.

Rendering mirrors the compiler's choices exactly: grain columns cast to
DATE, ratio as single-pass conditional aggregation with a zero-guard,
cumulative as a window over the grain-aggregated subquery partitioned
by the reset bucket.
"""

from __future__ import annotations

from .metric_spec import MetricFilter, MetricSpec
from .compiler import _DATEADD_RE, _DATE_LIT_RE, TS_COL


def _sql_value(value) -> str:
    if isinstance(value, bool):
        return "TRUE" if value else "FALSE"
    if isinstance(value, (int, float)):
        return repr(value)
    if value is None:
        return "NULL"
    s = str(value).strip()
    if "{{" in s or "dateadd" in s.lower():
        m = _DATEADD_RE.search(s)
        if not m:
            raise ValueError(f"unsupported templated filter value {value!r}")
        unit, n = m.group("unit").lower(), int(m.group("n"))
        anchor = m.group("anchor").strip().strip("'\"").rstrip("()")
        base = "current_date" if anchor == "current_date" else f"DATE '{anchor}'"
        months = {"week": None, "day": None, "month": 1, "quarter": 3, "year": 12}[unit]
        if unit == "day":
            return f"({base} + INTERVAL ({n}) DAY)"
        if unit == "week":
            return f"({base} + INTERVAL ({7 * n}) DAY)"
        return f"CAST({base} + INTERVAL ({months * n}) MONTH AS DATE)"
    low = s.lower()
    if low in ("true", "false"):
        return low.upper()
    try:
        int(s)
        return s
    except ValueError:
        pass
    try:
        float(s)
        return s
    except ValueError:
        pass
    if _DATE_LIT_RE.match(s):
        return f"DATE '{s}'"
    escaped = s.replace("'", "''")
    return f"'{escaped}'"


def _sql_filter(flt: MetricFilter) -> str:
    op = flt.operator
    if op in ("in", "not in"):
        vals = flt.value if isinstance(flt.value, (list, tuple)) else [flt.value]
        body = ", ".join(_sql_value(v) for v in vals)
        return f"{flt.field} {'NOT IN' if op == 'not in' else 'IN'} ({body})"
    if op in ("is", "is not"):
        return f"{flt.field} IS {'NOT ' if op == 'is not' else ''}NULL"
    op_sql = {"=": "=", "==": "=", "!=": "<>", "<>": "<>"}.get(op, op)
    return f"{flt.field} {op_sql} {_sql_value(flt.value)}"


def _where(filters: list[MetricFilter]) -> str:
    if not filters:
        return ""
    return " WHERE " + " AND ".join(_sql_filter(f) for f in filters)


def _grain_sql(ts_field: str, grain: str) -> str:
    if grain == "hour":
        return f"date_trunc('hour', {ts_field})"
    return f"CAST(date_trunc('{grain}', {ts_field}) AS DATE)"


def _agg_sql(method: str, expression: str, cond: str | None = None) -> str:
    expr = "1" if expression in ("*", "", None) else expression
    if cond:
        expr = f"CASE WHEN {cond} THEN {expr} END"
    return {
        "sum": f"SUM({expr})",
        "count": f"COUNT({expr})",
        "count_distinct": f"COUNT(DISTINCT {expr})",
        "average": f"AVG({expr})",
        "min": f"MIN({expr})",
        "max": f"MAX({expr})",
        "median": f"MEDIAN({expr})",
    }[method]


def _keys(spec: MetricSpec, grain: str | None) -> list[tuple[str, str]]:
    """[(select_expr, alias)] for the group keys."""
    keys: list[tuple[str, str]] = []
    if grain and grain != "all_time":
        if not spec.timestamp:
            raise ValueError(f"metric {spec.name!r} has no timestamp for grain {grain!r}")
        keys.append((_grain_sql(spec.timestamp, grain), TS_COL))
    keys.extend((d, d) for d in spec.dimensions)
    return keys


def oracle_sql_for(spec: MetricSpec, grain: str | None = None) -> str:
    """Render the DuckDB SQL equivalent of compiler.compile(spec, grain).

    The model name is used as the table name (the driver pre-registers
    each parquet table as a view of the same name).
    """
    if spec.metric_type == "simple":
        return _simple_sql(spec, grain)
    if spec.metric_type == "ratio":
        return _ratio_sql(spec, grain)
    if spec.metric_type == "cumulative":
        return _cumulative_sql(spec, grain)
    raise ValueError(f"no SQL oracle renderer for metric type {spec.metric_type!r}")


def _select(keys: list[tuple[str, str]], value_exprs: list[str], spec: MetricSpec) -> str:
    cols = [f"{e} AS {a}" for e, a in keys] + value_exprs
    sql = f"SELECT {', '.join(cols)} FROM {spec.model}{_where(spec.filters)}"
    if keys:
        sql += " GROUP BY " + ", ".join(str(i + 1) for i in range(len(keys)))
    return sql


def _simple_sql(spec: MetricSpec, grain: str | None) -> str:
    agg = f"{_agg_sql(spec.calculation_method, spec.expression)} AS {spec.name}"
    return _select(_keys(spec, grain), [agg], spec)


def _ratio_sql(spec: MetricSpec, grain: str | None) -> str:
    num, den = spec.numerator, spec.denominator
    base = MetricSpec(
        name=spec.name,
        calculation_method="count",
        expression="*",
        model=num.model,
        timestamp=spec.timestamp or num.timestamp,
        dimensions=spec.dimensions,
        filters=spec.filters,
    )
    n_cond = " AND ".join(_sql_filter(f) for f in num.filters) or None
    d_cond = " AND ".join(_sql_filter(f) for f in den.filters) or None
    n_sql = _agg_sql(num.calculation_method, num.expression, n_cond)
    d_sql = _agg_sql(den.calculation_method, den.expression, d_cond)
    value = f"CASE WHEN {d_sql} <> 0 THEN {n_sql} / {d_sql} END AS {spec.name}"
    return _select(_keys(base, grain), [value], base)


def _cumulative_sql(spec: MetricSpec, grain: str | None) -> str:
    if not grain or grain == "all_time":
        raise ValueError(f"cumulative metric {spec.name!r} requires a time grain")
    base_spec = MetricSpec(
        name="__bucket_value",
        calculation_method=spec.calculation_method,
        expression=spec.expression,
        model=spec.model,
        timestamp=spec.timestamp,
        dimensions=spec.dimensions,
        filters=spec.filters,
    )
    inner = _simple_sql(base_spec, grain)
    parts = list(spec.dimensions)
    if spec.reset_grain:
        parts.append(f"CAST(date_trunc('{spec.reset_grain}', {TS_COL}) AS DATE)")
    over = (
        f"PARTITION BY {', '.join(parts)} ORDER BY {TS_COL}"
        if parts
        else f"ORDER BY {TS_COL}"
    )
    acc = {"sum": "SUM", "count": "SUM", "min": "MIN", "max": "MAX"}[
        spec.calculation_method
    ]
    dims = "".join(f"{d}, " for d in spec.dimensions)
    return (
        f"SELECT {TS_COL}, {dims}{acc}(__bucket_value) OVER ({over} "
        f"ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS {spec.name} "
        f"FROM ({inner})"
    )
