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


def oracle_sql_for(
    spec: MetricSpec,
    grain: str | None = None,
    registry: dict[str, MetricSpec] | None = None,
) -> str:
    """Render the DuckDB SQL equivalent of compiler.compile(spec, grain).

    The model name is used as the table name (the driver pre-registers
    each parquet table as a view of the same name). Derived metrics
    need `registry` to resolve their input specs (mirroring
    MetricCompiler.registry).
    """
    if spec.metric_type == "simple":
        return _simple_sql(spec, grain)
    if spec.metric_type == "ratio":
        return _ratio_sql(spec, grain)
    if spec.metric_type == "cumulative":
        return _cumulative_sql(spec, grain)
    if spec.metric_type in ("derived", "expression"):
        return _derived_sql(spec, grain, registry or {}, visiting=())
    raise ValueError(f"no SQL oracle renderer for metric type {spec.metric_type!r}")


def _spec_columns(spec: MetricSpec, grain: str | None) -> list[str]:
    """Output column names of compiler.compile(spec, grain), in order."""
    return [a for _, a in _keys(spec, grain)] + [spec.name]


def _derived_sql(
    spec: MetricSpec,
    grain: str | None,
    registry: dict[str, MetricSpec],
    visiting: tuple,
) -> str:
    """Mirror _compile_derived: render each input, chain FULL JOIN USING
    on the keys shared so far (USING merges key columns in both engines),
    then evaluate the expression over the joined frame."""
    if spec.name in visiting:
        chain = " -> ".join(visiting + (spec.name,))
        raise ValueError(f"derived-metric cycle: {chain}")
    visiting = visiting + (spec.name,)
    ctes: list[str] = []
    frames: list[tuple[str, list[str]]] = []  # (cte_name, columns)
    for i, m in enumerate(spec.input_metrics):
        if m not in registry:
            raise ValueError(f"derived metric {spec.name!r}: unknown input metric {m!r}")
        sub = registry[m]
        if sub.metric_type in ("derived", "expression"):
            sql = _derived_sql(sub, grain, registry, visiting)
        else:
            sql = oracle_sql_for(sub, grain)
        cte = f"__m{i}"
        ctes.append(f"{cte} AS ({sql})")
        frames.append((cte, _spec_columns(sub, grain)))
    names = [m for m in spec.input_metrics]
    first_cte, first_cols = frames[0]
    key_cols = [c for c in first_cols if c not in names]
    joined = first_cte
    joined_cols = list(first_cols)
    for i, (cte, cols) in enumerate(frames[1:], start=1):
        shared = [c for c in key_cols if c in cols]
        if shared:
            joined = f"{joined} FULL JOIN {cte} USING ({', '.join(shared)})"
        else:
            joined = f"{joined} CROSS JOIN {cte}"
        joined_cols += [c for c in cols if c not in shared]
    out_keys = [c for c in joined_cols if c not in names]
    sel = "".join(f"{k}, " for k in out_keys)
    return (
        f"WITH {', '.join(ctes)} "
        f"SELECT {sel}{spec.expression} AS {spec.name} FROM {joined}"
    )


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
