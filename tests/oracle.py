"""Local replica of the driver's differential check: run a Spark query
and its DuckDB oracle SQL side by side, compare row count, column names,
and order-insensitively compared values (floats to a tolerance)."""

from __future__ import annotations

import math

import duckdb

from dbt_metrics_ingestion_script_spark.sources.tables import TABLES


def run_oracle(sql: str, sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    return cols, cur.fetchall()


def _norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 9)
    return v


def _norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(_norm_cell(r[i]) for i in order))
    return sorted(out, key=repr)


def assert_matches_oracle(spark_df, sql: str, sf_dir: str, float_tol: float = 1e-6):
    s_cols = spark_df.columns
    s_rows = [tuple(r) for r in spark_df.collect()]
    o_cols, o_rows = run_oracle(sql, sf_dir)
    assert sorted(s_cols) == sorted(o_cols), f"columns differ: {s_cols} vs {o_cols}"
    assert len(s_rows) == len(o_rows), f"row count differs: {len(s_rows)} vs {len(o_rows)}"
    sn = _norm_rows(s_cols, s_rows)
    on = _norm_rows(o_cols, o_rows)
    for i, (a, b) in enumerate(zip(sn, on)):
        for x, y in zip(a, b):
            if isinstance(x, float) and isinstance(y, float):
                assert math.isclose(x, y, rel_tol=float_tol, abs_tol=float_tol), (
                    f"row {i}: {a} vs {b}"
                )
            else:
                # normalize date/datetime midnight equivalence
                xs, ys = str(x), str(y)
                if xs.endswith(" 00:00:00"):
                    xs = xs[:-9]
                if ys.endswith(" 00:00:00"):
                    ys = ys[:-9]
                assert xs == ys, f"row {i}: {a} vs {b}"
