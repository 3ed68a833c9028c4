"""Registry-wide oracle/Spark type parity (round-2 verdict item 2).

The driver's value-hash is type-sensitive: a DuckDB oracle column that
comes out HUGEINT (``SUM`` over BIGINT promotes to INT128) where Spark
emits BIGINT hash-mismatches even when every value is identical — the
exact round-2 failure mode for ``corpus_pack_next_fit``,
``corpus_training_pipeline`` and ``events_sessionization``.

This module makes the whole class of bug impossible to reintroduce:
for every registered oracle we ``DESCRIBE`` the SQL in DuckDB
(metadata-only — no rows are scanned) and

1. forbid HUGEINT/UHUGEINT outright (write ``CAST(SUM(x) AS BIGINT)``),
2. assert the DuckDB column types map onto the Spark result schema
   column-for-column.
"""

from __future__ import annotations

import re

import duckdb
import pytest

from dbt_metrics_ingestion_script_spark import queries as _q
from dbt_metrics_ingestion_script_spark.sources.tables import TABLES

from .conftest import SF_DIR

_q.queries()  # load every query module so REGISTRY is complete

_FORBIDDEN = ("HUGEINT", "UHUGEINT")


def _oracle_schema(con, sql: str) -> list[tuple[str, str]]:
    cur = con.execute(f"DESCRIBE ({sql})")
    return [(r[0], r[1]) for r in cur.fetchall()]


def _canon_duck(t: str) -> str:
    """Collapse a DuckDB type to the comparison class the driver's
    hash effectively distinguishes."""
    t = t.upper()
    m = re.fullmatch(r"(\w+)\[\]", t)
    if m:
        return f"array<{_canon_duck(m.group(1))}>"
    if t in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT", "UTINYINT",
             "USMALLINT", "UINTEGER", "UBIGINT"):
        return "int"
    if t in ("DOUBLE", "FLOAT", "REAL"):
        return "float"
    if t.startswith("DECIMAL"):
        return "decimal"
    if t in ("VARCHAR", "TEXT", "STRING"):
        return "str"
    if t == "DATE":
        return "date"
    if t.startswith("TIMESTAMP"):
        return "timestamp"
    if t == "BOOLEAN":
        return "bool"
    return t.lower()


def _canon_spark(t: str) -> str:
    m = re.fullmatch(r"array<(.+)>", t)
    if m:
        return f"array<{_canon_spark(m.group(1))}>"
    if t in ("tinyint", "smallint", "int", "bigint"):
        return "int"
    if t in ("float", "double"):
        return "float"
    if t.startswith("decimal"):
        return "decimal"
    if t == "string":
        return "str"
    if t == "date":
        return "date"
    if t.startswith("timestamp"):
        return "timestamp"
    if t == "boolean":
        return "bool"
    return t


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


_WITH_ORACLE = sorted(
    name for name, qd in _q.REGISTRY.items() if qd.oracle is not None
)


@pytest.mark.parametrize("name", _WITH_ORACLE)
def test_oracle_has_no_hugeint(duck, name):
    schema = _oracle_schema(duck, _q.REGISTRY[name].oracle)
    bad = [(c, t) for c, t in schema if any(f in t.upper() for f in _FORBIDDEN)]
    assert not bad, (
        f"{name}: oracle emits {bad} — DuckDB promotes SUM(BIGINT) to "
        f"HUGEINT, which the driver's type-sensitive hash cannot match "
        f"against Spark's bigint; wrap in CAST(... AS BIGINT)"
    )


@pytest.mark.parametrize("name", _WITH_ORACLE)
@pytest.mark.slow
def test_oracle_types_match_spark(duck, spark, name):
    qd = _q.REGISTRY[name]
    o_schema = dict(_oracle_schema(duck, qd.oracle))
    s_schema = dict(qd.fn(spark, SF_DIR).dtypes)
    assert sorted(o_schema) == sorted(s_schema), (
        f"{name}: column names differ: {sorted(o_schema)} vs {sorted(s_schema)}"
    )
    diffs = {
        c: (o_schema[c], s_schema[c])
        for c in o_schema
        if _canon_duck(o_schema[c]) != _canon_spark(s_schema[c])
    }
    assert not diffs, f"{name}: oracle/Spark type mismatch: {diffs}"
