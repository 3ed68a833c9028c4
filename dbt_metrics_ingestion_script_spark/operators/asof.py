"""As-of (backward) join -- the time-series operator Spark's join
vocabulary lacks (SURVEY.md §2.11 X7; named alongside range joins as
the classic custom-operator gap).

For each left row, attach the single latest right row whose timestamp
is at-or-before the left row's timestamp, per key.  The naive
relational form is a range join (left.ts >= right.ts) plus a per-left
argmax -- quadratic on hot keys and two shuffles.  The Spark-first
form here is the UNION + WINDOW trick:

    tag right rows side=0, left rows side=1
    union them into one frame
    last(right_row_struct, ignorenulls=True) over (
        partition by key order by (ts, side)
        rows unbounded preceding .. current row)
    keep side=1 rows

One shuffle, one sort, linear in |left| + |right|; the running
`last(ignorenulls)` IS the as-of lookup.  The right row travels as ONE
struct, so the carried values are always from the same right row even
when some of them are NULL (per-column carries would mix rows).
Ordering (ts, side) puts a right row at the exact same timestamp
BEFORE the left row, so ties match (`<=` semantics), which is also
what DuckDB's native ASOF JOIN implements -- the oracle for the
registered query.

Scale posture: the window partitions by the join key, so skewed keys
concentrate in one reducer run -- same hazard class as sessionization
(SCALE.md); bound a key's history with a time-range filter upstream
when the right side grows unboundedly.  State inside the window is one
struct of carried values (RowFrame running last), never the key's
whole history.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
) -> DataFrame:
    """Left as-of join: every `left` row, plus `value_cols` (and
    `right_ts`) from the latest `right` row with
    right_ts <= left_ts for the same `on` key; nulls when no such row.

    `right` must be unique per (on, right_ts) -- pre-aggregate it
    otherwise -- so the result is deterministic (a duplicate timestamp
    would make 'the latest row' ambiguous in any engine).

    NULL timestamps: a right row with NULL right_ts can never satisfy
    `right_ts <= left_ts` and is dropped up front -- without that
    filter, Spark's nulls-first ascending sort would place it BEFORE
    every real row and `last(ignorenulls)` would carry it into every
    left row as a phantom '-infinity' match, where ASOF semantics
    (and the DuckDB oracle) return no match.  A left row with NULL
    left_ts sorts first, sees no prior right row, and gets the NULL
    fill -- already the ASOF answer, no special-casing needed.
    """
    clash = (set(value_cols) | {right_ts}) & set(left.columns)
    if clash:
        raise ValueError(
            f"right columns collide with left columns: {sorted(clash)}; "
            f"rename on the right side first"
        )
    reserved = {"__ts", "__side", "__r"} & (set(left.columns) | set(right.columns))
    if reserved:
        raise ValueError(
            f"columns collide with internal names: {sorted(reserved)}; rename first"
        )
    carried = [right_ts] + list(value_cols)
    left_only = [c for c in left.columns if c not in (on, left_ts)]
    ts_type = dict(left.dtypes)[left_ts]
    r_struct = F.struct(
        *[
            (F.col(c).cast(ts_type) if c == right_ts else F.col(c)).alias(c)
            for c in carried
        ]
    )
    r_struct_type = right.select(r_struct.alias("__r")).schema["__r"].dataType
    l_tagged = left.select(
        F.col(on),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        *[F.col(c) for c in left_only],
        F.lit(None).cast(r_struct_type).alias("__r"),
    )
    r_tagged = right.filter(F.col(right_ts).isNotNull()).select(
        F.col(on),
        F.col(right_ts).cast(ts_type).alias("__ts"),
        F.lit(0).alias("__side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_only],
        r_struct.alias("__r"),
    )
    w = (
        Window.partitionBy(on)
        .orderBy("__ts", "__side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    joined = l_tagged.unionByName(r_tagged).select(
        on,
        "__ts",
        "__side",
        *left_only,
        F.last("__r", ignorenulls=True).over(w).alias("__r"),
    )
    return joined.filter(F.col("__side") == 1).select(
        on,
        F.col("__ts").alias(left_ts),
        *left_only,
        *[F.col("__r")[c].alias(c) for c in carried],
    )
