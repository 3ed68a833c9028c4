"""String/scalar column helpers (SURVEY.md §2.7)."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def coalesce_nonempty(*cols: Column | str) -> Column:
    """Python `a or b` semantics: skip NULL *and* empty string.

    SQL coalesce only skips NULL -- the reference's `alias or name` /
    `label or name` fallbacks (/root/reference/dbt_metrics_to_datahub.py:
    229,244,312) treat '' as falsy, so '' must fall through too
    (SURVEY.md §7 watch-list 3).
    """
    out = None
    for c in cols:
        col = F.col(c) if isinstance(c, str) else c
        guarded = F.when(col.isNotNull() & (F.length(col) > 0), col)
        out = guarded if out is None else F.coalesce(out, guarded)
    return out


def csv_join(col: Column | str, sep: str = ", ") -> Column:
    """Array -> 'a, b, c' (reference ', '.join, F5)."""
    return F.concat_ws(sep, F.col(col) if isinstance(col, str) else col)
