"""MERGE INTO semantics as a pure DataFrame plan (EXT; the lakehouse
upsert).

Delta/Iceberg expose `MERGE INTO target USING source ON key WHEN
MATCHED THEN UPDATE WHEN NOT MATCHED THEN INSERT [WHEN NOT MATCHED BY
SOURCE THEN DELETE]`.  The engine-level operation under that syntax is
a keyed FULL OUTER reconcile producing the next snapshot -- expressed
here declaratively so it runs on plain parquet, composes with the
incremental-index writers (sinks/signature_index.py grows by append;
this grows by reconcile), and stays differentially testable.

Scale shape: one full-outer shuffle join on the merge key (broadcast
when the source batch is small -- the common CDC case; AQE picks).
Nothing driver-side; the action column is computed per row, so the
same plan serves "return the snapshot" (filter out deletes) and
"return the change feed" (keep the action column) -- materializing the
snapshot is then an ordinary partitioned write.

Key rules (pinned by tests and the oracle):
- the merge key must be unique and non-NULL on BOTH sides -- enforced
  upstream (dq.constraint_report's duplicates + completeness checks
  are the gate); duplicate keys make MERGE ambiguous and real engines
  reject it the same way;
- a NULL key that does slip through never equi-joins: it surfaces as
  an independent keep/insert row (standard SQL join semantics, pinned
  by test) instead of corrupting a matched row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def merge_upsert(
    target: DataFrame,
    source: DataFrame,
    key_col: str,
    delete_missing: bool = False,
) -> DataFrame:
    """Next-snapshot rows with their change action:

    - key in both           -> action 'update' (source row wins)
    - key only in source    -> action 'insert'
    - key only in target    -> action 'keep' (or 'delete' when
      `delete_missing`, i.e. WHEN NOT MATCHED BY SOURCE THEN DELETE)

    Output: key, every non-key column of the (shared) schema with the
    winning side's values, and `action`.  Callers materialize the
    snapshot with `.where(action != 'delete')` or feed the full frame
    downstream as a change feed.  Both inputs must share the schema;
    validated eagerly so drift fails at plan time.
    """
    if set(target.columns) != set(source.columns):
        raise ValueError(
            f"merge_upsert: schema mismatch target={sorted(target.columns)} "
            f"source={sorted(source.columns)}"
        )
    if key_col not in target.columns:
        raise ValueError(f"merge key {key_col!r} not in schema")
    cols = [c for c in target.columns if c != key_col]
    t = target.select(
        F.col(key_col).alias("__k"),
        F.lit(1).alias("__in_t"),
        *[F.col(c).alias(f"__t_{c}") for c in cols],
    )
    s = source.select(
        F.col(key_col).alias("__k"),
        F.lit(1).alias("__in_s"),
        *[F.col(c).alias(f"__s_{c}") for c in cols],
    )
    joined = t.join(s, "__k", "full_outer")
    action = (
        F.when(
            F.col("__in_t").isNotNull() & F.col("__in_s").isNotNull(),
            F.lit("update"),
        )
        .when(F.col("__in_s").isNotNull(), F.lit("insert"))
        .otherwise(F.lit("delete") if delete_missing else F.lit("keep"))
    )
    return joined.select(
        F.col("__k").alias(key_col),
        *[
            F.when(
                F.col("__in_s").isNotNull(), F.col(f"__s_{c}")
            ).otherwise(F.col(f"__t_{c}")).alias(c)
            for c in cols
        ],
        action.alias("action"),
    )
