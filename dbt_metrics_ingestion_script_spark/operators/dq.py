"""Declarative data-quality constraint checking (EXT; Deequ-style).

The audit a pipeline runs BEFORE trusting a 100 TB fact table:
completeness per column, value-bound violations, key uniqueness, and
referential integrity -- compiled into as few passes as the checks
allow instead of one job per check:

- every column-local check (completeness, bounds, uniqueness,
  distinct) folds into ONE aggregation over one scan: each check is a
  conditional aggregate expression, so adding a check adds a column to
  the agg, not a pass over the data;
- referential integrity is the only check needing a second table: an
  orphan COUNT via left-anti join (broadcast when the parent is a dim,
  shuffled otherwise -- Catalyst picks);
- the wide 1-row aggregate then unpivots into tidy (check, column,
  value) rows via an inline array-of-struct explode (still one scan).

The quarantine machinery (pipeline.py E1) handles row-level isolation;
this operator is the corpus-level scorecard those decisions roll up
into.  All outputs are exact counts / exact ratios of counts, so the
oracle replays every value.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def constraint_report(
    df: DataFrame,
    completeness: tuple[str, ...] = (),
    bounds: dict[str, tuple[float, float]] | None = None,
    unique: tuple[str, ...] = (),
    fk: tuple[str, DataFrame, str] | None = None,
) -> DataFrame:
    """Tidy (check_name, col_name, value) report:

    - completeness: fraction of non-NULL values per listed column;
    - bounds: count of non-NULL values outside [lo, hi] (inclusive);
    - unique: duplicate count = rows - distinct values (0 == unique;
      NULLs count as rows but not as values, surfacing as duplicates
      -- a nullable "primary key" should fail);
    - fk: (child_key, parent_df, parent_key) -> orphan count of
      non-NULL child keys with no parent row.

    Ratios round to 6 decimals; counts are exact doubles (the report
    is one numeric column, so counts cast to double for a single
    schema).
    """
    bounds = bounds or {}
    aggs = [F.count(F.lit(1)).alias("__n")]
    entries: list[tuple[str, str, str]] = []  # (check, column, agg alias)
    for c in completeness:
        a = f"__comp_{c}"
        aggs.append(F.count(F.col(c)).alias(a))
        entries.append(("completeness", c, a))
    for c, (lo, hi) in bounds.items():
        a = f"__bounds_{c}"
        viol = F.when(
            F.col(c).isNotNull() & ((F.col(c) < lo) | (F.col(c) > hi)), 1
        )
        aggs.append(F.count(viol).alias(a))
        entries.append(("bounds_violations", c, a))
    for c in unique:
        a = f"__uniq_{c}"
        aggs.append(
            (F.count(F.lit(1)) - F.countDistinct(F.col(c))).alias(a)
        )
        entries.append(("duplicates", c, a))

    wide = df.agg(*aggs)
    if fk is not None:
        child_key, parent, parent_key = fk
        orphans = (
            df.where(F.col(child_key).isNotNull())
            .join(
                parent.select(F.col(parent_key).alias(child_key)).distinct(),
                child_key,
                "left_anti",
            )
            .agg(F.count(F.lit(1)).alias("__orphans"))
        )
        wide = wide.crossJoin(orphans)
        entries.append(("fk_orphans", child_key, "__orphans"))

    structs = [
        F.struct(
            F.lit("row_count").alias("check_name"),
            F.lit("*").alias("col_name"),
            F.col("__n").cast("double").alias("value"),
        )
    ]
    for check, col, alias in entries:
        value = (
            F.round(F.col(alias) / F.col("__n"), 6)
            if check == "completeness"
            else F.col(alias).cast("double")
        )
        structs.append(
            F.struct(
                F.lit(check).alias("check_name"),
                F.lit(col).alias("col_name"),
                value.alias("value"),
            )
        )
    return wide.select(
        F.explode(F.array(*structs)).alias("__r")
    ).select("__r.check_name", "__r.col_name", "__r.value")


def checksum_buckets(
    df: DataFrame,
    key_col: str,
    n_buckets: int = 16,
) -> DataFrame:
    """Anti-entropy table summary (the data-diff primitive): collapse
    a table into `n_buckets` (bucket, n_rows, checksum) rows so two
    replicas / two snapshots / two ENGINES reconcile by comparing
    2 x n_buckets rows instead of shipping full tables; a mismatched
    bucket then narrows the row-level investigation to ~1/n_buckets of
    the data (recurse with more buckets for binary search).

    Determinism and portability: the row fingerprint is the portable
    md5-based hash of every column value joined with an uncollidable
    unit separator, masked to 31 bits so a per-bucket int64 SUM cannot
    overflow below ~4B rows per bucket -- overflow behavior is the
    classic cross-engine checksum trap, designed out rather than
    handled.  NULLs fingerprint as a sentinel distinct from the empty
    string (chr(1) sentinel).  Order-insensitive by construction (SUM), so partitioning
    and shuffle order never change a checksum.
    """
    if n_buckets < 1:
        raise ValueError("n_buckets must be >= 1")
    from ..functions.hashing import hash31

    cols = [
        F.coalesce(F.col(c).cast("string"), F.lit("\x01null"))
        for c in df.columns
    ]
    row_hash = hash31(F.concat_ws("\x1f", *cols))
    bucket = hash31(F.col(key_col).cast("string")) % n_buckets
    return (
        df.select(bucket.alias("bucket"), row_hash.alias("__h"))
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n_rows"),
            F.sum("__h").alias("checksum"),
        )
    )
