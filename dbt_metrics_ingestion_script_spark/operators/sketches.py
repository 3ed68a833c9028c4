"""Count-Min sketch: mergeable approximate frequency counting (EXT).

The frequency-counting sibling of the HLL distinct-count rollup
(queries_ext.events_user_sketch_rollup): where HLL answers "how many
distinct", Count-Min answers "about how often does key x occur" in
O(d x w) space regardless of key cardinality, with one-sided error
(estimate >= true count, always -- hash collisions only ADD).

Built portably instead of on a JVM sketch type: a sketch here is just
rows (i, col, c) for d hash rows x w columns, counters summed by
groupBy -- which makes the two properties that matter at 100 TB
directly testable:

- **mergeable**: the sketch of a union is the cell-wise SUM of the
  sketches, so daily sketches roll up to monthly/all-time exactly
  (same algebra the metric store uses for partial states);
- **deterministic**: cells are picked by the portable 31-bit universal
  hash family (functions/hashing.py), so a DuckDB oracle replays
  every counter and every estimate bit-identically, INCLUDING the
  collision overestimates -- the error itself is verified, not
  assumed (the Bloom-filter decontamination precedent).

Scale shape: building is one partial-aggregated groupBy over
(period, i, col) -- output bounded by periods x d x w cells, never by
key cardinality; estimating joins the tiny merged sketch (broadcast)
against the query keys and takes min over the d rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import family_hash, hash31


def countmin_daily_sketches(
    df: DataFrame,
    key_col: str,
    ts_col: str = "ts",
    depth: int = 4,
    width: int = 64,
) -> DataFrame:
    """Per-day Count-Min sketches of `key_col` occurrences:
    (day, i, col, c) rows, i in [0, depth), col in [0, width).

    Rows with NULL key or NULL ts carry no countable occurrence and
    are dropped (pinned by the oracle's WHERE)."""
    if depth < 1 or width < 1:
        raise ValueError("depth and width must be >= 1")
    base = df.where(
        F.col(key_col).isNotNull() & F.col(ts_col).isNotNull()
    ).select(
        F.date_trunc("day", F.col(ts_col)).cast("date").alias("day"),
        hash31(F.col(key_col).cast("string")).alias("__h"),
    )
    rows = base.select(
        "day",
        F.posexplode(
            F.array(
                *[(family_hash(F.col("__h"), i) % width) for i in range(depth)]
            )
        ).alias("i", "col"),
    )
    return rows.groupBy("day", "i", "col").agg(F.count("*").alias("c"))


def countmin_estimate(
    sketches: DataFrame,
    keys: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 64,
    extra_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Merge the (day, i, col, c) sketches cell-wise and estimate each
    key's total occurrence count: min over the d rows of the key's
    cell -- always >= the true count (collisions only add).

    Output: (key, *extra_cols, est_count).  `extra_cols` ride the keys
    frame through the estimation (they must be functionally dependent
    on the key, e.g. a precomputed exact count) so callers don't need
    a second join -- and with it a second derivation -- of the keys
    subtree.  The merged sketch is depth x width rows -- broadcast;
    estimation is a map-side join + tiny aggregation."""
    merged = sketches.groupBy("i", "col").agg(F.sum("c").alias("c"))
    lookups = keys.select(
        F.col(key_col),
        *extra_cols,
        hash31(F.col(key_col).cast("string")).alias("__h"),
    ).select(
        key_col,
        *extra_cols,
        F.posexplode(
            F.array(
                *[(family_hash(F.col("__h"), i) % width) for i in range(depth)]
            )
        ).alias("i", "col"),
    )
    return (
        lookups.join(F.broadcast(merged), ["i", "col"])
        .groupBy(key_col, *extra_cols)
        .agg(F.min("c").alias("est_count"))
    )
