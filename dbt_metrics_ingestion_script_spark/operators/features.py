"""Point-in-time-correct rolling feature engineering over event streams
(the feature-store shape: multi-horizon trailing aggregates attached to
every event, usable as training features without label leakage).

Behavior spec: EXT scope -- no counterpart in /root/reference (the
reference stops at metric emission); this is the training-data side of
the same events tables the metric layer aggregates.

Time arithmetic runs on INTEGER MICROSECONDS (unix_micros in Spark,
epoch_us in the DuckDB oracle) so RANGE frame bounds are exact integers
-- interval arithmetic near DST boundaries differs between engines,
integer microseconds never do.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

US_PER_HOUR = 3_600 * 1_000_000
US_PER_DAY = 24 * US_PER_HOUR

# (feature suffix, horizon in µs) -- the multi-horizon inventory a
# behavioral model consumes: burst (1h), daily rhythm (24h), weekly
# habit (7d)
DEFAULT_HORIZONS = [
    ("1h", US_PER_HOUR),
    ("24h", US_PER_DAY),
    ("7d", 7 * US_PER_DAY),
]


def rolling_user_features(
    events: DataFrame,
    horizons: list[tuple[str, int]] | None = None,
    ts_col: str = "ts",
    user_col: str = "user_id",
    id_col: str = "event_id",
    value_col: str = "value",
) -> DataFrame:
    """Per-event trailing activity features over multiple horizons:
    for every event, the count of the user's PRIOR events and the sum
    of their `value` within each trailing window.

    Point-in-time correctness: every frame ends at 1 µs BEFORE the
    current event (RANGE ... PRECEDING AND 1 PRECEDING), so the
    feature vector at time t sees strictly-earlier events only --
    including co-timestamped peers, which a CURRENT ROW bound would
    leak (at training time the label event itself must never inform
    its own features).  Events with NULL timestamp or user are not
    featurizable and are dropped on both engines.

    Scale shape: ALL horizons ride ONE window partitioning
    (user, ts-µs) -- Catalyst plans a single hash-partition Exchange +
    one Sort shared by every frame (locked in test_plan_shape), so
    adding a horizon costs zero extra shuffles.  The frame state per
    user is bounded by the longest horizon's event count; a skewed
    power user bounds at their 7d volume, not their history.  Output
    sums are rounded to 6dp (float accumulation order differs at ulp
    level between engines).
    """
    horizons = DEFAULT_HORIZONS if horizons is None else horizons
    df = events.where(
        F.col(ts_col).isNotNull() & F.col(user_col).isNotNull()
    ).withColumn("__us", F.unix_micros(F.col(ts_col).cast("timestamp")))
    cols = [F.col(id_col), F.col(user_col), F.col(ts_col)]
    for suffix, span_us in horizons:
        w = (
            Window.partitionBy(user_col)
            .orderBy("__us")
            .rangeBetween(-span_us, -1)
        )
        cols.append(F.count(F.lit(1)).over(w).alias(f"n_{suffix}"))
        cols.append(
            F.round(
                F.coalesce(F.sum(value_col).over(w), F.lit(0.0)), 6
            ).alias(f"value_{suffix}")
        )
    return df.select(*cols)
