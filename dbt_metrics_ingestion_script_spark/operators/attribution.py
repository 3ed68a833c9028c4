"""Marketing-style multi-touch attribution over the event stream (EXT).

Attribution answers "which touchpoints get credit for a conversion":
every view/click a user produced in the lookback window before a
purchase shares that purchase's value.  Linear attribution splits the
value EQUALLY across the window's touches -- the order-free baseline
model (first-touch / last-touch are argmin/argmax specializations the
as-of join already covers: operators/asof.py).

Scale shape: the touch-to-conversion pairing is a point-in-interval
range join -- each conversion owns the interval
[ts - lookback, ts] and each touch is a point -- so it reuses
`range_join_points`' bucketized replication (operators/ranges.py):
conversions replicate per time bucket, touches hash to their single
bucket, the join stays an equi-join on (user, bucket), and nothing is
quadratic in per-user activity.  Credit division then needs one window
count per conversion and one final aggregation shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .ranges import range_join_points


def linear_attribution(
    events: DataFrame,
    touch_types: tuple[str, ...] = ("view", "click"),
    conversion_type: str = "purchase",
    lookback_days: int = 7,
    bucket_minutes: int = 24 * 60,
) -> DataFrame:
    """Per-touch-type linear attribution: each conversion's `value` is
    split equally over the user's touches inside the inclusive
    [conv_ts - lookback_days, conv_ts] window; output one row per
    touch type with (n_touches, attributed_value).

    Conversions with no in-window touch attribute nothing (inner
    join); NULL-ts rows on either side never satisfy the event-time
    bound; NULL conversion values flow NULL credit, which the sum
    ignores -- all three pinned by the oracle.
    """
    if lookback_days < 1:
        raise ValueError("lookback_days must be >= 1")
    touches = events.where(
        F.col("event_type").isin(*touch_types) & F.col("ts").isNotNull()
    ).select(
        F.col("user_id"),
        F.col("event_id").alias("touch_id"),
        F.col("event_type").alias("touch_type"),
        F.col("ts"),
    )
    conversions = events.where(
        (F.col("event_type") == conversion_type) & F.col("ts").isNotNull()
    ).select(
        F.col("user_id"),
        F.col("event_id").alias("conv_id"),
        F.col("value"),
        (F.col("ts") - F.expr(f"INTERVAL {lookback_days} DAYS")).alias(
            "__start"
        ),
        F.col("ts").alias("__end"),
    )
    pairs = range_join_points(
        touches,
        conversions,
        on="user_id",
        point_ts="ts",
        start_col="__start",
        end_col="__end",
        bucket_minutes=bucket_minutes,
    )
    w = Window.partitionBy("conv_id")
    credit = F.col("value") / F.count("*").over(w)
    return (
        pairs.select("touch_type", credit.alias("__credit"))
        .groupBy("touch_type")
        .agg(
            F.count("*").alias("n_touches"),
            F.round(F.sum("__credit"), 6).alias("attributed_value"),
        )
    )
