"""Gap-based event sessionization (SURVEY.md §2.5 window depth).

The classic behavioral-analytics operator: order a user's events by
time, start a new session whenever the gap to the previous event
exceeds the timeout, then aggregate per session.  Expressed entirely
with window functions so it is SQL-portable (full DuckDB oracle) and
stays JVM-side:

    lag(us) over (user, ts)   ->  new_session flag
    sum(flag) over (user, ts) ->  session index
    groupBy(user, session)    ->  session stats

Time arithmetic runs on INTEGER MICROSECONDS (unix_micros / epoch_us)
on both engines: casting a timestamp to seconds would truncate
sub-second gaps differently per engine and flip sessions right at the
timeout boundary.

Scale posture: both windows and the final aggregation hash-partition on
user_id, so the plan carries ONE data shuffle (the window exchange is
reused by the groupBy -- grouping keys contain the partition key).
Per-user state inside the window is a single previous-row lookback
(RowFrame lag), never the whole history.  Skewed power-users are the
hazard at 100 TB; AQE skew handling applies, and a ts-bounded session
horizon (filter first) bounds any one user's row run.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    events: DataFrame,
    gap_minutes: int = 30,
    user_col: str = "user_id",
    ts_col: str = "ts",
    order_tiebreak: str = "event_id",
) -> DataFrame:
    """Per-session stats: (user_id, session_idx, n_events, session_start,
    session_end, duration_us).

    The ordering is (ts, tiebreak-id) so runs are deterministic when a
    user has simultaneous events -- a differential-oracle requirement,
    not just hygiene.
    """
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    w = Window.partitionBy(user_col).orderBy(ts_col, order_tiebreak)
    gap_us = gap_minutes * 60 * 1_000_000
    base = events.withColumn("__us", us)
    gap = F.col("__us") - F.lag("__us").over(w)
    new_session = F.when(gap.isNull() | (gap > gap_us), F.lit(1)).otherwise(
        F.lit(0)
    )
    with_idx = base.withColumn("__new", new_session).withColumn(
        "session_idx",
        F.sum("__new").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return with_idx.groupBy(F.col(user_col), F.col("session_idx")).agg(
        F.count("*").alias("n_events"),
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        (F.max("__us") - F.min("__us")).alias("duration_us"),
    )
