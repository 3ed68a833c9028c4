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


def session_window_stats(
    events: DataFrame,
    gap: str = "30 minutes",
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Spark-NATIVE gap sessionization via `F.session_window` -- the
    same aggregation shape works on a batch frame and on a watermarked
    stream, which is exactly why it exists alongside the window-function
    `sessionize`: streaming jobs can't run lag/cumsum windows, but they
    can run session_window state merges.

    Output: (user_id, session_start, session_end, n_events,
    total_value).  session_end is the session-window END, i.e. last
    event + gap, not the last event time.  The merge rule matches
    `sessionize`: windows merge while the next window's start is
    <= the previous end, so an EXACTLY-gap step still merges (both
    boundary behaviors are pinned by pytest; a naive half-open `>=`
    oracle splits that step and diverges).

    NULL timestamps are dropped by session_window (same analyzer
    rewrite as F.window); the oracle pins `ts IS NOT NULL`.

    Scale: one shuffle on user_id; Catalyst's session-window merge
    sorts each user's run -- the hot-key posture matches `sessionize`
    (SCALE.md), and on streams the state store holds open sessions
    only, bounded by the watermark.
    """
    return (
        events.groupBy(
            F.session_window(ts_col, gap).alias("w"), user_col
        )
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
        .select(
            user_col,
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "total_value",
        )
    )


def funnel_stages(
    events: DataFrame,
    steps: tuple[str, ...] = ("view", "click", "purchase"),
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    max_events_per_user: int | None = None,
    max_span_us: int | None = None,
) -> DataFrame:
    """Ordered-funnel analysis: how many users reached step i having
    passed steps 0..i-1 IN TIME ORDER (first-touch semantics: step i's
    match is the earliest qualifying event at-or-after the step i-1
    match).  Output: (stage_idx, stage, n_users), one row per step.

    Spark-first shape: ONE shuffle.  Each user's qualifying events
    collapse to a sorted (ts, step_idx) array and a single
    `F.aggregate` lambda walks it as a state machine (state = deepest
    stage reached + its timestamp); the global stage counts are then
    one conditional aggregation over 1 row per user.  The equivalent
    relational form -- one min-join per step, the shape the DuckDB
    oracle uses -- costs len(steps) shuffles over the full event table,
    which is the difference between scanning 100 TB once and three
    times.  The per-user array is bounded by that user's funnel events;
    `max_events_per_user` hardens the power-user tail: when set, each
    user's state-machine walk covers only their EARLIEST k qualifying
    events by (ts, step_idx) -- a `slice(sort_array(...))` inside the
    existing aggregation, no new shuffle.  Truncation semantics: a user
    whose funnel progression happens entirely within their first k
    events is counted identically to the unbounded run (a cap at or
    above the per-user event count is a strict no-op); progressions
    that only complete after event k are (documented, deliberately)
    not counted.  Default None = unbounded.  A ts-range filter upstream
    remains the right first lever for pathological users.

    Tie discipline: the sort key is (ts, step_idx), so simultaneous
    events resolve earlier-step-first and a same-instant next step
    still matches -- exactly the oracle's `ts >= previous` semantics;
    ordering by raw event_type strings instead would silently drop
    same-instant progressions (e.g. 'click' sorts before 'view').

    NULL timestamps cannot participate in an ORDERED funnel and are
    dropped up front on both sides (the oracle's min-join carries the
    same predicate) -- otherwise Spark's nulls-first array sort would
    let a NULL-ts event advance the funnel that the oracle's
    `ts >= previous` NULL comparison blocks.

    `max_span_us` is the CONVERSION WINDOW: when set, steps 1..n-1
    only count within max_span_us microseconds of the user's step-0
    match -- "viewed, then purchased within 7 days".  First-touch,
    no chain restart (the window anchors on the EARLIEST step-0 event;
    a later in-window chain is deliberately not searched -- that
    variant needs per-chain state and a different, non-min-join
    oracle).  Semantics stay equivalent to the relational min-join
    chain with `ts <= t0 + span` on every step, which is exactly what
    the registered oracle runs.  Integer-microsecond arithmetic keeps
    the boundary (<=) engine-exact.
    """
    step_arr = F.array(*[F.lit(s) for s in steps])
    idx = F.array_position(step_arr, F.col(type_col))
    per_user = (
        events.filter(
            F.col(type_col).isin(*steps) & F.col(ts_col).isNotNull()
        )
        .select(
            F.col(user_col),
            F.struct(
                F.col(ts_col).alias("ts"), (idx - 1).alias("step")
            ).alias("ev"),
        )
        .groupBy(user_col)
        .agg(
            (
                F.sort_array(F.collect_list("ev"))
                if max_events_per_user is None
                else F.slice(
                    F.sort_array(F.collect_list("ev")),
                    1,
                    max_events_per_user,
                )
            ).alias("evs")
        )
        .select(
            user_col,
            F.aggregate(
                "evs",
                F.struct(
                    F.lit(0).cast("int").alias("stage"),
                    F.lit(None).cast("timestamp").alias("t"),
                    F.lit(None).cast("timestamp").alias("t0"),
                ),
                lambda acc, e: F.when(
                    (acc["stage"] < F.lit(len(steps)))
                    & (e["step"] == acc["stage"].cast("long"))
                    & (
                        F.lit(True)
                        if max_span_us is None
                        else (
                            (acc["stage"] == 0)
                            # cast: batch loads surface TIMESTAMP_NTZ;
                            # session tz is pinned UTC so the cast is
                            # value-preserving
                            | (
                                F.unix_micros(e["ts"].cast("timestamp"))
                                - F.unix_micros(acc["t0"].cast("timestamp"))
                                <= F.lit(max_span_us)
                            )
                        )
                    ),
                    F.struct(
                        (acc["stage"] + 1).alias("stage"),
                        e["ts"].alias("t"),
                        F.when(acc["stage"] == 0, e["ts"])
                        .otherwise(acc["t0"])
                        .alias("t0"),
                    ),
                ).otherwise(acc),
            )["stage"].alias("final_stage"),
        )
    )
    counts = per_user.agg(
        *[
            F.coalesce(
                F.sum((F.col("final_stage") >= i + 1).cast("long")), F.lit(0)
            ).alias(f"__s{i}")
            for i in range(len(steps))
        ]
    )
    stages = F.array(
        *[
            F.struct(
                F.lit(i).cast("int").alias("stage_idx"),
                F.lit(s).alias("stage"),
                F.col(f"__s{i}").alias("n_users"),
            )
            for i, s in enumerate(steps)
        ]
    )
    return counts.select(F.explode(stages).alias("r")).select(
        "r.stage_idx", "r.stage", "r.n_users"
    )


def rolling_retention(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Week-over-week rolling retention: of the users active in week w,
    how many are also active in week w+1 -- the curve product teams
    watch alongside the cohort matrix (cohort_retention anchors on the
    FIRST week ever; rolling retention re-anchors every week, so it
    answers "are this week's actives coming back" rather than "how do
    signup cohorts decay").

    Output: (week, n_active, n_retained, retention_rate), one row per
    active week; the LAST active week has no w+1 data and is emitted
    with NULL retained/rate rather than a misleading 0 (the oracle
    carries the same convention).

    ONE scan of the event table (plan-asserted), three shuffles, the
    last two over week-cardinality frames: distinct (user, week)
    [shuffle 1, partial-aggregated], a per-user `lead(week)` window
    [shuffle 2 on user], the week aggregation [shuffle 3], and the
    last-week marker via a single-partition `max` window over the
    ~weeks-rows aggregate (NOT a separate max subquery, which would
    re-scan the event table -- Spark recomputes twice-referenced
    subtrees).  The relational form -- the activity frame self-joined
    on (user, week+1), which the DuckDB oracle runs -- scans the
    distinct frame twice.  NULL timestamps carry no week and are
    excluded on both sides.
    """
    wk = F.date_trunc("week", F.col(ts_col))
    activity = (
        events.filter(F.col(ts_col).isNotNull())
        .select(F.col(user_col).alias("__u"), wk.alias("__w"))
        .distinct()
    )
    w = Window.partitionBy("__u").orderBy("__w")
    flagged = activity.withColumn("__next", F.lead("__w").over(w)).withColumn(
        "__ret",
        (F.datediff(F.col("__next"), F.col("__w")) == 7).cast("int"),
    )
    agged = flagged.groupBy(F.col("__w").cast("date").alias("week")).agg(
        F.count("*").alias("n_active"),
        F.sum("__ret").alias("__n_ret"),
    )
    w_all = Window.partitionBy()  # ~weeks rows: single partition is fine
    return agged.withColumn("__maxw", F.max("week").over(w_all)).select(
        "week",
        "n_active",
        F.when(
            F.col("week") < F.col("__maxw"),
            F.coalesce(F.col("__n_ret"), F.lit(0)),
        ).alias("n_retained"),
        F.round(
            F.when(
                F.col("week") < F.col("__maxw"),
                F.coalesce(F.col("__n_ret"), F.lit(0)) / F.col("n_active"),
            ),
            6,
        ).alias("retention_rate"),
    )


def cohort_retention(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    max_active_weeks_per_user: int | None = None,
) -> DataFrame:
    """Weekly cohort retention matrix: users cohorted by the week of
    their FIRST event, counted in every week they were active, keyed by
    whole-week offset from the cohort week.  Output: (cohort_week,
    week_offset, n_users) -- the table behind every retention curve.

    One scan, two shuffles: the user groupBy collapses each user to
    (first_ts, distinct active weeks) in a single pass (min + a
    collect_set bounded by that user's active-week count, not events),
    then the exploded (cohort, offset) pairs aggregate map-side.  The
    relational form -- a first-event subquery joined back to a distinct
    activity frame, which is what the DuckDB oracle runs -- scans the
    event table twice and shuffles three times.  Offsets divide
    exactly (both sides are week-truncated), so the integer division
    is engine-portable.

    NULL timestamps carry no week and are excluded on both sides (the
    oracle filters them in its CTEs); min/collect_set would skip them
    anyway, so the explicit filter is the documented contract, not a
    behavior change.

    Per-user state here is DISTINCT ACTIVE WEEKS (not events), already
    a much smaller bound; `max_active_weeks_per_user` caps it for the
    years-of-history tail: when set, only each user's EARLIEST k active
    weeks survive (`slice(sort_array(collect_set(...)))` inside the
    existing aggregation, no new shuffle).  The cohort week is the
    earliest week and always survives the slice, so cohort assignment
    never changes -- only retention rows at offsets beyond the user's
    k-th active week are (documented, deliberately) dropped.  A cap at
    or above every user's active-week count is a strict no-op.
    Default None = unbounded.
    """
    w_ts = F.date_trunc("week", F.col(ts_col))
    weeks = F.collect_set(w_ts)
    if max_active_weeks_per_user is not None:
        weeks = F.slice(F.sort_array(weeks), 1, max_active_weeks_per_user)
    per_user = events.filter(F.col(ts_col).isNotNull()).groupBy(user_col).agg(
        F.min(ts_col).alias("__first"),
        weeks.alias("__weeks"),
    )
    exploded = per_user.select(
        F.date_trunc("week", "__first").alias("__cw"),
        F.explode("__weeks").alias("__w"),
    )
    return exploded.groupBy(
        F.col("__cw").cast("date").alias("cohort_week"),
        (F.datediff("__w", "__cw") / 7).cast("int").alias("week_offset"),
    ).agg(F.count("*").alias("n_users"))


def interarrival_profile(
    events: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """Per-type inter-arrival-time profile: the distribution of gaps
    between a user's consecutive events of each type -- the behavioral
    latency metric engagement monitoring tracks (a p50 jump means the
    product got slower to come back to; a p99 collapse means bots).

    Gaps are exact integer microseconds from a lag window ordered by
    (ts, id) -- the id tiebreak pins simultaneous events, so both
    engines pick identical predecessors.  Percentiles are the exact
    interpolated definition shared by Spark `percentile` and DuckDB
    `quantile_cont` (the length_profile precedent).

    Output: (event_type, n_gaps, mean_gap_s, p50_s, p90_s, p99_s),
    seconds rounded to 6.  Scale: one shuffle on (user, type) for the
    lag window, one aggregation shuffle on type; exact percentile
    buffers one type's gaps per reducer -- swap percentile_approx at
    extreme cardinality (the documented length_profile trade)."""
    from pyspark.sql import Window

    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    w = Window.partitionBy(user_col, type_col).orderBy(
        us.asc(), F.col(id_col).asc()
    )
    gaps = (
        events.where(F.col(ts_col).isNotNull())
        .withColumn("__gap_us", us - F.lag(us).over(w))
        .where(F.col("__gap_us").isNotNull())
    )
    sec = F.col("__gap_us") / F.lit(1_000_000.0)
    return gaps.groupBy(type_col).agg(
        F.count("*").alias("n_gaps"),
        F.round(F.avg(sec), 6).alias("mean_gap_s"),
        F.round(F.percentile(sec, F.lit(0.5)), 6).alias("p50_s"),
        F.round(F.percentile(sec, F.lit(0.9)), 6).alias("p90_s"),
        F.round(F.percentile(sec, F.lit(0.99)), 6).alias("p99_s"),
    )
