"""Custom stateful streaming operators (applyInPandasWithState).

SURVEY.md §2.8: the reference is strictly batch, so these are EXT --
the two stateful shapes a large-scale ingest pipeline needs that
tumbling windows can't express:

- running_totals_by_key: cumulative (since stream start) per-key metric
  totals, the streaming analogue of the cumulative metric type
  (/root/reference/example_dbt_metrics.yml:78-92) where the window is
  "everything so far" rather than a tumbling bucket.  State per key is
  two scalars, emitted in `update` mode each micro-batch.
- streaming_exact_dedup: emit only the first occurrence of each content
  hash across the whole stream (exactly-once semantics for corpus
  ingestion).  State per hash is a single marker with a configurable
  TTL so state stays bounded at 100 TB (a duplicate arriving after the
  TTL re-emits -- the standard state/completeness trade-off, same knob
  as Spark's own dropDuplicates watermark).

Both use Arrow-batched Pandas state functions (applyInPandasWithState),
never row-at-a-time Python; the groupBy key is the shuffle key, so
state is partition-local and scales horizontally with executors.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

RUNNING_TOTALS_SCHEMA = StructType(
    [
        StructField("key", StringType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
    ]
)

_RUNNING_STATE_SCHEMA = StructType(
    [StructField("n", LongType()), StructField("s", DoubleType())]
)


def running_totals_by_key(
    events: DataFrame, key_col: str = "event_type", value_col: str = "value"
) -> DataFrame:
    """Cumulative per-key (count, sum) over the whole stream, one updated
    row per key per micro-batch that touches the key."""

    def update(
        key, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        n, s = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            s += float(pdf[value_col].sum())
        state.update((n, s))
        yield pd.DataFrame({"key": [key[0]], "n_events": [n], "total_value": [s]})

    return (
        events.select(key_col, value_col)
        .groupBy(key_col)
        .applyInPandasWithState(
            update,
            RUNNING_TOTALS_SCHEMA,
            _RUNNING_STATE_SCHEMA,
            "update",
            GroupStateTimeout.NoTimeout,
        )
    )


DEDUP_SCHEMA = StructType(
    [
        StructField("content_hash", LongType()),
        StructField("event_id", LongType()),
    ]
)

_SEEN_STATE_SCHEMA = StructType([StructField("seen", LongType())])


def streaming_exact_dedup(
    hashed: DataFrame,
    hash_col: str = "content_hash",
    id_col: str = "event_id",
    state_ttl_ms: int = 0,
) -> DataFrame:
    """First-occurrence-wins streaming dedup on a precomputed 64-bit
    content hash (compute it upstream with functions.hashing.hash64 --
    the JVM side stays vectorized; only the tiny (hash, id) pairs reach
    Python).  `state_ttl_ms` > 0 bounds state via processing-time
    timeout; 0 keeps state forever (small corpora / tests)."""
    # plain bool for the worker-side closure: comparing the unpickled
    # GroupStateTimeout string constant by identity inside the state
    # function is unreliable after the pickle round-trip
    use_ttl = state_ttl_ms > 0
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if use_ttl
        else GroupStateTimeout.NoTimeout
    )

    def update(
        key, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if use_ttl and state.hasTimedOut:
            state.remove()
            return
        first_id = None
        for pdf in pdfs:
            batch_min = int(pdf[id_col].min())
            first_id = batch_min if first_id is None else min(first_id, batch_min)
        is_new = not state.exists
        if is_new and first_id is not None:
            state.update((1,))
        # Spark clears a group's timeout on EVERY invocation of the state
        # function, so the TTL must be re-armed for existing keys too --
        # otherwise one duplicate arrival pins the key in state forever.
        # Net semantics: TTL since last sighting (sliding), which is the
        # bounded-state guarantee the docstring promises.
        if use_ttl and state.exists:
            state.setTimeoutDuration(state_ttl_ms)
        if is_new and first_id is not None:
            yield pd.DataFrame({"content_hash": [key[0]], "event_id": [first_id]})

    return (
        hashed.select(hash_col, id_col)
        .groupBy(hash_col)
        .applyInPandasWithState(
            update, DEDUP_SCHEMA, _SEEN_STATE_SCHEMA, "update", timeout
        )
    )


FUNNEL_STATE_SCHEMA = StructType(
    [StructField("stage", LongType()), StructField("t0_us", LongType())]
)

FUNNEL_OUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("final_stage", LongType()),
    ]
)


def streaming_funnel_stages(
    events: DataFrame,
    steps: tuple[str, ...] = ("view", "click", "purchase"),
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    max_span_us: int | None = None,
) -> DataFrame:
    """Stateful streaming funnel: per-user funnel progression maintained
    across micro-batches (state = deepest stage reached + the step-0
    anchor timestamp for the optional conversion window), emitting the
    user's current final_stage in `update` mode whenever a batch
    touches the user.  The streaming analogue of
    `sessions.funnel_stages` -- the state machine is IDENTICAL (same
    first-touch, same (ts, step) tie ordering, same span rule), so the
    drained stream converges to the batch per-user stages, which is how
    it is tested.

    Ordering contract: events are sorted within each micro-batch, and
    state only advances, so the stream computes the batch answer when
    each user's events arrive batch-monotonically (per-user event-time
    order across batches -- the shape log streams and watermark-sorted
    feeds provide).  A cross-batch out-of-order event can under-count a
    progression, never over-count (the state machine skips
    non-qualifying events); bound disorder upstream with a watermark +
    sorting stage when the source needs it.

    State per user is two longs -- flat at any corpus scale; the
    groupBy key is the shuffle key, so state is partition-local.
    """
    step_idx = {s: i for i, s in enumerate(steps)}
    n_steps = len(steps)

    def update(
        key, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        stage, t0_us = state.get if state.exists else (0, None)
        batch = pd.concat(list(pdfs), ignore_index=True)
        batch = batch.dropna(subset=[ts_col])
        if len(batch):
            batch["__step"] = batch[type_col].map(step_idx)
            batch = batch.dropna(subset=["__step"]).copy()
            batch["__step"] = batch["__step"].astype("int64")
            # unit-robust: pandas surfaces parquet timestamps as ns OR
            # us depending on version; normalize through datetime64[us]
            batch["__us"] = (
                batch[ts_col].values.astype("datetime64[us]").astype("int64")
            )
            batch = batch.sort_values([ts_col, "__step"])
            for us, step in zip(batch["__us"], batch["__step"]):
                if stage >= n_steps or step != stage:
                    continue
                if (
                    max_span_us is not None
                    and stage > 0
                    and us - t0_us > max_span_us
                ):
                    continue
                if stage == 0:
                    t0_us = int(us)
                stage += 1
        state.update((int(stage), t0_us))
        yield pd.DataFrame(
            {"user_id": [key[0]], "final_stage": [int(stage)]}
        )

    return (
        events.select(user_col, ts_col, type_col)
        .groupBy(user_col)
        .applyInPandasWithState(
            update,
            FUNNEL_OUT_SCHEMA,
            FUNNEL_STATE_SCHEMA,
            "update",
            GroupStateTimeout.NoTimeout,
        )
    )


# ---------------------------------------------------------------------------
# streaming heavy hitters (space-saving summary)
# ---------------------------------------------------------------------------

HEAVY_HITTERS_SCHEMA = StructType(
    [
        StructField("key", StringType()),
        StructField("est_count", LongType()),
        StructField("max_err", LongType()),
        StructField("n_total", LongType()),
    ]
)

_HH_STATE_SCHEMA = StructType(
    [
        StructField("keys", ArrayType(StringType())),
        StructField("counts", ArrayType(LongType())),
        StructField("errs", ArrayType(LongType())),
        StructField("n", LongType()),
    ]
)


def space_saving_heavy_hitters(
    events, key_col: str = "user_id", m: int = 32
):
    """Streaming top-key summary by the space-saving algorithm (Metwally
    et al. 2005): at most `m` tracked counters; an untracked arrival
    evicts the minimum counter and inherits its count as error.  The
    classic guarantees hold whatever the arrival order: every key with
    true frequency > n/m is tracked, and for every tracked key
    true <= est_count <= true + max_err with max_err <= n/m.

    With m >= the stream's distinct-key count nothing ever evicts and
    the summary converges to EXACT counts -- the registered driver
    query runs in that regime so the stateful plumbing gets a full
    batch-SQL oracle; the eviction regime is pinned by property tests
    against exact per-prefix counts.

    Scale: rows reach the single summary group pre-projected to the
    key column only.  The single-group fold is the textbook
    single-node summary; at cluster scale space-saving summaries are
    MERGEABLE (Agarwal et al. 2012), so the production shape is one
    summary per partition folded pairwise -- the per-partition state
    function is this same update, and the merge is the insertion loop
    over (key, count) pairs, both exercised here.

    Emits the full current summary each micro-batch (update mode);
    the converged frame is the rows with the final n_total.
    """

    def update(
        key, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            keys, counts, errs, n = state.get
            summary = {
                k: [c, e] for k, c, e in zip(keys, counts, errs)
            }
        else:
            summary, n = {}, 0
        for pdf in pdfs:
            vc = pdf[key_col].value_counts()
            n += int(vc.sum())
            # deterministic insertion order: by (-batch_count, key), so
            # the same batch contents always produce the same summary
            for k in sorted(vc.index, key=lambda x: (-int(vc[x]), str(x))):
                c = int(vc[k])
                k = str(k)
                if k in summary:
                    summary[k][0] += c
                elif len(summary) < m:
                    summary[k] = [c, 0]
                else:
                    victim = min(
                        summary.items(), key=lambda kv: (kv[1][0], kv[0])
                    )
                    vmin = victim[1][0]
                    del summary[victim[0]]
                    summary[k] = [c + vmin, vmin]
        ks = sorted(summary)
        state.update(
            (
                ks,
                [summary[k][0] for k in ks],
                [summary[k][1] for k in ks],
                n,
            )
        )
        yield pd.DataFrame(
            {
                "key": ks,
                "est_count": [summary[k][0] for k in ks],
                "max_err": [summary[k][1] for k in ks],
                "n_total": [n] * len(ks),
            }
        )

    return (
        events.select(F.col(key_col).cast("string").alias(key_col))
        .where(F.col(key_col).isNotNull())
        .withColumn("__g", F.lit(1))
        .groupBy("__g")
        .applyInPandasWithState(
            update,
            HEAVY_HITTERS_SCHEMA,
            _HH_STATE_SCHEMA,
            "update",
            GroupStateTimeout.NoTimeout,
        )
    )
