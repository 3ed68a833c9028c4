"""Changelog replay: point-in-time snapshots and snapshot diffs (EXT).

The lakehouse temporal primitives on top of an append-only changelog:
given a stream of keyed upsert/delete records, reconstruct the table
state AS OF any timestamp, and diff two reconstructed states.  The
same replay semantics power the SCD2 builder (operators/sessions.py's
interval frames) and the metric-store MERGE loop (operators/merge.py)
-- this module is the read side: no mutable store needed, any
historical state is a query over the log.

Scale shape (100 TB changelog):

- ``snapshot_at`` is ONE partial-aggregated shuffle: `max_by` over a
  (ts, seq) ordering struct combines map-side, so each partition ships
  one candidate row per key it saw -- never the full log -- and the
  reduce side keeps one row per key.  No window sort, no per-key
  re-scan.  (A window row_number formulation would shuffle every log
  row to sort it; the aggregate form ships only per-partition winners.)
- ``snapshot_diff`` joins two snapshot frames on the key.  Both sides
  are outputs of the same aggregate, so at scale they are key-
  partitioned identically and AQE plans a co-partitioned join; the
  diff never touches the log again.
- Time-travel pruning: a changelog laid out by date (the usual
  ingestion partitioning) lets the ``ts <= as_of`` predicate prune
  whole partitions before the aggregate -- pinned by the pushdown
  lock in tests/test_plan_shape.py.

Replay semantics (one definition, used by snapshot and diff):

- records are keyed by ``key_col``; the latest record per key wins,
  "latest" ordered by (ts, seq) so co-timestamped records resolve
  deterministically by the monotone sequence column;
- a record whose op column matches ``delete_op`` is a tombstone: if
  the latest record for a key is a tombstone, the key is absent from
  the snapshot (classic compacted-topic / MERGE semantics).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def latest_records(
    log: DataFrame,
    *,
    key_col: str,
    ts_col: str,
    seq_col: str,
    op_col: str,
    value_cols: list[str],
    as_of: str | Column | None = None,
) -> DataFrame:
    """Latest record per key (tombstones INCLUDED), optionally bounded
    by ``as_of`` (inclusive): (key, state_ts, state_seq, state_op,
    *value_cols).  NULL ts rows carry no position and are ignored.

    Latest-wins over the (ts, seq) order is ASSOCIATIVE and
    COMMUTATIVE, so this fold can run over any partition of the log --
    per micro-batch, per shard -- and re-fold its own outputs
    (``snapshot_fold``) to the same result as one pass over the union.
    Tombstones must stay in the folded state for that to hold: a
    tombstone dropped early could be resurrected by a LATE record with
    an EARLIER timestamp arriving in a later batch.
    """
    cond = F.col(ts_col).isNotNull()
    if as_of is not None:
        as_of_c = (
            F.lit(as_of).cast("timestamp") if isinstance(as_of, str) else as_of
        )
        cond = cond & (F.col(ts_col) <= as_of_c)
    payload = F.struct(
        F.col(ts_col).alias("state_ts"),
        F.col(seq_col).alias("state_seq"),
        F.col(op_col).alias("state_op"),
        *[F.col(c) for c in value_cols],
    )
    order = F.struct(F.col(ts_col), F.col(seq_col))
    return (
        log.where(cond)
        .groupBy(F.col(key_col))
        .agg(F.max_by(payload, order).alias("__s"))
        .select(
            key_col,
            F.col("__s.state_ts").alias("state_ts"),
            F.col("__s.state_seq").alias("state_seq"),
            F.col("__s.state_op").alias("state_op"),
            *[F.col(f"__s.{c}").alias(c) for c in value_cols],
        )
    )


def snapshot_fold(
    prior: DataFrame,
    batch_latest: DataFrame,
    *,
    key_col: str,
    value_cols: list[str],
) -> DataFrame:
    """Fold a batch's latest-records frame into a prior state frame:
    per key, the later (state_ts, state_seq) record wins.  Both inputs
    and the output are ``latest_records``-shaped (tombstones kept), so
    folds chain across arbitrarily many batches -- the streaming
    maintenance loop's one-step state transition."""
    cols = ["state_ts", "state_seq", "state_op", *value_cols]
    unioned = prior.select(key_col, *cols).unionByName(
        batch_latest.select(key_col, *cols)
    )
    payload = F.struct(*[F.col(c) for c in cols])
    order = F.struct(F.col("state_ts"), F.col("state_seq"))
    return (
        unioned.groupBy(F.col(key_col))
        .agg(F.max_by(payload, order).alias("__s"))
        .select(key_col, *[F.col(f"__s.{c}").alias(c) for c in cols])
    )


def live_view(snapshot: DataFrame, *, op_col: str = "state_op", delete_op: str = "del") -> DataFrame:
    """The readable face of a tombstone-keeping state frame: live keys
    only."""
    return snapshot.where(F.col(op_col) != F.lit(delete_op))


def snapshot_at(
    log: DataFrame,
    *,
    key_col: str,
    ts_col: str,
    seq_col: str,
    op_col: str,
    delete_op: str,
    value_cols: list[str],
    as_of: str | Column,
) -> DataFrame:
    """Reconstruct the keyed table state as of ``as_of`` (inclusive).

    Output: one row per live key -- (key, state_ts, state_seq,
    state_op, *value_cols); tombstoned keys are absent.  NULL ts rows
    carry no position in the log and are ignored.
    """
    return live_view(
        latest_records(
            log,
            key_col=key_col,
            ts_col=ts_col,
            seq_col=seq_col,
            op_col=op_col,
            value_cols=value_cols,
            as_of=as_of,
        ),
        delete_op=delete_op,
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    *,
    key_col: str,
    value_cols: list[str],
) -> DataFrame:
    """Classify every key across two snapshots: added / removed /
    changed / unchanged.

    ``old`` and ``new`` must be snapshot frames (one row per key, the
    same value columns).  "changed" compares the value columns only --
    state_ts/seq advancing without a value change is "unchanged"
    (compaction produces exactly such records).  NULL-safe comparison
    throughout (<=> semantics), so NULL payloads diff correctly.
    """
    o = old.select(
        F.col(key_col), *[F.col(c).alias(f"old_{c}") for c in value_cols]
    )
    n = new.select(
        F.col(key_col), *[F.col(c).alias(f"new_{c}") for c in value_cols]
    )
    # presence markers: value columns may be legitimately NULL, so carry
    # an explicit per-side flag through the full-outer join instead of
    # probing a payload column for NULL
    o = o.withColumn("__in_old", F.lit(True))
    n = n.withColumn("__in_new", F.lit(True))
    joined = o.join(n, on=key_col, how="full_outer")
    same = F.lit(True)
    for c in value_cols:
        same = same & F.col(f"old_{c}").eqNullSafe(F.col(f"new_{c}"))
    status = (
        F.when(F.col("__in_old").isNull(), F.lit("added"))
        .when(F.col("__in_new").isNull(), F.lit("removed"))
        .when(same, F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return joined.select(
        key_col,
        status.alias("status"),
        *[F.col(f"old_{c}") for c in value_cols],
        *[F.col(f"new_{c}") for c in value_cols],
    )
