"""Spark-backed pin for the bench suspect adjudicator's sf-matched
fingerprint comparison (VERDICT r13 "What's wrong" 1 -- the round's one
found bug): fabricating a suspect for `dedup_semantic_survivors` -- the
query whose cross-sf fingerprints differ BY CONSTRUCTION (iterative
star-contraction checkpoint counts are data-dependent) -- must
adjudicate "transient" when the sf-matched (sf0.01) fingerprint is
unchanged vs the committed PLANAUDIT row."""

from __future__ import annotations

import pytest

import importlib.util
import pathlib

_SPEC = importlib.util.spec_from_file_location(
    "bench", pathlib.Path(__file__).parent.parent / "bench.py"
)
bench = importlib.util.module_from_spec(_SPEC)
_SPEC.loader.exec_module(bench)

AUDIT_SF = "/root/testdata/sf0.01"


@pytest.mark.slow
def test_fabricated_semantic_suspect_adjudicates_transient(spark):
    import __spark_entry__ as E

    name = "dedup_semantic_survivors"
    fn = E.queries()[name]
    committed = bench.committed_planaudit_row(name)
    assert committed is not None
    current = bench.plan_fingerprint(fn(spark, AUDIT_SF))
    # sf-matched: the live sf0.01 fingerprint equals the committed
    # sf0.01 audit row (the r13 artifact compared sf0.1 vs sf0.01 and
    # could NEVER match for this query)
    assert current == committed, (current, committed)
    entry = bench.adjudicate_suspect(
        raw=22.4,
        committed=7.4,
        ratio_norm=3.03,
        current_row=current,
        committed_row=committed,
    )
    assert entry["plan_changed"] is False
    assert bench.one_word_verdict(entry["adjudication"]) == "transient"


# ---------------------------------------------------------------------------
# bytes gate (VERDICT r14 item 2): armed in r15, these pins prove it
# actually fires -- no Spark needed, the gate is pure arithmetic
# ---------------------------------------------------------------------------


def test_fabricated_bytes_drift_fires_gate():
    """A BYTES_GATED query whose committed (prev) bytes are deflated
    past the band must surface as a bytes suspect -- the mirror of the
    transient-fingerprint pin above."""
    name = "dedup_semantic_clusters"
    assert name in bench.BYTES_GATED
    timings = {name: 9.9}
    cur = {name: 2_000_000}
    prev = {name: int(2_000_000 / (bench.BYTES_DRIFT_THRESHOLD * 1.2))}
    assert bench.bytes_gate_suspects(timings, cur, prev) == [name]
    # inside the band: no suspect
    prev_ok = {name: int(2_000_000 / (bench.BYTES_DRIFT_THRESHOLD * 0.9))}
    assert bench.bytes_gate_suspects(timings, cur, prev_ok) == []


def test_bytes_gate_silent_on_missing_or_failed_probe():
    """First-recording rounds and failed probes (None bytes) must gate
    nothing: a dead probe cannot vouch for OR against a query."""
    name = "corpus_semantic_pipeline"
    timings = {name: 9.9}
    assert bench.bytes_gate_suspects(timings, {}, {}) == []
    assert bench.bytes_gate_suspects(timings, {name: None}, {name: 5}) == []
    assert bench.bytes_gate_suspects(timings, {name: 5}, {}) == []


def test_wall_suspect_autocloses_on_flat_bytes():
    """Secondary bytes signal for ordinary wall suspects: unchanged
    plan + in-band bytes -> auto-closed transient (the adjudication all
    ten r14 wall suspects needed a judge re-probe for)."""
    row = "lineitemx1 2 1 - 0"
    entry = bench.adjudicate_suspect(
        raw=4.2,
        committed=1.9,
        ratio_norm=2.2,
        current_row=row,
        committed_row=row,
        bytes_ratio=1.01,
    )
    assert entry["ratio_bytes"] == 1.01
    assert "auto-closed" in entry["adjudication"]
    assert bench.one_word_verdict(entry["adjudication"]) == "transient"


def test_wall_suspect_escalates_on_bytes_drift_with_same_plan():
    """Unchanged plan but bytes past the deterministic band is REAL
    (data/partitioning change), not host noise."""
    row = "lineitemx1 2 1 - 0"
    entry = bench.adjudicate_suspect(
        raw=4.2,
        committed=1.9,
        ratio_norm=2.2,
        current_row=row,
        committed_row=row,
        bytes_ratio=bench.BYTES_DRIFT_THRESHOLD * 1.5,
    )
    assert bench.one_word_verdict(entry["adjudication"]) == "real"


def test_shuffle_bytes_delta_one_sided_failure_is_none():
    """ADVICE r15: a failed 'before' snapshot (None) with a healthy
    'after' must return None, never the sum of every retained stage;
    an honestly-empty {}/{} pair deltas to 0."""
    assert bench._shuffle_bytes_delta(None, {(1, 0): 100}) is None
    assert bench._shuffle_bytes_delta({(1, 0): 100}, None) is None
    assert bench._shuffle_bytes_delta(None, None) is None
    assert bench._shuffle_bytes_delta({}, {}) == 0
    assert bench._shuffle_bytes_delta({(1, 0): 5}, {(1, 0): 5, (2, 0): 7}) == 7
