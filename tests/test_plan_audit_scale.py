"""Pins for the scale-decade plan auditor's verdict logic -- no Spark
needed, verdict() is pure."""

from __future__ import annotations

import importlib.util
import pathlib

_SPEC = importlib.util.spec_from_file_location(
    "plan_audit_scale",
    pathlib.Path(__file__).parent.parent / "scripts" / "plan_audit_scale.py",
)
pas = importlib.util.module_from_spec(_SPEC)
_SPEC.loader.exec_module(pas)


def _counts(**over) -> dict:
    base = {n: 0 for n in pas.JOIN_NODES}
    base.update(
        {
            "isFinal": True,
            "singlep_unfed": 0,
            "embeddings_scans": 0,
            "max_broadcast_bytes": None,
        }
    )
    base.update(over)
    return base


def test_broadcast_cross_with_dead_probe_is_not_pass():
    """ADVICE r15: a BROADCAST_CROSS_OK query's BroadcastNestedLoopJoin
    is admitted ONLY on the measured runtime broadcast size; when the
    probe returned nothing the boundedness proof is missing and the
    verdict must FAIL ('unverified'), not silently PASS."""
    name = "similarity_ivf_pq_batch_topk"
    assert name in pas.BROADCAST_CROSS_OK
    c = _counts(BroadcastNestedLoopJoin=1, max_broadcast_bytes=None)
    v, why = pas.verdict(name, "x10", c)
    assert v == "FAIL"
    assert "UNVERIFIED" in why


def test_broadcast_cross_with_measured_bounded_size_passes():
    name = "similarity_ivf_pq_batch_topk"
    c = _counts(
        BroadcastNestedLoopJoin=1, max_broadcast_bytes=16 * 1024 * 1024
    )
    v, why = pas.verdict(name, "x10", c)
    assert v == "PASS"
    assert "broadcast-bounded" in why


def test_broadcast_cross_past_cap_fails():
    name = "similarity_ivf_pq_batch_topk"
    c = _counts(
        BroadcastNestedLoopJoin=1,
        max_broadcast_bytes=pas.BROADCAST_CAP_BYTES + 1,
    )
    v, why = pas.verdict(name, "x10", c)
    assert v == "FAIL"
    assert "exceeds" in why


def test_unlisted_nested_loop_still_fails_regardless_of_probe():
    c = _counts(
        BroadcastNestedLoopJoin=1, max_broadcast_bytes=1024
    )
    v, why = pas.verdict("tpch_q3_shipping_priority", "x10", c)
    assert v == "FAIL"
    assert "nested-loop" in why


def test_cartesian_always_fails():
    name = "similarity_ivf_pq_batch_topk"
    c = _counts(CartesianProduct=1, max_broadcast_bytes=1024)
    v, why = pas.verdict(name, "1x", c)
    assert v == "FAIL"
    assert "cartesian" in why
