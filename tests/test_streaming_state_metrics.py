"""Pins for the streaming state-metrics lane's pure summarizer
(scripts/streaming_state_metrics.py -- VERDICT r14 item 1: the lane
that adjudicates stateful streaming regressions wall+fingerprint
cannot)."""

from __future__ import annotations

import importlib.util
import pathlib

_SPEC = importlib.util.spec_from_file_location(
    "streaming_state_metrics",
    pathlib.Path(__file__).parent.parent
    / "scripts"
    / "streaming_state_metrics.py",
)
ssm = importlib.util.module_from_spec(_SPEC)
_SPEC.loader.exec_module(ssm)


def _progress(batch_rows, state_ops):
    return {"numInputRows": batch_rows, "stateOperators": state_ops}


def test_summarize_aggregates_across_batches():
    prog = [
        _progress(
            100,
            [
                {
                    "operatorName": "applyInPandasWithState",
                    "numRowsTotal": 10,
                    "numRowsUpdated": 10,
                    "memoryUsedBytes": 1000,
                    "commitTimeMs": 50,
                    "numShufflePartitions": 4,
                }
            ],
        ),
        _progress(
            50,
            [
                {
                    "operatorName": "applyInPandasWithState",
                    "numRowsTotal": 12,
                    "numRowsUpdated": 2,
                    "memoryUsedBytes": 1200,
                    "commitTimeMs": 30,
                    "numShufflePartitions": 4,
                }
            ],
        ),
    ]
    s = ssm._summarize(prog)
    assert s["batches"] == 2
    assert s["input_rows"] == 150
    op = s["state_operators"]["applyInPandasWithState"]
    # _last fields carry the final batch (state HELD at end), _sum
    # fields accumulate (total commit pressure / churn)
    assert op["numRowsTotal_last"] == 12
    assert op["memoryUsedBytes_last"] == 1200
    assert op["numRowsUpdated_sum"] == 12
    assert op["commitTimeMs_sum"] == 80
    assert op["numShufflePartitions"] == 4


def test_summarize_handles_stateless_and_missing_fields():
    s = ssm._summarize([_progress(7, [])])
    assert s == {"batches": 1, "input_rows": 7, "state_operators": {}}
    # partial metrics dicts must not crash the lane
    s = ssm._summarize([_progress(None, [{"operatorName": "x"}])])
    assert s["input_rows"] == 0
    assert s["state_operators"]["x"]["commitTimeMs_sum"] == 0
