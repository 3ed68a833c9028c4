"""Spark-backed pin for the bench suspect adjudicator's sf-matched
fingerprint comparison (VERDICT r13 "What's wrong" 1 -- the round's one
found bug): fabricating a suspect for `dedup_semantic_survivors` -- the
query whose cross-sf fingerprints differ BY CONSTRUCTION (iterative
star-contraction checkpoint counts are data-dependent) -- must
adjudicate "transient" when the sf-matched (sf0.01) fingerprint is
unchanged vs the committed PLANAUDIT row."""

from __future__ import annotations

import importlib.util
import pathlib

_SPEC = importlib.util.spec_from_file_location(
    "bench", pathlib.Path(__file__).parent.parent / "bench.py"
)
bench = importlib.util.module_from_spec(_SPEC)
_SPEC.loader.exec_module(bench)

AUDIT_SF = "/root/testdata/sf0.01"


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
