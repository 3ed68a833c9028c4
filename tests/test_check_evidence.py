"""Pure-logic tests for scripts/check_evidence.py (no Spark): the
round-10 review found two silent-pass bugs -- the newest-round
selection collapsing DRIVERSIM_rN and _rN_shuffle32 to one last-wins
entry, and the PLANAUDIT row match accepting plan_audit's own ERROR
lines as audited rows."""

from __future__ import annotations

import importlib.util
import pathlib
import re

_SPEC = importlib.util.spec_from_file_location(
    "check_evidence",
    pathlib.Path(__file__).parent.parent / "scripts" / "check_evidence.py",
)
ce = importlib.util.module_from_spec(_SPEC)
_SPEC.loader.exec_module(ce)


def test_latest_returns_every_variant_of_newest_round():
    files = [
        "DRIVERSIM_r8.txt",
        "DRIVERSIM_r8_shuffle32.txt",
        "DRIVERSIM_r10_shuffle32.txt",
        "DRIVERSIM_r10.txt",
        "DRIVERSIM_r9.txt",
    ]
    assert ce.latest(files, "DRIVERSIM") == [
        "DRIVERSIM_r10.txt",
        "DRIVERSIM_r10_shuffle32.txt",
    ]


def test_latest_single_variant_round():
    assert ce.latest(["PLANAUDIT_r6.txt", "PLANAUDIT_r7.txt"], "PLANAUDIT") == [
        "PLANAUDIT_r7.txt"
    ]


def test_planaudit_row_regex_rejects_error_lines():
    """The exact pattern main() uses: a padded-name ERROR line from
    plan_audit.py must NOT count as an audited row; a scans row (or a
    no-scan '-' row) must."""
    audit = (
        "good_query                                    ordersx1   2 0 -\n"
        "errored_query                                 ERROR boom\n"
        "bare_error_query                              ERROR\n"
        "noscan_query                                  -          1 0 -\n"
    )

    def audited(n: str) -> bool:
        return bool(
            re.search(rf"^{re.escape(n)} +(?!ERROR\b)\S", audit, re.M)
        )

    assert audited("good_query")
    assert audited("noscan_query")
    assert not audited("errored_query")
    # round-10 advice: a bare trailing ERROR (empty exception text)
    # must also be rejected -- "ERROR " with a required space let it
    # count as audited
    assert not audited("bare_error_query")
    assert not audited("absent_query")
    # prefix of a longer name never matches (space required after name)
    assert not audited("good")
    # names are escaped before interpolation: a hypothetical name with
    # a regex metacharacter must match literally, not as a pattern
    meta_audit = "weird.query+name                      eventsx1  1 0 -\n"
    assert re.search(
        rf"^{re.escape('weird.query+name')} +(?!ERROR\b)\S", meta_audit, re.M
    )
    assert not re.search(
        rf"^{re.escape('weirdXquery+name')} +(?!ERROR\b)\S", meta_audit, re.M
    )


def test_bench_suspect_adjudication_format():
    """bench.py suspects self-adjudicate (VERDICT r11 item 7): each
    entry carries {raw, committed, ratio_norm, plan_changed,
    adjudication}, with plan_changed derived from the committed
    PLANAUDIT row vs the current plan fingerprint (None when either
    side is missing)."""
    import importlib.util as _ilu

    spec = _ilu.spec_from_file_location(
        "bench", pathlib.Path(__file__).parent.parent / "bench.py"
    )
    bench = _ilu.module_from_spec(spec)
    spec.loader.exec_module(bench)

    # plan unchanged -> transient
    e = bench.adjudicate_suspect(
        raw=4.0, committed=2.0, ratio_norm=2.1,
        current_row="ordersx1 2 0 - 0", committed_row="ordersx1 2 0 - 0",
    )
    assert set(e) == {
        "raw", "committed", "ratio_norm", "plan_changed", "adjudication"
    }
    assert e["plan_changed"] is False
    assert "transient" in e["adjudication"]
    # plan changed -> real
    e = bench.adjudicate_suspect(
        raw=4.0, committed=2.0, ratio_norm=2.1,
        current_row="ordersx2 3 0 - 0", committed_row="ordersx1 2 0 - 0",
    )
    assert e["plan_changed"] is True
    assert "real" in e["adjudication"]
    # no committed row -> unknown
    e = bench.adjudicate_suspect(
        raw=4.0, committed=2.0, ratio_norm=2.1,
        current_row="ordersx1 2 0 - 0", committed_row=None,
    )
    assert e["plan_changed"] is None


def test_committed_planaudit_row_parses_latest_audit():
    """committed_planaudit_row normalizes the newest committed
    PLANAUDIT row to the 5-field fingerprint layout (arrow tag
    dropped, ERROR rows rejected)."""
    import importlib.util as _ilu

    spec = _ilu.spec_from_file_location(
        "bench", pathlib.Path(__file__).parent.parent / "bench.py"
    )
    bench = _ilu.module_from_spec(spec)
    spec.loader.exec_module(bench)

    # the repo's real newest audit must yield a 5-field row for a
    # long-stable query, and None for a nonexistent one
    row = bench.committed_planaudit_row("tpch_q1_pricing_summary")
    assert row is not None and len(row.split()) == 5, row
    assert row.split()[0] == "lineitemx1"
    assert bench.committed_planaudit_row("no_such_query_zzz") is None
