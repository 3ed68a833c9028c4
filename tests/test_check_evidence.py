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
