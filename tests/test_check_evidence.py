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
    # nearest-canary attribution (VERDICT r12 item 7): when given, the
    # entry carries the temporally nearest probe's drift and the
    # suspect's ratio renormalized against it
    e = bench.adjudicate_suspect(
        raw=4.0, committed=2.0, ratio_norm=2.1,
        current_row="ordersx1 2 0 - 0", committed_row="ordersx1 2 0 - 0",
        nearest_canary={
            "offset_sec": 87.2,
            "ratio_vs_prev": 1.9,
            "ratio_nearest_norm": 1.05,
        },
    )
    assert e["nearest_canary"]["ratio_nearest_norm"] == 1.05


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


def test_bench_compact_line_fits_driver_window():
    """VERDICT r12 "What's wrong" 1: the compact stdout line must stay
    inside the driver's ~2 KB tail window even at an implausibly large
    suspect count, so {"metric": ...} at the line's HEAD survives the
    tail capture.  Suspects shrink to one-word verdicts; queries then
    suspects are elided under a hard byte budget."""
    import json
    import importlib.util as _ilu

    spec = _ilu.spec_from_file_location(
        "bench", pathlib.Path(__file__).parent.parent / "bench.py"
    )
    bench = _ilu.module_from_spec(spec)
    spec.loader.exec_module(bench)

    # worst case: 260 long-named queries, 60 suspects with the longest
    # adjudication sentence bench emits
    timings = {
        f"a_very_long_query_name_family_variant_{i:03d}": 1.2345
        for i in range(260)
    }
    names = list(timings)
    canaries = {n: timings[n] for n in names[:9]}
    suspects = {
        n: bench.adjudicate_suspect(
            raw=9.8765,
            committed=1.2345,
            ratio_norm=6.5432,
            current_row="ordersx1 2 0 - 0",
            committed_row="ordersx1 2 0 - 0",
            nearest_canary={
                "offset_sec": 123.45,
                "ratio_vs_prev": 5.4321,
                "ratio_nearest_norm": 1.2045,
            },
        )
        for n in names[9:69]
    }
    result = {
        "metric": "headline_queries_total_runtime",
        "value": 320.9876,
        "unit": "sec",
        "queries": timings,
        "sf": 0.1,
        "canaries": canaries,
        "canary_total": 11.1105,
        "canary_prev": "BENCHFULL_r12.json",
        "canary_ratio_vs_prev": 1.3012,
        "canary_ratios": {n: 1.3 for n in canaries},
        "canary_probes": [
            {"offset_sec": 0.0, "canaries": dict(canaries), "total": 11.1},
            {"offset_sec": 160.2, "canaries": dict(canaries), "total": 14.4},
            {"offset_sec": 321.0, "canaries": dict(canaries), "total": 11.2},
        ],
        "query_offsets_sec": {n: 1.0 for n in timings},
        "suspects": suspects,
    }
    line = bench.build_compact_line(
        result, timings, canaries, "BENCHFULL.json"
    )
    assert len(line) <= bench.COMPACT_LINE_BUDGET, len(line)
    parsed = json.loads(line)
    assert line.startswith('{"metric"')
    assert parsed["value"] == 320.9876
    # suspects survive as one-word verdicts, never full sentences;
    # the nearest-canary renormalized ratio rides along as one number
    for s in parsed.get("suspects", {}).values():
        assert s["verdict"] in {"real", "transient", "unknown"}
        assert "adjudication" not in s
        assert s.get("ratio_nearest") == 1.2045
        assert "nearest_canary" not in s
    # nothing silently dropped: elision is accounted for
    assert parsed["queries_elided"] == len(timings) - len(parsed["queries"])
    n_susp = len(parsed.get("suspects", {}))
    assert parsed.get("suspects_elided", 0) == len(suspects) - n_susp
    # sidecar-only detail never reaches the bounded line
    assert "canary_probes" not in parsed
    assert "query_offsets_sec" not in parsed
    # the no-suspect shape still fits and parses
    r2 = {k: v for k, v in result.items() if k != "suspects"}
    line2 = bench.build_compact_line(r2, timings, canaries, "BENCHFULL.json")
    assert len(line2) <= bench.COMPACT_LINE_BUDGET
    assert "suspects" not in json.loads(line2)


def test_compact_line_pins_previous_stdout_window():
    """VERDICT r15 "What's wrong" 2: a query that IMPROVES must not
    fall out of the compact stdout line's slowest-N fill and read as
    dropped_from_bench.  The pinned set (previous round's stdout
    window) always survives shrinking -- the slowest fill and the
    suspects give way first -- and the real previous-round window
    (32 names incl. canaries) must fit the budget un-shrunk."""
    import importlib.util as _ilu

    spec = _ilu.spec_from_file_location(
        "bench", pathlib.Path(__file__).parent.parent / "bench.py"
    )
    bench = _ilu.module_from_spec(spec)
    spec.loader.exec_module(bench)
    import json

    # synthetic: pinned queries are FAST (would never make slowest-25)
    timings = {f"fam_slow_query_name_padpadpad_{i:03d}": 9.9 for i in range(40)}
    pinned = [f"fam_fast_improved_query_{i:03d}" for i in range(23)]
    timings.update({n: 0.01 for n in pinned})
    canaries = {n: timings[n] for n in list(timings)[:9]}
    result = {
        "metric": "headline_queries_total_runtime",
        "value": 123.4,
        "unit": "sec",
        "queries": timings,
        "sf": 0.1,
        "canaries": canaries,
        "canary_total": 1.0,
    }
    line = bench.build_compact_line(
        result, timings, canaries, "BENCHFULL.json", pinned=pinned
    )
    assert len(line) <= bench.COMPACT_LINE_BUDGET
    parsed = json.loads(line)
    for n in pinned:
        assert n in parsed["queries"], n
    # the REAL previous window (committed BENCH_r*.json) fits whole:
    # driver-visible n_dropped stays 0 by construction
    prev = bench.find_prev_stdout_window()
    assert len(prev) >= 23
    timings2 = {n: 1.2345 for n in prev}
    timings2.update({f"other_query_{i:03d}": 5.5 for i in range(200)})
    canaries2 = {n: timings2[n] for n in bench.CANARIES if n in timings2}
    result2 = dict(result, queries=timings2, canaries=canaries2)
    line2 = bench.build_compact_line(
        result2, timings2, canaries2, "BENCHFULL.json", pinned=prev
    )
    assert len(line2) <= bench.COMPACT_LINE_BUDGET
    parsed2 = json.loads(line2)
    missing = [n for n in prev if n not in parsed2["queries"]]
    assert not missing, missing


def test_adjudication_marks_data_dependent_fingerprints_incomparable():
    """VERDICT r13 "What's wrong" 1 (belt-and-braces half): a suspect
    whose fingerprint differs from the committed row ONLY because the
    checkpoint-leaf count moved has a data-dependent plan shape
    (iterative rounds vary with input) -- adjudicated "incomparable",
    never "real"; a ckpt-stable structural change still reads "real"."""
    import importlib.util as _ilu

    spec = _ilu.spec_from_file_location(
        "bench", pathlib.Path(__file__).parent.parent / "bench.py"
    )
    bench = _ilu.module_from_spec(spec)
    spec.loader.exec_module(bench)

    # ckpt count differs -> incomparable (the r13 artifact case:
    # embeddingsx1 0 1 - 1 at sf0.01 vs embeddingsx1 8 3 - 12 at sf0.1)
    e = bench.adjudicate_suspect(
        raw=22.4, committed=7.4, ratio_norm=3.0,
        current_row="embeddingsx1 8 3 - 12",
        committed_row="embeddingsx1 0 1 - 1",
    )
    assert "incomparable" in e["adjudication"]
    assert bench.one_word_verdict(e["adjudication"]) == "incomparable"
    # structural change at a STABLE ckpt count is still a real signal
    e = bench.adjudicate_suspect(
        raw=4.0, committed=2.0, ratio_norm=2.1,
        current_row="ordersx2 3 1 - 0", committed_row="ordersx1 2 0 - 0",
    )
    assert bench.one_word_verdict(e["adjudication"]) == "real"


def test_bench_fingerprints_suspects_at_the_audit_sf():
    """VERDICT r13 "What's wrong" 1 (root-cause half): the suspect
    fingerprint is built at AUDIT_SF_DIR (sf0.01, where the committed
    PLANAUDIT rows come from), never at the bench's SF_DIR -- the
    cross-sf comparison is structurally meaningless for data-dependent
    plans.  Source-level pin: the only plan_fingerprint call in main()
    must take AUDIT_SF_DIR."""
    src = (pathlib.Path(__file__).parent.parent / "bench.py").read_text()
    assert "AUDIT_SF_DIR" in src
    assert "plan_fingerprint(by_name[n](spark, SF_DIR))" not in src
    calls = re.findall(r"plan_fingerprint\(\s*by_name\[n\]\(spark, (\w+)\)", src)
    # both call sites (wall suspects + bytes-gated suspects) sf-matched
    assert calls and set(calls) == {"AUDIT_SF_DIR"}


def test_bytes_gated_suspects_survive_the_compact_line():
    """VERDICT r13 item 2: the semantic family gates on shuffle bytes.
    A bytes-gated suspect entry (ratio_bytes, no ratio_norm) must ride
    the compact line as a one-word "real" verdict with its bytes ratio
    in the ratio_norm slot, and the per-query shuffle_bytes map must
    stay sidecar-only."""
    import json
    import importlib.util as _ilu

    spec = _ilu.spec_from_file_location(
        "bench", pathlib.Path(__file__).parent.parent / "bench.py"
    )
    bench = _ilu.module_from_spec(spec)
    spec.loader.exec_module(bench)

    assert bench.one_word_verdict(
        "shuffle bytes drifted past the deterministic band: real, "
        "investigate"
    ) == "real"

    timings = {"dedup_semantic_survivors": 7.4, "tpch_q1": 0.4}
    canaries = {"tpch_q1": 0.4}
    result = {
        "metric": "headline_queries_total_runtime",
        "value": 7.8,
        "unit": "sec",
        "queries": timings,
        "sf": 0.1,
        "canaries": canaries,
        "canary_total": 0.4,
        "shuffle_bytes": {"dedup_semantic_survivors": 2_000_000},
        "suspects": {
            "dedup_semantic_survivors": {
                "bytes": 2_000_000,
                "committed_bytes": 1_000_000,
                "ratio_bytes": 2.0,
                "plan_changed": True,
                "adjudication": (
                    "shuffle bytes drifted past the deterministic "
                    "band: real, investigate"
                ),
            }
        },
    }
    line = bench.build_compact_line(
        result, timings, canaries, "BENCHFULL.json"
    )
    parsed = json.loads(line)
    assert "shuffle_bytes" not in parsed
    s = parsed["suspects"]["dedup_semantic_survivors"]
    assert s == {"ratio_norm": 2.0, "verdict": "real"}


def test_semantic_family_is_bytes_gated_not_wall_gated():
    """Source-level pin for the gate routing: the BYTES_GATED set names
    the semantic family, the wall-suspect comprehension excludes it,
    and the bytes comprehension gates on BYTES_DRIFT_THRESHOLD."""
    import importlib.util as _ilu

    spec = _ilu.spec_from_file_location(
        "bench", pathlib.Path(__file__).parent.parent / "bench.py"
    )
    bench = _ilu.module_from_spec(spec)
    spec.loader.exec_module(bench)

    assert bench.BYTES_GATED == {
        "dedup_semantic_clusters",
        "dedup_semantic_survivors",
        "dedup_semantic_clusters_celled",
        "dedup_semantic_survivors_celled",
        "corpus_semantic_pipeline",
        "text_bpe_merges",
        "text_bpe_encoded_lengths",
    }
    src = (pathlib.Path(__file__).parent.parent / "bench.py").read_text()
    assert "n not in BYTES_GATED" in src
    assert "BYTES_DRIFT_THRESHOLD" in src


def test_driversim_provenance_tamper_evidence():
    """VERDICT r13 item 7: a committed DRIVERSIM must carry a
    provenance header binding it to the registry it actually ran -- a
    stale digest, a subset run, or a missing header all fail, so the
    full-coverage claim is tamper-evident.  (The short non-40-hex sha
    here exercises the 'unverifiable sha' WARNING lane, ADVICE r15.)"""
    good = (
        "provenance: git_sha=0d0abadf00aa dirty=0 "
        "registry_digest=ab12cd34ef56ab78 n=249 subset=0\n"
        "PASS q1: match\n"
    )
    issues, warnings = ce.driversim_provenance_issues(
        good, "ab12cd34ef56ab78"
    )
    assert issues == []
    assert warnings and "unverifiable" in warnings[0]
    # stale: generated against an older registry
    issues, _ = ce.driversim_provenance_issues(good, "ffffffffffffffff")
    assert issues and "STALE" in issues[0]
    # subset runs never count as full-registry evidence
    subset = good.replace("subset=0", "subset=1")
    issues, _ = ce.driversim_provenance_issues(subset, "ab12cd34ef56ab78")
    assert issues and "SUBSET" in issues[0]
    # pre-r14 files (no header) fail loudly, not silently
    issues, _ = ce.driversim_provenance_issues("PASS q1: match\n", "ab12")
    assert issues and "no provenance header" in issues[0]


def test_driversim_provenance_sha_and_dirty_enforced(monkeypatch):
    """ADVICE r15: the digest binds only the registry NAME set, so
    git_sha/dirty are now enforced -- a sha outside HEAD's history is
    a hard FAIL (the code that ran was never committed); a dirty tree
    at an ancestor sha is a WARNING (the normal pre-commit round
    shape); a clean ancestor sha is silent."""
    digest = "ab12cd34ef56ab78"
    sha = "a" * 40

    def hdr(dirty):
        return (
            f"provenance: git_sha={sha} dirty={dirty} "
            f"registry_digest={digest} n=249 subset=0\nPASS q1: match\n"
        )

    # sha not an ancestor -> hard failure
    monkeypatch.setattr(ce, "_sha_is_ancestor", lambda s: False)
    issues, _ = ce.driversim_provenance_issues(hdr(0), digest)
    assert issues and "NOT in HEAD's history" in issues[0]
    # ancestor + dirty -> warning naming the digest's scope
    monkeypatch.setattr(ce, "_sha_is_ancestor", lambda s: True)
    issues, warnings = ce.driversim_provenance_issues(hdr(1), digest)
    assert issues == []
    assert warnings and "DIRTY" in warnings[0]
    assert "NAME set" in warnings[0]
    # ancestor + clean -> fully silent
    issues, warnings = ce.driversim_provenance_issues(hdr(0), digest)
    assert (issues, warnings) == ([], [])
