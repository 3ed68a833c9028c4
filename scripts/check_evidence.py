"""Refuse to end a round while committed evidence lags the registry.

Usage: python scripts/check_evidence.py [--worktree]

Exit 0 iff the LATEST DRIVERSIM_r{N}.txt and PLANAUDIT_r{N}.txt in git
HEAD (or, with --worktree, on disk) cover every driver-registered query
-- the same condition as
tests/test_plan_shape.py::test_committed_evidence_in_lockstep_with_registry,
but runnable in ~5 s without a SparkSession, so it belongs at the END
of any session that registered queries, BEFORE starting stretch work.

Why this is a standalone script and not a blocking pre-commit hook: the
round's final snapshot and the judge's verdict are committed by the
DRIVER, non-interactively; a hook that refuses those commits would
strand a whole round's work (or the verdict itself) outside git, which
is strictly worse than one red lockstep test.  The enforcement contract
is therefore:

  1. mid-round: new driver queries commit freely (evidence legitimately
     lags until the regen pass);
  2. after each feature batch: run the evidence chain (driver_sim x2 ->
     plan_audit -> bench) in the background and commit the artifacts --
     do NOT defer regen to a single end-of-round pass (rounds 7 and 9
     both ran out of turns there);
  3. before any stretch item and before the round's last hour: this
     script must exit 0 against HEAD.

tests/test_plan_shape.py::test_committed_evidence_in_lockstep_with_registry
remains the CI backstop that makes a violation visible to the judge.
"""

from __future__ import annotations

import pathlib
import re
import subprocess
import sys

ROOT = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))


def committed_names(pattern: str) -> list[str]:
    """Evidence files matching pattern in git HEAD."""
    out = subprocess.run(
        ["git", "ls-tree", "--name-only", "HEAD"],
        cwd=ROOT, capture_output=True, text=True, check=True,
    ).stdout.split()
    return [n for n in out if re.fullmatch(pattern, n)]


def latest(names: list[str], prefix: str) -> list[str]:
    """ALL evidence files of the newest round for prefix -- both the
    base DRIVERSIM_rN.txt and its _rN_shuffle32 variant must cover the
    registry (a dict keyed on N alone silently checked only whichever
    variant sorted last)."""
    cands: dict[int, list[str]] = {}
    for n in names:
        if m := re.match(rf"{prefix}_r(\d+)", n):
            cands.setdefault(int(m.group(1)), []).append(n)
    if not cands:
        sys.exit(f"FAIL: no committed {prefix}_r*.txt evidence in HEAD")
    return sorted(cands[max(cands)])


def _sha_is_ancestor(sha: str) -> bool | None:
    """True/False whether sha is an ancestor of (or equal to) HEAD;
    None if it cannot be determined (unknown sha, shallow clone)."""
    if not re.fullmatch(r"[0-9a-f]{40}", sha):
        return None
    try:
        r = subprocess.run(
            ["git", "merge-base", "--is-ancestor", sha, "HEAD"],
            cwd=ROOT, capture_output=True, text=True,
        )
    except OSError:
        return None
    if r.returncode == 0:
        return True
    if r.returncode == 1:
        return False
    return None


def driversim_provenance_issues(
    sim: str, head_digest: str
) -> tuple[list[str], list[str]]:
    """Tamper-evidence findings for one DRIVERSIM file (VERDICT r13
    item 7): (hard failures, warnings).

    SCOPE OF THE DIGEST (ADVICE r15): the registry digest binds the
    run to the NAME SET of driver-registered queries only -- it proves
    the file covered today's registry, NOT that the query
    implementations behaved as HEAD's do.  Behavioral binding comes
    from git_sha + dirty, enforced here as warnings: evidence is
    legitimately generated from the working tree just BEFORE the
    round's final commit (dirty=1 with the sha a HEAD ancestor is the
    normal round shape), but a sha that is NOT in HEAD's history means
    the run happened on code this repo never committed -- that one is
    a hard failure."""
    m = re.search(
        r"^provenance: git_sha=(\S+) dirty=(\d) "
        r"registry_digest=([0-9a-f]+) n=(\d+) subset=(\d)$",
        sim,
        re.M,
    )
    if m is None:
        return (
            [
                "carries no provenance header -- regenerate with the "
                "current driver_sim"
            ],
            [],
        )
    issues, warnings = [], []
    if m.group(3) != head_digest:
        issues.append(
            f"is STALE: generated against registry digest {m.group(3)} "
            f"(at git {m.group(1)[:12]}), HEAD registry digest is "
            f"{head_digest}"
        )
    if m.group(5) != "0":
        issues.append(
            "was a SUBSET run -- committed evidence must cover the "
            "full registry"
        )
    sha = m.group(1)
    ancestor = _sha_is_ancestor(sha)
    if ancestor is False:
        issues.append(
            f"was generated at git {sha[:12]}, which is NOT in HEAD's "
            "history -- the code that ran was never committed here"
        )
    elif ancestor is None:
        warnings.append(
            f"carries unverifiable git_sha {sha[:12]} -- ancestry "
            "check skipped"
        )
    if m.group(2) != "0":
        warnings.append(
            f"was generated from a DIRTY tree at {sha[:12]}: the "
            "digest binds only the registry NAME set, so the query "
            "implementations that actually ran may differ from that "
            "commit -- acceptable only for the round's own "
            "pre-commit evidence"
        )
    return issues, warnings


def read_evidence(name: str, worktree: bool) -> str:
    if worktree:
        return (ROOT / name).read_text()
    return subprocess.run(
        ["git", "show", f"HEAD:{name}"],
        cwd=ROOT, capture_output=True, text=True, check=True,
    ).stdout


def main() -> int:
    worktree = "--worktree" in sys.argv[1:]
    where = "worktree" if worktree else "HEAD"

    # registry import is Spark-free: registration happens at module
    # import, no JVM starts
    import __spark_entry__ as E

    E.queries()
    from dbt_metrics_ingestion_script_spark.registry import REGISTRY

    driver_names = [n for n, qd in REGISTRY.items() if qd.driver]

    if worktree:
        files = [p.name for p in ROOT.glob("*_r*.txt")]
    else:
        files = committed_names(r"(DRIVERSIM|PLANAUDIT)_r\w*\.txt")

    import hashlib

    head_digest = hashlib.sha256(
        "\n".join(sorted(driver_names)).encode()
    ).hexdigest()[:16]

    failed = False
    checked = []
    for sim_name in latest(files, "DRIVERSIM"):
        sim = read_evidence(sim_name, worktree)
        missing = [n for n in driver_names if f"PASS {n}:" not in sim]
        if missing:
            failed = True
            print(f"FAIL: {sim_name} ({where}) missing/failing: {missing}")
        # tamper-evidence (VERDICT r13 item 7): the file must declare
        # the registry it ran against (driver_sim's provenance header)
        # and that digest must match the registry at HEAD -- a stale
        # DRIVERSIM (generated before queries were added/renamed)
        # fails even if every PASS line happens to still be present.
        issues, warnings = driversim_provenance_issues(sim, head_digest)
        for issue in issues:
            failed = True
            print(f"FAIL: {sim_name} ({where}) {issue}")
        for warning in warnings:
            print(f"WARN: {sim_name} ({where}) {warning}")
        checked.append(sim_name)

    for audit_name in latest(files, "PLANAUDIT"):
        audit = read_evidence(audit_name, worktree)
        # a plan_audit row is "<name> <scans...>"; its error path prints
        # "<name padded> ERROR <exc>" -- a bare ^name-space match would
        # count a failed plan build as audited.  \b (not "ERROR ") so a
        # bare trailing "ERROR" with empty exception text is rejected
        # too, and re.escape() keeps the interpolation safe if a query
        # name ever gains a regex metacharacter.
        missing = [
            n
            for n in driver_names
            if not re.search(rf"^{re.escape(n)} +(?!ERROR\b)\S", audit, re.M)
        ]
        if missing:
            failed = True
            print(f"FAIL: {audit_name} ({where}) missing/errored: {missing}")
        checked.append(audit_name)

    if failed:
        print(
            "evidence lags the registry -- run the regen chain "
            "(scripts/driver_sim.py, DRIVER_SIM_SHUFFLE=32 variant, "
            "scripts/plan_audit.py, bench.py) and commit the artifacts "
            "BEFORE ending the round"
        )
        return 1
    print(
        f"OK: {' + '.join(checked)} ({where}) cover all "
        f"{len(driver_names)} driver-registered queries"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
