"""Compare two bench result files (BENCHFULL_r{N}.json or any file whose
last '{"metric"...}' line parses): per-query deltas on the common set,
regressions above a threshold, and the added/removed sets.

Usage: python scripts/bench_diff.py OLD NEW [--threshold 1.5]

Exit code 1 if any common-set query regressed beyond the threshold AND
by more than 0.1 s absolute (the same double gate the round judges
apply, so JVM noise on sub-100 ms queries never flags).
"""

from __future__ import annotations

import argparse
import json
import sys


def load(path: str) -> dict:
    """Accept a bare bench JSON line (BENCHFULL_r{N}.json), a driver
    wrapper ({"parsed": ..., "tail": "..."} as in BENCH_r{N}.json), or
    any log whose last '{"metric"...}' line parses."""
    raw = open(path).read()
    try:
        d = json.loads(raw)
        if isinstance(d, dict) and "queries" in d:
            return d
        if isinstance(d, dict) and d.get("parsed"):
            return d["parsed"]
        if isinstance(d, dict) and "tail" in d:
            tail = d["tail"]
            i = tail.rfind('{"metric"')
            if i < 0:
                raise SystemExit(f"{path}: driver tail holds no bench JSON")
            try:
                return json.loads(tail[i:].splitlines()[0])
            except json.JSONDecodeError as exc:
                raise SystemExit(
                    f"{path}: bench JSON in driver tail is truncated ({exc}); "
                    "use the committed BENCHFULL file for that round"
                ) from exc
    except json.JSONDecodeError:
        pass
    i = raw.rfind('{"metric"')
    if i < 0:
        raise SystemExit(f"{path}: no bench JSON line found")
    return json.loads(raw[i:].splitlines()[0])


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--threshold", type=float, default=1.5)
    args = ap.parse_args()
    old, new = load(args.old), load(args.new)
    qo, qn = old["queries"], new["queries"]
    common = sorted(set(qo) & set(qn))
    to = sum(qo[k] for k in common)
    tn = sum(qn[k] for k in common)
    print(
        f"common set: {len(common)} queries, "
        f"{to:.2f}s -> {tn:.2f}s ({(tn / to - 1) * 100:+.1f}%)"
    )
    regressions = []
    for k in common:
        a, b = qo[k], qn[k]
        if b > args.threshold * a and b - a > 0.1:
            regressions.append((b / a, k, a, b))
    for ratio, k, a, b in sorted(regressions, reverse=True):
        print(f"REGRESSION {k}: {a:.3f}s -> {b:.3f}s ({ratio:.2f}x)")
    added = sorted(set(qn) - set(qo), key=lambda k: -qn[k])
    removed = sorted(set(qo) - set(qn))
    if added:
        extra = sum(qn[k] for k in added)
        print(f"added ({len(added)}, {extra:.2f}s): "
              + ", ".join(f"{k} {qn[k]:.2f}s" for k in added[:8])
              + ("..." if len(added) > 8 else ""))
    if removed:
        print(f"removed ({len(removed)}): " + ", ".join(removed))
    return 1 if regressions else 0


if __name__ == "__main__":
    sys.exit(main())
