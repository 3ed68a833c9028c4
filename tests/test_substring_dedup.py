"""Exact substring dedup (VERDICT r8 item 4): property tests of the
positional-shingle extent finder and span remover against a
brute-force Python reference, plus fixed-case pins for the edge shapes
(adjacent windows coalescing, fully-duplicated docs, short docs).

The Python reference is deliberately naive: enumerate every n-token
window string per doc, mark a window duplicated when the same string
occurs in another doc, union the covered token positions, and emit
maximal runs -- O(total_tokens^2) string comparisons, nothing shared
with the Spark plan beyond the definition.
"""

from __future__ import annotations

import pytest

import re

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from dbt_metrics_ingestion_script_spark.operators.corpus import (
    duplicated_substring_extents,
    substring_dedup_clean,
)


def _norm_tokens(text: str) -> list[str]:
    return re.sub(r"\s+", " ", text.lower()).strip().split(" ")


def brute_force_extents(
    docs: dict[int, str], n: int
) -> dict[int, list[tuple[int, int]]]:
    """Reference extent finder: maximal 1-based inclusive token runs
    covered by n-token windows occurring verbatim in >= 2 docs."""
    toks = {d: _norm_tokens(t) for d, t in docs.items()}
    windows: dict[str, set[int]] = {}
    for d, ts in toks.items():
        for i in range(len(ts) - n + 1):
            windows.setdefault(" ".join(ts[i : i + n]), set()).add(d)
    out: dict[int, list[tuple[int, int]]] = {}
    for d, ts in toks.items():
        covered: set[int] = set()
        for i in range(len(ts) - n + 1):
            if len(windows[" ".join(ts[i : i + n])]) >= 2:
                covered.update(range(i + 1, i + n + 1))  # 1-based
        runs: list[tuple[int, int]] = []
        for p in sorted(covered):
            if runs and p == runs[-1][1] + 1:
                runs[-1] = (runs[-1][0], p)
            else:
                runs.append((p, p))
        if runs:
            out[d] = runs
    return out


def brute_force_clean(docs: dict[int, str], n: int) -> dict[int, str]:
    ext = brute_force_extents(docs, n)
    out = {}
    for d, t in docs.items():
        ts = _norm_tokens(t)
        covered = {
            p for s, e in ext.get(d, []) for p in range(s, e + 1)
        }
        out[d] = " ".join(
            tok for i, tok in enumerate(ts, start=1) if i not in covered
        )
    return out


# tiny vocab + short docs force real cross-doc window collisions
doc_text = st.lists(
    st.sampled_from(["alpha", "beta", "gamma", "delta", "eps"]),
    min_size=0,
    max_size=14,
).map(" ".join)


def _spark_extents(spark, docs: dict[int, str], n: int):
    df = spark.createDataFrame(
        [(d, t) for d, t in docs.items()], "doc_id long, text string"
    )
    rows = duplicated_substring_extents(df, n=n).collect()
    got: dict[int, list[tuple[int, int]]] = {}
    for r in sorted(rows, key=lambda r: (r.doc_id, r.start_tok)):
        got.setdefault(r.doc_id, []).append((r.start_tok, r.end_tok))
        assert r.n_tokens == r.end_tok - r.start_tok + 1
    return got


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(st.lists(doc_text, min_size=2, max_size=5), st.integers(2, 4))
@pytest.mark.slow
def test_extents_match_brute_force(spark, texts, n):
    docs = {i: t for i, t in enumerate(texts) if t}
    if len(docs) < 2:
        return
    assert _spark_extents(spark, docs, n) == brute_force_extents(docs, n)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(st.lists(doc_text, min_size=2, max_size=4), st.integers(2, 3))
@pytest.mark.slow
def test_clean_matches_brute_force(spark, texts, n):
    docs = {i: t for i, t in enumerate(texts) if t}
    if len(docs) < 2:
        return
    df = spark.createDataFrame(
        [(d, t) for d, t in docs.items()], "doc_id long, text string"
    )
    rows = substring_dedup_clean(df, n=n).collect()
    expected = brute_force_clean(docs, n)
    assert len(rows) == len(docs)  # every doc survives, possibly empty
    for r in rows:
        assert r.clean_text == expected[r.doc_id], r.doc_id
        ts = _norm_tokens(docs[r.doc_id])
        assert r.n_kept + r.n_removed == len(ts)


def test_adjacent_windows_coalesce(spark):
    """Two duplicated windows that touch without overlapping merge into
    one extent (covered-token-union semantics)."""
    a = "x1 x2 x3 y1 y2 y3"  # both 3-grams duplicated, adjacent
    docs = {1: a, 2: "x1 x2 x3 q q q q y1 y2 y3"}
    got = _spark_extents(spark, docs, 3)
    assert got[1] == [(1, 6)]
    assert got[2] == [(1, 3), (8, 10)]


def test_fully_duplicated_doc_cleans_to_empty(spark):
    docs = {1: "a b c d e", 2: "a b c d e"}
    df = spark.createDataFrame(list(docs.items()), "doc_id long, text string")
    rows = {r.doc_id: r for r in substring_dedup_clean(df, n=3).collect()}
    assert rows[1].clean_text == "" and rows[1].n_removed == 5
    assert rows[2].clean_text == "" and rows[2].n_kept == 0


def test_short_docs_produce_no_extents(spark):
    """Docs shorter than n tokens carry no window, hence no extents --
    NOT the whole-text fallback shingling uses (a 2-token doc cannot
    contain an 8-token duplicate)."""
    docs = {1: "a b", 2: "a b", 3: "a b c d e f g h i j"}
    df = spark.createDataFrame(list(docs.items()), "doc_id long, text string")
    assert duplicated_substring_extents(df, n=8).count() == 0
