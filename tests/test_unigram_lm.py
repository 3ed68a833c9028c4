"""Unigram-LM tokenizer (VERDICT r8 stretch): differential tests of the
driver-local SentencePiece-style EM trainer and the JVM Viterbi encode
fold against an INDEPENDENTLY WRITTEN Python reference of the same
spec, plus an exhaustive-enumeration optimality check of the DP.

The reference below shares no code with the operator: it iterates raw
token occurrences (not the word-frequency table), keeps its state in
plain lists, and its Viterbi is written forward with explicit
backpointers.  The exhaustive check enumerates EVERY segmentation of
each short word and verifies the DP's (cost, piece-count) is the true
lexicographic minimum -- an algorithm-level check no shared spec bug
can satisfy by accident.
"""

from __future__ import annotations

import math
import re

import pytest

from dbt_metrics_ingestion_script_spark.operators.text import (
    _uni_viterbi,
    unigram_encode_token_counts,
    unigram_train_local,
)

MAX_LEN = 6
ALPHA = 0.1


# ---------------------------------------------------------------------------
# independent reference implementation (same spec, different code)
# ---------------------------------------------------------------------------


def _ref_tokens(texts: list[str]) -> list[str]:
    out = []
    for t in texts:
        out.extend(
            w for w in re.sub(r"\s+", " ", t.lower()).strip().split(" ") if w
        )
    return out


def _ref_viterbi(word: str, logp: dict[str, float]) -> list[str]:
    """Forward DP with explicit backpointers; per-step round-9
    accumulation; ties -> fewer pieces, then longer final piece."""
    n = len(word)
    table: list[tuple[float, int, int] | None] = [None] * (n + 1)
    table[0] = (0.0, 0, 0)
    for end in range(1, n + 1):
        options = []
        for start in range(max(0, end - MAX_LEN), end):
            piece = word[start:end]
            if piece not in logp or table[start] is None:
                continue
            cum = round(table[start][0] + round(-logp[piece], 9), 9)
            options.append(
                ((cum, table[start][1] + 1, MAX_LEN - (end - start)), start)
            )
        if options:
            key, start = min(options)
            table[end] = (key[0], key[1], start)
    if table[n] is None:
        return []
    pieces = []
    end = n
    while end > 0:
        start = table[end][2]
        pieces.append(word[start:end])
        end = start
    return pieces[::-1]


def _ref_probs(counts: dict[str, int], vocab: list[str]) -> dict[str, float]:
    total = sum(counts.get(p, 0) for p in vocab)
    denom = total + ALPHA * len(vocab)
    return {p: (counts.get(p, 0) + ALPHA) / denom for p in vocab}


def ref_train(
    texts: list[str], vocab_size: int, seed_size: int, em_rounds: int
) -> list[tuple[int, str, int, int, float]]:
    toks = _ref_tokens(texts)
    # seed weights from every substring occurrence of every token
    weights: dict[str, int] = {}
    for w in toks:
        for i in range(len(w)):
            for j in range(i + 1, min(i + MAX_LEN, len(w)) + 1):
                weights[w[i:j]] = weights.get(w[i:j], 0) + 1
    singles = sorted({c for w in toks for c in w})
    multi = sorted(
        [p for p in weights if len(p) > 1], key=lambda p: (-weights[p], p)
    )
    vocab = singles + multi[: max(0, seed_size - len(singles))]
    probs = _ref_probs({p: weights[p] for p in vocab}, vocab)

    def em(vocab_now: list[str], probs_now: dict[str, float]):
        logp = {p: math.log(probs_now[p]) for p in vocab_now}
        # NOTE: the operator's cost is round(-ln p, 9); replicate via
        # -round(-ln p, 9) = logp rounding on the negated value
        logp = {p: -round(-v, 9) for p, v in logp.items()}
        counts: dict[str, int] = {}
        for w in toks:
            for piece in _ref_viterbi(w, logp):
                counts[piece] = counts.get(piece, 0) + 1
        return counts

    counts: dict[str, int] = {}
    for _ in range(em_rounds):
        counts = em(vocab, probs)
        probs = _ref_probs(counts, vocab)
    kept = singles + sorted(
        [p for p in vocab if len(p) > 1],
        key=lambda p: (-counts.get(p, 0), p),
    )[: max(0, vocab_size - len(singles))]
    final_counts = em(kept, _ref_probs(counts, kept))
    final_probs = _ref_probs(final_counts, kept)
    ranked = sorted(kept, key=lambda p: (-final_counts.get(p, 0), p))
    return [
        (
            r,
            p,
            len(p),
            final_counts.get(p, 0),
            round(math.log(final_probs[p]), 9),
        )
        for r, p in enumerate(ranked)
    ]


# ---------------------------------------------------------------------------
# exhaustive optimality reference (no DP at all)
# ---------------------------------------------------------------------------


def _all_segmentations(word: str, vocab: set[str]):
    if not word:
        yield []
        return
    for l in range(1, min(MAX_LEN, len(word)) + 1):
        if word[:l] in vocab:
            for rest in _all_segmentations(word[l:], vocab):
                yield [word[:l]] + rest


def _seg_key(seg: list[str], cost: dict[str, float]):
    cum = 0.0
    for p in seg:
        cum = round(cum + cost[p], 9)
    return (cum, len(seg), MAX_LEN - len(seg[-1]))


# ---------------------------------------------------------------------------
# tests
# ---------------------------------------------------------------------------

VS, SS, ROUNDS = 120, 250, 3


@pytest.fixture(scope="module")
def corpus(spark, sf_dir):
    from dbt_metrics_ingestion_script_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    texts = [r["text"] for r in docs.select("text").collect()]
    return docs, texts


def test_trainer_matches_independent_reference(corpus):
    docs, texts = corpus
    got = [
        (r["rank"], r["piece"], r["n_chars"], r["count"], r["logprob"])
        for r in unigram_train_local(
            docs, vocab_size=VS, seed_size=SS, em_rounds=ROUNDS
        )
        .orderBy("rank")
        .collect()
    ]
    assert got == ref_train(texts, VS, SS, ROUNDS)


def test_viterbi_is_exhaustively_optimal(corpus):
    docs, texts = corpus
    pieces = unigram_train_local(
        docs, vocab_size=VS, seed_size=SS, em_rounds=ROUNDS
    ).collect()
    cost = {r["piece"]: round(-r["logprob"], 9) for r in pieces}
    vocab = set(cost)
    words = sorted({w for w in _ref_tokens(texts) if len(w) <= 12})
    assert words, "corpus yielded no short words to check"
    checked = 0
    for w in words[:40]:
        segs = list(_all_segmentations(w, vocab))
        assert segs, w  # single-char coverage guarantees >= 1
        best = min(_seg_key(s, cost) for s in segs)
        dp = _uni_viterbi(w, cost, MAX_LEN)
        assert _seg_key(dp, cost) == best, w
        checked += 1
    assert checked > 0


def test_encode_fold_matches_python_viterbi(spark, corpus):
    """The JVM F.aggregate DP produces the same per-word length as the
    Python Viterbi for EVERY distinct corpus word."""
    import pyspark.sql.functions as F

    docs, texts = corpus
    pieces = unigram_train_local(
        docs, vocab_size=VS, seed_size=SS, em_rounds=ROUNDS
    ).collect()
    arts = [(r["piece"], round(-r["logprob"], 9)) for r in pieces]
    cost = dict(arts)
    words = sorted({w for w in _ref_tokens(texts)})
    one = spark.createDataFrame(
        [(i, w) for i, w in enumerate(words)], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: r["n_uni_tokens"]
        for r in unigram_encode_token_counts(one, arts).collect()
    }
    for i, w in enumerate(words):
        assert got[i] == len(_uni_viterbi(w, cost, MAX_LEN)), w


def test_encoded_lengths_invariants(corpus):
    """Per doc: n_uni_tokens bounded by [n_words, n_chars]; every doc
    encodable (coverage: all single chars survive pruning)."""
    docs, texts = corpus
    pieces = unigram_train_local(
        docs, vocab_size=VS, seed_size=SS, em_rounds=ROUNDS
    ).collect()
    arts = [(r["piece"], round(-r["logprob"], 9)) for r in pieces]
    rows = unigram_encode_token_counts(docs, arts).collect()
    assert rows
    for r in rows:
        assert r["n_uni_tokens"] is not None
        assert r["n_uni_tokens"] >= r["n_words"]


def test_unseen_char_word_yields_null(spark, corpus):
    docs, _ = corpus
    pieces = unigram_train_local(
        docs, vocab_size=VS, seed_size=SS, em_rounds=ROUNDS
    ).collect()
    arts = [(r["piece"], round(-r["logprob"], 9)) for r in pieces]
    assert all(p != "ß" for p, _ in arts)
    odd = spark.createDataFrame(
        [(1, "straße")], "doc_id long, text string"
    )
    out = unigram_encode_token_counts(odd, arts).collect()
    assert out[0]["n_uni_tokens"] is None


def test_vocab_shape_invariants(corpus):
    docs, texts = corpus
    rows = (
        unigram_train_local(
            docs, vocab_size=VS, seed_size=SS, em_rounds=ROUNDS
        )
        .orderBy("rank")
        .collect()
    )
    singles = {c for w in _ref_tokens(texts) for c in w}
    got_singles = {r["piece"] for r in rows if r["n_chars"] == 1}
    assert got_singles == singles  # every corpus char survives pruning
    assert [r["rank"] for r in rows] == list(range(len(rows)))
    assert len(rows) == min(VS, len({r["piece"] for r in rows}))
    counts = [r["count"] for r in rows]
    assert counts == sorted(counts, reverse=True)
