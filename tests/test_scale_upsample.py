"""Honesty properties of the scale-slope upsample generator
(scripts/make_scale_upsample.py) -- the x10/x100 slope evidence in
SCALING_r11*.json is only meaningful if the upsample neither creates
artificial cross-replica duplicates (quadratic candidate growth the
real corpus wouldn't have) nor destroys within-replica structure (the
work per replica must match the original)."""

from __future__ import annotations

import importlib.util
import math
import pathlib

from pyspark.sql import functions as F

_SPEC = importlib.util.spec_from_file_location(
    "make_scale_upsample",
    pathlib.Path(__file__).parent.parent / "scripts" / "make_scale_upsample.py",
)
up = importlib.util.module_from_spec(_SPEC)
_SPEC.loader.exec_module(up)


def _cos(a, b):
    d = sum(x * y for x, y in zip(a, b))
    na = math.sqrt(sum(x * x for x in a))
    nb = math.sqrt(sum(x * x for x in b))
    return d / (na * nb)


def test_replicate_rekeys_disjoint(spark):
    df = spark.createDataFrame([(0, "a"), (7, "b")], "doc_id long, text string")
    out = up._replicate(df, ["doc_id"], 3).collect()
    ids = sorted(r["doc_id"] for r in out)
    # offset = max+1 = 8 per replica; all ids distinct, populations disjoint
    assert ids == [0, 7, 8, 15, 16, 23]


def test_salt_suffixes_every_token_uniquely_per_replica(spark):
    df = spark.createDataFrame([(1, "the quick fox")], "doc_id long, text string")
    texts = {
        i: up._salt_documents(df, i).first()["text"] for i in (0, 1, 27, 53)
    }
    assert texts[0] == "the quick fox"
    assert texts[1] == "theba quickba foxba"
    # two-letter salts stay unique past 26 replicas
    assert texts[27] == "thebb quickbb foxbb"
    assert texts[53] == "thebc quickbc foxbc"
    # no token of a salted replica equals any token of another replica
    toks = {i: set(t.split()) for i, t in texts.items()}
    for i in toks:
        for j in toks:
            if i != j:
                assert not (toks[i] & toks[j])


def test_sign_flip_preserves_within_replica_cosine(spark):
    a = [float((d % 7) - 3) or 1.0 for d in range(64)]
    b = [float((d % 5) - 2) or -1.0 for d in range(64)]
    df = spark.createDataFrame(
        [(0, a), (1, b)], "vec_id long, embedding array<double>"
    )
    base = {r["vec_id"]: r["embedding"] for r in df.collect()}
    for i in (1, 42, 99):
        rep = {
            r["vec_id"]: r["embedding"]
            for r in up._decorrelate_embedding(df, i).collect()
        }
        # norms preserved exactly
        for k in base:
            assert abs(
                sum(x * x for x in rep[k]) - sum(x * x for x in base[k])
            ) < 1e-9
        # within-replica cosine EXACTLY preserved
        assert abs(_cos(rep[0], rep[1]) - _cos(base[0], base[1])) < 1e-12
        # cross-replica cosine decorrelated: the same vector against its
        # flipped self is far from 1 (no near-dup clique)
        assert abs(_cos(base[0], rep[0])) < 0.6
