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


def test_orders_lineitem_share_one_offset_preserving_ri(spark):
    """VERDICT r11 item 1: the fact-fact join decade is only honest if
    every replica keeps lineitem->orders referential integrity -- both
    tables must re-key on the SAME offset (max o_orderkey + 1)."""
    orders = spark.createDataFrame(
        [(1, 10), (2, 11), (9, 12)], "o_orderkey long, o_custkey long"
    )
    li = spark.createDataFrame(
        [(1, 5.0), (1, 6.0), (9, 7.0)],
        "l_orderkey long, l_quantity double",
    )
    off = 10  # max(o_orderkey) + 1
    o_up = up._replicate(
        orders, ["o_orderkey"], 3, offsets={"o_orderkey": off}
    )
    l_up = up._replicate(li, ["l_orderkey"], 3, offsets={"l_orderkey": off})
    # every upsampled lineitem key resolves to an upsampled order: zero
    # orphans at any factor
    orphans = l_up.join(
        o_up, l_up.l_orderkey == o_up.o_orderkey, "left_anti"
    ).count()
    assert orphans == 0
    assert o_up.count() == 9 and l_up.count() == 9
    # replicas are disjoint key populations (no artificial fan-out)
    assert o_up.select("o_orderkey").distinct().count() == 9


def test_lang_salt_preserves_quality_statistics_exactly(spark):
    """VERDICT r11 item 5: the lang-preserving salt must keep every
    per-document quality statistic identical to replica 0 -- protected
    stopwords/markers untouched, token lengths and n-gram repetition
    profile preserved (injective last-char relabeling), so the filter
    family's survivor set grows exactly xN."""
    from dbt_metrics_ingestion_script_spark.operators import text as T

    df = spark.createDataFrame(
        [(1, "the quick quick fox is with the fox und der hund")],
        "doc_id long, text string",
    )
    out = {i: up._salt_documents_lang(df, i).first()["text"] for i in (0, 1, 3)}
    assert out[0] == "the quick quick fox is with the fox und der hund"
    # protected: en markers/stopwords AND other languages' markers
    assert out[1] == "the quicb quicb fob is with the fob und der hunb"
    assert out[3] == "the quicd quicd fod is with the fod und der hund"
    for i in (1, 3):
        a, b = out[0].split(), out[i].split()
        # token count and every token LENGTH preserved
        assert [len(t) for t in a] == [len(t) for t in b]
        # repetition profile preserved: equal tokens stay equal,
        # distinct tokens stay distinct (injective relabeling)
        import itertools

        for (x1, y1), (x2, y2) in itertools.combinations(
            list(zip(a, b)), 2
        ):
            assert (x1 == x2) == (y1 == y2)
    # the composed quality flags are bit-identical across replicas
    rep = up._salt_documents_lang(df, 7).withColumn(
        "n_chars", F.length("text").cast("long")
    )
    base = df.withColumn("n_chars", F.length("text").cast("long"))
    f0 = T.quality_filter_report(base).collect()
    f7 = T.quality_filter_report(rep).collect()
    assert sorted(map(tuple, f0)) == sorted(map(tuple, f7))


def test_zipf_skew_routes_half_to_one_hot_key(spark):
    ev = spark.createDataFrame(
        [(i, 100 + i, "click") for i in range(10)],
        "event_id long, user_id long, event_type string",
    )
    out = up._skew_events(ev, 1).collect()
    hot = [r for r in out if r["event_type"] == "hot"]
    assert len(hot) == 5
    assert all(r["event_id"] % 2 == 0 for r in hot)
    # replica 0 untouched
    assert all(
        r["event_type"] == "click" for r in up._skew_events(ev, 0).collect()
    )
    docs = spark.createDataFrame(
        [(0, "a b c", 5), (1, "d e f", 5)],
        "doc_id long, text string, n_chars long",
    )
    sk = {r["doc_id"]: r for r in up._skew_documents(docs, 2).collect()}
    assert sk[0]["text"].endswith(up.HOT_SENTENCE)
    assert sk[0]["n_chars"] == len(sk[0]["text"])
    assert sk[1]["text"] == "d e f"


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
