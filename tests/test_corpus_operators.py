"""Property tests for the training-corpus preparation operators
(operators/corpus.py).  Differential DuckDB coverage for the four
registered corpus_* queries runs in test_metric_compiler's
ORACLE_BACKED sweep; these tests pin the semantic invariants the
oracle can't express (coverage, determinism, packing layout).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dbt_metrics_ingestion_script_spark.operators import corpus


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


# ---------------------------------------------------------------------------
# decontamination
# ---------------------------------------------------------------------------


def test_decontamination_flags_verbatim_overlap(spark):
    train = _docs(
        spark,
        [
            (1, "the quick brown fox jumps over the lazy dog", "en"),
            (2, "completely disjoint vocabulary here alpha beta gamma", "en"),
            (3, "prefix words then the quick brown fox jumps over suffix", "en"),
        ],
    )
    eval_set = _docs(spark, [(100, "the quick brown fox jumps over a fence", "en")])
    got = {
        r["doc_id"]: r["n_overlap"]
        for r in corpus.decontaminate_ngram_overlap(train, eval_set, n=5).collect()
    }
    # docs 1 and 3 share the 5-gram "the quick brown fox jumps" (and more)
    assert set(got) == {1, 3}
    assert all(v >= 1 for v in got.values())


def test_decontamination_min_overlap_threshold(spark):
    train = _docs(spark, [(1, "a b c d e f", "en")])
    eval_set = _docs(spark, [(100, "a b c d e z", "en")])
    # exactly one shared 5-gram ("a b c d e")
    assert corpus.decontaminate_ngram_overlap(
        train, eval_set, n=5, min_overlap=2
    ).count() == 0
    assert corpus.decontaminate_ngram_overlap(
        train, eval_set, n=5, min_overlap=1
    ).count() == 1


# ---------------------------------------------------------------------------
# stratified sampling
# ---------------------------------------------------------------------------


def test_stratified_sample_rates_and_determinism(spark):
    rows = [(i, f"text {i}", ["en", "zh"][i % 2]) for i in range(2000)]
    df = _docs(spark, rows)
    out = corpus.stratified_sample(df, "lang", {"en": 1.0, "zh": 0.25})
    counts = {
        r["lang"]: r["n"]
        for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    assert counts["en"] == 1000  # rate 1.0 keeps everything
    assert 150 <= counts.get("zh", 0) <= 350  # ~250 expected
    # deterministic: identical output on re-run (function of id+stratum)
    ids1 = {r["doc_id"] for r in out.collect()}
    ids2 = {
        r["doc_id"]
        for r in corpus.stratified_sample(
            df, "lang", {"en": 1.0, "zh": 0.25}
        ).collect()
    }
    assert ids1 == ids2
    # rate 0 drops the stratum entirely
    none = corpus.stratified_sample(df, "lang", {"en": 0.0}, default_rate=0.0)
    assert none.count() == 0


def test_stratified_sample_is_subset(spark):
    df = _docs(spark, [(i, f"t {i}", "en") for i in range(100)])
    sampled = {r["doc_id"] for r in corpus.stratified_sample(df, "lang", {"en": 0.5}).collect()}
    assert sampled <= set(range(100))
    assert 0 < len(sampled) < 100


# ---------------------------------------------------------------------------
# chunking
# ---------------------------------------------------------------------------


def test_chunk_fixed_covers_text(spark):
    text = "x" * 777
    df = _docs(spark, [(1, text, "en")])
    chunks = corpus.chunk_fixed(df, chunk_chars=200, overlap=50).collect()
    stride = 150
    expected_offsets = list(range(0, len(text), stride))
    assert sorted(r["chunk_offset"] for r in chunks) == expected_offsets
    for r in chunks:
        expected_len = min(200, len(text) - r["chunk_offset"])
        assert r["chunk_len"] == expected_len
    # consecutive chunks overlap by `overlap` chars
    assert expected_offsets[1] - expected_offsets[0] == stride


def test_chunk_fixed_empty_and_short_docs(spark):
    df = _docs(spark, [(1, "", "en"), (2, "short", "en")])
    got = corpus.chunk_fixed(df, chunk_chars=200, overlap=50).collect()
    by_doc = {}
    for r in got:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert len(by_doc[1]) == 1 and by_doc[1][0]["chunk_len"] == 0
    assert len(by_doc[2]) == 1 and by_doc[2][0]["chunk_len"] == 5


def test_chunk_fixed_rejects_bad_overlap(spark):
    df = _docs(spark, [(1, "abc", "en")])
    try:
        corpus.chunk_fixed(df, chunk_chars=100, overlap=100)
        raise AssertionError("expected ValueError")
    except ValueError:
        pass


# ---------------------------------------------------------------------------
# sequence packing
# ---------------------------------------------------------------------------


def test_pack_next_fit_layout(spark):
    # shard "en": docs of 3, 4, 5 tokens; capacity 8.
    # cum_excl: 0, 3, 7 -> all bin 0 (a doc belongs to the bin its first
    # token lands in; doc 3 straddles the boundary).
    # shard "zh": 6-token docs at cum_excl 0, 6 -> bin 0; 12 -> bin 1.
    rows = [
        (1, "a b c", "en"),
        (2, "a b c d", "en"),
        (3, "a b c d e", "en"),
        (10, "a b c d e f", "zh"),
        (11, "a b c d e f", "zh"),
        (12, "a b c d e f", "zh"),
    ]
    out = {
        (r["shard"], r["bin_id"]): (r["n_docs"], r["n_tokens"])
        for r in corpus.pack_next_fit(
            _docs(spark, rows), "lang", capacity=8
        ).collect()
    }
    assert out == {
        ("en", 0): (3, 12),
        ("zh", 0): (2, 12),
        ("zh", 1): (1, 6),
    }


def test_pack_conserves_tokens(spark, sf_dir):
    from dbt_metrics_ingestion_script_spark.operators.dedup import normalize_text
    from dbt_metrics_ingestion_script_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    packed = corpus.pack_next_fit(docs, "lang", capacity=512)
    total_packed = packed.agg(F.sum("n_tokens")).collect()[0][0]
    total_direct = docs.select(
        F.size(F.split(normalize_text("text"), " ")).alias("n")
    ).agg(F.sum("n")).collect()[0][0]
    assert total_packed == total_direct
    # bin ids are dense from 0 within every shard
    per_shard = packed.groupBy("shard").agg(
        F.min("bin_id").alias("lo"),
        F.max("bin_id").alias("hi"),
        F.count_distinct("bin_id").alias("n"),
    )
    for r in per_shard.collect():
        assert r["lo"] == 0 and r["n"] == r["hi"] + 1
