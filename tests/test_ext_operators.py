"""EXT operators: differential tests vs DuckDB where SQL-expressible,
semantic/property tests for the sketch + approximate + Pandas-UDF paths."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dbt_metrics_ingestion_script_spark import queries as q
from dbt_metrics_ingestion_script_spark.operators import dedup, multimodal, similarity
from dbt_metrics_ingestion_script_spark.sources.tables import load_table

from .oracle import assert_matches_oracle

EXT_ORACLE_QUERIES = [
    "dedup_exact",
    "dedup_embedding_cosine_pairs",
    "dedup_ngram_jaccard_pairs",
    "dedup_minhash_lsh_candidates",
    "dedup_simhash_near_pairs",
    "dedup_near_minhash_survivors",
    "dedup_embedding_lsh_survivors",
    "similarity_cosine_topk",
    "similarity_norm_stats_by_label",
    "text_stats",
    "text_token_count_bpe",
    "text_language_id",
    "text_quality_score",
    "text_doc_fingerprint",
    "text_tfidf_top_terms",
    "text_unigram_logprob",
    "embeddings_quantize_int8",
    "embeddings_kmeans_assign",
    "events_funnel_stages",
    "events_asof_last_order",
    "events_range_join_sessions",
    "events_cohort_retention",
    "events_hopping_window_agg",
    "multimodal_binary_stats",
    "multimodal_feature_extract",
    "multimodal_resize",
    "multimodal_frame_sample",
    "events_json_props_extract",
    "similarity_lsh_topk",
    "similarity_ivf_topk",
]


@pytest.mark.parametrize("name", EXT_ORACLE_QUERIES)
def test_ext_matches_oracle(spark, sf_dir, name):
    q.queries()  # force registration
    qd = q.REGISTRY[name]
    assert_matches_oracle(qd.fn(spark, sf_dir), qd.oracle, sf_dir)


def test_events_daily_agg_matches_oracle(spark, sf_dir):
    # unregistered (oracle identical to events_salted_daily_agg) but the
    # plain aggregation path stays differential-tested here
    from dbt_metrics_ingestion_script_spark import queries_ext

    assert_matches_oracle(
        queries_ext.events_daily_agg(spark, sf_dir),
        queries_ext.EVENTS_DAILY_ORACLE,
        sf_dir,
    )


def test_simhash_properties(spark):
    df = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumps over the lazy dog"),
            (3, "THE  quick   Brown fox jumps over the lazy dog"),  # case/ws jitter
            (4, "a completely different sentence about spark engines"),
        ],
        "doc_id long, text string",
    )
    sigs = {r["doc_id"]: r["simhash"] for r in dedup.simhash_signatures(df).collect()}
    assert sigs[1] == sigs[2] == sigs[3]  # normalization removes jitter
    assert sigs[1] != sigs[4]


def test_minhash_recall_vs_exact_jaccard(spark, sf_dir):
    """LSH candidates must cover all genuinely similar pairs (recall ~1
    at jaccard >= 0.8 with k=16, bands=4: P_miss = (1-j^4)^4 < 0.04)."""
    docs = load_table(spark, sf_dir, "documents")
    exact = {
        (r["id_a"], r["id_b"])
        for r in dedup.ngram_jaccard_pairs(docs, threshold=0.8).collect()
    }
    cands = {
        (r["id_a"], r["id_b"])
        for r in dedup.minhash_lsh_candidates(docs, k=16, bands=4).collect()
    }
    assert exact, "fixture should contain near-duplicate documents"
    missed = exact - cands
    assert len(missed) <= max(1, len(exact) // 10), f"LSH recall too low: missed {missed}"


def test_ngram_df_cap_bounds_hot_shingle_fanout(spark):
    """VERDICT r3 item 2: a shingle shared by every document must not
    produce O(n^2) candidate pairs.  60 docs share exactly one hot
    shingle and are otherwise unique: exact semantics (df_max=None)
    yields all C(60,2)=1770 co-shingle pairs; the DF cap drops the hot
    shingle from the index, leaving zero pairs -- the fan-out bound is
    visible at the output because grouping preserves pair count."""
    docs = spark.createDataFrame(
        [(i, f"hot shingle words u{i}a u{i}b u{i}c u{i}d") for i in range(60)],
        "doc_id long, text string",
    )
    exact = dedup.ngram_jaccard_pairs(
        docs, threshold=0.001, df_max=None
    ).count()
    capped = dedup.ngram_jaccard_pairs(
        docs, threshold=0.001, df_max=10
    ).count()
    assert exact == 60 * 59 // 2
    assert capped == 0


def test_ngram_df_cap_is_lower_bound_subset(spark, sf_dir):
    """Capped pairs are a SUBSET of exact pairs with jaccard <= exact
    jaccard (no false positives; the cap only loses recall on overlap
    carried by hot shingles)."""
    docs = load_table(spark, sf_dir, "documents")
    exact = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in dedup.ngram_jaccard_pairs(
            docs, threshold=0.2, df_max=None
        ).collect()
    }
    capped = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in dedup.ngram_jaccard_pairs(docs, threshold=0.2, df_max=5).collect()
    }
    assert set(capped) <= set(exact)
    for pair, j in capped.items():
        assert j <= exact[pair] + 1e-9


def test_near_dedup_removes_near_dups(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    survivors = dedup.near_dedup_minhash(docs, k=16, bands=4, threshold=0.8)
    n0, n1 = docs.count(), survivors.count()
    assert n1 < n0  # corpus contains near-dups by construction
    assert n1 > n0 // 2  # but is not degenerate


def test_lsh_topk_recall(spark, sf_dir):
    """Approximate ANN should recover most of the exact top-10."""
    emb = load_table(spark, sf_dir, "embeddings")
    from pyspark.sql import functions as F

    qid = emb.agg(F.min("vec_id")).collect()[0][0]
    query = emb.filter(F.col("vec_id") == qid)
    exact = [r["vec_id"] for r in similarity.cosine_topk(emb, query, k=10).collect()]
    # this synthetic corpus has weak neighbors (top cosine ~0.33, near-
    # orthogonal): use fewer planes + wide multi-probe; real embedding
    # corpora (neighbor cosine > 0.8) would use the tighter defaults
    approx = [
        r["vec_id"]
        for r in similarity.lsh_cosine_topk(
            emb, query, k=10, n_planes=8, probe_hamming=4
        ).collect()
    ]
    overlap = len(set(exact) & set(approx))
    assert overlap >= 4, f"ANN recall too low: {overlap}/10 ({exact} vs {approx})"


def test_ivf_topk_exact_when_probing_all(spark, sf_dir):
    """Exact-degradation PROPERTY (VERDICT r4 item 7): with
    n_probe == n_centroids the IVF path scans every inverted list, so
    it must reproduce brute force exactly -- checked across a spread of
    query vectors (min/median/max id region), not one spot query, and
    across two index granularities."""
    emb = load_table(spark, sf_dir, "embeddings")
    from pyspark.sql import functions as F

    ids = sorted(r["vec_id"] for r in emb.select("vec_id").collect())
    probes = [ids[0], ids[len(ids) // 2], ids[-1]]
    for qid in probes:
        query = emb.filter(F.col("vec_id") == qid)
        exact = [
            r["vec_id"] for r in similarity.cosine_topk(emb, query, k=10).collect()
        ]
        for n_cent in (4, 8):
            full = [
                r["vec_id"]
                for r in similarity.ivf_topk(
                    emb, query, k=10, n_centroids=n_cent, n_probe=n_cent
                ).collect()
            ]
            assert full == exact, f"qid={qid} n_centroids={n_cent}"


def test_ann_recall_is_one_when_probing_all(spark, sf_dir):
    """Recall self-evaluation sanity: with n_probe == n_centroids the
    IVF path IS brute force, so the measured recall must be exactly
    1.0; with real pruning recall stays in (0, 1]."""
    emb = load_table(spark, sf_dir, "embeddings")
    from dbt_metrics_ingestion_script_spark.queries_ext import _min_id_query

    full = similarity.ann_recall(
        emb, _min_id_query(emb), k=10, n_centroids=8, n_probe=8
    ).collect()[0]
    assert (full["k"], full["n_exact"], full["n_hits"], full["recall"]) == (
        10, 10, 10, 1.0,
    )
    pruned = similarity.ann_recall(
        emb, _min_id_query(emb), k=10, n_centroids=16, n_probe=4
    ).collect()[0]
    assert 0 < pruned["n_hits"] <= 10
    assert pruned["recall"] == round(pruned["n_hits"] / pruned["n_exact"], 6)


def test_ann_recall_small_corpus_reaches_one(spark, sf_dir):
    """A corpus smaller than k yields n_exact < k; a perfect index must
    still measure recall == 1.0 (ADVICE r7: dividing by the literal k
    understated recall for small/filtered probe sets)."""
    emb = load_table(spark, sf_dir, "embeddings")
    from dbt_metrics_ingestion_script_spark.queries_ext import _min_id_query

    small = emb.orderBy("vec_id").limit(6)
    r = similarity.ann_recall(
        small, _min_id_query(small), k=10, n_centroids=2, n_probe=2
    ).collect()[0]
    assert r["k"] == 10
    assert r["n_exact"] == 6
    assert r["n_hits"] == 6
    assert r["recall"] == 1.0


def test_ivf_pq_recall_not_below_ivf_only(spark, sf_dir):
    """The composed IVF->PQ->rerank path must not trail the IVF-only
    path at equal probe budget (VERDICT r8 item 5): the 5x-k ADC
    shortlist plus exact re-rank recovers everything the PQ
    compression mis-ranks on this corpus.  Also pins the degenerate
    sanity: with the shortlist covering every candidate, the composed
    path IS the IVF-only path."""
    emb = load_table(spark, sf_dir, "embeddings")
    from dbt_metrics_ingestion_script_spark.queries_ext import _min_id_query

    rows = {
        r["path"]: r
        for r in similarity.ivf_pq_recall(
            emb, _min_id_query(emb), k=10, shortlist=50,
            n_centroids=16, n_probe=4,
        ).collect()
    }
    assert set(rows) == {"ivf", "ivf_pq"}
    assert rows["ivf_pq"]["recall"] >= rows["ivf"]["recall"], rows
    # shortlist >= corpus: ADC prunes nothing, re-rank sees every
    # probed candidate -> identical recall by construction
    wide = {
        r["path"]: r["recall"]
        for r in similarity.ivf_pq_recall(
            emb, _min_id_query(emb), k=10, shortlist=10_000,
            n_centroids=16, n_probe=4,
        ).collect()
    }
    assert wide["ivf_pq"] == wide["ivf"]


def test_ivf_pq_topk_matches_ivf_topk_rows(spark, sf_dir):
    """With the shortlist covering all candidates the composed serving
    plan returns EXACTLY the IVF-only rows (same ids, same rounded
    scores) -- the degenerate-equivalence pin."""
    emb = load_table(spark, sf_dir, "embeddings")
    from dbt_metrics_ingestion_script_spark.queries_ext import _min_id_query

    a = similarity.ivf_pq_topk(
        emb, _min_id_query(emb), k=10, shortlist=10_000,
        n_centroids=16, n_probe=4, round_digits=6,
    ).collect()
    b = similarity.ivf_topk(
        emb, _min_id_query(emb), k=10, n_centroids=16, n_probe=4,
        round_digits=6,
    ).collect()
    assert [(r["vec_id"], r["cosine_sim"]) for r in a] == [
        (r["vec_id"], r["cosine_sim"]) for r in b
    ]


def test_cluster_balanced_cap_semantics(spark, sf_dir):
    """Per-cluster cap: at most k rows per centroid, ranks contiguous
    from 1, d2 non-increasing within a cluster (farthest kept first),
    and k >= cluster size keeps whole clusters (total == corpus)."""
    import pytest as _pytest

    emb = load_table(spark, sf_dir, "embeddings")
    rows = similarity.cluster_balanced_cap(
        emb, k_per_cluster=3, n_centroids=4
    ).collect()
    by_c: dict[int, list] = {}
    for r in rows:
        by_c.setdefault(r["centroid_id"], []).append(r)
    assert by_c and all(len(v) <= 3 for v in by_c.values())
    for members in by_c.values():
        members.sort(key=lambda r: r["rank"])
        assert [r["rank"] for r in members] == list(range(1, len(members) + 1))
        d2s = [r["d2"] for r in members]
        assert d2s == sorted(d2s, reverse=True)
    n = emb.count()
    assert (
        similarity.cluster_balanced_cap(emb, k_per_cluster=n, n_centroids=4).count()
        == n
    )
    with _pytest.raises(ValueError, match="k_per_cluster"):
        similarity.cluster_balanced_cap(emb, k_per_cluster=0)


def test_ivf_topk_prunes_and_keeps_k(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    from pyspark.sql import functions as F

    qid = emb.agg(F.min("vec_id")).collect()[0][0]
    query = emb.filter(F.col("vec_id") == qid)
    assignments, _ = similarity.ivf_index(emb, n_centroids=8)
    # the index must spread the corpus over multiple lists for pruning
    # to mean anything
    assert assignments.select("centroid_id").distinct().count() > 1
    approx = similarity.ivf_topk(emb, query, k=10, n_centroids=8, n_probe=2)
    assert approx.count() == 10


def test_embedding_near_dedup_survivors(spark, sf_dir):
    """LSH-pruned dedup must drop only rows that genuinely have an
    earlier near-duplicate (no false-positive drops), and at these
    LSH settings catch most of them."""
    emb = load_table(spark, sf_dir, "embeddings")
    exact_pairs = dedup.embedding_cosine_pairs(emb, threshold=0.4).collect()
    true_losers = {r["id_b"] for r in exact_pairs}
    survivors = {
        r["vec_id"]
        for r in dedup.embedding_near_dedup(emb, threshold=0.4).collect()
    }
    all_ids = {r["vec_id"] for r in emb.select("vec_id").collect()}
    dropped = all_ids - survivors
    assert dropped <= true_losers, f"false drops: {dropped - true_losers}"
    assert exact_pairs, "fixture should contain cosine-similar pairs"


def test_multimodal_feature_extract_plumbing(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    assets = multimodal.synth_assets(docs)
    feats = multimodal.extract_features(assets)
    assert feats.schema == multimodal.FEATURE_SCHEMA
    rows = feats.collect()
    assert len(rows) == docs.count()
    assert all(0 <= r["feat_0"] <= 255 for r in rows)
    # deterministic: same input -> same features
    again = multimodal.extract_features(assets).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_multimodal_resize_bounds_payload(spark, sf_dir):
    assets = multimodal.synth_assets(load_table(spark, sf_dir, "documents"))
    resized = multimodal.resize_images(assets, width=8, height=4)
    assert resized.schema == multimodal.RESIZED_SCHEMA
    rows = resized.collect()
    assert len(rows) == assets.count()
    assert all(len(r["content"]) == 8 * 4 for r in rows)
    assert all((r["width"], r["height"]) == (8, 4) for r in rows)


def test_multimodal_frame_sampling_fans_out(spark, sf_dir):
    from pyspark.sql import functions as F

    assets = multimodal.synth_assets(load_table(spark, sf_dir, "documents"))
    frames = multimodal.sample_frames(assets, max_frames=5)
    assert frames.schema == multimodal.FRAME_SCHEMA
    per_asset = frames.groupBy("asset_id").count()
    counts = {r["asset_id"]: r["count"] for r in per_asset.collect()}
    assert set(counts) == {r["asset_id"] for r in assets.select("asset_id").collect()}
    assert all(1 <= c <= 5 for c in counts.values())
    # frame indices are dense from 0 and contents deterministic
    first = frames.filter(F.col("frame_idx") == 0).count()
    assert first == len(counts)
    again = {
        (r["asset_id"], r["frame_idx"]): bytes(r["content"])
        for r in multimodal.sample_frames(assets, max_frames=5).collect()
    }
    for r in frames.collect():
        assert again[(r["asset_id"], r["frame_idx"])] == bytes(r["content"])


def test_decode_image_is_stubbed():
    # per-codec guards: each stub assertion skips independently, so an
    # environment with soundfile but not PIL (or vice versa) still runs
    # the applicable half instead of failing the other
    try:
        import PIL  # noqa: F401

        pil_present = True
    except ImportError:
        pil_present = False
    try:
        import soundfile  # noqa: F401

        sf_present = True
    except ImportError:
        sf_present = False
    if not pil_present:
        with pytest.raises(NotImplementedError, match="codec"):
            multimodal.decode_image(b"\x89PNG fake")
        with pytest.raises(NotImplementedError, match="codec"):
            multimodal.resize_images(None, decode="pil")  # guard precedes any plan
    if not sf_present:
        with pytest.raises(NotImplementedError, match="codec"):
            multimodal.decode_audio(b"RIFF fake")
    if pil_present and sf_present:
        pytest.skip("both codecs present; stubs not applicable")


# -- codec-gated REAL decode paths (VERDICT r4 item 4): skip cleanly in
# this container, run live the moment the environment provides a codec --


def _png_bytes(w: int, h: int) -> bytes:
    import io

    import PIL.Image as Image

    buf = io.BytesIO()
    Image.new("RGB", (w, h), (10, 20, 30)).save(buf, format="PNG")
    return buf.getvalue()


def test_decode_image_real_png():
    pytest.importorskip("PIL")
    assert multimodal.decode_image(_png_bytes(7, 5)) == (7, 5)


def test_resize_images_real_pil(spark):
    pytest.importorskip("PIL")
    png = _png_bytes(20, 10)
    assets = spark.createDataFrame(
        [(1, "image/png", bytearray(png), len(png), "test")],
        multimodal.ASSET_SCHEMA,
    )
    rows = multimodal.resize_images(assets, width=8, height=4, decode="pil").collect()
    assert len(rows) == 1
    r = rows[0]
    # real decode keeps the fake kernel's scale contract: fixed-size payload
    assert (r["width"], r["height"], len(r["content"])) == (8, 4, 32)


def test_decode_audio_real_wav():
    soundfile = pytest.importorskip("soundfile")
    import io

    import numpy as np

    buf = io.BytesIO()
    samples = np.linspace(-1.0, 1.0, 100)
    soundfile.write(buf, samples, 8000, format="WAV")
    got = multimodal.decode_audio(buf.getvalue())
    assert len(got) == 100
    assert abs(got[0] - samples[0]) < 1e-3 and abs(got[-1] - samples[-1]) < 1e-3


def test_resize_images_rejects_unknown_decode(spark):
    with pytest.raises(ValueError, match="decode"):
        multimodal.resize_images(None, decode="opencv")


def test_duplicate_clusters_collapse_chains(spark):
    """A~B and B~C must land in ONE cluster labeled min(A,B,C), even
    though A and C share no pair; disconnected pairs stay separate."""
    from dbt_metrics_ingestion_script_spark.operators.dedup import duplicate_clusters

    pairs = spark.createDataFrame(
        [(10, 20), (20, 3), (50, 60), (70, 80), (80, 71)],
        "id_a long, id_b long",
    )
    got = {r["doc_id"]: r["cluster_id"] for r in duplicate_clusters(pairs).collect()}
    assert got == {3: 3, 10: 3, 20: 3, 50: 50, 60: 50, 70: 70, 71: 70, 80: 70}


@pytest.mark.slow
def test_duplicate_clusters_exhaustion_falls_back_to_star(spark):
    """ADVICE r2 b + VERDICT r4 item 2: exhausting max_iter with labels
    still moving must never return silently-wrong split clusters.  The
    default recovery is the diameter-independent star algorithm (a
    correct answer was computable, so compute it); on_exhaustion='raise'
    restores the strict abort.  A 23-node chain has diameter 22 >
    max_iter=3; the same graph converges directly (one cluster, label 0)
    with an adequate budget."""
    import pytest

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(22)], "id_a long, id_b long"
    )
    with pytest.raises(RuntimeError, match="converge"):
        dedup.duplicate_clusters(chain, max_iter=3, on_exhaustion="raise")
    with pytest.raises(ValueError, match="on_exhaustion"):
        dedup.duplicate_clusters(chain, on_exhaustion="retry")
    # default path: falls back to star and still produces the right answer
    stats: dict = {}
    labels = {
        r["doc_id"]: r["cluster_id"]
        for r in dedup.duplicate_clusters(chain, max_iter=3, stats=stats).collect()
    }
    assert labels == {i: 0 for i in range(23)}
    assert stats == {"iterations": 3, "fell_back": True}
    # adequate budget: label propagation converges on its own
    labels = {
        r["doc_id"]: r["cluster_id"]
        for r in dedup.duplicate_clusters(chain, max_iter=30).collect()
    }
    assert labels == {i: 0 for i in range(23)}


def test_duplicate_clusters_shallow_graph_never_falls_back(spark):
    """VERDICT r4 item 2 (common-case guard): a shallow pair graph must
    converge inside label propagation without invoking the star
    fallback, and within diameter+1 iterations (no extra jobs in the
    common case)."""
    # two triangles + a pair: every component has diameter <= 2
    g = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (10, 11), (11, 12), (10, 12), (20, 21)],
        "id_a long, id_b long",
    )
    stats: dict = {}
    labels = {
        r["doc_id"]: r["cluster_id"]
        for r in dedup.duplicate_clusters(g, stats=stats).collect()
    }
    assert labels == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 12: 10, 20: 20, 21: 20}
    assert stats["fell_back"] is False
    assert stats["iterations"] <= 3  # diameter 2 + convergence probe round


def test_duplicate_clusters_star_matches_label_propagation(spark, sf_dir):
    """The O(log n)-round star algorithm must produce exactly the label
    propagation clusters on the real near-dup pair graph."""
    pairs = dedup.ngram_jaccard_pairs(
        load_table(spark, sf_dir, "documents"), threshold=0.2
    ).persist()
    want = {
        (r["doc_id"], r["cluster_id"])
        for r in dedup.duplicate_clusters(pairs).collect()
    }
    got = {
        (r["doc_id"], r["cluster_id"])
        for r in dedup.duplicate_clusters_star(pairs).collect()
    }
    pairs.unpersist()
    assert got == want and got


@pytest.mark.slow
def test_duplicate_clusters_star_handles_deep_chains(spark):
    """A 60-node chain (diameter 59) exceeds label propagation's default
    iteration budget but star-contraction needs only O(log n) rounds:
    the case the alternative algorithm exists for.  Also checks a mixed
    graph: chain + separate triangle + isolated pair."""
    import pytest

    chain = [(i, i + 1) for i in range(59)]
    tri = [(100, 101), (101, 102), (100, 102)]
    pair = [(200, 201)]
    g = spark.createDataFrame(chain + tri + pair, "id_a long, id_b long")
    with pytest.raises(RuntimeError, match="converge"):
        # strict mode: default max_iter=20 < diameter 59
        dedup.duplicate_clusters(g, on_exhaustion="raise")
    want = {i: 0 for i in range(60)}
    want.update({100: 100, 101: 100, 102: 100, 200: 200, 201: 200})
    labels = {
        r["doc_id"]: r["cluster_id"]
        for r in dedup.duplicate_clusters_star(g).collect()
    }
    assert labels == want
    # VERDICT r4 item 2: the PUBLIC entry point now finishes the deep
    # chain too, by falling back to star after exhaustion
    labels = {
        r["doc_id"]: r["cluster_id"]
        for r in dedup.duplicate_clusters(g).collect()
    }
    assert labels == want


def test_duplicate_clusters_long_path(spark):
    """Label propagation crosses a diameter-6 path (min at one end)."""
    from dbt_metrics_ingestion_script_spark.operators.dedup import duplicate_clusters

    chain = [(i + 1, i) for i in range(1, 7)]  # 7-6-...-2-1
    got = {r["doc_id"]: r["cluster_id"] for r in duplicate_clusters(
        spark.createDataFrame(chain, "id_a long, id_b long")
    ).collect()}
    assert got == {i: 1 for i in range(1, 8)}


def _edge_df(spark, pairs):
    return spark.createDataFrame(pairs, "id_a long, id_b long")


def test_incremental_clusters_matches_full_recluster(spark):
    """duplicate_clusters_incremental(batch, prior) must be
    indistinguishable from re-clustering (old UNION batch): covers a
    component MERGE through a batch bridge, a chained two-component
    merge, an entirely new component, a new node attaching to an old
    component, a within-component no-op edge, and an UNTOUCHED
    component that must pass through unchanged."""
    from dbt_metrics_ingestion_script_spark.operators import dedup

    old = [(1, 2), (2, 3), (10, 11), (20, 21), (50, 51)]
    batch = [
        (3, 11),    # merges {1,2,3} with {10,11} -> root 1
        (11, 50),   # chains {50,51} into the same merge -> root 1
        (30, 31),   # brand-new component
        (52, 50),   # new node onto a (now-merged) old component
        (2, 1),     # within-component no-op
    ]
    prior = dedup.duplicate_clusters_star(_edge_df(spark, old))
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in dedup.duplicate_clusters_incremental(
            _edge_df(spark, batch), prior
        ).collect()
    }
    want = {
        r["doc_id"]: r["cluster_id"]
        for r in dedup.duplicate_clusters_star(
            _edge_df(spark, old + batch)
        ).collect()
    }
    assert got == want
    assert got[20] == 20 and got[21] == 20  # untouched component intact
    assert got[52] == 1 and got[30] == 30


def test_label_store_roundtrip_and_served_equivalence(spark, tmp_path):
    """r16 (VERDICT r15 item 4): the materialized label store holds the
    exact duplicate_clusters_star labels (write -> read roundtrip is
    bit-identical), materialize is idempotent (second call is a no-op
    against a published store), and incremental maintenance fed FROM
    THE STORE equals a full re-clustering -- the contract behind
    dedup_clusters_incremental_vs_corpus_served."""
    from dbt_metrics_ingestion_script_spark.operators import dedup

    old = [(1, 2), (2, 3), (10, 11), (20, 21), (50, 51)]
    batch = [(3, 11), (11, 50), (30, 31), (52, 50), (2, 1)]
    store = str(tmp_path / "labels_store")
    dedup.materialize_label_store(_edge_df(spark, old), store)
    prior = dedup.read_label_store(spark, store)
    direct = {
        r["doc_id"]: r["cluster_id"]
        for r in dedup.duplicate_clusters_star(
            _edge_df(spark, old)
        ).collect()
    }
    stored = {r["doc_id"]: r["cluster_id"] for r in prior.collect()}
    assert stored == direct
    # idempotent: a second materialize must not rebuild or corrupt
    import os

    ptr = os.path.join(store, "_current")
    before = os.stat(ptr).st_mtime_ns
    dedup.materialize_label_store(_edge_df(spark, old), store)
    assert os.stat(ptr).st_mtime_ns == before
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in dedup.duplicate_clusters_incremental(
            _edge_df(spark, batch), prior
        ).collect()
    }
    want = {
        r["doc_id"]: r["cluster_id"]
        for r in dedup.duplicate_clusters_star(
            _edge_df(spark, old + batch)
        ).collect()
    }
    assert got == want


def test_incremental_clusters_batch_only_and_empty_merge(spark):
    """Degenerate shapes: a batch touching NO prior node (prior passes
    through verbatim + fresh components appear), and a batch whose
    edges are all within existing components (labels identical)."""
    from dbt_metrics_ingestion_script_spark.operators import dedup

    prior = dedup.duplicate_clusters_star(_edge_df(spark, [(1, 2), (5, 6)]))
    fresh = {
        r["doc_id"]: r["cluster_id"]
        for r in dedup.duplicate_clusters_incremental(
            _edge_df(spark, [(100, 101)]), prior
        ).collect()
    }
    assert fresh == {1: 1, 2: 1, 5: 5, 6: 5, 100: 100, 101: 100}
    noop = {
        r["doc_id"]: r["cluster_id"]
        for r in dedup.duplicate_clusters_incremental(
            _edge_df(spark, [(2, 1)]), prior
        ).collect()
    }
    assert noop == {1: 1, 2: 1, 5: 5, 6: 5}


def test_incremental_clusters_plan_never_shuffles_prior(spark, tmp_path):
    """The scale contract: prior labels (a materialized store, modeled
    here as parquet -- the production shape) are SCANNED via broadcast
    probe + broadcast relabel, never shuffled: no SortMergeJoin or
    ShuffledHashJoin anywhere, no Exchange partitioned on the prior
    frame's columns, and the only shuffles are the batch-side edge/node
    dedup."""
    from dbt_metrics_ingestion_script_spark.operators import dedup

    prior_path = str(tmp_path / "prior_labels.parquet")
    dedup.duplicate_clusters_star(
        _edge_df(spark, [(1, 2), (5, 6)])
    ).write.parquet(prior_path)
    prior = spark.read.parquet(prior_path)
    out = dedup.duplicate_clusters_incremental(
        _edge_df(spark, [(2, 5), (100, 101)]), prior
    )
    mode = out.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "simple"
    )
    plan = out._jdf.queryExecution().explainString(mode)
    # every join in the plan is broadcast: a shuffle of the prior frame
    # for a join would surface as SortMergeJoin / ShuffledHashJoin, and
    # nothing else in the prior branch (scan -> join -> project ->
    # union) can demand a distribution
    assert "SortMergeJoin" not in plan
    assert "ShuffledHashJoin" not in plan
    assert "BroadcastHashJoin" in plan
    # structural check: every scan of the prior store reaches its FIRST
    # join without crossing a shuffle (after that probe join only
    # batch-sized survivors continue, so later shuffles move batch
    # volume).  Walk each prior FileScan's ancestor chain by tree
    # indentation; broadcast exchanges of the (tiny) probe side are
    # allowed, hash/range repartitioning of prior rows is not.
    lines = plan.splitlines()

    def node_depth(line: str) -> int:
        for marker in (":- ", "+- "):
            if marker in line:
                return line.index(marker)
        return -1  # root / non-tree line

    prior_scans = [
        i for i, l in enumerate(lines)
        if "FileScan" in l and "doc_id:bigint,cluster_id:bigint" in l
    ]
    # the returned plan scans the prior store exactly once (the relabel
    # pass); the broadcast probe ran once, eagerly, into the `touched`
    # checkpoint leaf -- two scans total per maintenance cycle
    assert len(prior_scans) == 1, plan
    for i in prior_scans:
        d = node_depth(lines[i])
        for j in range(i - 1, -1, -1):
            dj = node_depth(lines[j])
            if 0 <= dj < d or (dj == -1 and lines[j].strip()):
                if "Join" in lines[j]:
                    break  # reached the first join: chain is clean
                assert "Exchange hashpartitioning" not in lines[j], lines[j]
                assert "Exchange rangepartitioning" not in lines[j], lines[j]
                d = dj if dj >= 0 else d
    # and the result is still right after the round trip
    got = {r["doc_id"]: r["cluster_id"] for r in out.collect()}
    assert got == {1: 1, 2: 1, 5: 1, 6: 1, 100: 100, 101: 100}


def test_unigram_logprob_flags_out_of_distribution_text(spark):
    """In-distribution text must outscore out-of-distribution gibberish
    under an external reference; fully-unseen tokens score exactly the
    smoothed floor ln(1/(N+V+1)); token-free docs emit no row."""
    import math

    from dbt_metrics_ingestion_script_spark.operators.text import (
        unigram_logprob_score,
    )

    ref = spark.createDataFrame(
        [(100, "the cat sat on the mat"), (101, "the dog sat on the rug")],
        "doc_id long, text string",
    )
    docs = spark.createDataFrame(
        [
            (1, "the cat sat"),        # all tokens seen, frequent
            (2, "zzz qqq xyzzy"),      # all tokens unseen
            (3, ""),                   # token-free: no output row
            (4, None),
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["n_tokens"], r["avg_logprob"])
        for r in unigram_logprob_score(docs, reference=ref).collect()
    }
    assert set(got) == {1, 2}
    assert got[1][0] == 3 and got[2][0] == 3
    assert got[1][1] > got[2][1], "in-distribution must outscore gibberish"
    # reference: N=12 tokens, V=7 types (the cat sat on mat dog rug)
    # -> unseen floor = ln(1/(12+7+1)) = ln(1/20)
    assert abs(got[2][1] - round(math.log(1.0 / 20.0), 6)) < 1e-9


def test_quantize_embeddings_round_trip_error_bound(spark, sf_dir):
    """Dequantized values must sit within half a quantization step of
    the originals (floor(x+0.5) rounds to nearest), q values must fit
    int8, and the dequantized cosine against the original must stay
    near 1 -- the property that makes int8 usable for ANN recall."""
    import math

    emb = load_table(spark, sf_dir, "embeddings")
    rows = similarity.quantize_embeddings(emb).join(
        emb.select("vec_id", "embedding"), "vec_id"
    ).limit(50).collect()
    assert rows
    for r in rows:
        scale, qv, v = r["scale"], r["qvec"], r["embedding"]
        assert len(qv) == len(v)
        assert all(-127 <= q <= 127 for q in qv), "int8 range"
        step = scale / 127.0
        deq = [q * step for q in qv]
        assert all(
            abs(d - x) <= step / 2 + 1e-9 for d, x in zip(deq, v)
        ), "round-to-nearest error bound"
        dot = sum(d * x for d, x in zip(deq, v))
        na = math.sqrt(sum(d * d for d in deq))
        nb = math.sqrt(sum(x * x for x in v))
        if na > 0 and nb > 0:
            assert dot / (na * nb) > 0.995, "dequantized cosine degraded"


def test_tfidf_ranks_distinctive_terms_over_ubiquitous(spark):
    """A term appearing in every document carries minimal idf, so a
    doc-specific term must outrank it; k bounds rows per doc; docs with
    no tokens produce no rows."""
    from dbt_metrics_ingestion_script_spark.operators.text import tfidf_top_terms

    docs = spark.createDataFrame(
        [
            (1, "common zebra zebra"),
            (2, "common yak yak"),
            (3, "common"),
            (4, None),
            (5, ""),
        ],
        "doc_id long, text string",
    )
    rows = tfidf_top_terms(docs, k=2).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append((r["term"], r["score"]))
    assert set(by_doc) == {1, 2, 3}  # null/empty docs emit nothing
    # per-doc rows already arrive rank-ordered (row_number filter)
    assert by_doc[1][0][0] == "zebra"  # distinctive 2x beats shared 'common'
    assert by_doc[2][0][0] == "yak"
    assert by_doc[3] == [("common", by_doc[3][0][1])]  # only term, 1 row
    assert all(len(v) <= 2 for v in by_doc.values())
    # ubiquitous term scores strictly below the distinctive ones
    common_score = dict(by_doc[1])["common"]
    assert dict(by_doc[1])["zebra"] > common_score


def test_tfidf_df_ceiling_is_post_aggregate_filter(spark):
    """`df_ceiling` (VERDICT r5 item 4) drops hot terms AFTER the df
    aggregate: every capped row must appear in the exact un-capped
    scored set with an IDENTICAL score (df computed over all docs, not
    post-filter), capped rows are a pure subset, and exactly the terms
    with df > ceiling disappear.  A large ceiling is a no-op."""
    from dbt_metrics_ingestion_script_spark.operators.text import tfidf_top_terms

    docs = spark.createDataFrame(
        [
            (1, "common zebra zebra stop stop stop"),  # 'stop' hot + high tf
            (2, "common yak stop stop"),
            (3, "common stop"),
        ],
        "doc_id long, text string",
    )
    # k large enough to rank every term -> the exact FULL scored set
    exact = {
        (r["doc_id"], r["term"]): r["score"]
        for r in tfidf_top_terms(docs, k=100).collect()
    }
    # ceiling=2: drops 'common' and 'stop' (df=3 each), keeps the rest
    capped = {
        (r["doc_id"], r["term"]): r["score"]
        for r in tfidf_top_terms(docs, k=100, df_ceiling=2).collect()
    }
    assert set(capped) <= set(exact), "capped must be a subset of exact"
    for key, score in capped.items():
        assert score == exact[key], f"score drifted for {key}"
    dropped = {t for (_, t) in set(exact) - set(capped)}
    assert dropped == {"common", "stop"}
    # post-aggregate semantics: surviving 'zebra' keeps its exact score
    assert (1, "zebra") in capped
    # a ceiling above every df is a no-op
    noop = {
        (r["doc_id"], r["term"]): r["score"]
        for r in tfidf_top_terms(docs, k=100, df_ceiling=10).collect()
    }
    assert noop == exact


def test_unigram_broadcast_guard_paths_agree(spark):
    """All three `broadcast_model` physical paths must produce identical
    scores (only the join strategy moves); an invalid value raises."""
    import pytest as _pytest

    from dbt_metrics_ingestion_script_spark.operators.text import (
        unigram_logprob_score,
    )

    ref = spark.createDataFrame(
        [(100, "the cat sat on the mat"), (101, "the dog sat on the rug")],
        "doc_id long, text string",
    )
    docs = spark.createDataFrame(
        [(1, "the cat sat"), (2, "zzz qqq xyzzy"), (3, "dog rug unseen")],
        "doc_id long, text string",
    )
    results = {
        mode: sorted(
            tuple(r)
            for r in unigram_logprob_score(
                docs, reference=ref, broadcast_model=mode
            ).collect()
        )
        for mode in (True, False, "auto")
    }
    assert results[True] == results[False] == results["auto"]
    with _pytest.raises(ValueError, match="broadcast_model"):
        unigram_logprob_score(docs, reference=ref, broadcast_model="yes")


def test_hopping_window_covers_each_event_thrice(spark, sf_dir):
    """A 3h/1h hopping window assigns every event to exactly 3 windows:
    total assigned count must be 3x the event count."""
    from dbt_metrics_ingestion_script_spark import queries_ext
    from pyspark.sql import functions as F

    ev = load_table(spark, sf_dir, "events")
    agg = queries_ext.events_hopping_window_agg(spark, sf_dir)
    assert (
        agg.agg(F.sum("n_events")).collect()[0][0] == 3 * ev.count()
    )


def test_cohort_retention_semantics(spark):
    """Week-0 retention equals cohort size (every user is active in
    their first week by construction), offsets are never negative, and
    a user active across a week boundary lands in both offsets."""
    import datetime

    from dbt_metrics_ingestion_script_spark.operators.sessions import (
        cohort_retention,
    )

    # 2024-01-01 is a Monday; week two starts 2024-01-08
    d = lambda day, h=0: datetime.datetime(2024, 1, day, h)  # noqa: E731
    events = spark.createDataFrame(
        [
            (1, d(1)), (1, d(3)), (1, d(9)),   # cohort w0, active w0+w1
            (2, d(2)),                         # cohort w0, only w0
            (3, d(10)), (3, d(22)),            # cohort w1, active w1+w3
        ],
        "user_id long, ts timestamp",
    )
    got = {
        (str(r["cohort_week"]), r["week_offset"]): r["n_users"]
        for r in cohort_retention(events).collect()
    }
    assert got == {
        ("2024-01-01", 0): 2,
        ("2024-01-01", 1): 1,
        ("2024-01-08", 0): 1,
        ("2024-01-08", 2): 1,
    }
    assert all(off >= 0 for _, off in got)


def test_funnel_and_cohort_power_user_guards(spark):
    """`max_events_per_user` / `max_active_weeks_per_user` (VERDICT r5
    item 5): a cap at or above reality is a strict no-op; a tight cap
    truncates to the EARLIEST events/weeks with the documented
    semantics (funnel progressions completing after event k don't
    count; retention offsets past week k drop, cohort assignment never
    changes)."""
    import datetime

    from dbt_metrics_ingestion_script_spark.operators.sessions import (
        cohort_retention,
        funnel_stages,
    )

    d = lambda day, h=0: datetime.datetime(2024, 1, day, h)  # noqa: E731
    # power user 1: 6 views then the click/purchase arrive as events
    # 7-8 -- visible unbounded or with cap>=8, invisible at cap=4
    ev_rows = [(1, d(1, h), "view") for h in range(6)] + [
        (1, d(2, 0), "click"),
        (1, d(2, 1), "purchase"),
        (2, d(1), "view"),
        (2, d(2), "click"),
    ]
    events = spark.createDataFrame(
        ev_rows, "user_id long, ts timestamp, event_type string"
    )
    base = {
        r["stage"]: r["n_users"] for r in funnel_stages(events).collect()
    }
    assert base == {"view": 2, "click": 2, "purchase": 1}
    loose = {
        r["stage"]: r["n_users"]
        for r in funnel_stages(events, max_events_per_user=100).collect()
    }
    assert loose == base, "cap above reality must be a no-op"
    tight = {
        r["stage"]: r["n_users"]
        for r in funnel_stages(events, max_events_per_user=4).collect()
    }
    # user 1's click/purchase fall beyond their first 4 events; user 2
    # fits entirely
    assert tight == {"view": 2, "click": 1, "purchase": 0}

    # cohort: user 1 active in weeks 0,1,3 (2024-01-01 is a Monday)
    c_events = spark.createDataFrame(
        [(1, d(1)), (1, d(9)), (1, d(22)), (2, d(2))],
        "user_id long, ts timestamp",
    )
    c_base = {
        (str(r["cohort_week"]), r["week_offset"]): r["n_users"]
        for r in cohort_retention(c_events).collect()
    }
    assert c_base == {
        ("2024-01-01", 0): 2,
        ("2024-01-01", 1): 1,
        ("2024-01-01", 3): 1,
    }
    c_loose = {
        (str(r["cohort_week"]), r["week_offset"]): r["n_users"]
        for r in cohort_retention(
            c_events, max_active_weeks_per_user=10
        ).collect()
    }
    assert c_loose == c_base, "cap above reality must be a no-op"
    c_tight = {
        (str(r["cohort_week"]), r["week_offset"]): r["n_users"]
        for r in cohort_retention(
            c_events, max_active_weeks_per_user=2
        ).collect()
    }
    # earliest 2 weeks survive: offsets 0 and 1; week-3 activity drops,
    # cohort week unchanged
    assert c_tight == {
        ("2024-01-01", 0): 2,
        ("2024-01-01", 1): 1,
    }


def test_range_join_bucketization_semantics(spark):
    """Inclusive bounds on both ends, no duplicate match when an
    interval spans many buckets, overlapping intervals each match, and
    out-of-interval or wrong-key points drop."""
    import datetime

    from dbt_metrics_ingestion_script_spark.operators.ranges import (
        range_join_points,
    )

    t = lambda h, m=0: datetime.datetime(2024, 1, 1, h, m)  # noqa: E731
    points = spark.createDataFrame(
        [
            (1, 10, t(0)),       # == start of iv1 (inclusive)
            (2, 10, t(5)),       # == end of iv1 (inclusive, 5 buckets in)
            (3, 10, t(6)),       # outside iv1
            (4, 10, t(0, 30)),   # inside iv1 AND iv2 (overlap) -> 2 rows
            (5, 99, t(1)),       # key with no intervals
        ],
        "pid long, user_id long, ts timestamp",
    )
    intervals = spark.createDataFrame(
        [
            (10, 100, t(0), t(5)),        # iv1: spans 6 hourly buckets
            (10, 101, t(0, 15), t(0, 45)),  # iv2: sub-bucket overlap
        ],
        "user_id long, iv_id long, s timestamp, e timestamp",
    )
    got = sorted(
        (r["pid"], r["iv_id"])
        for r in range_join_points(
            points, intervals, on="user_id", point_ts="ts",
            start_col="s", end_col="e", bucket_minutes=60,
        ).collect()
    )
    assert got == [(1, 100), (2, 100), (4, 100), (4, 101)]
    import pytest as _pytest

    with _pytest.raises(ValueError, match="collide"):
        range_join_points(
            points, intervals.withColumnRenamed("iv_id", "pid"),
            on="user_id", point_ts="ts", start_col="s", end_col="e",
        )
    with _pytest.raises(ValueError, match="internal names"):
        range_join_points(
            points.withColumnRenamed("pid", "__b"), intervals,
            on="user_id", point_ts="ts", start_col="s", end_col="e",
        )
    with _pytest.raises(ValueError, match="bucket_minutes"):
        range_join_points(
            points, intervals, on="user_id", point_ts="ts",
            start_col="s", end_col="e", bucket_minutes=0,
        )
    # inverted and NULL-bounded intervals contain no timestamp: they
    # must drop silently-but-correctly (BETWEEN is empty for them),
    # never error out of sequence() or fan out descending buckets
    bad_iv = spark.createDataFrame(
        [(10, 200, t(5), t(0)), (10, 201, None, t(5)), (10, 202, t(0), None)],
        "user_id long, iv_id long, s timestamp, e timestamp",
    )
    assert (
        range_join_points(
            points, bad_iv, on="user_id", point_ts="ts",
            start_col="s", end_col="e", bucket_minutes=60,
        ).count()
        == 0
    )


def test_asof_join_backward_semantics(spark):
    """<= tie matching, latest-prior-row selection, null fill when no
    prior row exists, and ATOMIC row carry: a NULL value in the latest
    right row must surface as NULL, not fall back to an older row's
    value (the failure mode of carrying columns independently)."""
    import datetime

    from dbt_metrics_ingestion_script_spark.operators.asof import (
        asof_join_backward,
    )

    t = lambda m: datetime.datetime(2024, 1, 1, 0, m)  # noqa: E731
    left = spark.createDataFrame(
        [
            (1, 10, t(5)),   # after r2 -> picks r2 (v=None, w=22)
            (2, 10, t(2)),   # tie with r1's ts -> <= matches r1
            (3, 10, t(1)),   # before any right row -> nulls
            (4, 99, t(9)),   # key with no right rows at all -> nulls
        ],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (10, t(2), 11, 21),
            (10, t(4), None, 22),  # latest for t>=4; v is NULL on purpose
        ],
        "user_id long, rts timestamp, v long, w long",
    )
    got = {
        r["event_id"]: (r["rts"], r["v"], r["w"])
        for r in asof_join_backward(
            left, right, on="user_id", left_ts="ts", right_ts="rts",
            value_cols=["v", "w"],
        ).collect()
    }
    assert got[1] == (t(4), None, 22)  # atomic carry: v stays NULL
    assert got[2] == (t(2), 11, 21)    # equal-timestamp right row matches
    assert got[3] == (None, None, None)
    assert got[4] == (None, None, None)
    # a NULL-timestamp right row satisfies no inequality: it must never
    # act as a '-infinity' match (nulls-first sort would otherwise
    # carry it into every left row preceding the first real right row)
    null_right = spark.createDataFrame(
        [(10, None, 77, 78)], "user_id long, rts timestamp, v long, w long"
    )
    got_nr = {
        r["event_id"]: (r["rts"], r["v"], r["w"])
        for r in asof_join_backward(
            left, null_right, on="user_id", left_ts="ts", right_ts="rts",
            value_cols=["v", "w"],
        ).collect()
    }
    assert all(v == (None, None, None) for v in got_nr.values())
    import pytest as _pytest

    with _pytest.raises(ValueError, match="collide"):
        asof_join_backward(
            left, right.withColumnRenamed("v", "ts"),
            on="user_id", left_ts="ts", right_ts="rts", value_cols=["ts"],
        )


def test_asof_join_single_shuffle(spark):
    """The union+window as-of join carries ONE data exchange (the key
    partition feeding the window) -- never a range join or per-left
    argmax."""
    from dbt_metrics_ingestion_script_spark.operators.asof import (
        asof_join_backward,
    )

    left = spark.createDataFrame(
        [(1, 10, None)], "event_id long, user_id long, ts timestamp"
    )
    right = spark.createDataFrame(
        [(10, None, 1)], "user_id long, rts timestamp, v long"
    )
    df = asof_join_backward(
        left, right, on="user_id", left_ts="ts", right_ts="rts",
        value_cols=["v"],
    )
    jmode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "simple"
    )
    plan = df._jdf.queryExecution().explainString(jmode)
    assert plan.count("Exchange") == 1, plan
    assert "Window" in plan


def test_asof_bucketed_equivalence_fixture(spark, sf_dir):
    """The bucketized as-of (VERDICT r5 item 6) must reproduce the
    plain union+window form EXACTLY on the events/orders fixture,
    across bucket widths that put the whole history in one bucket,
    split it across a few, and shatter it into many."""
    from dbt_metrics_ingestion_script_spark.operators.asof import (
        asof_join_backward,
        asof_join_backward_bucketed,
    )
    from pyspark.sql import functions as F

    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    daily = (
        load_table(spark, sf_dir, "orders")
        .groupBy(
            F.col("o_custkey").alias("user_id"),
            F.col("o_orderdate").cast("timestamp").alias("last_order_ts"),
        )
        .agg(F.count("*").alias("n_orders"))
    )
    kw = dict(
        on="user_id", left_ts="ts", right_ts="last_order_ts",
        value_cols=["n_orders"],
    )
    base = sorted(
        (tuple(r) for r in asof_join_backward(ev, daily, **kw).collect()),
        key=repr,
    )
    for bucket in ("3650 days", "90 days", "7 days"):
        got = sorted(
            (
                tuple(r)
                for r in asof_join_backward_bucketed(
                    ev, daily, bucket=bucket, **kw
                ).collect()
            ),
            key=repr,
        )
        assert got == base, f"bucket={bucket} diverged"


def test_asof_bucketed_edge_cases(spark):
    """Bucketed-specific traps: the carry crosses EMPTY intermediate
    buckets, a right row exactly at a bucket boundary beats the seed
    (side ordering), NULL timestamps on either side behave like the
    plain form, and the atomic-row carry survives the seed path."""
    import datetime

    from dbt_metrics_ingestion_script_spark.operators.asof import (
        asof_join_backward,
        asof_join_backward_bucketed,
    )

    t = lambda d, m=0: datetime.datetime(2024, 1, d, 0, m)  # noqa: E731
    left = spark.createDataFrame(
        [
            (1, 10, t(25)),   # 24 days after the last right row: the
                              # carry must cross many empty 1-day buckets
            (2, 10, t(1, 2)), # same bucket as r1/r2
            (3, 10, t(2, 0)), # exactly at a bucket boundary
            (4, 10, None),    # NULL ts -> null fill
            (5, 99, t(5)),    # keyless -> null fill
        ],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (10, t(1, 1), 11, 21),
            (10, t(2, 0), None, 22),  # at the day-2 boundary; v NULL
            (10, None, 77, 78),       # NULL ts: never matches
        ],
        "user_id long, rts timestamp, v long, w long",
    )
    kw = dict(
        on="user_id", left_ts="ts", right_ts="rts", value_cols=["v", "w"]
    )
    base = {
        r["event_id"]: (r["rts"], r["v"], r["w"])
        for r in asof_join_backward(left, right, **kw).collect()
    }
    got = {
        r["event_id"]: (r["rts"], r["v"], r["w"])
        for r in asof_join_backward_bucketed(
            left, right, bucket="1 day", **kw
        ).collect()
    }
    assert got == base
    # and the expectations themselves, independent of the plain form:
    assert got[1] == (t(2, 0), None, 22)  # carried across empty buckets,
    # atomically (v stays NULL)
    assert got[2] == (t(1, 1), 11, 21)
    assert got[3] == (t(2, 0), None, 22)  # boundary row beats the seed
    assert got[4] == (None, None, None)
    assert got[5] == (None, None, None)


def test_funnel_first_touch_semantics(spark):
    """Ordered-funnel edge cases: steps count only in time order
    (a click before the first view does not progress the funnel), a
    same-instant next step DOES progress it (ties resolve
    earlier-step-first), and an earlier out-of-order final step is not
    counted."""
    import datetime

    from dbt_metrics_ingestion_script_spark.operators.sessions import funnel_stages

    t = lambda m: datetime.datetime(2024, 1, 1, 0, m)  # noqa: E731
    rows = [
        # u1: full funnel in order
        (1, t(0), "view"), (1, t(1), "click"), (1, t(2), "purchase"),
        # u2: click precedes the first view and never recurs -> stops at view
        (2, t(0), "click"), (2, t(1), "view"),
        # u3: same-instant view+click progresses; purchase happened BEFORE
        # the click match -> not counted
        (3, t(0), "purchase"), (3, t(1), "view"), (3, t(1), "click"),
        # u4: only purchase -> contributes to no stage
        (4, t(0), "purchase"),
        # u5: no funnel events at all
        (5, t(0), "error"),
    ]
    events = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string"
    )
    got = {
        r["stage"]: (r["stage_idx"], r["n_users"])
        for r in funnel_stages(events).collect()
    }
    assert got == {"view": (0, 3), "click": (1, 2), "purchase": (2, 1)}
    # monotone: stage counts can never increase down the funnel
    counts = [got[s][1] for s in ("view", "click", "purchase")]
    assert counts == sorted(counts, reverse=True)


def test_funnel_empty_input_emits_zero_rows_per_stage(spark):
    from dbt_metrics_ingestion_script_spark.operators.sessions import funnel_stages

    empty = spark.createDataFrame(
        [], "user_id long, ts timestamp, event_type string"
    )
    got = {(r["stage_idx"], r["stage"], r["n_users"]) for r in funnel_stages(empty).collect()}
    assert got == {(0, "view", 0), (1, "click", 0), (2, "purchase", 0)}


def test_sessionize_gap_semantics(spark):
    """Sessions split exactly when the gap EXCEEDS the timeout; boundary
    gap == timeout stays in-session; sub-second gaps use integer micros."""
    from datetime import datetime

    from dbt_metrics_ingestion_script_spark.operators.sessions import sessionize

    t0 = datetime(2024, 1, 1, 0, 0, 0)

    def at(seconds, micro=0):
        return datetime(2024, 1, 1, 0, 0, 0).fromtimestamp(
            t0.timestamp() + seconds
        ).replace(microsecond=micro)

    rows = [
        # user 1: events at 0s, +600s (same session), then +601s gap -> split
        (1, 1, at(0)), (2, 1, at(600)), (3, 1, at(1201)),
        # user 2: gap exactly the 10-min timeout -> SAME session
        (10, 2, at(0)), (11, 2, at(600)),
        # user 3: gap exceeds timeout by one microsecond -> split
        (20, 3, at(0)), (21, 3, at(600, micro=1)),
    ]
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp")
    got = {
        (r["user_id"], r["session_idx"]): r["n_events"]
        for r in sessionize(df, gap_minutes=10).collect()
    }
    assert got == {(1, 1): 2, (1, 2): 1, (2, 1): 2, (3, 1): 1, (3, 2): 1}


def test_sessionize_duration_and_bounds(spark):
    from datetime import datetime

    from dbt_metrics_ingestion_script_spark.operators.sessions import sessionize

    rows = [
        (1, 1, datetime(2024, 1, 1, 0, 0, 0, 250000)),
        (2, 1, datetime(2024, 1, 1, 0, 5, 0, 750000)),
    ]
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp")
    [r] = sessionize(df, gap_minutes=30).collect()
    assert r["n_events"] == 2
    assert r["duration_us"] == 300 * 1_000_000 + 500_000
    assert r["session_start"] == rows[0][2] and r["session_end"] == rows[1][2]


def test_pii_scrub_counts_and_redaction(spark):
    from dbt_metrics_ingestion_script_spark.functions.hashing import hash64
    from dbt_metrics_ingestion_script_spark.operators.text import pii_scrub

    rows = [
        (1, "mail me at a.b+c@ex-ample.org or call 555-123-4567 now"),
        (2, "server at 10.0.0.1 and 192.168.1.255, no mail"),
        (3, "clean document with no identifiers at all"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in pii_scrub(df).collect()}
    assert (got[1]["n_email"], got[1]["n_phone"], got[1]["n_ipv4"]) == (1, 1, 0)
    assert (got[2]["n_email"], got[2]["n_phone"], got[2]["n_ipv4"]) == (0, 0, 2)
    assert (got[3]["n_email"], got[3]["n_phone"], got[3]["n_ipv4"]) == (0, 0, 0)
    # redaction replaces the matches: doc 3 digest equals its raw digest,
    # doc 1 digest differs (text changed)
    raw = {r["doc_id"]: r["h"] for r in df.select("doc_id", hash64(df.text).alias("h")).collect()}
    assert got[3]["redacted_hash"] == raw[3]
    assert got[1]["redacted_hash"] != raw[1]


def test_repetition_stats_flags_templated_text(spark):
    from dbt_metrics_ingestion_script_spark.operators.text import repetition_stats

    rows = [
        (1, "buy now " * 50),             # one bigram dominates
        (2, "each word appears only once here today"),
        (3, "short"),                     # < 2 tokens: no row
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in repetition_stats(df).collect()}
    assert set(got) == {1, 2}
    assert got[1]["top_bigram_frac"] > 0.45   # "now buy"/"buy now" alternate
    assert got[2]["top_bigram_frac"] < 0.2
    assert got[2]["distinct_bigram_ratio"] == 1.0


def test_vocab_top_terms_semantics(spark):
    """Counts aggregate globally, doc frequency counts documents not
    occurrences, min_df prunes, k bounds, and the (count desc, term
    asc) boundary tie is deterministic."""
    from dbt_metrics_ingestion_script_spark.operators.text import vocab_top_terms

    docs = spark.createDataFrame(
        [
            (1, "apple apple banana"),
            (2, "apple cherry cherry"),
            (3, "banana"),
            (4, None),
        ],
        "doc_id long, text string",
    )
    rows = [tuple(r) for r in vocab_top_terms(docs, k=10).collect()]
    assert rows == [
        ("apple", 3, 2),
        ("banana", 2, 2),
        ("cherry", 2, 1),
    ]
    # min_df=2 drops cherry (1 doc) even though it has 2 occurrences
    rows = [tuple(r) for r in vocab_top_terms(docs, k=10, min_df=2).collect()]
    assert rows == [("apple", 3, 2), ("banana", 2, 2)]
    # k cuts at the deterministic boundary: banana beats cherry on term
    rows = [tuple(r) for r in vocab_top_terms(docs, k=2).collect()]
    assert rows == [("apple", 3, 2), ("banana", 2, 2)]


def test_source_term_kl_semantics(spark):
    """KL properties on a constructed corpus: sources with the
    corpus-identical term distribution score ~0, an outlier source
    scores strictly higher, every divergence is non-negative, and the
    token/term accounting is exact."""
    from dbt_metrics_ingestion_script_spark.operators.text import source_term_kl

    rows = [
        # A and B share the same distribution {x:2, y:1} per doc
        (1, "A", "x x y"),
        (2, "A", "x x y"),
        (3, "B", "x x y"),
        # C is disjoint vocabulary -> maximal drift from the corpus mix
        (4, "C", "zzz qqq zzz"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    got = {r["source"]: r for r in source_term_kl(docs).collect()}
    assert set(got) == {"A", "B", "C"}
    for r in got.values():
        assert r["kl_divergence"] >= 0
    assert got["A"]["n_tokens"] == 6 and got["A"]["n_terms"] == 2
    assert got["C"]["n_tokens"] == 3 and got["C"]["n_terms"] == 2
    # A and B have identical distributions -> identical (small) drift;
    # the disjoint-vocabulary source dominates both
    assert got["A"]["kl_divergence"] == got["B"]["kl_divergence"]
    assert got["C"]["kl_divergence"] > got["A"]["kl_divergence"]


def test_pq_encode_structure_and_determinism(spark, sf_dir):
    """m code rows per vector, codes in [0, n_codes), bit-identical
    across runs, and dim must divide by m."""
    emb = load_table(spark, sf_dir, "embeddings")
    codes, books = similarity.pq_encode(emb, m=8, n_codes=16, dim=64)
    n_vec = emb.count()
    rows = codes.collect()
    assert len(rows) == 8 * n_vec
    assert all(0 <= r["code"] < 16 and 0 <= r["subspace"] < 8 for r in rows)
    again = similarity.pq_encode(emb, m=8, n_codes=16, dim=64)[0].collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))
    bk = books.collect()
    assert len(bk) <= 8 * 16
    assert all(len(r["cvec"]) == 8 for r in bk)
    with pytest.raises(ValueError, match="divisible"):
        similarity.pq_encode(emb, m=7, dim=64)


def test_pq_lloyd_refinement_reduces_distortion(spark, sf_dir):
    """The one-Lloyd codebook must reconstruct vectors at least as well
    as the raw seed codebook (k-means monotonicity), measured as total
    squared reconstruction error over the corpus."""
    from pyspark.sql import functions as F

    emb = load_table(spark, sf_dir, "embeddings")
    codes, books = similarity.pq_encode(emb, m=8, n_codes=16, dim=64)

    def distortion(codes_df, books_df):
        sub = similarity.as_double("embedding")
        vecs = emb.select(F.col("vec_id").alias("id"), sub.alias("vec"))
        joined = (
            codes_df.join(books_df, ["subspace", "code"]).join(vecs, "id")
        )
        err = F.aggregate(
            F.zip_with(
                F.slice("vec", F.col("subspace") * 8 + 1, 8),
                "cvec",
                lambda x, y: (x - y) * (x - y),
            ),
            F.lit(0.0),
            lambda a, x: a + x,
        )
        return joined.agg(F.sum(err)).collect()[0][0]

    refined = distortion(codes, books)
    # seed codebook = the n_codes lowest-id subvectors, assignment only
    vecs = emb.select(F.col("vec_id").alias("id"), similarity.as_double("embedding").alias("vec"))
    from pyspark.sql import Window

    subs = vecs.select(
        "id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("subspace"),
                        F.slice("vec", j * 8 + 1, 8).alias("svec"),
                    )
                    for j in range(8)
                ]
            )
        ).alias("s"),
    ).select("id", "s.subspace", "s.svec")
    w = Window.partitionBy("subspace").orderBy("id")
    seed_books = (
        subs.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= 16)
        .select("subspace", (F.col("__rn") - 1).alias("code"), F.col("svec").alias("cvec"))
    )
    d2 = F.aggregate(
        F.zip_with("svec", "cvec", lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda a, x: a + x,
    )
    seed_err = (
        subs.join(F.broadcast(seed_books), "subspace")
        .groupBy("id", "subspace")
        .agg(F.min(d2).alias("d"))
        .agg(F.sum("d"))
        .collect()[0][0]
    )
    assert refined <= seed_err + 1e-6, (refined, seed_err)


def test_pq_adc_topk_sanity(spark, sf_dir):
    """ADC is an approximation of exact L2: the query's own vector must
    rank first (its codes are its nearest codebook entries by
    construction of the distance), distances ascend, and the overlap
    with exact top-20 is non-trivial even on this near-orthogonal
    synthetic corpus."""
    from pyspark.sql import functions as F

    emb = load_table(spark, sf_dir, "embeddings")
    qid = emb.agg(F.min("vec_id")).collect()[0][0]
    query = emb.filter(F.col("vec_id") == qid)
    adc = similarity.pq_adc_topk(emb, query, k=20).collect()
    assert adc[0]["vec_id"] == qid
    dists = [r["adc_d2"] for r in adc]
    assert dists == sorted(dists)
    vecs = emb.select("vec_id", similarity.as_double("embedding").alias("v"))
    qv = query.select(similarity.as_double("embedding").alias("q"))
    d2 = F.aggregate(
        F.zip_with("v", "q", lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda a, x: a + x,
    )
    exact = [
        r["vec_id"]
        for r in vecs.crossJoin(F.broadcast(qv))
        .select("vec_id", d2.alias("d"))
        .orderBy("d", "vec_id")
        .limit(20)
        .collect()
    ]
    overlap = len({r["vec_id"] for r in adc} & set(exact))
    assert overlap >= 3, f"ADC degenerated: {overlap}/20"


def test_dedup_against_index_semantics(spark):
    """In-batch keep-first + index anti-join: a batch row whose digest
    is indexed drops; duplicate batch rows keep the lowest id;
    normalization jitter still matches the index; fresh content
    survives."""
    index_docs = spark.createDataFrame(
        [(100, "known document text")], "doc_id long, text string"
    )
    index = dedup.exact_dedup(index_docs).select("content_hash")
    batch = spark.createDataFrame(
        [
            (1, "KNOWN   document TEXT"),   # jitter: still indexed -> drop
            (2, "fresh content a"),
            (3, "fresh content a"),         # in-batch dup -> keep 2 only
            (4, "fresh content b"),
        ],
        "doc_id long, text string",
    )
    got = sorted(
        r["doc_id"] for r in dedup.dedup_against_index(batch, index).collect()
    )
    assert got == [2, 4]


def test_funnel_conversion_window_semantics(spark):
    """max_span_us anchors on the user's step-0 match: in-window
    conversions count, the exact boundary (<=) counts, past-boundary
    steps don't, the window does NOT restart on a later step-0 event,
    and max_span_us=None reproduces the unwindowed funnel."""
    import datetime

    from dbt_metrics_ingestion_script_spark.operators.sessions import funnel_stages

    h = lambda n: datetime.datetime(2024, 1, 1) + datetime.timedelta(hours=n)  # noqa: E731
    span_us = 24 * 3600 * 1_000_000  # 1 day
    rows = [
        # u1: click at exactly +24h (boundary counts), purchase at +25h (out)
        (1, h(0), 1, "view"), (2, h(24), 1, "click"), (3, h(25), 1, "purchase"),
        # u2: full funnel within the day
        (4, h(0), 2, "view"), (5, h(1), 2, "click"), (6, h(2), 2, "purchase"),
        # u3: click only past the window; a SECOND view inside the gap
        # must NOT restart the window (first-touch anchor)
        (7, h(0), 3, "view"), (8, h(30), 3, "view"), (9, h(31), 3, "click"),
    ]
    events = spark.createDataFrame(
        [(i, ts, u, t, 1.0, "{}") for i, ts, u, t in rows],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    windowed = {
        r["stage"]: r["n_users"]
        for r in funnel_stages(events, max_span_us=span_us).collect()
    }
    assert windowed == {"view": 3, "click": 2, "purchase": 1}
    unwindowed = {
        r["stage"]: r["n_users"] for r in funnel_stages(events).collect()
    }
    assert unwindowed == {"view": 3, "click": 3, "purchase": 2}


def test_rolling_retention_semantics(spark):
    """Retention counts only week w -> w+1 returns (a w+2 return after
    a gap is NOT retained for w), the last active week emits NULL (not
    0), rates divide active counts, and NULL timestamps drop."""
    import datetime

    from dbt_metrics_ingestion_script_spark.operators.sessions import (
        rolling_retention,
    )

    d = lambda day: datetime.datetime(2024, 1, day)  # noqa: E731
    # 2024-01-01 is a Monday: weeks start 1, 8, 15, 22
    rows = [
        (1, d(1)), (1, d(8)), (1, d(15)),  # active w1,w2,w3: retained twice
        (2, d(1)), (2, d(15)),             # gap week: NOT retained for w1
        (3, d(1)),                         # one-week wonder
        (4, None),                         # NULL ts: excluded
    ]
    events = spark.createDataFrame(rows, "user_id long, ts timestamp")
    got = {
        str(r["week"]): (r["n_active"], r["n_retained"], r["retention_rate"])
        for r in rolling_retention(events).collect()
    }
    assert got == {
        "2024-01-01": (3, 1, round(1 / 3, 6)),  # only user 1 returns in w2
        "2024-01-08": (1, 1, 1.0),
        "2024-01-15": (2, None, None),          # last week: unknown, not 0
    }


def test_daily_anomaly_zscore_semantics(spark, tmp_path):
    """A constructed outlier day is flagged, normal days are not, and a
    zero-variance type yields NULL z / never flags (the 0/0 pin)."""
    import datetime

    from dbt_metrics_ingestion_script_spark import queries_ext

    d = lambda n: datetime.datetime(2024, 1, n)  # noqa: E731
    rows = (
        # 'view': 10 quiet days of ~1.0 then a 100.0 spike
        [(i, d(i + 1), 1, "view", 1.0, "{}") for i in range(10)]
        + [(10, d(11), 1, "view", 100.0, "{}")]
        # 'flat': identical every day -> zero variance
        + [(100 + i, d(i + 1), 2, "flat", 5.0, "{}") for i in range(5)]
    )
    tmpdir = str(tmp_path / "anomaly")
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).coalesce(1).write.mode("overwrite").parquet(f"{tmpdir}/events.parquet")
    out = {
        (r["event_type"], str(r["day"])): (r["zscore"], r["is_anomaly"])
        for r in queries_ext.events_daily_anomaly_zscore(
            spark, tmpdir
        ).collect()
    }
    assert out[("view", "2024-01-11")][1] is True
    quiet = [v for (t, day), v in out.items() if t == "view" and day != "2024-01-11"]
    assert all(not a for _, a in quiet)
    flat = [v for (t, _), v in out.items() if t == "flat"]
    assert all(z is None and a is False for z, a in flat)


def test_near_dedup_against_corpus_semantics(spark):
    """A batch doc near-duplicating a corpus doc drops (normalization
    jitter included); distinct batch content survives; the corpus is
    never modified; exact verification gates LSH candidates (a doc
    sharing a band by chance but below threshold survives)."""
    base = "the quick brown fox jumps over the lazy dog again and again"
    corpus_side = spark.createDataFrame(
        [(100, base), (101, "completely unrelated corpus record here")],
        "doc_id long, text string",
    )
    batch = spark.createDataFrame(
        [
            (1, "THE  quick   brown fox jumps over the lazy dog again and again"),
            (2, "a genuinely fresh document about spark engines"),
            # shares a prefix with base but mostly different: candidate
            # via some band is possible, jaccard far below 0.8
            (3, base.split(" and ")[0] + " but then something else entirely happened here"),
        ],
        "doc_id long, text string",
    )
    survivors = sorted(
        r["doc_id"]
        for r in dedup.near_dedup_against_corpus(
            batch, corpus_side, k=16, bands=4, threshold=0.8
        ).collect()
    )
    assert survivors == [2, 3]


# ---------------------------------------------------------------------------
# feature-hashing linear classifier
# ---------------------------------------------------------------------------


def test_hashed_linear_score_bounds_and_determinism(spark):
    from dbt_metrics_ingestion_script_spark.operators import text as T

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (2, "alpha beta gamma delta"), (3, "zzz")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in T.hashed_linear_score(docs).collect()}
    # identical text -> identical score (pure function of content)
    assert rows[1]["score"] == rows[2]["score"]
    # mean of zero-mean weights normalized by the half-range stays in [-1, 1]
    assert all(-1.0 <= r["score"] <= 1.0 for r in rows.values())
    # keep is the thresholded ROUNDED score
    assert all(r["keep"] == (r["score"] >= 0.0) for r in rows.values())


def test_hashed_linear_score_single_bucket_is_constant(spark):
    """n_buckets=1 collapses every token to bucket 0: every doc's score
    is the same constant w(0)/HALF regardless of content."""
    from dbt_metrics_ingestion_script_spark.operators import text as T

    docs = spark.createDataFrame(
        [(1, "some words here"), (2, "totally different content now")],
        "doc_id long, text string",
    )
    scores = {r["score"] for r in T.hashed_linear_score(docs, n_buckets=1).collect()}
    assert len(scores) == 1


def test_hashed_linear_score_seed_changes_model(spark):
    from dbt_metrics_ingestion_script_spark.operators import text as T

    docs = spark.createDataFrame(
        [(i, f"word{i} filler tokens go here") for i in range(20)],
        "doc_id long, text string",
    )
    s0 = {r["doc_id"]: r["score"] for r in T.hashed_linear_score(docs, weight_seed=0).collect()}
    s1 = {r["doc_id"]: r["score"] for r in T.hashed_linear_score(docs, weight_seed=7).collect()}
    assert s0 != s1  # a different seed is a different weight vector


def test_hashed_linear_score_rejects_bad_buckets(spark):
    import pytest

    from dbt_metrics_ingestion_script_spark.operators import text as T

    docs = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError):
        T.hashed_linear_score(docs, n_buckets=0)


def test_semantic_clusters_collapse_cosine_chains(spark):
    """embedding_near_pairs -> star CC: a chain of pairwise-similar
    vectors lands in ONE cluster labeled by the component minimum; a
    dissimilar vector generates no pairs and stays out of the graph."""
    import math

    from dbt_metrics_ingestion_script_spark.operators import dedup as D

    def vec(theta, axis2):
        v = [0.0] * 64
        v[0] = math.cos(theta)
        v[axis2] = math.sin(theta)
        return v

    rows = [
        (0, vec(0.00, 1), 0),
        (1, vec(0.15, 1), 0),   # cos 0.15 rad ~ 0.989 to v0
        (2, vec(0.30, 1), 0),   # ~0.989 to v1, ~0.955 to v0
        (9, [0.0] * 32 + [1.0] + [0.0] * 31, 1),  # orthogonal loner
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int"
    )
    pairs = D.embedding_near_pairs(emb, threshold=0.9)
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in D.duplicate_clusters_star(pairs).collect()
    }
    assert got == {0: 0, 1: 0, 2: 0}


def test_celled_pairs_exact_precision_and_measured_recall(spark, sf_dir):
    """embedding_near_pairs_celled (SemDeDup cells, the ×100 scale
    path): every emitted pair is a TRUE cosine>=t pair (precision
    exact -- pairs are verified), and recall vs the brute-force pair
    set stays above the measured floor (r15 measurements: 39/66 =
    0.591 at the test fixture sf, 42/59 = 0.712 at sf0.01 -- vs
    banded-LSH 0.542; recall is the documented SemDeDup trade --
    cross-cell pairs are unseen)."""
    from dbt_metrics_ingestion_script_spark.operators import dedup as D
    from dbt_metrics_ingestion_script_spark.operators.similarity import dot

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    units = D._unit_vectors(emb, "vec_id", "embedding")
    a, b = units.alias("a"), units.alias("b")
    brute = (
        a.crossJoin(b)
        .filter(F.col("a.id") < F.col("b.id"))
        .filter(dot(F.col("a.unit"), F.col("b.unit")) >= 0.4)
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
    )
    celled = D.embedding_near_pairs_celled(emb, threshold=0.4)
    n_celled = celled.count()
    n_brute = brute.count()
    assert n_brute > 0
    # precision: emitted pairs are a subset of the true pair set
    assert celled.join(brute, ["id_a", "id_b"]).count() == n_celled
    assert n_celled / n_brute >= 0.55


def test_celled_pairs_cell_count_scales_with_corpus(spark):
    """The cell count is the scale knob: ceil(n / target_cell) cells,
    so per-cell size -- and with it candidate volume per row -- stays
    ~constant as the corpus grows.  Pinned by construction on a
    synthetic frame large enough for 4 cells."""
    import math

    from dbt_metrics_ingestion_script_spark.operators import dedup as D

    n, dim = 40, 8
    rows = [
        (
            i,
            [math.cos(i * 0.7 + d) for d in range(dim)],
            0,
        )
        for i in range(n)
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int"
    )
    pairs = D.embedding_near_pairs_celled(
        emb, threshold=0.99, target_cell=10
    )
    # 40 rows / target 10 -> 4 cells; with a 0.99 threshold on spread
    # vectors the verified set is small and every pair is true
    got = pairs.collect()
    from dbt_metrics_ingestion_script_spark.operators.similarity import (
        as_double,
        dot,
    )

    units = {
        r["id"]: r["unit"]
        for r in D._unit_vectors(emb, "vec_id", "embedding").collect()
    }
    for r in got:
        ua, ub = units[r["id_a"]], units[r["id_b"]]
        assert sum(x * y for x, y in zip(ua, ub)) >= 0.99


def test_embedding_dedup_against_corpus_semantics(spark):
    """Corpus-similar batch vectors drop; batch-INTERNAL near-dups and
    genuinely fresh vectors survive; the corpus frame never loses rows
    (only batch rows are judged)."""
    import math

    from dbt_metrics_ingestion_script_spark.operators import dedup as D

    def vec(theta, axis2):
        v = [0.0] * 64
        v[0] = math.cos(theta)
        v[axis2] = math.sin(theta)
        return v

    corpus = spark.createDataFrame(
        [(100, vec(0.0, 1), 0)], "vec_id long, embedding array<double>, label int"
    )
    batch = spark.createDataFrame(
        [
            (1, vec(0.05, 1), 0),   # ~0.999 cosine to corpus -> drop
            (2, vec(1.57, 2), 0),   # orthogonal to corpus -> keep
            (3, vec(1.60, 2), 0),   # near-dup OF ANOTHER BATCH ROW -> keep
        ],
        "vec_id long, embedding array<double>, label int",
    )
    out = sorted(
        r["vec_id"]
        for r in D.embedding_dedup_against_corpus(batch, corpus, threshold=0.9).collect()
    )
    assert out == [2, 3]


def test_containment_catches_doc_in_doc_that_jaccard_misses(spark):
    """A small doc embedded verbatim in a much larger one: containment
    1.0, Jaccard tiny -- the wrapper/quotation case only the
    containment metric finds."""
    from dbt_metrics_ingestion_script_spark.operators import dedup as D

    small = "alpha beta gamma delta epsilon zeta"
    filler = " ".join(f"w{i}" for i in range(120))
    docs = spark.createDataFrame(
        [(1, small), (2, small + " " + filler)], "doc_id long, text string"
    )
    got = D.ngram_containment_pairs(docs, threshold=0.9).collect()
    assert len(got) == 1
    r = got[0]
    assert (r["id_a"], r["id_b"], r["contained_id"]) == (1, 2, 1)
    assert r["containment"] == 1.0
    # the symmetric similarity never sees it
    assert D.ngram_jaccard_pairs(docs, threshold=0.5).count() == 0


def test_containment_tie_prefers_lower_id(spark):
    from dbt_metrics_ingestion_script_spark.operators import dedup as D

    docs = spark.createDataFrame(
        [(1, "x y z w v u"), (2, "x y z w v u")], "doc_id long, text string"
    )
    r = D.ngram_containment_pairs(docs, threshold=0.9).collect()[0]
    assert r["contained_id"] == 1 and r["containment"] == 1.0


def test_vocab_coverage_full_vocab_is_total(spark):
    """With vocab_k >= |vocabulary| every occurrence is covered; with a
    tiny vocab the dominant term alone sets the coverage."""
    from dbt_metrics_ingestion_script_spark.operators import text as T

    docs = spark.createDataFrame(
        [(1, "a a a b", "s1"), (2, "a c", "s2")],
        "doc_id long, text string, source string",
    )
    full = {r["source"]: r for r in T.vocab_coverage(docs, vocab_k=10).collect()}
    assert all(r["coverage"] == 1.0 for r in full.values())
    assert full["s1"]["n_tokens"] == 4 and full["s2"]["n_tokens"] == 2
    one = {r["source"]: r for r in T.vocab_coverage(docs, vocab_k=1).collect()}
    # top-1 vocab is 'a' (4 occurrences)
    assert one["s1"]["n_covered"] == 3 and one["s2"]["n_covered"] == 1
    assert one["s1"]["coverage"] == 0.75 and one["s2"]["coverage"] == 0.5


def test_hll_sketch_merge_equals_direct_sketch(spark):
    """The rollup's correctness hinge: unioning per-day sketches must
    equal sketching the whole month directly (lossless merge), and at
    low cardinality the estimate is exact."""
    from pyspark.sql import functions as F

    rows = [(d, u) for d in (1, 2, 3) for u in range(20 * d)]  # overlapping users
    df = spark.createDataFrame(rows, "day int, user_id long")
    merged = (
        df.groupBy("day")
        .agg(F.hll_sketch_agg("user_id").alias("sk"))
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"))
        .collect()[0]["est"]
    )
    direct = df.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("est")
    ).collect()[0]["est"]
    exact = df.select("user_id").distinct().count()
    assert merged == direct == exact == 60


def test_token_entropy_extremes(spark):
    """Uniform distribution hits ln(n_distinct); a single repeated
    token has zero entropy; all-whitespace docs drop."""
    import math

    from dbt_metrics_ingestion_script_spark.operators import text as T

    docs = spark.createDataFrame(
        [(1, "a b c d"), (2, "x x x x x"), (3, "   ")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in T.token_entropy(docs).collect()}
    assert set(got) == {1, 2}
    assert got[1]["entropy"] == round(math.log(4), 6)
    assert got[1]["n_distinct"] == 4 and got[1]["n_tokens"] == 4
    assert got[2]["entropy"] == 0.0 and got[2]["n_distinct"] == 1


def test_interarrival_profile_gap_semantics(spark):
    """Gaps pair consecutive SAME-(user,type) events only; a user's
    single event contributes no gap; ties pin by event_id."""
    import datetime

    from dbt_metrics_ingestion_script_spark.operators.sessions import (
        interarrival_profile,
    )

    t0 = datetime.datetime(2024, 1, 1)
    s = lambda n: t0 + datetime.timedelta(seconds=n)  # noqa: E731
    ev = spark.createDataFrame(
        [
            (1, s(0), 1, "click"),
            (2, s(10), 1, "click"),
            (3, s(40), 1, "click"),
            (4, s(5), 1, "view"),     # different type: no click gap
            (5, s(7), 2, "click"),    # other user, single event: no gap
        ],
        "event_id long, ts timestamp, user_id long, event_type string",
    )
    got = {r["event_type"]: r for r in interarrival_profile(ev).collect()}
    assert set(got) == {"click"}
    assert got["click"]["n_gaps"] == 2
    assert got["click"]["mean_gap_s"] == 20.0  # gaps 10 and 30
    assert got["click"]["p50_s"] == 20.0       # interpolated median of [10, 30]


# ---------------------------------------------------------------------------
# record linkage (operators/linkage.py)
# ---------------------------------------------------------------------------


def test_fuzzy_blocked_pairs_within_block_distances(spark):
    from dbt_metrics_ingestion_script_spark.operators.linkage import (
        fuzzy_blocked_pairs,
    )

    df = spark.createDataFrame(
        [
            (1, "alpha beta gamma"),
            (2, "alpha beta gamba"),   # dist 1 from id 1, same block
            (3, "alpha completely different"),  # same block, far
            (4, "omega beta gamma"),   # dist <= 2 from id 1 but OTHER block
        ],
        "id long, name string",
    )
    got = {
        (r["id_a"], r["id_b"]): r["dist"]
        for r in fuzzy_blocked_pairs(
            df, key_col="name", id_col="id", max_dist=2
        ).collect()
    }
    assert got == {(1, 2): 1}  # blocking trades away the (1,4) match


@pytest.mark.slow
def test_fuzzy_blocked_pairs_length_band_never_drops_valid(spark):
    # every pair the unpruned formulation finds survives the length
    # band: |len diff| <= max_dist is implied by dist <= max_dist
    from dbt_metrics_ingestion_script_spark.operators.linkage import (
        fuzzy_blocked_pairs,
    )

    df = spark.createDataFrame(
        [(i, f"t {'x' * (i % 7)}end") for i in range(30)],
        "id long, name string",
    )
    got = fuzzy_blocked_pairs(df, key_col="name", id_col="id", max_dist=3)
    brute = (
        df.alias("a")
        .join(df.alias("b"), F.col("a.id") < F.col("b.id"))
        .where(F.levenshtein("a.name", "b.name") <= 3)
        .count()
    )
    # single shared block ("t"), so blocking removes nothing here and
    # the prune must be lossless
    assert got.count() == brute


def test_fuzzy_blocked_pairs_zero_dist_is_exact_match(spark):
    from dbt_metrics_ingestion_script_spark.operators.linkage import (
        fuzzy_blocked_pairs,
    )

    df = spark.createDataFrame(
        [(1, "same title"), (2, "same title"), (3, "same titles")],
        "id long, name string",
    )
    got = {
        (r["id_a"], r["id_b"])
        for r in fuzzy_blocked_pairs(
            df, key_col="name", id_col="id", max_dist=0
        ).collect()
    }
    assert got == {(1, 2)}


def test_kmeans_convergence_inertia_nonincreasing(spark, sf_dir):
    got = {
        r["iter"]: r
        for r in similarity.kmeans_convergence(
            load_table(spark, sf_dir, "embeddings"), n_centroids=8, n_iter=2
        ).collect()
    }
    assert sorted(got) == [0, 1, 2]
    # Lloyd's invariant: each recentering + reassignment lowers (or
    # keeps) inertia, up to the 9-dec centroid rounding
    assert got[1]["inertia"] <= got[0]["inertia"] + 1e-6
    assert got[2]["inertia"] <= got[1]["inertia"] + 1e-6
    # iter 0 counts every point as newly assigned
    n = load_table(spark, sf_dir, "embeddings").count()
    assert got[0]["n_moved"] == n
    assert 0 <= got[2]["n_moved"] <= got[1]["n_moved"] + n


def test_linear_attribution_equal_split_and_window(spark):
    from dbt_metrics_ingestion_script_spark.operators.attribution import (
        linear_attribution,
    )

    rows = [
        # user 1: two touches inside the window -> each gets value/2
        (1, "2024-03-01 10:00:00", 1, "view", None),
        (2, "2024-03-01 11:00:00", 1, "click", None),
        (3, "2024-03-02 10:00:00", 1, "purchase", 10.0),
        # user 2: touch OUTSIDE the 7-day lookback -> nothing attributed
        (4, "2024-02-01 10:00:00", 2, "view", None),
        (5, "2024-03-01 10:00:00", 2, "purchase", 99.0),
        # user 3: NULL-value conversion -> touch counted, credit NULL
        (6, "2024-03-01 10:00:00", 3, "view", None),
        (7, "2024-03-01 12:00:00", 3, "purchase", None),
    ]
    df = spark.createDataFrame(
        [(i, ts, u, t, v) for i, ts, u, t, v in rows],
        "event_id long, ts string, user_id long, event_type string, value double",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    got = {
        r["touch_type"]: r
        for r in linear_attribution(df, lookback_days=7).collect()
    }
    assert got["view"]["n_touches"] == 2  # users 1 and 3; user 2 excluded
    assert got["view"]["attributed_value"] == 5.0
    assert got["click"]["n_touches"] == 1
    assert got["click"]["attributed_value"] == 5.0


def test_fuzzy_qgram_equals_dense_including_short_strings(spark, sf_dir):
    """The q-gram count filter is lossless: same pairs and distances
    as the dense block join, with short strings (vacuous bound)
    routed through the dense fallback."""
    from dbt_metrics_ingestion_script_spark.operators.linkage import (
        fuzzy_blocked_pairs,
        fuzzy_qgram_pairs,
    )

    # synthetic mix: long near-matches, a short-key group (< (d+1)*q
    # chars, bound vacuous), and far strings
    rows = [
        (1, "alpha metric revenue monthly rollup"),
        (2, "alpha metric revenue monthly rollups"),   # dist 1
        (3, "alpha metric revenue quarterly"),          # far from 1/2
        (4, "alpha ab"),                                # short
        (5, "alpha ax"),                                # short, dist 1 from 4
        (6, "beta metric revenue monthly rollup"),      # other block
    ]
    df = spark.createDataFrame(rows, "id long, name string")
    kw = dict(key_col="name", id_col="id", max_dist=2)
    dense = {
        (r["id_a"], r["id_b"], r["dist"])
        for r in fuzzy_blocked_pairs(df, **kw).collect()
    }
    qgram = {
        (r["id_a"], r["id_b"], r["dist"])
        for r in fuzzy_qgram_pairs(df, q=3, **kw).collect()
    }
    assert qgram == dense
    assert (1, 2, 1) in qgram and (4, 5, 1) in qgram

    # and on the real documents title geometry
    from dbt_metrics_ingestion_script_spark.registry import REGISTRY
    import dbt_metrics_ingestion_script_spark.queries_ext  # noqa: F401

    fast = REGISTRY["dedup_fuzzy_title_pairs"].fn(spark, sf_dir)
    slow = REGISTRY["dedup_fuzzy_title_pairs_dense"].fn(spark, sf_dir)
    a = {tuple(r) for r in fast.collect()}
    b = {tuple(r) for r in slow.collect()}
    assert a == b and len(a) > 0


def test_zorder_key_interleave_and_locality(spark):
    from dbt_metrics_ingestion_script_spark.operators.layout import (
        render_interleave_sql,
        zorder_key,
    )

    # hand-computed interleave: a=0b101 (bits 0,2), b=0b011 (bits 0,1)
    # -> zkey bits: a0->1, a2->5, b0->0, b1->2 = 0b100111 = 39
    df = spark.createDataFrame(
        [(1, 0, 0), (2, 7, 7), (3, 5, 3)], "id long, a long, b long"
    )
    got = {
        r["id"]: r["zkey"]
        for r in zorder_key(
            df, dim_a="a", dim_b="b", id_col="id", bits=3, n_shards=2
        ).collect()
    }
    # bounds map a,b onto [0,7] identically (min 0, max 7, top 7)
    assert got[1] == 0
    assert got[2] == 63
    assert got[3] == 0b100111
    # dialect renderers agree on the same bit plan
    import duckdb

    sql = render_interleave_sql("5", "3", 3)
    assert duckdb.connect().execute(f"SELECT {sql}").fetchone()[0] == 39


def test_zorder_null_dims_dropped(spark):
    from dbt_metrics_ingestion_script_spark.operators.layout import zorder_key

    df = spark.createDataFrame(
        [(1, 1, None), (2, None, 1), (3, 2, 2)],
        "id long, a long, b long",
    )
    got = zorder_key(df, dim_a="a", dim_b="b", id_col="id", bits=4).collect()
    assert {r["id"] for r in got} == {3}


def test_countmin_one_sided_and_mergeable(spark, sf_dir):
    from dbt_metrics_ingestion_script_spark.operators.sketches import (
        countmin_daily_sketches,
        countmin_estimate,
    )

    ev = load_table(spark, sf_dir, "events").where(
        F.col("user_id").isNotNull() & F.col("ts").isNotNull()
    )
    sk = countmin_daily_sketches(ev, key_col="user_id", depth=4, width=32)
    users = ev.select("user_id").distinct()
    est = countmin_estimate(sk, users, key_col="user_id", depth=4, width=32)
    exact = ev.groupBy("user_id").agg(F.count("*").alias("exact"))
    joined = est.join(exact, "user_id").collect()
    assert len(joined) > 0
    # one-sided error: estimate never undercounts
    assert all(r["est_count"] >= r["exact"] for r in joined)
    # width 32 over hundreds of users MUST collide somewhere
    assert any(r["est_count"] > r["exact"] for r in joined)

    # mergeability: summing the daily sketches == sketching the whole
    # corpus in one pass (cell-wise)
    whole = countmin_daily_sketches(
        ev.withColumn("ts", F.lit("2024-01-01").cast("timestamp")),
        key_col="user_id",
        depth=4,
        width=32,
    ).groupBy("i", "col").agg(F.sum("c").alias("c"))
    rolled = sk.groupBy("i", "col").agg(F.sum("c").alias("c"))
    assert {tuple(r) for r in whole.collect()} == {
        tuple(r) for r in rolled.collect()
    }


def test_constraint_report_detects_planted_violations(spark):
    from dbt_metrics_ingestion_script_spark.operators.dq import (
        constraint_report,
    )

    child = spark.createDataFrame(
        [
            (1, 10, 5.0),
            (2, 10, -1.0),   # bounds violation
            (2, 20, 3.0),    # duplicate id; orphan parent 20
            (4, None, None), # null fk + null value
        ],
        "id long, fk long, v double",
    )
    parent = spark.createDataFrame([(10,)], "pk long")
    got = {
        (r["check_name"], r["col_name"]): r["value"]
        for r in constraint_report(
            child,
            completeness=("fk", "v"),
            bounds={"v": (0.0, 100.0)},
            unique=("id",),
            fk=("fk", parent, "pk"),
        ).collect()
    }
    assert got[("row_count", "*")] == 4.0
    assert got[("completeness", "fk")] == 0.75
    assert got[("completeness", "v")] == 0.75
    assert got[("bounds_violations", "v")] == 1.0
    assert got[("duplicates", "id")] == 1.0
    assert got[("fk_orphans", "fk")] == 1.0  # NULL fk is NOT an orphan


def test_scd2_intervals_run_length_and_null_attr(spark):
    from dbt_metrics_ingestion_script_spark.operators.asof import (
        scd2_intervals,
    )

    rows = [
        (1, "2024-01-01 00:00:00", 10, "a"),
        (2, "2024-01-02 00:00:00", 10, "a"),   # same run
        (3, "2024-01-03 00:00:00", 10, "b"),   # change
        (4, "2024-01-04 00:00:00", 10, None),  # NULL is a value
        (5, "2024-01-05 00:00:00", 10, None),  # same NULL run
        (6, "2024-01-06 00:00:00", 10, "a"),   # back to a: NEW run
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, state string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    got = sorted(
        scd2_intervals(
            df, key_col="user_id", attr_col="state", tiebreak_col="event_id"
        ).collect(),
        key=lambda r: r["valid_from"],
    )
    assert [(r["state"], r["n_rows"]) for r in got] == [
        ("a", 2), ("b", 1), (None, 2), ("a", 1),
    ]
    # intervals tile the timeline: each valid_to == next valid_from
    for prev, nxt in zip(got, got[1:]):
        assert prev["valid_to"] == nxt["valid_from"]
    assert got[-1]["valid_to"] is None  # current state stays open


def test_merge_upsert_actions_and_null_keys(spark):
    from dbt_metrics_ingestion_script_spark.operators.merge import (
        merge_upsert,
    )

    target = spark.createDataFrame(
        [(1, "a"), (2, "b"), (None, "t-null")], "k long, v string"
    )
    source = spark.createDataFrame(
        [(2, "B"), (3, "C"), (None, "s-null")], "k long, v string"
    )
    got = {
        (r["k"], r["v"], r["action"])
        for r in merge_upsert(target, source, key_col="k").collect()
    }
    assert (1, "a", "keep") in got
    assert (2, "B", "update") in got      # source wins
    assert (3, "C", "insert") in got
    # NULL keys never equi-join: both surface independently
    assert (None, "t-null", "keep") in got
    assert (None, "s-null", "insert") in got
    assert len(got) == 5

    # delete_missing: WHEN NOT MATCHED BY SOURCE THEN DELETE
    got2 = {
        (r["k"], r["action"])
        for r in merge_upsert(
            target, source, key_col="k", delete_missing=True
        ).collect()
    }
    assert (1, "delete") in got2 and (2, "update") in got2

    import pytest as _pytest

    with _pytest.raises(ValueError, match="schema mismatch"):
        merge_upsert(target, source.withColumnRenamed("v", "w"), key_col="k")


def test_triangle_stats_known_graph(spark):
    from dbt_metrics_ingestion_script_spark.operators.graph import (
        triangle_stats,
    )

    # K4 minus one edge: edges of {1,2,3,4} complete except (3,4):
    # 5 edges, wedges = sum C(d,2) over degrees [3,3,2,2] = 3+3+1+1=8,
    # triangles = {1,2,3}, {1,2,4} = 2, coeff = 6/8
    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4)], "id_a long, id_b long"
    )
    r = triangle_stats(edges).collect()[0]
    assert (
        r["n_edges"],
        r["n_wedges"],
        r["n_triangles"],
        r["clustering_coeff"],
    ) == (5, 8, 2, 0.75)


def test_triangle_stats_triangle_free(spark):
    from dbt_metrics_ingestion_script_spark.operators.graph import (
        triangle_stats,
    )

    # star graph: many wedges, zero triangles
    edges = spark.createDataFrame(
        [(1, i) for i in range(2, 7)], "id_a long, id_b long"
    )
    r = triangle_stats(edges).collect()[0]
    assert r["n_triangles"] == 0 and r["clustering_coeff"] == 0.0
    assert r["n_wedges"] == 10  # C(5,2) at the hub


def test_fuzzy_qgram_straddling_pair_not_lost(spark):
    """Regression: a pair straddling the short/long boundary (one
    string below (d+1)*q chars, one at/above) must still be found --
    the gram index covers ALL strings and the dense partition is only
    short x short."""
    from dbt_metrics_ingestion_script_spark.operators.linkage import (
        fuzzy_blocked_pairs,
        fuzzy_qgram_pairs,
    )

    rows = [
        (1, "alpha bravo chary"),    # len 17 < min_len 18 (d=5, q=3)
        (2, "alpha bravo charly"),   # len 18, dist 1 from id 1
        (3, "alpha bravo charlie x")  # len 20, far from both? dist 3 from 2
    ]
    df = spark.createDataFrame(rows, "id long, name string")
    kw = dict(key_col="name", id_col="id", max_dist=5)
    dense = {
        (r["id_a"], r["id_b"], r["dist"])
        for r in fuzzy_blocked_pairs(df, **kw).collect()
    }
    qg = {
        (r["id_a"], r["id_b"], r["dist"])
        for r in fuzzy_qgram_pairs(df, q=3, **kw).collect()
    }
    assert qg == dense
    assert (1, 2, 1) in qg  # the straddling pair


def test_checksum_buckets_detects_single_row_change(spark):
    from dbt_metrics_ingestion_script_spark.operators.dq import (
        checksum_buckets,
    )

    a = spark.createDataFrame(
        [(i, f"v{i}") for i in range(100)], "k long, v string"
    )
    b = spark.createDataFrame(
        [(i, f"v{i}" if i != 42 else "CHANGED") for i in range(100)],
        "k long, v string",
    )
    ca = {r["bucket"]: (r["n_rows"], r["checksum"])
          for r in checksum_buckets(a, "k", n_buckets=8).collect()}
    cb = {r["bucket"]: (r["n_rows"], r["checksum"])
          for r in checksum_buckets(b, "k", n_buckets=8).collect()}
    diff = {bk for bk in ca if ca[bk] != cb.get(bk)}
    assert len(diff) == 1  # exactly the bucket holding row 42
    # identical tables reconcile exactly, regardless of partitioning
    a16 = checksum_buckets(a.repartition(16), "k", n_buckets=8)
    assert {tuple(r) for r in a16.collect()} == {
        (bk, *v) for bk, v in ca.items()
    }


def test_write_zordered_files_own_disjoint_key_ranges(spark, tmp_path, sf_dir):
    """The materialized Z-order layout's point: every output file owns
    a contiguous, non-overlapping zkey interval (that is what makes
    min/max stats prune scans on either dimension)."""
    import glob

    import pyarrow.parquet as pq

    from dbt_metrics_ingestion_script_spark.operators.layout import (
        write_zordered,
    )

    ev = (
        load_table(spark, sf_dir, "events")
        .where(F.col("user_id").isNotNull() & F.col("ts").isNotNull())
        .withColumn("us", F.unix_micros(F.col("ts").cast("timestamp")))
        .select("event_id", "user_id", "us")
    )
    out = str(tmp_path / "zordered")
    write_zordered(
        ev, out, dim_a="user_id", dim_b="us", id_col="event_id", n_files=8
    )
    ranges = []
    for f in glob.glob(f"{out}/part-*.parquet"):
        t = pq.read_table(f, columns=["zkey"])
        if t.num_rows:
            col = t.column("zkey").to_pylist()
            ranges.append((min(col), max(col)))
    assert len(ranges) >= 2
    ranges.sort()
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2  # contiguous, non-overlapping intervals


# ---------------------------------------------------------------------------
# BPE tokenizer training (text.bpe_pair_counts / text.bpe_train)
# ---------------------------------------------------------------------------


def _py_bpe_reference(texts, n_merges):
    """Independent pure-Python BPE trainer replaying the published
    algorithm (word-frequency table, greedy left-to-right merges,
    count-desc/pair-asc tie-break) for the differential."""
    import re
    from collections import Counter

    wf = Counter()
    for t in texts:
        if t is None:
            continue
        norm = re.sub(r"\s+", " ", t.lower()).strip()
        for w in norm.split(" "):
            if len(w) >= 2:
                wf[w] += 1
    symbols = {w: list(w) for w in wf}
    rules = []
    for rank in range(n_merges):
        pc = Counter()
        for w, syms in symbols.items():
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += wf[w]
        if not pc:
            break
        (l, r), cnt = min(
            pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        rules.append((rank, l, r, l + r, cnt))
        for w, syms in symbols.items():
            out, merged_last = [], False
            for x in syms:
                if (not merged_last) and out and out[-1] == l and x == r:
                    out[-1] = l + r
                    merged_last = True
                else:
                    out.append(x)
                    merged_last = False
            symbols[w] = out
    return rules


def test_bpe_train_matches_python_reference(spark):
    """Full differential: the Spark merge loop learns the exact rule
    list (order, symbols, counts) the independent Python trainer
    learns on the same corpus -- including multi-char symbols from
    later rounds merging earlier rounds' output."""
    from dbt_metrics_ingestion_script_spark.operators.text import bpe_train

    rows = [
        (1, "the theme of the thesis is these themes"),
        (2, "there is the other theory THE theme"),
        (3, "banana bandana ananas"),
        (4, "aaaa aaa aa"),
        (5, None),
        (6, "x"),  # single char: excluded from the word table
        (7, "  spaced   out\tthe   theme  "),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = [tuple(r) for r in bpe_train(df, n_merges=6).collect()]
    want = _py_bpe_reference([t for _, t in rows], 6)
    assert got == want


def test_bpe_train_fixture_corpus_differential(spark, sf_dir):
    """Same differential over the real sf0.001 documents table (read
    independently via pyarrow, not Spark)."""
    import pyarrow.parquet as pq

    from dbt_metrics_ingestion_script_spark.operators.text import bpe_train
    from dbt_metrics_ingestion_script_spark.sources.tables import load_table

    texts = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["text"]
    ).column("text").to_pylist()
    want = _py_bpe_reference(texts, 4)
    got = [
        tuple(r)
        for r in bpe_train(load_table(spark, sf_dir, "documents"), 4).collect()
    ]
    assert got == want


def test_bpe_merge_overlap_is_greedy_left_to_right(spark):
    """'aaaa' with pair (a,a) merges to [aa, aa] and 'aaa' to [aa, a]:
    a freshly merged slot never re-merges with the next element (the
    published left-to-right scan)."""
    from dbt_metrics_ingestion_script_spark.operators.text import bpe_train

    df = spark.createDataFrame(
        [(1, "aaaa aaa")], "doc_id long, text string"
    )
    rules = [tuple(r) for r in bpe_train(df, n_merges=2).collect()]
    # round 0: (a,a) count = 3 (two in aaaa, one in aaa -- overlap at
    # position 2-3 of aaaa and 2-3 of aaa suppressed by the greedy scan
    # ... pair COUNTING is positional: aaaa has 3 adjacent slots, aaa
    # has 2, so count = 5)
    assert rules[0][:4] == (0, "a", "a", "aa")
    assert rules[0][4] == 5
    # round 1 operates on the REWRITTEN symbols [aa,aa] and [aa,a]
    assert rules[1][:4] == (1, "aa", "aa", "aaaa") or rules[1][:4] == (
        1,
        "aa",
        "a",
        "aaa",
    )
    # deterministic tie-break: both candidate pairs have count 1;
    # ('aa','a') < ('aa','aa') lexicographically on the right symbol
    assert rules[1][:4] == (1, "aa", "a", "aaa")


def test_bpe_pair_counts_weights_by_word_frequency(spark):
    from dbt_metrics_ingestion_script_spark.operators.text import (
        bpe_pair_counts,
    )

    df = spark.createDataFrame(
        [(1, "ab ab ab cd"), (2, "ab cd cd")], "doc_id long, text string"
    )
    got = {r["pair"]: r["pair_count"] for r in bpe_pair_counts(df).collect()}
    assert got == {"ab": 4, "cd": 3}


def _py_bpe_encode(texts, rules):
    import re

    out = {}
    for doc_id, t in texts:
        if t is None:
            continue
        norm = re.sub(r"\s+", " ", t.lower()).strip()
        words = [w for w in norm.split(" ") if w != ""]
        if not words:
            continue
        n_tokens = 0
        for w in words:
            syms = list(w)
            for l, r in rules:
                nxt, merged_last = [], False
                for x in syms:
                    if (not merged_last) and nxt and nxt[-1] == l and x == r:
                        nxt[-1] = l + r
                        merged_last = True
                    else:
                        nxt.append(x)
                        merged_last = False
                syms = nxt
            n_tokens += len(syms)
        out[doc_id] = (len(words), n_tokens)
    return out


def test_bpe_encode_matches_python_reference(spark):
    """Train on one corpus, encode it, and compare per-doc sequence
    lengths against the independent Python trainer+encoder -- includes
    single-char words (excluded from TRAINING but still encoded) and
    within-doc repetition."""
    from dbt_metrics_ingestion_script_spark.operators.text import (
        bpe_encode_token_counts,
        bpe_train,
    )

    rows = [
        (1, "the theme of the thesis is these themes the theme"),
        (2, "a b c the the the"),
        (3, "banana bandana ananas banana"),
        (4, ""),
        (5, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    rules = [
        (r["left"], r["right"])
        for r in bpe_train(df, n_merges=5).orderBy("rank").collect()
    ]
    got = {
        r["doc_id"]: (r["n_words"], r["n_bpe_tokens"])
        for r in bpe_encode_token_counts(df, rules).collect()
    }
    py_rules = [(l, r) for _, l, r, _, _ in _py_bpe_reference(
        [t for _, t in rows], 5
    )]
    assert py_rules == rules
    assert got == _py_bpe_encode(rows, rules)


def test_bpe_encode_compresses_fixture_corpus(spark, sf_dir):
    """Sanity on real data: every merge strictly reduces or preserves
    each doc's length, and the corpus-total BPE token count after 4
    merges sits strictly between per-char and per-word totals."""
    from pyspark.sql import functions as F

    from dbt_metrics_ingestion_script_spark.operators.text import (
        bpe_encode_token_counts,
        bpe_train,
    )
    from dbt_metrics_ingestion_script_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    rules = [
        (r["left"], r["right"])
        for r in bpe_train(docs, n_merges=4).orderBy("rank").collect()
    ]
    assert len(rules) == 4
    enc = bpe_encode_token_counts(docs, rules)
    base = bpe_encode_token_counts(docs, [])  # char-level baseline
    j = enc.alias("e").join(base.alias("b"), "doc_id")
    bad = j.where(
        (F.col("e.n_bpe_tokens") > F.col("b.n_bpe_tokens"))
        | (F.col("e.n_bpe_tokens") < F.col("e.n_words"))
    ).count()
    assert bad == 0


def test_bpe_train_local_equals_spark_loop(spark, sf_dir):
    """VERDICT r7 item 3a: the driver-local trainer (collected
    word-frequency table + incremental pair maintenance) learns the
    EXACT rule list of the Spark merge loop -- order, symbols, counts --
    on the crafted corpus AND the real sf0.001 documents table, and
    both match the independent Python reference."""
    from dbt_metrics_ingestion_script_spark.operators.text import (
        bpe_train,
        bpe_train_local,
    )
    from dbt_metrics_ingestion_script_spark.sources.tables import load_table

    rows = [
        (1, "the theme of the thesis is these themes"),
        (2, "there is the other theory THE theme"),
        (3, "banana bandana ananas"),
        (4, "aaaa aaa aa"),
        (5, None),
        (6, "x"),
        (7, "  spaced   out\tthe   theme  "),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got_local = [tuple(r) for r in bpe_train_local(df, n_merges=6).collect()]
    got_spark = [tuple(r) for r in bpe_train(df, n_merges=6).collect()]
    assert got_local == got_spark
    assert got_local == _py_bpe_reference([t for _, t in rows], 6)

    docs = load_table(spark, sf_dir, "documents")
    assert [tuple(r) for r in bpe_train_local(docs, 6).collect()] == [
        tuple(r) for r in bpe_train(docs, 6).collect()
    ]


def _crafted_bpe_corpus():
    """Deterministic corpus with 600 distinct 6-char words: every
    distinct word needs its own final merge to become one symbol, so
    at least 600 learnable rules exist (a 500-rule tokenizer is
    trainable without touching unrelated fixtures)."""
    letters = "abcdefghijklmnopqrst"
    words = []
    for i in range(600):
        w = "".join(letters[(i // (20 ** j)) % 20] for j in range(6))
        words.append(w)
    docs = []
    for d in range(50):
        # each doc takes 30 words with deterministic repetition so the
        # frequency table is non-uniform (ties still occur -> the
        # tie-break policy is exercised)
        ws = [words[(d * 17 + k * 7) % 600] for k in range(30)]
        ws += ws[: d % 5]  # within-doc repeats
        docs.append((d, " ".join(ws)))
    return docs


@pytest.mark.slow
def test_bpe_encode_500_rules_staged_vocab(spark):
    """VERDICT r7 item 3b: a 500-rule tokenizer -- far past the point
    where one chained fold expression breaks Janino -- encodes via the
    staged-vocabulary path (bounded folds per compilation unit, vocab
    joined back) and matches the independent Python encoder exactly."""
    from dbt_metrics_ingestion_script_spark.operators.text import (
        bpe_encode_token_counts,
        bpe_train_local,
    )

    rows = _crafted_bpe_corpus()
    df = spark.createDataFrame(rows, "doc_id long, text string")
    trained = bpe_train_local(df, n_merges=500).orderBy("rank").collect()
    assert len(trained) == 500
    rules = [(r["left"], r["right"]) for r in trained]
    got = {
        r["doc_id"]: (r["n_words"], r["n_bpe_tokens"])
        for r in bpe_encode_token_counts(df, rules).collect()
    }
    assert got == _py_bpe_encode(rows, rules)


def test_bpe_encode_staged_vocab_equals_chained(spark):
    """Path equality: the staged-vocabulary encode (the r15 default,
    and in multiple stage widths) reproduces the inline chained-fold
    result on the same rules, so the scale path is a pure physical
    swap."""
    from dbt_metrics_ingestion_script_spark.operators.text import (
        bpe_encode_token_counts,
        bpe_train_local,
    )

    rows = [
        (1, "the theme of the thesis is these themes the theme"),
        (2, "a b c the the the"),
        (3, "banana bandana ananas banana"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    rules = [
        (r["left"], r["right"])
        for r in bpe_train_local(df, n_merges=6).orderBy("rank").collect()
    ]
    chained = {
        r["doc_id"]: (r["n_words"], r["n_bpe_tokens"])
        for r in bpe_encode_token_counts(
            df, rules, max_chained_rules=len(rules)
        ).collect()
    }
    for mcr in (0, 2):
        staged = {
            r["doc_id"]: (r["n_words"], r["n_bpe_tokens"])
            for r in bpe_encode_token_counts(
                df, rules, max_chained_rules=mcr
            ).collect()
        }
        assert staged == chained, mcr


def test_rolling_features_point_in_time_no_leakage(spark):
    """Co-timestamped events must not see each other (a CURRENT ROW
    bound would leak the label event into its own features), strictly
    earlier events inside the horizon count, and events outside it
    fall off."""
    from datetime import datetime

    from dbt_metrics_ingestion_script_spark.operators.features import (
        rolling_user_features,
    )

    t0 = datetime(2024, 1, 10, 12, 0, 0)
    rows = [
        # two co-timestamped events for user 1 + one 30 min earlier +
        # one 8 days earlier (outside every horizon)
        (1, datetime(2024, 1, 2, 12, 0, 0), 10, "view", 100.0, None),
        (2, datetime(2024, 1, 10, 11, 30, 0), 10, "view", 7.0, None),
        (3, t0, 10, "view", 1.0, None),
        (4, t0, 10, "purchase", 2.0, None),
        # NULL user / NULL ts: not featurizable
        (5, t0, None, "view", 9.0, None),
        (6, None, 10, "view", 9.0, None),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    got = {
        r["event_id"]: r for r in rolling_user_features(df).collect()
    }
    assert set(got) == {1, 2, 3, 4}
    # both co-timestamped events see ONLY the 11:30 event in 1h
    for eid in (3, 4):
        assert got[eid]["n_1h"] == 1
        assert got[eid]["value_1h"] == 7.0
        assert got[eid]["n_7d"] == 1  # 8-day-old event fell off
    # the 11:30 event sees nothing in 1h, nothing in 7d (Jan 2 is
    # 8 days back), and zero-coalesced sums
    assert got[2]["n_1h"] == 0 and got[2]["value_1h"] == 0.0
    assert got[2]["n_7d"] == 0
    # the earliest event sees an empty history
    assert got[1]["n_7d"] == 0 and got[1]["value_7d"] == 0.0


def test_training_set_assembly_no_label_leakage(spark):
    """VERDICT r7 item 6: the assembled training row's features AT the
    label timestamp must exclude the label event and its co-timestamped
    peers; strictly-prior events count; a user with no prior feature
    row NULL-fills; labels never cross users."""
    from datetime import datetime

    from dbt_metrics_ingestion_script_spark.operators.features import (
        training_set_point_in_time,
    )

    t0 = datetime(2024, 1, 10, 12, 0, 0)
    events = spark.createDataFrame(
        [
            (1, datetime(2024, 1, 10, 11, 30, 0), 10, "click", 5.0),
            (2, t0, 10, "view", 7.0),       # co-timestamped with label
            (3, t0, 10, "purchase", 100.0),  # the label event itself
            (4, datetime(2024, 1, 10, 13, 0, 0), 10, "view", 50.0),  # future
            (5, datetime(2024, 1, 10, 12, 0, 1), 20, "purchase", 9.0),
        ],
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double",
    )
    labels = events.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("label_id"),
        "user_id",
        F.col("ts").alias("label_ts"),
        F.col("value").alias("label_value"),
    )
    got = {
        r["label_id"]: r
        for r in training_set_point_in_time(events, labels).collect()
    }
    # user 10's label at t0: the co-timestamped feature row (max
    # event_id = 3, the label itself) is selected by the as-of, but its
    # frame ends 1 us BEFORE t0 -- only the 11:30 click is visible.
    # A CURRENT ROW frame would show n_1h=3 / value_1h=112.0 (leak).
    r10 = got[3]
    assert r10["feature_event_id"] == 3
    assert r10["n_1h"] == 1 and r10["value_1h"] == 5.0
    assert r10["n_24h"] == 1 and r10["value_24h"] == 5.0
    # user 20's first-ever event is its own label: prior feature rows
    # exist for user 20? only the label itself at 12:00:01 -> frame
    # empty -> zero-valued features, never user 10's history
    r20 = got[5]
    assert r20["n_1h"] == 0 and r20["value_1h"] == 0.0
    assert r20["n_7d"] == 0


def test_training_set_assembly_null_fill_before_history(spark):
    """A label timestamped BEFORE the user's first feature row gets the
    NULL fill (no as-of match), not a zero vector -- 'no feature data
    yet' is distinguishable from 'zero recent activity'."""
    from datetime import datetime

    from dbt_metrics_ingestion_script_spark.operators.features import (
        training_set_point_in_time,
    )

    events = spark.createDataFrame(
        [(1, datetime(2024, 5, 1), 10, "view", 1.0)],
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double",
    )
    labels = spark.createDataFrame(
        [(99, 10, datetime(2024, 4, 1), 1.0)],
        "label_id long, user_id long, label_ts timestamp, label_value double",
    )
    row = training_set_point_in_time(events, labels).collect()[0]
    assert row["feature_ts"] is None
    assert row["feature_event_id"] is None
    assert row["n_1h"] is None and row["value_7d"] is None


def test_bucketed_join_is_shuffle_free_and_prunes_buckets(spark, sf_dir):
    """Bucketing pays the join shuffle once at WRITE time: two tables
    bucketed on the same key/count sort-merge-join with ZERO Exchange
    (Spark 3+ still adds a partition-local Sort unless the legacy
    bucketedTableScan.outputOrdering flag is on -- an in-memory pass,
    not a shuffle), an equality filter on the bucket key scans
    1/n_buckets of the files, and the co-located join returns exactly
    the plain join's rows."""
    from pyspark.sql import functions as F

    from dbt_metrics_ingestion_script_spark.sources.bucketed import (
        write_bucketed,
    )

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    customer = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        F.col("c_custkey").alias("o_custkey"), "c_acctbal"
    )
    t_o, t_c = "bktest_orders", "bktest_customer"
    try:
        # repartition(1): one writer task -> one file per bucket, the
        # layout that lets the join reuse the write-time sort order
        write_bucketed(orders.repartition(1), t_o, ["o_custkey"], n_buckets=4)
        write_bucketed(customer.repartition(1), t_c, ["o_custkey"], n_buckets=4)
        bo, bc = spark.table(t_o), spark.table(t_c)
        j = bo.hint("merge").join(bc, "o_custkey")
        from .conftest import SF_DIR  # noqa: F401  (plan_of lives in plan tests)

        plan = j._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "simple"
            )
        )
        assert "SortMergeJoin" in plan, plan
        assert "Exchange" not in plan, plan
        # co-located result == plain shuffled join result
        want = orders.join(customer, "o_custkey").count()
        assert j.count() == want
        # bucket pruning: equality on the bucket key touches 1 of 4.
        # autoBucketedScan (default on) disables bucketed reading for
        # scan-only plans where no operator consumes the distribution,
        # which also forfeits pruning -- pin it off for the probe, as a
        # pruning-reliant production job would
        auto = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
        prev = spark.conf.get(auto)
        try:
            spark.conf.set(auto, "false")
            some_key = bo.select("o_custkey").first()[0]
            pruned = bo.where(F.col("o_custkey") == some_key)
            pplan = pruned._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
            assert "SelectedBucketsCount: 1 out of 4" in pplan, pplan
        finally:
            spark.conf.set(auto, prev)
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {t_o}")
        spark.sql(f"DROP TABLE IF EXISTS {t_c}")


def test_ann_probe_sweep_monotone_and_ends_at_one(spark, sf_dir):
    """The IVF tuning curve: recall is nondecreasing in n_probe, and
    probing every list IS brute force, so the curve ends at exactly
    1.0."""
    from dbt_metrics_ingestion_script_spark.queries_ext import (
        similarity_ann_probe_sweep,
    )

    rows = sorted(
        similarity_ann_probe_sweep(spark, sf_dir).collect(),
        key=lambda r: r["n_probe"],
    )
    assert [r["n_probe"] for r in rows] == [1, 2, 4, 8, 16]
    recalls = [r["recall"] for r in rows]
    assert all(a <= b for a, b in zip(recalls, recalls[1:]))
    assert recalls[-1] == 1.0
    assert all(r["n_exact"] == 10 for r in rows)

@pytest.mark.slow
def test_ivf_pq_batch_topk_matches_single_query_path(spark, sf_dir):
    """The batch serving plan must return, per query_id, EXACTLY the
    rows the single-query ivf_pq_topk returns for that vector (same
    ids, same rounded scores) -- batching is a plan generalization,
    never a semantics change (VERDICT r9 item 3)."""
    emb = load_table(spark, sf_dir, "embeddings")
    from dbt_metrics_ingestion_script_spark.queries_ext import (
        _min_ids_queries,
    )

    queries = _min_ids_queries(emb, nq=3)
    batch = similarity.ivf_pq_batch_topk(
        emb, queries, k=10, shortlist=50, n_centroids=16, n_probe=4,
        round_digits=6,
    ).collect()
    by_q = {}
    for r in batch:
        by_q.setdefault(r["query_id"], []).append(
            (r["vec_id"], r["cosine_sim"])
        )
    for qid, vec in [(r["query_id"], r["embedding"]) for r in queries.collect()]:
        single_q = spark.createDataFrame(
            [(qid, vec)], "vec_id long, embedding array<float>"
        )
        single = similarity.ivf_pq_topk(
            emb, single_q, k=10, shortlist=50, n_centroids=16,
            n_probe=4, round_digits=6,
        ).collect()
        assert by_q[qid] == [
            (r["vec_id"], r["cosine_sim"]) for r in single
        ], qid


def test_ivf_batch_topk_matches_single_query_path(spark, sf_dir):
    """Same per-query equivalence pin for the IVF-only batch path."""
    emb = load_table(spark, sf_dir, "embeddings")
    from dbt_metrics_ingestion_script_spark.queries_ext import (
        _min_ids_queries,
    )

    queries = _min_ids_queries(emb, nq=3)
    batch = similarity.ivf_batch_topk(
        emb, queries, k=10, n_centroids=16, n_probe=4, round_digits=6
    ).collect()
    by_q = {}
    for r in batch:
        by_q.setdefault(r["query_id"], []).append(
            (r["vec_id"], r["cosine_sim"])
        )
    for qid, vec in [(r["query_id"], r["embedding"]) for r in queries.collect()]:
        single_q = spark.createDataFrame(
            [(qid, vec)], "vec_id long, embedding array<float>"
        )
        single = similarity.ivf_topk(
            emb, single_q, k=10, n_centroids=16, n_probe=4,
            round_digits=6,
        ).collect()
        assert by_q[qid] == [
            (r["vec_id"], r["cosine_sim"]) for r in single
        ], qid


def test_ivf_pq_batch_recall_shape_and_ordering(spark, sf_dir):
    """Batch recall: one row per path; mean/min in [0, 1] with
    min <= mean; n_queries == the batch size; at the batch-tuned 8x-k
    shortlist the composed path must not trail IVF-only on the mean.
    (The harness itself caught that the single-query 5x-k tune does
    NOT generalize: at shortlist 50 the composed mean trails 0.875 vs
    0.925 on this corpus -- which is why the registered batch queries
    use _IVFPQ_BATCH_SHORTLIST = 80.)"""
    emb = load_table(spark, sf_dir, "embeddings")
    from dbt_metrics_ingestion_script_spark.queries_ext import (
        _min_ids_queries,
    )

    rows = {
        r["path"]: r
        for r in similarity.ivf_pq_batch_recall(
            emb, _min_ids_queries(emb, nq=4), k=10, shortlist=80,
            n_centroids=16, n_probe=4,
        ).collect()
    }
    assert set(rows) == {"ivf", "ivf_pq"}
    for r in rows.values():
        assert r["n_queries"] == 4
        assert 0.0 <= r["min_recall"] <= r["mean_recall"] <= 1.0, r
    assert rows["ivf_pq"]["mean_recall"] >= rows["ivf"]["mean_recall"], rows


def test_repetition_signals_match_bruteforce_reference(spark):
    """Crafted docs (multi-line dups, heavy n-gram repetition, empty
    text, single word, trailing newline) against a plain-Python
    reference implementing the documented definitions."""
    import re as _re

    docs = [
        (1, "a b a b a b\na b a b a b\nunique line"),
        (2, "the cat sat on the mat the cat sat on the mat the cat"),
        (3, ""),
        (4, "word"),
        (5, "x y z\n"),
        (6, "same\nsame\nsame\nsame"),
    ]
    from dbt_metrics_ingestion_script_spark.operators import text

    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r["doc_id"]: r.asDict() for r in text.repetition_signals(df).collect()
    }

    def ref(doc_id, raw):
        lines = raw.split("\n")
        norm = _re.sub(r"\s+", " ", raw.lower()).strip()
        words = [w for w in norm.split(" ") if w]
        nc = len(norm)
        out = {
            "doc_id": doc_id,
            "n_lines": len(lines),
            "dup_line_frac": round(
                (len(lines) - len(set(lines))) / len(lines), 6
            ),
        }
        tlc = sum(len(l) for l in lines)
        dlc = sum(len(l) for l in set(lines))
        out["dup_line_char_frac"] = round((tlc - dlc) / tlc, 6) if tlc else 0.0
        for n in (2, 3, 4):
            grams = [
                " ".join(words[i : i + n])
                for i in range(len(words) - n + 1)
            ]
            if grams and nc:
                cnt = {}
                for g in grams:
                    cnt[g] = cnt.get(g, 0) + 1
                best = min(cnt.items(), key=lambda kv: (-kv[1], kv[0]))
                out[f"top_{n}gram_char_frac"] = round(
                    best[1] * len(best[0]) / nc, 6
                )
            else:
                out[f"top_{n}gram_char_frac"] = 0.0
        for n in (5, 6, 7, 8, 9, 10):
            grams = [
                " ".join(words[i : i + n])
                for i in range(len(words) - n + 1)
            ]
            cnt = {}
            for g in grams:
                cnt[g] = cnt.get(g, 0) + 1
            dup = sum((c - 1) * len(g) for g, c in cnt.items() if c > 1)
            out[f"dup_{n}gram_char_frac"] = (
                round(dup / nc, 6) if nc else 0.0
            )
        return out

    for doc_id, raw in docs:
        assert got[doc_id] == ref(doc_id, raw), (doc_id, got[doc_id])
    # sanity anchors on the crafted data
    assert got[6]["dup_line_frac"] == 0.75  # 4 identical lines
    assert got[1]["n_lines"] == 3
    assert got[2]["dup_5gram_char_frac"] > 0  # repeated 13-word phrase
    assert got[3] == ref(3, "")  # empty doc yields all zeros


def test_interval_overlap_join_semantics(spark):
    """Unkeyed interval-interval overlap: inclusive touch at either
    end counts, a pair spanning MANY shared buckets yields exactly ONE
    row (canonical-bucket dedup, no DISTINCT in the plan), disjoint
    pairs drop, inverted/NULL intervals are unmatchable, and the keyed
    mode restricts to equal keys."""
    import datetime

    import pytest as _pytest

    from dbt_metrics_ingestion_script_spark.operators.ranges import (
        interval_overlap_join,
    )

    t = lambda h, m=0: datetime.datetime(2024, 1, 1, h, m)  # noqa: E731
    left = spark.createDataFrame(
        [
            (1, 1, t(0), t(5)),      # spans 6 hourly buckets
            (2, 1, t(10), t(11)),    # touches r3 at its end instant
            (3, 2, t(0), t(1)),      # key 2 (for the keyed mode)
            (4, 1, t(20), None),     # NULL end: unmatchable
            (5, 1, t(9), t(8)),      # inverted: unmatchable
        ],
        "lid long, k long, ls timestamp, le timestamp",
    )
    right = spark.createDataFrame(
        [
            (100, 1, t(3), t(7)),    # overlaps l1 across buckets 3..5
            (101, 1, t(6), t(8)),    # disjoint from l1 (starts after)
            (102, 1, t(11), t(12)),  # touch: r.start == l2.end
            (103, 2, t(0, 30), t(2)),  # overlaps l1 AND l3
        ],
        "rid long, k long, rs timestamp, re timestamp",
    )
    unkeyed = sorted(
        (r["lid"], r["rid"])
        for r in interval_overlap_join(
            left.drop("k"), right.drop("k"),
            left_start="ls", left_end="le",
            right_start="rs", right_end="re", bucket_minutes=60,
        ).collect()
    )
    assert unkeyed == [(1, 100), (1, 103), (2, 102), (3, 103)]

    keyed = sorted(
        (r["lid"], r["rid"])
        for r in interval_overlap_join(
            left, right,
            left_start="ls", left_end="le",
            right_start="rs", right_end="re",
            on="k", bucket_minutes=60,
        ).collect()
    )
    # key 1: l1-r100 only (103 is key 2); key 2: l3-r103
    assert keyed == [(1, 100), (2, 102), (3, 103)]

    with _pytest.raises(ValueError, match="collide"):
        interval_overlap_join(
            left, right.withColumnRenamed("rid", "lid"),
            left_start="ls", left_end="le",
            right_start="rs", right_end="re", on="k",
        )
    with _pytest.raises(ValueError, match="internal names"):
        interval_overlap_join(
            left.withColumnRenamed("lid", "__b"), right,
            left_start="ls", left_end="le",
            right_start="rs", right_end="re", on="k",
        )
    with _pytest.raises(ValueError, match="bucket_minutes"):
        interval_overlap_join(
            left, right, left_start="ls", left_end="le",
            right_start="rs", right_end="re", bucket_minutes=-1,
        )


@pytest.mark.slow
def test_interval_overlap_join_randomized_vs_bruteforce(spark):
    """Canonical-bucket dedup proof, randomized: 200x120 random
    microsecond intervals (fixed seed; lengths from sub-bucket to
    many-bucket, including touching and point intervals), unkeyed
    overlap join compared pair-for-pair against the brute-force
    cross-join theta filter.  Any double-report (pair surviving in two
    buckets) or miss (canonical bucket outside a span) fails here
    before it can corrupt an oracle."""
    import random

    import datetime

    from dbt_metrics_ingestion_script_spark.operators.ranges import (
        interval_overlap_join,
    )

    rng = random.Random(0xC0FFEE)
    base = datetime.datetime(2024, 1, 1)

    def mk(n, id0):
        rows = []
        for i in range(n):
            s = base + datetime.timedelta(seconds=rng.randint(0, 400_000))
            dur = rng.choice([0, 1, 59, 3_600, 3_601, 40_000])
            rows.append((id0 + i, s, s + datetime.timedelta(seconds=dur)))
        return rows

    left = spark.createDataFrame(mk(200, 0), "lid long, ls timestamp, le timestamp")
    right = spark.createDataFrame(mk(120, 1000), "rid long, rs timestamp, re timestamp")

    got = sorted(
        (r["lid"], r["rid"])
        for r in interval_overlap_join(
            left, right, left_start="ls", left_end="le",
            right_start="rs", right_end="re", bucket_minutes=60,
        ).collect()
    )
    from pyspark.sql import functions as F

    want = sorted(
        (r["lid"], r["rid"])
        for r in left.crossJoin(right)
        .filter((F.col("ls") <= F.col("re")) & (F.col("rs") <= F.col("le")))
        .collect()
    )
    assert len(got) == len(set(got)), "duplicate pair reported"
    assert got == want


def test_interval_overlap_join_guards(spark):
    """ADVICE r12: a missing `on` key raises a clear ValueError at plan
    time (not a late engine error), and the opt-in max_span_buckets cap
    drops a pathological never-closed interval BEFORE replication while
    leaving every normal-length interval's pairs intact."""
    import datetime

    import pytest as _pytest

    from dbt_metrics_ingestion_script_spark.operators.ranges import (
        interval_overlap_join,
    )

    t = lambda h, m=0: datetime.datetime(2024, 1, 1 + h // 24, h % 24, m)  # noqa: E731
    left = spark.createDataFrame(
        [
            (1, t(0), t(1)),       # 2 hourly buckets
            (2, t(0), t(47, 59)),  # 48 buckets: the pathological row
        ],
        "lid long, ls timestamp, le timestamp",
    )
    right = spark.createDataFrame(
        [(100, t(0, 30), t(0, 45)), (101, t(40), t(41))],
        "rid long, rs timestamp, re timestamp",
    )

    with _pytest.raises(ValueError, match="missing from left and right"):
        interval_overlap_join(
            left, right, left_start="ls", left_end="le",
            right_start="rs", right_end="re", on="nope",
        )
    with _pytest.raises(ValueError, match="missing from right"):
        interval_overlap_join(
            left.withColumnRenamed("lid", "k"), right,
            left_start="ls", left_end="le",
            right_start="rs", right_end="re", on="k",
        )
    with _pytest.raises(ValueError, match="max_span_buckets"):
        interval_overlap_join(
            left, right, left_start="ls", left_end="le",
            right_start="rs", right_end="re", max_span_buckets=0,
        )

    def pairs(**kw):
        return sorted(
            (r["lid"], r["rid"])
            for r in interval_overlap_join(
                left, right, left_start="ls", left_end="le",
                right_start="rs", right_end="re", bucket_minutes=60, **kw,
            ).collect()
        )

    # uncapped: the 48-bucket interval fans out and matches both rights
    assert pairs() == [(1, 100), (2, 100), (2, 101)]
    # capped below 48 buckets: the pathological row is dropped entirely
    # (no replication, no pairs); normal rows unaffected
    assert pairs(max_span_buckets=10) == [(1, 100)]
    # cap at exactly the span keeps it (drop is strictly MORE than cap)
    assert pairs(max_span_buckets=48) == [(1, 100), (2, 100), (2, 101)]


def _overlap_stream_files(tmp_path, side, named_rows):
    """Write one parquet file per (name, rows) with increasing mtimes so
    maxFilesPerTrigger=1 drains them as successive micro-batches."""
    import os
    import time as _time

    import pyarrow as pa
    import pyarrow.parquet as pq

    d = str(tmp_path / side)
    os.makedirs(d, exist_ok=True)
    base = _time.time() - 1000
    for i, (name, rows) in enumerate(named_rows):
        p = os.path.join(d, name)
        pq.write_table(
            pa.table(
                {
                    "id": pa.array([r[0] for r in rows], pa.int64()),
                    "s": pa.array([r[1] for r in rows], pa.timestamp("us")),
                    "e": pa.array([r[2] for r in rows], pa.timestamp("us")),
                }
            ),
            p,
        )
        os.utime(p, (base + 10 * i, base + 10 * i))
    return d


def test_interval_overlap_join_stream_cross_batch_pairs(spark, tmp_path):
    """Stream-STREAM overlap join (state on both sides): the
    canonical-bucket replication supplies the equality key the
    symmetric hash join requires, and a pair whose two sides arrive in
    DIFFERENT micro-batches is emitted from state -- then the whole
    drain equals the batch operator under the same length cap, with
    zero duplicate pairs even though overlapping spans share many
    buckets."""
    import datetime
    import os

    from dbt_metrics_ingestion_script_spark.operators.ranges import (
        interval_overlap_join,
        interval_overlap_join_stream,
    )

    t = lambda h, m=0: datetime.datetime(2024, 1, 1 + h // 24, h % 24, m)  # noqa: E731
    # left batch 1: l1; left batch 2: l2
    ldir = _overlap_stream_files(
        tmp_path, "left",
        [
            ("l1.parquet", [(1, t(0), t(2))]),
            ("l2.parquet", [(2, t(10), t(11))]),
        ],
    )
    # right batch 1: r1 (same-batch pair with l1); right batch 2: r2
    # (CROSS-batch pair with l1, which is already in state) + r3
    rdir = _overlap_stream_files(
        tmp_path, "right",
        [
            ("r1.parquet", [(100, t(1), t(1, 30))]),
            (
                "r2.parquet",
                [(101, t(1, 30), t(3)), (102, t(10, 30), t(12))],
            ),
        ],
    )
    lschema = "lid long, ls timestamp, le timestamp"
    rschema = "rid long, rs timestamp, re timestamp"
    lstream = (
        spark.readStream.schema("id long, s timestamp, e timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(ldir)
        .toDF("lid", "ls", "le")
    )
    rstream = (
        spark.readStream.schema("id long, s timestamp, e timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(rdir)
        .toDF("rid", "rs", "re")
    )
    pairs = interval_overlap_join_stream(
        lstream, rstream,
        left_start="ls", left_end="le",
        right_start="rs", right_end="re",
        bucket_minutes=60, max_interval_minutes=24 * 60,
        watermark="30 days",
    )
    out = str(tmp_path / "out")
    q = (
        pairs.writeStream.format("parquet")
        .option("path", os.path.join(out, "pairs"))
        .option("checkpointLocation", os.path.join(out, "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)
    got = sorted(
        (r["lid"], r["rid"])
        for r in spark.read.schema(pairs.schema)
        .parquet(os.path.join(out, "pairs"))
        .collect()
    )
    # the (1, 101) pair is cross-batch by construction: l1 drained in
    # left micro-batch 1, r2 in right micro-batch 2
    assert got == [(1, 100), (1, 101), (2, 102)]
    assert len(got) == len(set(got)), "duplicate pair reported"
    # batch convergence: identical to the batch operator under the cap
    left_b = spark.createDataFrame(
        [(1, t(0), t(2)), (2, t(10), t(11))], lschema
    )
    right_b = spark.createDataFrame(
        [(100, t(1), t(1, 30)), (101, t(1, 30), t(3)), (102, t(10, 30), t(12))],
        rschema,
    )
    want = sorted(
        (r["lid"], r["rid"])
        for r in interval_overlap_join(
            left_b, right_b,
            left_start="ls", left_end="le",
            right_start="rs", right_end="re",
            bucket_minutes=60, max_span_buckets=24,
        ).collect()
    )
    assert got == want


def test_interval_overlap_join_stream_checkpoint_restart(spark, tmp_path):
    """Checkpoint recovery for the stream-stream overlap: run 1 drains
    a left interval with no partner; run 2 (a NEW query object on the
    SAME checkpoint) delivers the matching right interval -- the pair
    must emit from RECOVERED state, and run 1's pair must not
    re-emit."""
    import datetime
    import os
    import time as _time

    import pyarrow as pa
    import pyarrow.parquet as pq

    from dbt_metrics_ingestion_script_spark.operators.ranges import (
        interval_overlap_join_stream,
    )

    t = lambda h, m=0: datetime.datetime(2024, 1, 1, h, m)  # noqa: E731
    ldir = str(tmp_path / "left"); os.makedirs(ldir)
    rdir = str(tmp_path / "right"); os.makedirs(rdir)
    out = str(tmp_path / "out")

    def write(d, name, rows, mtime):
        p = os.path.join(d, name)
        pq.write_table(
            pa.table(
                {
                    "id": pa.array([r[0] for r in rows], pa.int64()),
                    "s": pa.array([r[1] for r in rows], pa.timestamp("us")),
                    "e": pa.array([r[2] for r in rows], pa.timestamp("us")),
                }
            ),
            p,
        )
        os.utime(p, (mtime, mtime))

    def run_once():
        lstream = (
            spark.readStream.schema("id long, s timestamp, e timestamp")
            .option("maxFilesPerTrigger", 1)
            .parquet(ldir)
            .toDF("lid", "ls", "le")
        )
        rstream = (
            spark.readStream.schema("id long, s timestamp, e timestamp")
            .option("maxFilesPerTrigger", 1)
            .parquet(rdir)
            .toDF("rid", "rs", "re")
        )
        pairs = interval_overlap_join_stream(
            lstream, rstream,
            left_start="ls", left_end="le",
            right_start="rs", right_end="re",
            bucket_minutes=60, max_interval_minutes=24 * 60,
            watermark="30 days",
        )
        q = (
            pairs.writeStream.format("parquet")
            .option("path", os.path.join(out, "pairs"))
            .option("checkpointLocation", os.path.join(out, "ckpt"))
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(120)
        return pairs.schema

    now = _time.time()
    write(ldir, "l1.parquet", [(1, t(0), t(2))], now - 100)
    write(rdir, "r1.parquet", [(100, t(1), t(1, 30))], now - 100)
    schema = run_once()  # run 1: (1, 100)

    # run 2: only a NEW right interval arrives; its partner lives in
    # run 1's recovered left state
    write(rdir, "r2.parquet", [(101, t(0, 30), t(3))], now - 50)
    run_once()

    got = sorted(
        (r["lid"], r["rid"])
        for r in spark.read.schema(schema)
        .parquet(os.path.join(out, "pairs"))
        .collect()
    )
    assert got == [(1, 100), (1, 101)]


def test_interval_overlap_join_stream_keyed_mode(spark, tmp_path):
    """Keyed stream-stream overlap: the key joins ALONGSIDE the bucket
    id (both are equality conjuncts in the symmetric hash join), so
    overlapping intervals under different keys never pair; guards
    match the batch operator."""
    import datetime
    import os

    import pytest as _pytest

    from dbt_metrics_ingestion_script_spark.operators.ranges import (
        interval_overlap_join_stream,
    )

    t = lambda h, m=0: datetime.datetime(2024, 1, 1, h, m)  # noqa: E731
    ldir = _overlap_stream_files(
        tmp_path, "left",
        [("l1.parquet", [(1, t(0), t(2)), (2, t(0), t(2))])],
    )
    rdir = _overlap_stream_files(
        tmp_path, "right",
        [("r1.parquet", [(100, t(1), t(3)), (101, t(1), t(3))])],
    )
    # key: odd/even id -- l1(k=1) pairs only with r101(k=1), l2(k=0)
    # only with r100(k=0), despite all four intervals overlapping
    lstream = (
        spark.readStream.schema("id long, s timestamp, e timestamp")
        .parquet(ldir)
        .selectExpr("id AS lid", "id % 2 AS k", "s AS ls", "e AS le")
    )
    rstream = (
        spark.readStream.schema("id long, s timestamp, e timestamp")
        .parquet(rdir)
        .selectExpr("id AS rid", "id % 2 AS k", "s AS rs", "e AS re")
    )
    pairs = interval_overlap_join_stream(
        lstream, rstream,
        left_start="ls", left_end="le",
        right_start="rs", right_end="re",
        on="k", bucket_minutes=60, max_interval_minutes=24 * 60,
        watermark="30 days",
    )
    out = str(tmp_path / "out")
    q = (
        pairs.writeStream.format("parquet")
        .option("path", os.path.join(out, "pairs"))
        .option("checkpointLocation", os.path.join(out, "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)
    got = sorted(
        (r["lid"], r["rid"], r["k"])
        for r in spark.read.schema(pairs.schema)
        .parquet(os.path.join(out, "pairs"))
        .collect()
    )
    assert got == [(1, 101, 1), (2, 100, 0)]

    with _pytest.raises(ValueError, match="missing from right"):
        interval_overlap_join_stream(
            lstream, rstream.drop("k"),
            left_start="ls", left_end="le",
            right_start="rs", right_end="re", on="k",
        )
    with _pytest.raises(ValueError, match="max_interval_minutes"):
        interval_overlap_join_stream(
            lstream, rstream.drop("k").withColumnRenamed("rid", "rid2"),
            left_start="ls", left_end="le",
            right_start="rs", right_end="re", max_interval_minutes=0,
        )


@pytest.mark.slow
def test_interval_overlap_stream_cap_is_bucket_span_exact(spark, tmp_path):
    """ADVICE r13: the stream's length cap is expressed in BUCKET-SPAN
    terms -- the exact filter interval_overlap_join's max_span_buckets
    applies -- so the pinned batch differential holds even at the cap
    boundary.  The adversarial input: an interval of duration exactly
    max_interval_minutes (24h) that straddles one extra bucket edge
    (00:30-24:30 spans 25 hourly buckets).  Both engines must DROP it;
    a duration-based stream cap would have kept it and diverged."""
    import datetime
    import os

    import pytest as _pytest

    from dbt_metrics_ingestion_script_spark.operators.ranges import (
        interval_overlap_join,
        interval_overlap_join_stream,
    )

    def t(h, m=0):
        return datetime.datetime(2024, 1, 1) + datetime.timedelta(
            hours=h, minutes=m
        )

    # l1 straddles: duration exactly 24h over 25 buckets; l2 is a
    # control pair well under the cap
    left_rows = [(1, t(0, 30), t(24, 30)), (2, t(1), t(2))]
    right_rows = [(100, t(1), t(1, 30))]
    lschema = "lid long, ls timestamp, le timestamp"
    rschema = "rid long, rs timestamp, re timestamp"
    ldir, rdir = str(tmp_path / "l"), str(tmp_path / "r")
    spark.createDataFrame(left_rows, lschema).coalesce(1).write.parquet(ldir)
    spark.createDataFrame(right_rows, rschema).coalesce(1).write.parquet(rdir)
    pairs = interval_overlap_join_stream(
        spark.readStream.schema(lschema).parquet(ldir),
        spark.readStream.schema(rschema).parquet(rdir),
        left_start="ls", left_end="le",
        right_start="rs", right_end="re",
        bucket_minutes=60, max_interval_minutes=24 * 60,
        watermark="30 days",
    )
    out = str(tmp_path / "out")
    q = (
        pairs.writeStream.format("parquet")
        .option("path", os.path.join(out, "pairs"))
        .option("checkpointLocation", os.path.join(out, "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)
    got = sorted(
        (r["lid"], r["rid"])
        for r in spark.read.schema(pairs.schema)
        .parquet(os.path.join(out, "pairs"))
        .collect()
    )
    want = sorted(
        (r["lid"], r["rid"])
        for r in interval_overlap_join(
            spark.createDataFrame(left_rows, lschema),
            spark.createDataFrame(right_rows, rschema),
            left_start="ls", left_end="le",
            right_start="rs", right_end="re",
            bucket_minutes=60, max_span_buckets=24,
        ).collect()
    )
    # the straddling boundary interval drops on BOTH engines
    assert got == want == [(2, 100)]

    # the exactness precondition is validated, not assumed
    with _pytest.raises(ValueError, match="multiple of bucket_minutes"):
        interval_overlap_join_stream(
            spark.readStream.schema(lschema).parquet(ldir),
            spark.readStream.schema(rschema).parquet(rdir),
            left_start="ls", left_end="le",
            right_start="rs", right_end="re",
            bucket_minutes=60, max_interval_minutes=90,
        )


def test_ensure_scan_parallelism_guard_contract(
    spark, tmp_path, monkeypatch
):
    """r16 fan-out guard contract: under-split frames repartition to a
    SIZE-DERIVED width (ceil(estimated bytes / target), capped at
    defaultParallelism -- VERDICT r15 items 3/8: the r15 guard fanned
    2,000-row frames to all 32 slots, pure scheduling floor),
    metadata-sized frames pass through untouched (the in-query ANN
    store-build exemption), exchange-bearing plans are never probed
    (ADVICE r15 medium: .rdd under AQE would EXECUTE the upstream
    stages at build time), and STREAMING frames bypass the probe
    entirely (df.rdd on a streaming source is an AnalysisException --
    the regression that broke streaming_quality_filter_report when the
    guard first landed in repetition_signals)."""
    from dbt_metrics_ingestion_script_spark.operators.similarity import (
        ensure_scan_parallelism,
    )

    # range(100) estimates 800 bytes; a 96 B/task target wants
    # ceil(800/96) = 9 partitions
    monkeypatch.setenv("SPARK_GRAFT_FANOUT_TARGET_BYTES", "96")
    small = spark.range(100).coalesce(1).select("id")
    fanned = ensure_scan_parallelism(small, "id")
    assert fanned.rdd.getNumPartitions() == min(
        spark.sparkContext.defaultParallelism, 9
    )
    # ...and the width is capped at defaultParallelism for big frames
    monkeypatch.setenv("SPARK_GRAFT_FANOUT_TARGET_BYTES", "1")
    fanned_cap = ensure_scan_parallelism(small, "id")
    assert fanned_cap.rdd.getNumPartitions() == (
        spark.sparkContext.defaultParallelism
    )
    # metadata-sized frame (estimated bytes <= target): untouched --
    # this is what keeps the guard out of in-query store-build batches
    monkeypatch.setenv("SPARK_GRAFT_FANOUT_TARGET_BYTES", str(96 * 1024))
    tiny = spark.range(100).coalesce(1).select("id")
    assert ensure_scan_parallelism(tiny, "id") is tiny
    monkeypatch.delenv("SPARK_GRAFT_FANOUT_TARGET_BYTES")
    # exchange-bearing plan: returned untouched WITHOUT probing .rdd
    # (same-object check; the plan contains a repartition Exchange)
    wide = spark.range(1000).repartition(
        spark.sparkContext.defaultParallelism, "id"
    )
    assert ensure_scan_parallelism(wide, "id") is wide
    agg = spark.range(1000).groupBy((F.col("id") % 7).alias("k")).count()
    assert ensure_scan_parallelism(agg, "k") is agg
    # streaming: bypassed, frame returned untouched, no exception
    src = str(tmp_path / "stream_src")
    spark.range(10).selectExpr("id", "id AS doc_id").write.parquet(src)
    stream = spark.readStream.schema("id long, doc_id long").parquet(src)
    out = ensure_scan_parallelism(stream, "doc_id")
    assert out is stream
