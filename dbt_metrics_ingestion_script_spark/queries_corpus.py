"""Training-corpus preparation queries (operators/corpus.py): the
decontaminate -> sample -> chunk -> pack stages an LLM data pipeline
runs between "deduped corpus" and "training shards", each with a full
DuckDB oracle (all four stages are deterministic by construction --
sampling decisions and bin layout derive from the portable hash and
document ids, never from RNG state or partitioning).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .functions.hashing import MERSENNE31
from .operators import corpus
from .operators.text import QUALITY_STOPWORDS
from .registry import register
from .sources.tables import load_table

_H = "('0x' || substr(md5({x}), 1, 15))::BIGINT"
_H31 = f"({_H} & {MERSENNE31})"

_NORM = r"trim(regexp_replace(lower(text), '\s+', ' ', 'g'))"

# eval split for the decontamination demo: every 19th doc plays the
# benchmark set, the rest are the training corpus
_EVAL_MOD = 19
_DECON_N = 5  # word-shingle width (operator default is the published 13;
# the synthetic fixture corpus needs a smaller window to have near-dup
# contamination at all SFs)


def _decon_oracle() -> str:
    n = _DECON_N
    return rf"""
    WITH docs AS (
      SELECT doc_id, {_NORM} AS norm FROM documents
    ), tok AS (
      SELECT doc_id, string_split(norm, ' ') AS toks FROM docs
    ), sh AS (
      SELECT doc_id,
             CASE WHEN len(toks) < {n} THEN [array_to_string(toks, ' ')]
                  ELSE list_distinct(list_transform(range(1, len(toks) - {n} + 2),
                         i -> array_to_string(toks[i:i+{n - 1}], ' ')))
             END AS shingles
      FROM tok
    ), grams AS (
      SELECT doc_id, {_H.format(x='s.sh')} AS gram
      FROM sh, unnest(shingles) AS s(sh)
    )
    SELECT t.doc_id, COUNT(*) AS n_overlap
    FROM (SELECT * FROM grams WHERE doc_id % {_EVAL_MOD} <> 0) t
    JOIN (SELECT DISTINCT gram FROM grams WHERE doc_id % {_EVAL_MOD} = 0) e
      USING (gram)
    GROUP BY t.doc_id
    """


@register("corpus_decontamination", _decon_oracle())
def corpus_decontamination(spark, sf_dir):
    """Train/eval n-gram decontamination (GPT-3-style overlap check):
    which training documents share a word {n}-gram with the eval split.
    The eval n-gram set is broadcast, so the corpus scan stays map-side."""
    docs = load_table(spark, sf_dir, "documents")
    train = docs.where(F.col("doc_id") % _EVAL_MOD != 0)
    eval_set = docs.where(F.col("doc_id") % _EVAL_MOD == 0)
    return corpus.decontaminate_ngram_overlap(train, eval_set, n=_DECON_N)


_RATES = {"en": 0.5, "zh": 0.25, "de": 1.0}
_DEFAULT_RATE = 0.75


def _sample_oracle() -> str:
    whens = " ".join(f"WHEN '{k}' THEN {v}" for k, v in sorted(_RATES.items()))
    h = _H31.format(x="doc_id::VARCHAR || ':' || coalesce(lang, '')")
    return f"""
    SELECT doc_id, lang, source
    FROM documents
    WHERE {h} < (CASE lang {whens} ELSE {_DEFAULT_RATE} END) * {MERSENNE31}
    """


@register("corpus_stratified_sample", _sample_oracle())
def corpus_stratified_sample(spark, sf_dir):
    """Deterministic per-language Bernoulli sample (rebalance a skewed
    corpus): keep-decision is a pure function of (doc_id, lang), so the
    filter is map-side, shuffle-free, and stable under task retries."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "source")
    return corpus.stratified_sample(
        docs, "lang", _RATES, default_rate=_DEFAULT_RATE
    )


_CHUNK, _OVERLAP = 200, 50


def _chunk_oracle() -> str:
    stride = _CHUNK - _OVERLAP
    chunk = f"substr(norm, chunk_offset + 1, {_CHUNK})"
    return rf"""
    WITH docs AS (
      SELECT doc_id, {_NORM} AS norm FROM documents
    ), pos AS (
      SELECT doc_id, norm,
             unnest(range(0, greatest(length(norm) - 1, 0) + 1, {stride}))
               AS chunk_offset
      FROM docs
    )
    SELECT doc_id, chunk_offset,
           length({chunk}) AS chunk_len,
           {_H.format(x=chunk)} AS chunk_hash
    FROM pos
    """


@register("corpus_chunks_fixed", _chunk_oracle())
def corpus_chunks_fixed(spark, sf_dir):
    """Overlapping fixed-width chunking (context-window splitter); chunk
    identity is (doc_id, chunk_offset) so the plan is a map-side explode
    with no ordinality shuffle."""
    return corpus.chunk_fixed(
        load_table(spark, sf_dir, "documents"),
        chunk_chars=_CHUNK,
        overlap=_OVERLAP,
    )


_CAPACITY = 512


def _pack_oracle() -> str:
    return rf"""
    WITH docs AS (
      SELECT lang AS shard, doc_id,
             len(string_split({_NORM}, ' ')) AS n_toks
      FROM documents
    ), binned AS (
      SELECT shard, n_toks,
             CAST(floor(COALESCE(SUM(n_toks) OVER (
                    PARTITION BY shard ORDER BY doc_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                  ), 0) / {_CAPACITY}) AS BIGINT) AS bin_id
      FROM docs
    )
    SELECT shard, bin_id, COUNT(*) AS n_docs, CAST(SUM(n_toks) AS BIGINT) AS n_tokens
    FROM binned GROUP BY shard, bin_id
    """


@register("corpus_pack_next_fit", _pack_oracle())
def corpus_pack_next_fit(spark, sf_dir):
    """Next-fit sequence packing per language shard: deterministic
    concat-and-cut layout of the token stream into capacity-sized bins,
    windowed per shard so packing parallelizes across the corpus."""
    return corpus.pack_next_fit(
        load_table(spark, sf_dir, "documents"), "lang", capacity=_CAPACITY
    )


def _pipeline_oracle() -> str:
    """CTE chain replaying the full pipeline: Gopher quality filter ->
    exact-dedup survivors -> stratified sample -> next-fit pack."""
    from .operators.text import QUALITY_STOPWORDS

    stop = ", ".join(f"'{s}'" for s in QUALITY_STOPWORDS)
    whens = " ".join(f"WHEN '{k}' THEN {v}" for k, v in sorted(_RATES.items()))
    h31 = _H31.format(x="doc_id::VARCHAR || ':' || coalesce(lang, '')")
    return rf"""
    WITH docs AS (
      SELECT doc_id, lang, {_NORM} AS norm FROM documents
    ), q AS (
      SELECT doc_id,
             greatest(len(string_split(norm, ' ')), 1) AS n_tokens,
             len(list_filter(string_split(norm, ' '),
                             x -> list_contains([{stop}], x))) AS n_stop,
             len(regexp_extract_all(norm, '[^A-Za-z0-9 ]')) AS n_symbols,
             length(norm) AS n_len
      FROM docs
    ), kept AS (
      SELECT d.doc_id, d.lang, d.norm
      FROM docs d JOIN q USING (doc_id)
      WHERE q.n_tokens >= 5
        AND (q.n_len - (q.n_tokens - 1)) / q.n_tokens BETWEEN 2.0 AND 12.0
        AND q.n_stop / q.n_tokens >= 0.05
        AND q.n_symbols / greatest(q.n_len, 1) <= 0.15
    ), surv AS (
      SELECT MIN(doc_id) AS doc_id
      FROM (SELECT doc_id, {_H.format(x='norm')} AS h FROM kept)
      GROUP BY h
    ), dd AS (
      SELECT k.doc_id, k.lang, k.norm FROM kept k JOIN surv USING (doc_id)
    ), samp AS (
      SELECT doc_id, lang, norm FROM dd
      WHERE {h31} < (CASE lang {whens} ELSE {_DEFAULT_RATE} END) * {MERSENNE31}
    ), toks AS (
      SELECT lang AS shard, doc_id, len(string_split(norm, ' ')) AS n_toks
      FROM samp
    ), binned AS (
      SELECT shard, n_toks,
             CAST(floor(COALESCE(SUM(n_toks) OVER (
                    PARTITION BY shard ORDER BY doc_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                  ), 0) / {_CAPACITY}) AS BIGINT) AS bin_id
      FROM toks
    )
    SELECT shard, bin_id, COUNT(*) AS n_docs, CAST(SUM(n_toks) AS BIGINT) AS n_tokens
    FROM binned GROUP BY shard, bin_id
    """


@register("corpus_training_pipeline", _pipeline_oracle())
def corpus_training_pipeline(spark, sf_dir):
    """The end-to-end corpus preparation pipeline as ONE composed plan:
    Gopher-style quality filter -> exact-dedup survivors (keep lowest
    doc_id per content digest) -> deterministic stratified sample ->
    per-shard next-fit packing.  Returns the training-shard manifest
    (shard, bin_id, n_docs, n_tokens).

    This is the composition a 100 TB run would execute: Catalyst fuses
    the quality filter and sampling into the scan side, and the plan
    carries exactly TWO full shuffles -- the dedup digest window
    (row_number keep-first, one payload shuffle instead of
    groupBy + survivor-rejoin) and the per-shard packing window."""
    from .operators import dedup, text

    docs = load_table(spark, sf_dir, "documents")
    keep_ids = (
        text.quality_score(docs).where(F.col("quality_keep")).select("doc_id")
    )
    kept = docs.join(keep_ids, "doc_id")
    deduped = dedup.exact_dedup_survivors(kept)
    sampled = corpus.stratified_sample(
        deduped, "lang", _RATES, default_rate=_DEFAULT_RATE
    )
    return corpus.pack_next_fit(sampled, "lang", capacity=_CAPACITY)


@register(
    "corpus_length_profile",
    # Spark exact percentile and DuckDB quantile_cont share the linear
    # interpolation definition, so the profile hash-matches
    """
    SELECT source,
           COUNT(n_chars) AS n_docs,
           ROUND(AVG(n_chars), 6) AS mean_chars,
           ROUND(quantile_cont(n_chars, 0.5), 6) AS p50,
           ROUND(quantile_cont(n_chars, 0.9), 6) AS p90,
           ROUND(quantile_cont(n_chars, 0.99), 6) AS p99
    FROM documents GROUP BY source
    """,
)
def corpus_length_profile(spark, sf_dir):
    return corpus.length_profile(load_table(spark, sf_dir, "documents"))


_PCT_Q = 0.5  # keep the top half of each source by stopword ratio


def _percentile_filter_oracle() -> str:
    # quality-score CTE (same arithmetic as text_quality_score's
    # oracle), then the per-source percent_rank ANSI window: both
    # engines define percent_rank as (rank-1)/(n-1) over the SAME
    # rounded score, so tie structure and boundary values agree exactly
    return rf"""
    WITH docs AS (
      SELECT doc_id, source, {_NORM} AS norm FROM documents
    ), t AS (
      SELECT doc_id, source,
             greatest(len(string_split(norm, ' ')), 1) AS n_tokens,
             len(list_filter(string_split(norm, ' '),
                             x -> list_contains([{{stop}}], x))) AS n_stop
      FROM docs
    ), scored AS (
      -- NULL scores dropped on BOTH sides before ranking (engines
      -- disagree on NULL sort placement; an unscorable doc cannot
      -- pass a quality bar)
      SELECT doc_id, source, ROUND(n_stop / n_tokens, 4) AS stopword_ratio
      FROM t WHERE n_stop / n_tokens IS NOT NULL
    ), ranked AS (
      SELECT doc_id, source, stopword_ratio,
             ROUND(PERCENT_RANK() OVER (
               PARTITION BY source ORDER BY stopword_ratio
             ), 6) AS pct_rank
      FROM scored
    )
    SELECT doc_id, source, stopword_ratio, pct_rank
    FROM ranked WHERE pct_rank >= 1.0 - {_PCT_Q}
    """


@register(
    "corpus_quality_percentile_filter",
    _percentile_filter_oracle().replace(
        "{stop}", ", ".join(f"'{s}'" for s in QUALITY_STOPWORDS)
    ),
)
def corpus_quality_percentile_filter(spark, sf_dir):
    """Per-source quality bar: keep the top half of each source by
    stopword ratio (a RELATIVE bar per stratum -- a global threshold
    would empty low-scoring sources entirely).  percent_rank over the
    rounded score is bit-portable; one shuffle, partitioned by source."""
    from .operators import text

    docs = load_table(spark, sf_dir, "documents")
    scored = text.quality_score(docs, extra_cols=("source",)).select(
        "doc_id", "source", "stopword_ratio"
    )
    return corpus.percentile_filter(
        scored, score_col="stopword_ratio", stratum_col="source", q=_PCT_Q
    )


_TEMP_ALPHA = 0.5


def _temperature_oracle() -> str:
    h31 = _H31.format(x="doc_id::VARCHAR || ':' || coalesce(lang, '')")
    # sqrt, not pow: IEEE-correctly-rounded in both engines, so the
    # 6-decimal rounded rate (and with it every keep decision) is
    # bit-identical -- the operator picks sqrt for alpha = 0.5 too
    return f"""
    WITH c AS (
      SELECT coalesce(lang, '') AS strat, COUNT(*) AS c
      FROM documents GROUP BY 1
    ), m AS (SELECT MIN(c) AS cmin FROM c),
    r AS (
      SELECT strat, ROUND(SQRT(m.cmin::DOUBLE / c.c), 6) AS keep_rate
      FROM c, m
    )
    SELECT d.doc_id, d.lang, d.source, r.keep_rate
    FROM documents d JOIN r ON coalesce(d.lang, '') = r.strat
    WHERE {h31} < r.keep_rate * {MERSENNE31}
    """


@register("corpus_temperature_sample", _temperature_oracle())
def corpus_temperature_sample(spark, sf_dir):
    """Temperature-based language rebalancing (alpha = 0.5): kept
    counts become proportional to sqrt(c_lang), flattening the dominant
    language while the rarest keeps rate 1.0.  Deterministic
    hash-threshold decisions; the corpus never shuffles (one count
    shuffle over strata + broadcast rate join + map-side filter)."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "source"
    )
    return corpus.temperature_sample(
        docs, stratum_col="lang", alpha=_TEMP_ALPHA
    ).select("doc_id", "lang", "source", "keep_rate")


# Bloom geometry for the registered demo: m small enough that hash
# collisions actually occur at sf0.01, proving the oracle replays even
# the FALSE POSITIVES bit-identically (one-sided error, superset of the
# exact operator -- locked by pytest)
_BLOOM_M, _BLOOM_K = 4096, 3


def _bloom_oracle() -> str:
    from .functions.hashing import _family_coeffs

    n = _DECON_N
    cases = " ".join(
        f"WHEN {j} THEN ({a} * (g & {MERSENNE31}) + {b}) % {MERSENNE31}"
        for j, (a, b) in ((j, _family_coeffs(j)) for j in range(_BLOOM_K))
    )
    return rf"""
    WITH docs AS (
      SELECT doc_id, {_NORM} AS norm FROM documents
    ), tok AS (
      SELECT doc_id, string_split(norm, ' ') AS toks FROM docs
    ), sh AS (
      SELECT doc_id,
             CASE WHEN len(toks) < {n} THEN [array_to_string(toks, ' ')]
                  ELSE list_distinct(list_transform(range(1, len(toks) - {n} + 2),
                         i -> array_to_string(toks[i:i+{n - 1}], ' ')))
             END AS shingles
      FROM tok
    ), g AS (
      SELECT doc_id, {_H.format(x='s.sh')} AS g
      FROM sh, unnest(shingles) AS s(sh)
    ), pos AS (
      SELECT doc_id, g, j.j AS j,
             (CASE j.j {cases} END) % {_BLOOM_M} AS p
      FROM g, unnest(range({_BLOOM_K})) AS j(j)
    ), bloom AS (
      SELECT DISTINCT p FROM pos WHERE doc_id % {_EVAL_MOD} = 0
    )
    SELECT doc_id, COUNT(*) AS n_bloom_hits FROM (
      SELECT t.doc_id, t.g
      FROM (SELECT * FROM pos WHERE doc_id % {_EVAL_MOD} <> 0) t
      JOIN bloom USING (p)
      GROUP BY t.doc_id, t.g
      HAVING COUNT(DISTINCT t.j) = {_BLOOM_K}
    ) GROUP BY doc_id
    """


@register("corpus_bloom_decontamination", _bloom_oracle())
def corpus_bloom_decontamination(spark, sf_dir):
    """Bloom-filter decontamination (the broadcast-too-big scale path):
    the filter travels as a distinct set-bit-position frame through a
    broadcast join; all hash arithmetic is the portable md5+universal
    family, so the DuckDB oracle replays every decision -- including
    the deliberate false positives at this m -- bit-identically."""
    docs = load_table(spark, sf_dir, "documents")
    train = docs.where(F.col("doc_id") % _EVAL_MOD != 0)
    eval_set = docs.where(F.col("doc_id") % _EVAL_MOD == 0)
    return corpus.decontaminate_bloom(
        train, eval_set, n=_DECON_N, m_bits=_BLOOM_M, k=_BLOOM_K
    )


_CURRICULUM_PHASES = 10


def _curriculum_oracle() -> str:
    n = _CURRICULUM_PHASES
    ts = ", ".join(
        f"ROUND(quantile_cont(avg_logprob, {i / n}), 6)" for i in range(1, n)
    )
    return rf"""
    WITH docs AS (
      SELECT doc_id,
             string_split({_NORM}, ' ') AS toks
      FROM documents
    ), terms AS (
      SELECT doc_id, t.term FROM docs, unnest(toks) AS t(term)
      WHERE t.term <> ''
    ), rc AS (
      SELECT term, COUNT(*) AS c FROM terms GROUP BY 1
    ), tot AS (
      SELECT SUM(c) AS n, COUNT(*) AS v FROM rc
    ), lp AS (
      SELECT terms.doc_id,
             ROUND(AVG(ln((rc.c + 1.0) / (tot.n + tot.v + 1.0))), 6)
               AS avg_logprob
      FROM terms JOIN rc USING (term) CROSS JOIN tot
      GROUP BY 1
    ), thr AS (
      SELECT [{ts}] AS ts FROM lp
    )
    SELECT doc_id, avg_logprob,
           (1 + len(list_filter(ts, t -> t > avg_logprob)))::INT AS phase,
           {_H.format(x="doc_id::VARCHAR")} AS order_key
    FROM lp, thr
    """


@register("corpus_curriculum_phases", _curriculum_oracle())
def corpus_curriculum_phases(spark, sf_dir):
    """Curriculum-learning schedule: every document gets an
    easiest-first phase (decile of its unigram typicality score via a
    broadcast exact-percentile threshold frame -- no global ntile
    sort) and a deterministic within-phase shuffle key; (phase,
    order_key) is the training sort key.  Completes the corpus
    pipeline's ordering stages: global shuffle (uniform), mixing
    schedule (by source), curriculum (by difficulty).

    Scan budget: documents 6x -- the unigram typicality model (vocab,
    totals, percentile thresholds) is derived inline; the production
    form scores against a materialized model table (1 scan).
    """
    from .operators.corpus import curriculum_phases
    from .operators.text import unigram_logprob_score

    scores = unigram_logprob_score(
        load_table(spark, sf_dir, "documents")
    ).select("doc_id", "avg_logprob")
    return curriculum_phases(scores, n_phases=_CURRICULUM_PHASES)


def _cdc_oracle() -> str:
    from .operators.corpus import CDC_BASE, CDC_DIVISOR, CDC_WINDOW

    w, d = CDC_WINDOW, CDC_DIVISOR
    powers = "[" + ", ".join(
        str(CDC_BASE ** (w - 1 - j)) for j in range(w)
    ) + "]"
    chunk = "substr(norm, starts[k] + 1, ends[k] - starts[k] + 1)"
    # closed-form polynomial sum mod M == Spark's per-char fold mod M
    # (max term 255 * 31^7 ~ 7e12, 8-term sum well inside int64)
    return rf"""
    WITH docs AS (
      SELECT doc_id, {_NORM} AS norm FROM documents
    ), nz AS (
      SELECT doc_id, norm FROM docs WHERE norm IS NOT NULL AND norm <> ''
    ), pos AS (
      SELECT doc_id, unnest(range({w} - 1, length(norm)::BIGINT - 1)) AS i,
             norm
      FROM nz WHERE length(norm) >= {w} + 1
    ), hh AS (
      SELECT doc_id, i FROM pos
      WHERE (list_sum(list_transform(range({w}),
               j -> ascii(substr(norm, (i - {w} + 2 + j)::INT, 1))
                    * {powers}[j + 1])) % {MERSENNE31}) % {d} = 0
    ), cuts AS (
      SELECT n.doc_id, n.norm,
             coalesce(list_sort(list(h.i) FILTER (WHERE h.i IS NOT NULL)),
                      []) AS cs
      FROM nz n LEFT JOIN hh h ON n.doc_id = h.doc_id
      GROUP BY n.doc_id, n.norm
    ), spans AS (
      SELECT doc_id, norm,
             list_prepend(0::BIGINT, list_transform(cs, c -> c + 1)) AS starts,
             list_append(cs, length(norm)::BIGINT - 1) AS ends
      FROM cuts
    )
    SELECT doc_id,
           (k - 1)::INT AS chunk_idx,
           starts[k]::INT AS chunk_start,
           (ends[k] - starts[k] + 1)::INT AS chunk_len,
           {_H.format(x=chunk)} AS chunk_hash
    FROM spans, unnest(range(1, len(starts) + 1)) AS t(k)
    """


def _cdc_dup_oracle() -> str:
    base = _cdc_oracle()
    return rf"""
    WITH chunks AS ({base}), with_df AS (
      SELECT doc_id, chunk_len,
             COUNT(*) OVER (PARTITION BY chunk_hash) AS cdf
      FROM chunks
    )
    SELECT doc_id,
           COUNT(*) AS n_chunks,
           CAST(SUM(CASE WHEN cdf > 1 THEN chunk_len ELSE 0 END) AS BIGINT)
             AS dup_chars,
           CAST(SUM(chunk_len) AS BIGINT) AS n_chars,
           ROUND(SUM(CASE WHEN cdf > 1 THEN chunk_len ELSE 0 END)::DOUBLE
                 / SUM(chunk_len), 6) AS dup_char_fraction
    FROM with_df GROUP BY doc_id
    """


@register("corpus_cdc_dup_fraction", _cdc_dup_oracle())
def corpus_cdc_dup_fraction(spark, sf_dir):
    """Per-document CHARACTER share covered by CDC chunks that also
    occur in other documents (or repeat within one) -- the
    storage-dedup duplication signal: where dup-ngram counts gram HITS,
    this weights by chunk LENGTH, so it reads as 'fraction of this
    document's bytes that are boilerplate'.  Same window shape as
    cross_doc_dup_fraction: chunk document-frequency is a count window
    on the 64-bit chunk hash over ONE chunk frame (itself map-side),
    then a doc rollup -- two slim keyed shuffles, text never moves."""
    from pyspark.sql import Window

    from .operators.corpus import cdc_chunks

    chunks = cdc_chunks(load_table(spark, sf_dir, "documents"))
    w = Window.partitionBy("chunk_hash")
    with_df = chunks.withColumn("__cdf", F.count("*").over(w))
    return (
        with_df.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_chunks"),
            F.sum(
                F.when(F.col("__cdf") > 1, F.col("chunk_len")).otherwise(0)
            ).cast("long").alias("dup_chars"),
            F.sum("chunk_len").cast("long").alias("n_chars"),
        )
        .withColumn(
            "dup_char_fraction",
            F.round(F.col("dup_chars") / F.col("n_chars"), 6),
        )
    )


@register("corpus_cdc_chunks", _cdc_oracle())
def corpus_cdc_chunks(spark, sf_dir):
    """Content-defined chunking (Rabin-style CDC): cut where the
    trailing-window rolling hash hits the divisor -- boundaries follow
    CONTENT, not position, so a prefix edit leaves downstream chunk
    hashes intact where fixed-width chunking shifts them all (the
    storage-dedup primitive, shift-resilience pinned in pytest).
    Entirely map-side JVM expression work: per-position hash is an
    O(window) fold in one projection, chunks posexplode, no shuffle."""
    from .operators.corpus import cdc_chunks

    return cdc_chunks(load_table(spark, sf_dir, "documents"))


_CAP_K = 10


@register(
    "corpus_source_cap",
    f"""
    SELECT doc_id, source, n_chars, rank FROM (
      SELECT doc_id, source, n_chars,
             ROW_NUMBER() OVER (
               PARTITION BY source ORDER BY n_chars DESC, doc_id ASC
             ) AS rank
      FROM documents
    ) WHERE rank <= {_CAP_K}
    """,
)
def corpus_source_cap(spark, sf_dir):
    """Per-source document cap (domain-cap curation rule): keep the top
    {k} docs of each source by length, id-tiebroken so score ties cut
    deterministically.  One per-stratum window shuffle."""
    return corpus.source_cap_topk(
        load_table(spark, sf_dir, "documents"), k=_CAP_K
    )


_SHUF_SEED, _SHUF_BUCKETS = 42, 16


def _global_shuffle_oracle() -> str:
    key = _H.format(x=f"doc_id::VARCHAR || ':{_SHUF_SEED}'")
    return f"""
    WITH k AS (
      SELECT doc_id, {key} AS key FROM documents
    )
    SELECT doc_id, key % {_SHUF_BUCKETS} AS bucket,
           ROW_NUMBER() OVER (
             PARTITION BY key % {_SHUF_BUCKETS} ORDER BY key, doc_id
           ) AS pos
    FROM k
    """


@register("corpus_global_shuffle", _global_shuffle_oracle())
def corpus_global_shuffle(spark, sf_dir):
    """Deterministic training-order shuffle: reproducible pseudorandom
    epoch order as (shard bucket, in-shard position) -- per-bucket
    row_number keeps the permutation parallel where a global
    row_number would serialize the corpus through one reducer.  The
    oracle replays key, bucket, and position bit-identically."""
    return corpus.global_shuffle(
        load_table(spark, sf_dir, "documents"),
        seed=_SHUF_SEED,
        n_buckets=_SHUF_BUCKETS,
    )


_SEG_W, _SEG_T = 5, 2  # segment width (words) / removal threshold, shared
# between the Spark call site and the oracle so geometry cannot drift


def _line_dedup_oracle() -> str:
    w, t = _SEG_W, _SEG_T
    return rf"""
    WITH docs AS (
      SELECT doc_id, string_split({_NORM}, ' ') AS toks FROM documents
    ), seg AS (
      SELECT doc_id, i.i AS seg_idx,
             array_to_string(toks[i.i*{w}+1 : i.i*{w}+{w}], ' ') AS seg
      FROM docs,
           unnest(range(CAST(ceil(len(toks)::DOUBLE / {w}) AS BIGINT))) AS i(i)
    ), cnt AS (
      SELECT {_H.format(x='seg')} AS seg_h, COUNT(*) AS c
      FROM seg GROUP BY 1
    ), j AS (
      SELECT s.doc_id, s.seg_idx, s.seg, (c.c >= {t}) AS dup
      FROM seg s JOIN cnt c ON {_H.format(x='s.seg')} = c.seg_h
    )
    SELECT doc_id,
           COUNT(*) AS n_segments,
           CAST(SUM(CASE WHEN dup THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
           COALESCE(string_agg(seg, ' ' ORDER BY seg_idx)
                      FILTER (WHERE NOT dup), '') AS text_kept
    FROM j GROUP BY doc_id
    """


@register("corpus_line_dedup", _line_dedup_oracle())
def corpus_line_dedup(spark, sf_dir):
    """CCNet-style duplicated-segment removal: segments occurring >=
    {t} times corpus-wide (boilerplate) are dropped from EVERY document
    they appear in, and each doc is reassembled from its surviving
    segments in order.  Two shuffles: a window count over the segment
    digest (the segment frame moves once) + the per-doc reassembly.
    The oracle replays the identical segmentation, digest, and
    threshold, so even hash-collision merges match bit-for-bit."""
    return corpus.line_dedup(
        load_table(spark, sf_dir, "documents"),
        segment_words=_SEG_W,
        dup_threshold=_SEG_T,
    )


_LINE_IDX_MOD = 2  # even doc_ids play the historical reference corpus


def _line_dedup_index_oracle() -> str:
    w, t, m = _SEG_W, _SEG_T, _LINE_IDX_MOD
    return rf"""
    WITH docs AS (
      SELECT doc_id, string_split({_NORM}, ' ') AS toks FROM documents
    ), seg AS (
      SELECT doc_id, i.i AS seg_idx,
             array_to_string(toks[i.i*{w}+1 : i.i*{w}+{w}], ' ') AS seg
      FROM docs,
           unnest(range(CAST(ceil(len(toks)::DOUBLE / {w}) AS BIGINT))) AS i(i)
    ), cnt AS (
      SELECT {_H.format(x='seg')} AS seg_h, COUNT(*) AS c
      FROM seg WHERE doc_id % {m} = 0 GROUP BY 1
    ), j AS (
      SELECT s.doc_id, s.seg_idx, s.seg,
             (COALESCE(c.c, 0) >= {t}) AS dup
      FROM (SELECT * FROM seg WHERE doc_id % {m} <> 0) s
      LEFT JOIN cnt c ON {_H.format(x='s.seg')} = c.seg_h
    )
    SELECT doc_id,
           COUNT(*) AS n_segments,
           CAST(SUM(CASE WHEN dup THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
           COALESCE(string_agg(seg, ' ' ORDER BY seg_idx)
                      FILTER (WHERE NOT dup), '') AS text_kept
    FROM j GROUP BY doc_id
    """


@register("corpus_line_dedup_incremental", _line_dedup_index_oracle())
def corpus_line_dedup_incremental(spark, sf_dir):
    """Incremental boilerplate stripping: the batch's segments are
    judged against the HISTORICAL segment-frequency index (built from
    the reference half of the corpus) -- known boilerplate is removed
    without rescanning history; batch-internal duplication
    deliberately does not count (the incremental-family contract)."""
    docs = load_table(spark, sf_dir, "documents")
    ref = docs.where(F.col("doc_id") % _LINE_IDX_MOD == 0)
    batch = docs.where(F.col("doc_id") % _LINE_IDX_MOD != 0)
    index = corpus.segment_count_index(ref, segment_words=_SEG_W)
    return corpus.line_dedup_against_index(
        batch, index, segment_words=_SEG_W, dup_threshold=_SEG_T
    )


@register(
    "corpus_duplication_report",
    # within-source exact-duplication rate off the normalized-text
    # digest -- the corpus-health number curation dashboards track per
    # feed (a jump means a scraper started re-ingesting)
    rf"""
    WITH h AS (
      SELECT source,
             {_H.format(x=_NORM)} AS ch
      FROM documents
    )
    SELECT source,
           COUNT(*) AS n_docs,
           COUNT(DISTINCT ch) AS n_unique,
           ROUND(1 - COUNT(DISTINCT ch)::DOUBLE / COUNT(*), 6) AS dup_rate
    FROM h GROUP BY source
    """,
)
def corpus_duplication_report(spark, sf_dir):
    """Per-source exact-duplication rate: docs vs distinct content
    digests per feed.  One scan; the shuffle carries (source, digest)
    pairs and Spark's two-phase distinct rewrite keeps the hot source
    partial-aggregated."""
    from .functions.hashing import hash64
    from .operators.dedup import normalize_text

    docs = load_table(spark, sf_dir, "documents")
    hashed = docs.select(
        "source", hash64(normalize_text("text")).alias("__ch")
    )
    return hashed.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.count_distinct("__ch").alias("n_unique"),
        F.round(
            F.lit(1.0) - F.count_distinct("__ch") / F.count("*"), 6
        ).alias("dup_rate"),
    )


_DUPGRAM_N = 5  # word window; the published sub-document dedup uses 50
# tokens -- the synthetic fixture docs are too short for that to fire


def _dup_ngram_oracle() -> str:
    n = _DUPGRAM_N
    return rf"""
    WITH docs AS (
      SELECT doc_id, {_NORM} AS norm FROM documents
    ), tok AS (
      SELECT doc_id, string_split(norm, ' ') AS toks FROM docs
    ), sh AS (
      SELECT doc_id,
             CASE WHEN len(toks) < {n} THEN [array_to_string(toks, ' ')]
                  ELSE list_distinct(list_transform(range(1, len(toks) - {n} + 2),
                         i -> array_to_string(toks[i:i+{n - 1}], ' ')))
             END AS shingles
      FROM tok
    ), grams AS (
      SELECT doc_id, {_H.format(x='s.sh')} AS gram
      FROM sh, unnest(shingles) AS s(sh)
    ), with_df AS (
      SELECT doc_id, COUNT(*) OVER (PARTITION BY gram) AS gram_df
      FROM grams
    )
    SELECT doc_id,
           COUNT(*) AS n_grams,
           CAST(SUM(CASE WHEN gram_df > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_dup_grams,
           ROUND(SUM(CASE WHEN gram_df > 1 THEN 1 ELSE 0 END)::DOUBLE
                 / COUNT(*), 6) AS dup_fraction
    FROM with_df GROUP BY doc_id
    """


@register("corpus_dup_ngram_fraction", _dup_ngram_oracle())
def corpus_dup_ngram_fraction(spark, sf_dir):
    """Cross-document duplicated n-gram fraction per doc (the
    sub-document duplication signal whole-doc digests miss: shared
    boilerplate/templates across distinct pages).  One documents scan;
    gram document-frequency is a count window on the gram hash, so the
    exploded slim frame shuffles once on gram and once on doc_id."""
    return corpus.cross_doc_dup_fraction(
        load_table(spark, sf_dir, "documents"), n=_DUPGRAM_N
    )


def _semantic_pipeline_oracle() -> str:
    """Full curation-chain replay: hashed-linear quality gate ->
    keep-first exact dedup -> semantic-cluster drops (recursive-CTE
    walk over the embedding near-dup graph, vec_id == doc_id)."""
    from .functions.hashing import _family_coeffs
    from .operators.text import HASHED_LINEAR_HALF
    from .queries_ext import (
        _CLS_BUCKETS,
        _CLS_SEED,
        _CLS_THRESHOLD,
        _COS_T,
        _embedding_bucket_cte,
    )

    a, b = _family_coeffs(_CLS_SEED)
    h31 = f"({_H.format(x='x')} & {MERSENNE31})"
    w = (
        f"(({a} * ({h31} % {_CLS_BUCKETS}) + {b}) % {MERSENNE31}"
        f" - {HASHED_LINEAR_HALF})"
    )
    return rf"""
    WITH RECURSIVE docs AS (
      SELECT doc_id, lang, source, {_NORM} AS norm FROM documents
    ), folded AS (
      SELECT doc_id, len(toks) AS n_tokens,
             CAST(list_sum(list_transform(toks, x -> {w})) AS BIGINT) AS wsum
      FROM (SELECT doc_id, string_split(norm, ' ') AS toks FROM docs)
    ), q AS (
      SELECT doc_id FROM folded
      WHERE ROUND(wsum::DOUBLE / (n_tokens * {float(HASHED_LINEAR_HALF)}), 6)
              >= {_CLS_THRESHOLD}
    ), kept AS (
      SELECT d.* FROM docs d JOIN q USING (doc_id)
    ), surv AS (
      SELECT MIN(doc_id) AS doc_id
      FROM (SELECT doc_id, {_H.format(x='norm')} AS h FROM kept)
      GROUP BY h
    ), dd AS (
      SELECT k.doc_id, k.lang, k.source FROM kept k JOIN surv USING (doc_id)
    ), {_embedding_bucket_cte()}, edges AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b
      FROM bk a JOIN bk b ON a.vec_id < b.vec_id
      WHERE bit_count(xor(a.bucket, b.bucket)) <= 2
        AND list_dot_product(a.unit, b.unit) >= {_COS_T}
    ), sym AS (
      SELECT id_a AS src, id_b AS dst FROM edges
      UNION SELECT id_b, id_a FROM edges
    ), walk(node, lbl) AS (
      SELECT src, LEAST(src, MIN(dst)) FROM sym GROUP BY src
      UNION
      SELECT s.src, w.lbl FROM sym s JOIN walk w ON s.dst = w.node
      WHERE w.lbl < s.src
    ), drops AS (
      SELECT node FROM walk GROUP BY node HAVING MIN(lbl) <> node
    )
    SELECT doc_id, lang, source FROM dd
    WHERE doc_id NOT IN (SELECT node FROM drops)
    """


@register("corpus_semantic_pipeline", _semantic_pipeline_oracle())
def corpus_semantic_pipeline(spark, sf_dir):
    """The MODEL-ERA curation chain, composed end to end: feature-
    hashing quality gate (map-side, zero shuffle) -> keep-first exact
    dedup (one digest-window shuffle) -> semantic drop of
    non-representative embedding-cluster members (LSH pairs -> star
    components over the embeddings table, vec_id == doc_id by fixture
    contract).  The complement of `corpus_training_pipeline`'s
    rule-based chain: learned quality score instead of Gopher rules,
    embedding-space dedup instead of lexical.

    Not one job -- the star stage is iterative (its convergence probes
    are actions) -- but every stage is the documented scale path, and
    the document payload shuffles exactly once (the digest window);
    cluster drops arrive as a slim id frame anti-joined at the end."""
    from .operators import dedup, text
    from .queries_ext import _CLS_BUCKETS, _CLS_SEED, _CLS_THRESHOLD, _COS_T

    docs = load_table(spark, sf_dir, "documents")
    # extra_cols passthrough keeps the gate single-scan: the classifier
    # is a projection over the same scan, no doc_id re-join
    kept = text.hashed_linear_score(
        docs,
        n_buckets=_CLS_BUCKETS,
        weight_seed=_CLS_SEED,
        threshold=_CLS_THRESHOLD,
        extra_cols=("lang", "source", "text"),
    ).where(F.col("keep"))
    dd = dedup.exact_dedup_survivors(kept)
    clusters = dedup.duplicate_clusters_star(
        dedup.embedding_near_pairs(
            load_table(spark, sf_dir, "embeddings"), threshold=_COS_T
        )
    )
    drops = clusters.where(F.col("cluster_id") != F.col("doc_id")).select(
        "doc_id"
    )
    return dd.join(drops, "doc_id", "left_anti").select(
        "doc_id", "lang", "source"
    )


_BUDGET_TOKENS = 2000


def _budget_select_oracle() -> str:
    stop = ", ".join(f"'{s}'" for s in QUALITY_STOPWORDS)
    return rf"""
    WITH docs AS (
      SELECT doc_id, source, {_NORM} AS norm FROM documents
    ), scored AS (
      SELECT doc_id, source,
             ROUND(len(list_filter(string_split(norm, ' '),
                       x -> list_contains([{stop}], x)))
                   / greatest(len(string_split(norm, ' ')), 1), 4) AS score,
             greatest(len(string_split(norm, ' ')), 1) AS n_tokens
      FROM docs
    ), r AS (
      SELECT doc_id, source, score, n_tokens,
             SUM(n_tokens) OVER (
               PARTITION BY source ORDER BY score DESC, doc_id ASC
               ROWS UNBOUNDED PRECEDING
             ) AS running_tokens
      FROM scored
    )
    SELECT doc_id, source, score, CAST(n_tokens AS INT) AS n_tokens,
           CAST(running_tokens AS BIGINT) AS running_tokens
    FROM r WHERE running_tokens <= {_BUDGET_TOKENS}
    """


@register("corpus_budget_select", _budget_select_oracle())
def corpus_budget_select(spark, sf_dir):
    """Token-budget-constrained selection: each source's docs walked in
    quality order (stopword-ratio, id-tiebroken), kept while the
    running token total fits the per-source budget -- the greedy
    "top N tokens of each feed" mixing rule.  One window shuffle; the
    oracle replays every cut decision (greedy prefix, not knapsack)."""
    return corpus.budget_select(
        load_table(spark, sf_dir, "documents"), budget_tokens=_BUDGET_TOKENS
    )


# PPS geometry: expected ~_PPS_K samples per source stratum; bucket
# count shared by the operator's distributed prefix sum and the
# oracle's naive single-window replay (same walk order, different plan)
_PPS_K = 25
_PPS_BUCKETS = 32


def _pps_oracle() -> str:
    b = _H31.format(x="doc_id::VARCHAR")
    return f"""
    WITH p AS (
      SELECT doc_id, coalesce(source, '') AS stratum,
             n_chars::BIGINT AS weight, ({b}) % {_PPS_BUCKETS} AS b
      FROM documents WHERE n_chars > 0
    ), c AS (
      SELECT doc_id, stratum, weight,
             SUM(weight) OVER (
               PARTITION BY stratum ORDER BY b, doc_id
               ROWS UNBOUNDED PRECEDING
             ) AS w_end,
             GREATEST(SUM(weight) OVER (PARTITION BY stratum)
                      // {_PPS_K}, 1) AS stride
      FROM p
    )
    SELECT doc_id, stratum, CAST(weight AS BIGINT) AS weight,
           CAST(w_end AS BIGINT) AS w_end,
           CAST((w_end // stride) - ((w_end - weight) // stride)
                AS BIGINT) AS n_hits
    FROM c
    WHERE (w_end // stride) - ((w_end - weight) // stride) >= 1
    """


@register("corpus_pps_systematic_sample", _pps_oracle())
def corpus_pps_systematic_sample(spark, sf_dir):
    """Probability-proportional-to-size systematic sample per source:
    "sample the TOKENS, not the documents" -- stride walk over the
    stratum's integer weight line, multiplicity for docs larger than
    the stride.  Operator runs the distributed two-phase prefix sum
    (bucketed partial sums + offset join, one corpus shuffle); the
    oracle replays the same (bucket, id) walk with a naive single
    window -- identical integers from a different plan shape."""
    return corpus.pps_systematic_sample(
        load_table(spark, sf_dir, "documents").select(
            "doc_id", "source", "n_chars"
        ),
        weight_col="n_chars",
        stratum_col="source",
        k=_PPS_K,
        n_buckets=_PPS_BUCKETS,
    )


_WPS_K = 50


@register(
    "corpus_weighted_priority_sample",
    f"""
    WITH s AS (
      SELECT doc_id,
             n_chars::DOUBLE AS weight,
             n_chars::DOUBLE /
               ((({_H31.format(x="doc_id::VARCHAR")}) + 1) / 2147483648.0)
               AS priority
      FROM documents WHERE n_chars > 0
    )
    SELECT doc_id, weight, ROUND(priority, 4) AS priority
    FROM s ORDER BY priority DESC, doc_id ASC LIMIT {_WPS_K}
    """,
)
def corpus_weighted_priority_sample(spark, sf_dir):
    """Weighted sampling WITHOUT replacement (priority sampling,
    Duffield-Lund-Thorup): top-{_WPS_K} priorities w/u over the
    char-weight column -- the weighted counterpart of the Bernoulli /
    temperature / PPS samplers, preferring heavy documents while light
    ones keep a proportional chance.  u is an exact dyadic rational of
    the portable hash and the key is ONE IEEE division (no pow/ln), so
    the oracle reproduces the selection bit-for-bit; the top-k is a
    TakeOrdered, never a global sort."""
    return corpus.weighted_priority_sample(
        load_table(spark, sf_dir, "documents").select("doc_id", "n_chars"),
        weight=F.col("n_chars"),
        k=_WPS_K,
    )


_HIST_BUCKETS = 10


def _length_histogram_oracle() -> str:
    return f"""
    WITH d AS (
      SELECT n_chars FROM documents WHERE n_chars IS NOT NULL
    ), b AS (
      SELECT MIN(n_chars) AS mn, MAX(n_chars) AS mx FROM d
    ), h AS (
      SELECT LEAST(
               (({_HIST_BUCKETS} * (n_chars - mn))
                // GREATEST(mx - mn + 1, 1)),
               {_HIST_BUCKETS} - 1) AS bucket,
             mn, mx
      FROM d, b
    )
    SELECT CAST(bucket AS BIGINT) AS bucket, COUNT(*) AS n_docs
    FROM h GROUP BY bucket
    """


@register("corpus_length_histogram", _length_histogram_oracle())
def corpus_length_histogram(spark, sf_dir):
    """Equi-width document-length histogram: 10-bucket integer-exact
    binning off a 1-row broadcast (min, max) bounds frame (bucket =
    NB * (x - mn) DIV (mx - mn + 1), clamped) -- the distribution
    panel of a corpus dashboard, one partial-aggregated shuffle over
    at most NB groups."""
    d = load_table(spark, sf_dir, "documents").where(
        F.col("n_chars").isNotNull()
    ).select("n_chars")
    b = d.agg(F.min("n_chars").alias("mn"), F.max("n_chars").alias("mx"))
    bucket = F.least(
        F.expr(f"({_HIST_BUCKETS} * (n_chars - mn)) DIV greatest(mx - mn + 1, 1)"),
        F.lit(_HIST_BUCKETS - 1),
    )
    return (
        d.crossJoin(F.broadcast(b))
        .select(bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(F.count("*").alias("n_docs"))
    )


# Split fractions in per-mille so the thresholds are integers:
# [0, 800) train, [800, 900) val, [900, 1000) test.
_SPLIT_TRAIN, _SPLIT_VAL = 800, 900


def _split_oracle() -> str:
    h = _H31.format(x="doc_id::VARCHAR || ':split'")
    return f"""
    SELECT doc_id, source,
           CASE WHEN ({h}) % 1000 < {_SPLIT_TRAIN} THEN 'train'
                WHEN ({h}) % 1000 < {_SPLIT_VAL} THEN 'val'
                ELSE 'test' END AS split
    FROM documents
    """


@register("corpus_train_val_test_split", _split_oracle())
def corpus_train_val_test_split(spark, sf_dir):
    """Deterministic 80/10/10 train/val/test split: the assignment is
    a pure function of hash(doc_id:'split') -- map-side, zero shuffle,
    stable under retries/repartitioning/re-ingestion, and new
    documents never move existing ones between splits (the property
    random splits lack).  Integer per-mille thresholds replay exactly
    in any engine."""
    from .functions.hashing import hash31

    d = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    slot = hash31(
        F.concat(F.col("doc_id").cast("string"), F.lit(":split"))
    ) % 1000
    return d.select(
        "doc_id",
        "source",
        F.when(slot < _SPLIT_TRAIN, "train")
        .when(slot < _SPLIT_VAL, "val")
        .otherwise("test")
        .alias("split"),
    )


# Mixing weights: web-ish sources (even index) sampled 3x as often as
# the rest.  LCM(3, 1) = 3 keeps the schedule keys integral.
_MIX_HEAVY, _MIX_LIGHT, _MIX_LCM = 3, 1, 3


def _mixing_oracle() -> str:
    # TRY_CAST: an unparseable source index is NULL in both engines
    # (Spark's non-ANSI cast), landing in the light-weight ELSE branch
    w = (
        "CASE WHEN TRY_CAST(substr(source, 4) AS INT) % 2 = 0 "
        f"THEN {_MIX_HEAVY} ELSE {_MIX_LIGHT} END"
    )
    return f"""
    WITH d AS (
      SELECT doc_id, source, {w} AS w,
             ROW_NUMBER() OVER (PARTITION BY source ORDER BY doc_id)
               AS pos
      FROM documents
    )
    SELECT doc_id, source, CAST(pos AS BIGINT) AS pos,
           CAST(pos * ({_MIX_LCM} / w) AS BIGINT) AS mix_key
    FROM d
    """


@register("corpus_mixing_schedule", _mixing_oracle())
def corpus_mixing_schedule(spark, sf_dir):
    """Deterministic source-mixing schedule (the fixed-ratio data
    mixing LLM training runs on): each document gets an integer
    mix_key = pos_in_source * (LCM / weight); reading in mix_key order
    interleaves sources at exactly their weight ratios -- a weight-3
    source contributes 3 documents for every 1 from a weight-1 source,
    forever, with no RNG.  One per-source window shuffle; the global
    order is the SORT KEY, not a global row_number (which would
    serialize the corpus through one reducer)."""
    from pyspark.sql import Window as W

    d = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    # try_cast: ANSI-mode cast throws on junk; unparseable source
    # indexes must land in the light branch instead (TRY_CAST parity
    # with the oracle)
    w_col = F.when(
        (F.substring("source", 4, 10).try_cast("int") % 2) == 0,
        F.lit(_MIX_HEAVY),
    ).otherwise(F.lit(_MIX_LIGHT))
    pos = F.row_number().over(W.partitionBy("source").orderBy("doc_id"))
    return d.select(
        "doc_id",
        "source",
        pos.cast("long").alias("pos"),
        w_col.alias("__w"),
    ).select(
        "doc_id",
        "source",
        "pos",
        (F.col("pos") * (F.lit(_MIX_LCM) / F.col("__w")))
        .cast("long")
        .alias("mix_key"),
    )


# ---------------------------------------------------------------------------
# exact substring dedup: duplicated-extent detection + span removal
# ---------------------------------------------------------------------------

_SUBSTR_N = 8  # token window; the published suffix-array dedup uses 50
# (Lee et al.) -- 8 exercises the same machinery at this corpus's ~54
# mean tokens/doc


def _substring_extent_ctes() -> str:
    """Shared CTE chain: positional grams -> cross-doc dup positions ->
    maximal merged extents (DuckDB replay of the Spark plan, window for
    window)."""
    n = _SUBSTR_N
    gram = f"array_to_string(toks[i:i+{n - 1}], ' ')"
    return rf"""
    docs AS (
      SELECT doc_id, {_NORM} AS norm FROM documents
    ), tok AS (
      SELECT doc_id, string_split(norm, ' ') AS toks FROM docs
    ), g AS (
      SELECT doc_id, i AS pos, {_H.format(x=gram)} AS g
      FROM tok, unnest(range(1, len(toks) - {n} + 2)) r(i)
    ), dup AS (
      SELECT doc_id, pos FROM (
        SELECT doc_id, pos,
               MIN(doc_id) OVER (PARTITION BY g) AS mn,
               MAX(doc_id) OVER (PARTITION BY g) AS mx
        FROM g
      ) t WHERE mn <> mx
    ), m AS (
      SELECT doc_id, pos,
             MAX(pos + {n - 1}) OVER (
               PARTITION BY doc_id ORDER BY pos
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ) AS pe
      FROM dup
    ), grps AS (
      SELECT doc_id, pos,
             SUM(CASE WHEN pe IS NULL OR pos > pe + 1 THEN 1 ELSE 0 END)
               OVER (PARTITION BY doc_id ORDER BY pos) AS ext
      FROM m
    ), extents AS (
      SELECT doc_id, CAST(MIN(pos) AS BIGINT) AS start_tok,
             CAST(MAX(pos) + {n - 1} AS BIGINT) AS end_tok
      FROM grps GROUP BY doc_id, ext
    )"""


@register(
    "corpus_substring_extents",
    f"""
    WITH {_substring_extent_ctes()}
    SELECT doc_id, start_tok, end_tok,
           end_tok - start_tok + 1 AS n_tokens
    FROM extents
    """,
)
def corpus_substring_extents(spark, sf_dir):
    """Exact substring dedup, detection half: maximal token extents
    duplicated verbatim (>= {n}-token windows) across documents --
    the sub-document spans whole-doc and near dedup both miss, found
    by the positional-shingle equivalent of suffix-array dedup.  One
    real documents scan (eager gram checkpoint), three slim shuffles
    (skew-proof gram aggregate, AQE-splittable coverage join-back,
    per-doc extent merge); the oracle replays the same semantics as
    one window chain."""
    return corpus.duplicated_substring_extents(
        load_table(spark, sf_dir, "documents"), n=_SUBSTR_N
    )


@register(
    "corpus_substring_dedup_clean",
    f"""
    WITH {_substring_extent_ctes()},
    tokp AS (
      SELECT doc_id, i AS pos, toks[i] AS tok
      FROM tok, unnest(range(1, len(toks) + 1)) r(i)
    ), covered AS (
      SELECT doc_id, unnest(range(start_tok, end_tok + 1)) AS pos
      FROM extents
    )
    SELECT t.doc_id,
           COALESCE(string_agg(CASE WHEN c.pos IS NULL THEN t.tok END,
                               ' ' ORDER BY t.pos), '') AS clean_text,
           CAST(SUM(CASE WHEN c.pos IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_kept,
           CAST(SUM(CASE WHEN c.pos IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_removed
    FROM tokp t
    LEFT JOIN covered c ON c.doc_id = t.doc_id AND c.pos = t.pos
    GROUP BY t.doc_id
    """,
)
def corpus_substring_dedup_clean(spark, sf_dir):
    """Exact substring dedup, removal half: every document re-emitted
    with its cross-document duplicated extents cut out (clean_text,
    n_kept, n_removed); fully-duplicated documents survive with empty
    text so the keep threshold stays the caller's policy.  The oracle
    replays detection AND removal, so the cleaned strings themselves
    are cross-engine-verified."""
    return corpus.substring_dedup_clean(
        load_table(spark, sf_dir, "documents"), n=_SUBSTR_N
    )
