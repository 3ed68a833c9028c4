"""Record linkage: blocked approximate-string matching (EXT).

The dedup family (operators/dedup.py) finds near-duplicate *content*
via set similarity (shingles, MinHash, SimHash).  Record linkage is the
complementary entity-resolution primitive: find pairs whose *key
strings* (names, titles) are within a small edit distance -- the
classic fuzzy-join a curation pipeline runs to collapse variant titles
or merge catalog entries.  No reference counterpart (the reference is a
metadata emitter, `/root/reference/dbt_metrics_to_datahub.py`); built
Spark-first per the SURVEY.md §2.11 EXT mandate.

Scale design -- never all-pairs:

1. **Blocking**: candidate pairs only form inside a block (equi-join on
   a cheap deterministic key, e.g. the first token).  At 100 TB the
   join shuffles on the block key; comparisons are O(sum b_i^2) over
   block sizes instead of O(n^2).  Skewed blocks (stopword first
   tokens) are the known hazard -- mitigate with a longer block key or
   multi-pass blocking; block sizes are one `groupBy.count` away.
2. **Length-band prune**: levenshtein(a, b) >= abs(len(a) - len(b)),
   so a `abs(length diff) <= max_dist` predicate inside the join
   condition discards most candidates BEFORE the O(len^2) distance
   kernel runs -- a cheap codegen comparison guarding an expensive one.
3. **q-gram count filter** (`fuzzy_qgram_pairs`): the published scale
   path for edit-distance joins (Gravano et al., VLDB'01 approximate
   string joins).  An edit destroys at most q q-grams, so strings
   within distance d share at least max(len) - q + 1 - d*q q-grams --
   a NECESSARY condition checked through an inverted q-gram index
   (multiset-correct via occurrence numbering) so candidates come from
   shared grams, not from enumerating block pairs.  Lossless: the
   final banded levenshtein verifies every survivor, and strings too
   short for the bound to bite route through the dense block path.
4. **Edit distance stays JVM-side**: `F.levenshtein` is a built-in
   codegen expression (no Python); the threshold form bands the DP to
   O(len x d).  DuckDB's `levenshtein` computes the identical classic
   metric, so the whole operator is differentially testable -- integer
   distances, no float drift.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def fuzzy_blocked_pairs(
    df: DataFrame,
    key_col: str,
    id_col: str,
    max_dist: int = 3,
    block_expr=None,
) -> DataFrame:
    """All (id_a < id_b) pairs whose `key_col` strings are within
    `max_dist` edits, candidate-limited to equal `block` values.

    `block_expr` defaults to the key's first whitespace token.  Output:
    (id_a, id_b, block, dist), dist <= max_dist.  Pairs whose keys
    fall in different blocks are NOT found (blocking is a recall
    trade, exactly like LSH banding) -- the differential harness pins
    the within-block semantics exactly.
    """
    if max_dist < 0:
        raise ValueError("max_dist must be >= 0")
    block = (
        block_expr
        if block_expr is not None
        else F.split_part(F.col(key_col), F.lit(" "), F.lit(1))
    )
    side = df.select(
        F.col(id_col).alias("id"),
        F.col(key_col).alias("key"),
        block.alias("block"),
        F.length(key_col).alias("len"),
    )
    a, b = side.alias("a"), side.alias("b")
    joined = a.join(
        b,
        (F.col("a.block") == F.col("b.block"))
        & (F.col("a.id") < F.col("b.id"))
        # length-band prune: |len(a)-len(b)| > d implies dist > d, so
        # the cheap predicate runs before the O(len^2) kernel
        & (F.abs(F.col("a.len") - F.col("b.len")) <= max_dist),
    )
    # the threshold form bands the DP to O(len x max_dist) and exits
    # early, returning -1 beyond the bound -- the kernel-side analogue
    # of the length prune (3-4x cheaper than the full O(len^2) table
    # at max_dist << len)
    return (
        joined.select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.block").alias("block"),
            F.levenshtein(
                F.col("a.key"), F.col("b.key"), max_dist
            ).alias("dist"),
        )
        .where(F.col("dist") >= 0)
    )


def fuzzy_qgram_pairs(
    df: DataFrame,
    key_col: str,
    id_col: str,
    max_dist: int = 5,
    q: int = 3,
    block_expr=None,
) -> DataFrame:
    """`fuzzy_blocked_pairs` semantics (same blocks, same output, same
    distances) via the q-gram count filter: candidates are generated
    from an inverted q-gram index instead of enumerating every block
    pair, then verified with the banded levenshtein kernel.

    Count bound: edit distance <= d can destroy at most d*q of a
    string's len - q + 1 positional q-grams, so a true pair shares at
    least max(len_a, len_b) - q + 1 - d*q grams (multiset-counted:
    occurrences are numbered so 'aaaa' matching 'aaaa' counts each
    copy once).  Pairs failing the bound never reach the kernel;
    strings shorter than (d+1)*q -- where the bound is vacuous -- fall
    back to the dense block join, so the composition is LOSSLESS and
    the direct-join oracle still matches exactly.

    Scale: the gram join shuffles on (block, gram, occ) -- the
    inverted-index discipline of dedup.ngram_jaccard_pairs -- and the
    kernel runs only on pairs that share enough content to possibly
    match.  Hot grams stay bounded by their block.
    """
    if max_dist < 0:
        raise ValueError("max_dist must be >= 0")
    if q < 1:
        raise ValueError("q must be >= 1")
    block = (
        block_expr
        if block_expr is not None
        else F.split_part(F.col(key_col), F.lit(" "), F.lit(1))
    )
    side = df.select(
        F.col(id_col).alias("id"),
        F.col(key_col).alias("key"),
        block.alias("block"),
        F.length(key_col).alias("len"),
    )
    # The count bound for a PAIR is vacuous iff max(len_a, len_b) <
    # min_len (then bound <= 0: the pair can share zero grams and still
    # match) -- which requires BOTH strings short.  So: short x short
    # pairs go through the dense block join; every pair with at least
    # one string of len >= min_len has bound >= 1 and is findable
    # through the gram index PROVIDED ALL strings are indexed (a
    # straddling short-long pair needs the short side's grams too).
    # The __lmax >= min_len filter on the gram side keeps the two
    # partitions disjoint (no duplicated pairs).
    min_len = (max_dist + 1) * q
    dense = fuzzy_blocked_pairs(
        side.where(F.col("len") < min_len),
        key_col="key",
        id_col="id",
        max_dist=max_dist,
        block_expr=F.col("block"),
    )

    # positional q-grams with per-(id, gram) occurrence numbers: the
    # (gram, occ) equi-join computes MULTISET intersection counts
    grams = side.where(F.col("len") >= q).select(
        "id",
        "block",
        "len",
        F.posexplode(
            F.expr(
                f"transform(sequence(1, len - {q} + 1), "
                f"p -> substring(key, p, {q}))"
            )
        ).alias("__pos", "gram"),
    ).withColumn(
        "occ",
        F.row_number().over(
            Window.partitionBy("id", "gram").orderBy("__pos")
        ),
    )
    ga, gb = grams.alias("ga"), grams.alias("gb")
    common = (
        ga.join(
            gb,
            (F.col("ga.block") == F.col("gb.block"))
            & (F.col("ga.gram") == F.col("gb.gram"))
            & (F.col("ga.occ") == F.col("gb.occ"))
            & (F.col("ga.id") < F.col("gb.id"))
            & (
                F.abs(F.col("ga.len") - F.col("gb.len")) <= max_dist
            ),
        )
        .groupBy(
            F.col("ga.id").alias("id_a"),
            F.col("gb.id").alias("id_b"),
            F.col("ga.block").alias("block"),
            F.greatest(F.col("ga.len"), F.col("gb.len")).alias("__lmax"),
        )
        .agg(F.count("*").alias("__common"))
        .where(
            # short x short pairs (vacuous bound) belong to the dense
            # partition -- dropping them here keeps the union disjoint
            (F.col("__lmax") >= min_len)
            & (
                F.col("__common")
                >= F.col("__lmax") - F.lit(q - 1) - F.lit(max_dist * q)
            )
        )
    )
    keys = side.select("id", "key")
    verified = (
        common.join(keys.select(F.col("id").alias("id_a"), F.col("key").alias("__ka")), "id_a")
        .join(keys.select(F.col("id").alias("id_b"), F.col("key").alias("__kb")), "id_b")
        .select(
            "id_a",
            "id_b",
            "block",
            F.levenshtein(F.col("__ka"), F.col("__kb"), max_dist).alias(
                "dist"
            ),
        )
        .where(F.col("dist") >= 0)
    )
    return verified.unionByName(dense)
