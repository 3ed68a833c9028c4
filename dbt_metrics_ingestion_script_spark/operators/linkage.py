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
3. **Edit distance stays JVM-side**: `F.levenshtein` is a built-in
   codegen expression (no Python).  DuckDB's `levenshtein` computes the
   identical classic metric, so the whole operator is differentially
   testable -- integer distances, no float drift.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
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
    return (
        joined.select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.block").alias("block"),
            F.levenshtein(F.col("a.key"), F.col("b.key")).alias("dist"),
        )
        .where(F.col("dist") <= max_dist)
    )
