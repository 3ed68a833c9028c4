"""Skew-aware aggregation: two-phase salted groupBy.

AQE's skew handling splits skewed *join* partitions, but a groupBy over
a power-law key (the norm in event/telemetry data: one tenant, one
event_type, one hot day dominates) still funnels each hot key through a
single reducer. Salting spreads phase 1 over `salt` sub-keys, then
phase 2 merges the tiny per-salt partials -- the hot key's work is
parallelized across `salt` tasks at the cost of one extra (cheap)
shuffle over partial rows.

Only re-aggregable measures can be salted (sum/count/min/max; avg as
sum+count pair). Exact count_distinct CAN be salted with one extra
condition: salt on the distinct column itself (salt_on=<distinct
expr>), which partitions the VALUE SPACE -- each salt bucket then holds
a disjoint slice of each key's distinct values, so per-bucket exact
distinct counts sum exactly. Salting on anything else double-counts;
`count_distinct_approx` (mergeable HLL sketches) has no such
constraint.

The salt column is derived deterministically from a stable hash of all
grouping values (pmod over xxhash64) rather than rand(): retries and
speculative tasks then produce identical partials, keeping the operator
idempotent under task re-execution.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# phase-1 partial -> phase-2 merge function per supported measure
_MERGE = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}


def _canon(c: Column) -> str:
    """Canonical expression string for best-effort equality of column
    expressions (Catalyst's toString; stable for the plain-column and
    simple-expression forms salt_on takes in practice).

    `Column._jc` is a classic-Spark private handle that does not exist
    under Spark Connect (ADVICE r4); fall back to `str(col)` there --
    same best-effort contract (the docstring of salted_agg already
    requires the SAME SPELLING on both sides), different renderer."""
    jc = getattr(c, "_jc", None)
    if jc is not None:
        try:
            return jc.toString()
        except Exception:
            pass
    return str(c)


def salted_agg(
    df: DataFrame,
    keys: list[str | Column],
    measures: dict[str, tuple[str, str]],
    salt: int = 16,
    salt_on: str | Column | None = None,
) -> DataFrame:
    """groupBy(keys).agg(measures) executed as salted two-phase
    aggregation.

    measures: output_name -> (method, column_expr), method in
    {sum, count, count_distinct_approx, min, max, avg}.
    salt_on: column whose hash picks the salt bucket (defaults to a
    deterministic row hash over all measure columns).
    """
    key_cols = [F.col(k) if isinstance(k, str) else k for k in keys]
    if salt_on is None:
        salt_src = F.concat_ws(
            "\x1f", *[F.expr(expr).cast("string") for _, expr in measures.values()]
        )
    else:
        salt_src = F.col(salt_on) if isinstance(salt_on, str) else salt_on
    salted = df.withColumn("__salt", F.pmod(F.xxhash64(salt_src), F.lit(salt)))

    partials: list[Column] = []
    finals: list[Column] = []
    for name, (method, expr) in measures.items():
        e = F.expr(expr)
        if method in ("sum", "min", "max"):
            partials.append({"sum": F.sum, "min": F.min, "max": F.max}[method](e).alias(f"__p_{name}"))
            finals.append(_MERGE[method](f"__p_{name}").alias(name))
        elif method == "count":
            partials.append(F.count(e).alias(f"__p_{name}"))
            finals.append(F.sum(f"__p_{name}").alias(name))
        elif method == "avg":
            partials.append(F.sum(e).alias(f"__ps_{name}"))
            partials.append(F.count(e).alias(f"__pc_{name}"))
            finals.append(
                (F.sum(f"__ps_{name}") / F.sum(f"__pc_{name}")).alias(name)
            )
        elif method == "count_distinct":
            if salt_on is None:
                raise ValueError(
                    f"measure {name!r}: exact count_distinct requires "
                    "salt_on=<the distinct column> so salt buckets "
                    "partition the value space (disjoint slices sum exactly)"
                )
            # ADVICE r2 c: per-bucket exact distinct counts only sum
            # exactly when the buckets slice the DISTINCT VALUE SPACE --
            # i.e. the salt hashes the distinct expression itself.  Any
            # other salt_on spreads one value across buckets and
            # double-counts it, silently.  Compare canonical expression
            # strings (best-effort: catches the name-level mismatch this
            # guards against; exotic but equivalent spellings should use
            # the same spelling on both sides).
            if _canon(e) != _canon(salt_src):
                raise ValueError(
                    f"measure {name!r}: exact count_distinct is salted on "
                    f"{_canon(salt_src)!r} but counts distinct "
                    f"{_canon(e)!r}; salt buckets must partition the "
                    f"distinct value space, so salt_on must be that exact "
                    f"expression (or use count_distinct_approx, whose HLL "
                    f"sketches merge under any salt)"
                )
            partials.append(F.count_distinct(e).alias(f"__p_{name}"))
            finals.append(F.sum(f"__p_{name}").alias(name))
        elif method == "count_distinct_approx":
            # HLL sketches merge across salt buckets losslessly
            partials.append(F.hll_sketch_agg(e).alias(f"__p_{name}"))
            finals.append(
                F.hll_sketch_estimate(F.hll_union_agg(f"__p_{name}")).alias(name)
            )
        else:
            raise ValueError(
                f"measure {name!r}: method {method!r} is not salt-mergeable "
                "(exact count_distinct cannot be composed from partials)"
            )

    phase1 = salted.groupBy(*key_cols, F.col("__salt")).agg(*partials)
    out_keys = [c for c in phase1.columns if not c.startswith("__")]
    return phase1.groupBy(*[F.col(c) for c in out_keys]).agg(*finals)


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    salt_key: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Explicit skew-salted equi-join: the manual fallback for join-key
    skew in the places AQE's runtime skew split cannot reach (AQE only
    splits sort-merge partitions mid-shuffle; a join feeding a
    co-partitioned window, running inside a cached subtree, or running
    on an engine without AQE still funnels a hot key through one task).

    The BIG side gets a deterministic salt from `salt_key` (a unique or
    near-unique column -- retries and speculative tasks then re-derive
    identical salts, unlike rand()); the SMALL side is replicated once
    per salt value via a literal-array explode (no shuffle -- the
    replication happens map-side and multiplies the small side by
    n_salts, which is the price of spreading each hot key over n_salts
    reducers).  The join keys become (on..., __salt), so rows of one
    hot key land in n_salts different partitions.  The salt never
    changes the JOIN RESULT -- every big row still meets every matching
    small row exactly once (in its salt slice) -- so correctness is
    checkable against the plain join verbatim.

    `how` supports the left-preserving flavors ("inner", "left"); the
    small side is replicated, so right/full joins would duplicate
    unmatched small rows once per salt and are rejected.
    """
    if how not in ("inner", "left"):
        raise ValueError(
            f"salted_join supports how='inner'|'left', got {how!r} "
            f"(right/full would duplicate unmatched replicated rows)"
        )
    if "__salt" in big.columns or "__salt" in small.columns:
        raise ValueError("columns collide with internal name '__salt'")
    big_s = big.withColumn(
        "__salt", F.pmod(F.xxhash64(F.col(salt_key)), F.lit(n_salts))
    )
    small_s = small.withColumn(
        "__salt",
        F.explode(F.array(*[F.lit(i).cast("bigint") for i in range(n_salts)])),
    )
    # force the shuffled-hash path: salting exists precisely for the
    # case where the small side is too big to broadcast (a broadcast
    # join has no reducer skew to fix) -- without the hint the local
    # fixture would broadcast and the plan under test would not be the
    # plan the operator is for
    return big_s.join(
        small_s.hint("shuffle_hash"), [*on, "__salt"], how
    ).drop("__salt")


def bloom_pruned_join(
    fact: DataFrame,
    dim: DataFrame,
    key_col: str,
    m_bits: int = 1 << 16,
    k: int = 2,
) -> DataFrame:
    """Semi-join reduction via a Bloom filter: prune fact rows that
    CANNOT match the (already filtered) dim side before the fact ever
    reaches the join exchange.  Result is exactly `fact.join(dim,
    key_col)` -- the Bloom pass has no false negatives, and the final
    equi-join discards its false positives -- so the oracle for any
    query using this strategy is the plain join.

    Shape: the dim's keys hash (portable 31-bit family,
    functions/hashing.py) to k bit positions, carried as a DISTINCT
    position frame (<= m_bits ints, usually far fewer).  The fact side
    then passes k chained BROADCAST LEFT SEMI joins -- one per hash
    function, each a map-side probe, ZERO shuffles -- before the real
    join.  At 100 TB this is the explicit form of a runtime filter:
    fact rows failing any probe never shuffle, which is the entire
    cost of a selective fact<->dim join.  (AQE injects bloom runtime
    filters for some shapes; this form is engine-portable, works under
    any plan, and its pruning decisions replay in the DuckDB oracle.)

    NULL fact keys hash like any value but cannot equi-join; they are
    dropped up front, matching the inner join's own semantics.
    """
    from ..functions.hashing import family_hash, hash31

    if k < 1 or m_bits < 2:
        raise ValueError(f"need k >= 1 and m_bits >= 2, got k={k}, m_bits={m_bits}")
    dim_h = dim.select(
        hash31(F.col(key_col).cast("string")).alias("__h")
    ).where(F.col(key_col).isNotNull())
    bloom = (
        dim_h.select(
            F.explode(
                F.array(*[(family_hash(F.col("__h"), j) % m_bits) for j in range(k)])
            ).alias("__pos")
        )
        .distinct()
    )
    cand = fact.where(F.col(key_col).isNotNull()).withColumn(
        "__fh", hash31(F.col(key_col).cast("string"))
    )
    for j in range(k):
        cand = cand.join(
            F.broadcast(bloom),
            (family_hash(F.col("__fh"), j) % m_bits) == F.col("__pos"),
            "left_semi",
        )
    return cand.drop("__fh").join(dim, key_col)
