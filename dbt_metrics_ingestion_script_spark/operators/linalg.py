"""Distributed linear algebra over embedding columns (EXT).

Power iteration for the top principal component.  PCA at corpus scale
never materializes the covariance: power iteration only needs the
matrix-vector product C v = sum_rows (x_c . v) x_c, which is one
map-side dot product per row plus one dimension-keyed aggregation --
the same two-step any parameter-server SGD round pays.  Five fixed
rounds from a deterministic start vector, with per-round 9-dp
re-rounding of the unit vector so the iteration is bit-stable across
engines (the PageRank/k-means trace discipline applied to linear
algebra; see queries_temporal._pagerank_oracle).

Scale shape per round: ONE scan of the (staged) centered frame, a
64-row shuffle keyed by dimension, and a 1-row broadcast of the
current vector.  The loop builds one plan -- no per-round action; at
production scale `centered.persist()` turns the five scans into one
materialization plus four cache reads.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .similarity import as_double, dot


def pca_power_iteration(
    embeddings: DataFrame,
    dim: int,
    iters: int = 5,
    vec_col: str = "embedding",
) -> DataFrame:
    """Top principal component of `vec_col` (fixed width `dim`) via
    `iters` rounds of power iteration on the centered data.

    Output: one row per dimension -- (dim 1-based, loading rounded to
    6 dp, lambda_hat the final pre-normalization norm, the eigenvalue
    estimate of the UNSCALED scatter matrix A^T A).  Deterministic:
    v0 = 1/sqrt(dim) in every coordinate, per-round components round
    to 9 dp AFTER unit normalization, so two engines running the same
    recurrence agree bit-for-bit.  Rows whose vector is not exactly
    `dim` wide are excluded (degenerate inputs must not kill the job).
    """
    if iters < 1:
        raise ValueError("iters must be >= 1")
    base = embeddings.where(F.size(vec_col) == dim).select(
        as_double(vec_col).alias("x")
    )
    # per-dimension mean, rounded 9 dp (both engines replay the same mu,
    # so centering introduces no drift)
    mu_rows = (
        base.select(F.posexplode("x").alias("pos", "val"))
        .groupBy("pos")
        .agg(F.round(F.avg("val"), 9).alias("m"))
    )
    mu = mu_rows.agg(
        F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("ms")
    ).select(F.transform("ms", lambda t: t["m"]).alias("mv"))
    centered = base.crossJoin(F.broadcast(mu)).select(
        F.zip_with("x", "mv", lambda a, b: a - b).alias("xc")
    )

    v = F.array(*[F.lit(1.0 / dim**0.5)] * dim)
    v_frame = centered.sparkSession.range(1).select(v.alias("v"))
    w_frame = None
    for _ in range(iters):
        scored = centered.crossJoin(F.broadcast(v_frame)).select(
            "xc", dot(F.col("xc"), F.col("v")).alias("s")
        )
        w = (
            scored.select(F.col("s"), F.posexplode("xc").alias("pos", "val"))
            .groupBy("pos")
            .agg(F.sum(F.col("val") * F.col("s")).alias("w"))
        )
        w_arr = w.agg(
            F.array_sort(F.collect_list(F.struct("pos", "w"))).alias("ws")
        ).select(F.transform("ws", lambda t: t["w"]).alias("w"))
        # stage the norm in its own projection (lambda/expr-reuse
        # discipline), then round unit components at 9 dp
        w_frame = w_arr.select(
            "w",
            F.sqrt(
                F.aggregate("w", F.lit(0.0), lambda acc, x: acc + x * x)
            ).alias("nrm"),
        )
        v_frame = w_frame.select(
            F.transform("w", lambda x: F.round(x / F.col("nrm"), 9)).alias(
                "v"
            )
        )
    return w_frame.select(
        F.posexplode(
            F.transform("w", lambda x: F.round(x / F.col("nrm"), 9))
        ).alias("pos", "unit"),
        F.round("nrm", 6).alias("lambda_hat"),
    ).select(
        (F.col("pos") + 1).cast("int").alias("dim"),
        F.round("unit", 6).alias("loading"),
        "lambda_hat",
    )
