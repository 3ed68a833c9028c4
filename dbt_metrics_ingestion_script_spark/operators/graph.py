"""Distributed graph statistics over pair frames (EXT).

The dedup family emits *pair graphs* (near-dup candidates, semantic
edges); connected components (operators/dedup.py) answers "which rows
collapse together".  This module answers the orthogonal health
question -- how CLUSTERED is the duplication graph -- via triangle
counting, the canonical distributed-graph benchmark:

- a corpus whose near-dup graph is triangle-dense collapses into few
  big clusters (template farms, mirrors);
- a triangle-free graph of the same edge count is pairwise noise.

Algorithm: edges arrive id-oriented (id_a < id_b), so every triangle
a < b < c is counted exactly once as the wedge (a,b)+(b,c) closed by
(a,c) -- two self-equi-joins of the edge frame, the standard
node-iterator formulation.  At 100 TB the refinement is degree
ordering (orient each edge low-degree -> high-degree before the wedge
join) so hub vertices don't fan out quadratically; with id orientation
the wedge fan-out is bounded by per-id edge counts, which the LSH
band geometry already caps here.  Wedge counts come from a plain
degree aggregate; the global clustering coefficient is
3 * triangles / wedges.

The edge frame is referenced three times (degrees, wedge side, closing
side): pass a persisted/materialized frame at scale or Spark re-derives
it per reference (the duplicate_clusters persist discipline).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def triangle_stats(
    edges: DataFrame,
    a_col: str = "id_a",
    b_col: str = "id_b",
    eager: bool = True,
) -> DataFrame:
    """One row: (n_edges, n_wedges, n_triangles, clustering_coeff)
    for an id-oriented simple edge frame (a < b, no duplicates --
    callers dedup upstream; duplicate edges would double-count).

    clustering_coeff = 3 * triangles / wedges (0 when wedge-free),
    rounded to 6 decimals; every other output is an exact integer.

    The edge frame is referenced three times (degrees + both wedge
    sides) and Spark re-derives unpersisted subtrees per reference --
    for a derived edge frame (an LSH candidate build) that triples the
    expensive part.  `eager=True` (default) therefore persists the
    edges, collects the ONE result row driver-side, unpersists, and
    returns it as a literal frame -- the stats-aggregate collect
    pattern, with no leaked cache.  Pass eager=False to keep the fully
    lazy, composable plan (right when the caller already persists
    edges or needs this inside a bigger plan).
    """
    if eager:
        spark = edges.sparkSession
        cached = edges.persist()
        try:
            row = triangle_stats(
                cached, a_col=a_col, b_col=b_col, eager=False
            ).collect()[0]
        finally:
            cached.unpersist()
        return spark.createDataFrame(
            [row],
            "n_edges long, n_wedges long, n_triangles long, "
            "clustering_coeff double",
        )
    e = edges.select(F.col(a_col).alias("a"), F.col(b_col).alias("b"))
    n_edges = e.agg(F.count("*").alias("n_edges"))
    deg = (
        e.select(F.col("a").alias("v"))
        .unionAll(e.select(F.col("b").alias("v")))
        .groupBy("v")
        .agg(F.count("*").alias("d"))
    )
    wedges = deg.agg(
        F.coalesce(
            F.sum(F.expr("(d * (d - 1)) DIV 2")), F.lit(0)
        ).alias("n_wedges")
    )
    e1, e2, e3 = e.alias("e1"), e.alias("e2"), e.alias("e3")
    tri = (
        e1.join(e2, F.col("e1.b") == F.col("e2.a"))
        .join(
            e3,
            (F.col("e3.a") == F.col("e1.a"))
            & (F.col("e3.b") == F.col("e2.b")),
        )
        .agg(F.count("*").alias("n_triangles"))
    )
    return (
        n_edges.crossJoin(wedges)
        .crossJoin(tri)
        .select(
            "n_edges",
            "n_wedges",
            "n_triangles",
            F.round(
                3.0 * F.col("n_triangles")
                / F.greatest(F.col("n_wedges"), F.lit(1)),
                6,
            ).alias("clustering_coeff"),
        )
    )
