"""Lineage resolution and graph traversal as DataFrame transforms.

Behavioral spec: /root/reference/dbt_metrics_to_datahub.py:218-254
(nodes-then-sources lookup, 3-part lowercase dataset name, WARN + skip
on miss) and :292-299 (per-metric depends_on fan-out joined back to a
CSV string), plus the manifest's parent_map adjacency lists
(/root/reference/test_manifest.json:414-431) for multi-hop chains.

Spark shape (SURVEY.md J1-J4): the nodes/sources dimensions are unioned
into one registry and **broadcast** -- at 100 TB of metrics (or facts)
the dimension side stays tiny, so resolution is a map-side hash join
with zero shuffle.  depends_on order is preserved deterministically via
posexplode + array_sort on (pos, urn), not collect_list order (which
Spark does not guarantee).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.strings import coalesce_nonempty
from ..functions.urns import dataset_urn


def dataset_registry(
    nodes: DataFrame, sources: DataFrame, platform: str = "dbt", env: str = "PROD"
) -> DataFrame:
    """Union nodes + sources into one (unique_id, dataset_urn) dimension.

    Name = lower(database.schema.(alias|identifier or name)) -- the
    `or` fallback skips empty strings (Python-or fidelity).
    Nodes win on id collisions (reference checks nodes first): enforced
    with a priority column rather than lookup order.
    """
    n = nodes.select(
        "unique_id",
        F.lit(0).alias("prio"),
        F.lower(
            F.concat_ws(
                ".", "database", "schema", coalesce_nonempty("alias", "name")
            )
        ).alias("dataset_name"),
    )
    s = sources.select(
        "unique_id",
        F.lit(1).alias("prio"),
        F.lower(
            F.concat_ws(
                ".", "database", "schema", coalesce_nonempty("identifier", "name")
            )
        ).alias("dataset_name"),
    )
    unioned = n.unionByName(s)
    best = unioned.groupBy("unique_id").agg(
        F.min_by("dataset_name", "prio").alias("dataset_name")
    )
    return best.select(
        "unique_id", dataset_urn("dataset_name", platform, env).alias("dataset_urn")
    )


def resolve_upstreams(
    metrics: DataFrame, registry: DataFrame
) -> DataFrame:
    """J2: explode depends_on, broadcast-join the registry, re-aggregate
    to a deterministic CSV string per metric.

    Output: (unique_id, upstream_datasets, n_unresolved).  Unresolvable
    node ids are dropped from the CSV but counted (reference WARNs and
    omits, /root/reference/dbt_metrics_to_datahub.py:253-254).
    Metrics with empty depends_on keep a row with NULL upstream_datasets.
    """
    exploded = metrics.select(
        "unique_id", F.posexplode_outer("depends_on").alias("pos", "node_id")
    )
    joined = exploded.join(
        F.broadcast(registry.withColumnRenamed("unique_id", "node_id")),
        on="node_id",
        how="left",
    )
    return joined.groupBy("unique_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(
                            F.col("dataset_urn").isNotNull(),
                            F.struct("pos", "dataset_urn"),
                        )
                    )
                ),
                lambda x: x["dataset_urn"],
            ),
            ", ",
        ).alias("upstream_datasets"),
        F.sum(
            F.when(
                F.col("node_id").isNotNull() & F.col("dataset_urn").isNull(), 1
            ).otherwise(0)
        ).alias("n_unresolved"),
    ).withColumn(
        "upstream_datasets",
        F.when(F.length("upstream_datasets") > 0, F.col("upstream_datasets")),
    )


def transitive_closure(edges: DataFrame, max_hops: int = 10) -> DataFrame:
    """J4: multi-hop lineage closure over (child, parent) edges.

    Iterative self-join BFS to fixpoint (bounded by max_hops).  Each
    iteration extends frontier paths by one hop and unions new pairs.
    Output: (descendant, ancestor, depth) with depth = hop count >= 1.

    Scale note: lineage graphs are metadata-sized (thousands of nodes),
    so the loop's shuffles are trivial; the depth bound also guards
    against cycles in malformed manifests.  For truly huge graphs this
    would move to an iterative checkpointed loop, same plan shape.
    """
    base = edges.select(
        F.col("child").alias("descendant"),
        F.col("parent").alias("ancestor"),
        F.lit(1).alias("depth"),
    ).distinct()
    closure = base
    frontier = base
    for _ in range(max_hops - 1):
        nxt = (
            frontier.join(
                base.select(
                    F.col("descendant").alias("ancestor"),
                    F.col("ancestor").alias("next_ancestor"),
                ),
                on="ancestor",
            )
            .select(
                "descendant",
                F.col("next_ancestor").alias("ancestor"),
                (F.col("depth") + 1).alias("depth"),
            )
            .join(closure.select("descendant", "ancestor"), ["descendant", "ancestor"], "left_anti")
            .distinct()
            # materialize each frontier: the emptiness probe is an action,
            # and without persist every hop would re-execute all prior hops
            .persist()
        )
        if nxt.isEmpty():
            nxt.unpersist()
            break
        closure = closure.unionByName(nxt)
        frontier = nxt
    return closure
