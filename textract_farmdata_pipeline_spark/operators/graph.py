"""Iterative graph analytics on DataFrames (Pregel-style join–agg).

Connected components (dedup clustering) lives in
:mod:`.dedup`; this module holds rank propagation.  The pattern for
all of them: the edge relation is the stable, reused input — partition
it ONCE on the join key and persist, so every iteration's join
co-locates with the per-iteration rank table instead of re-shuffling
the (much larger) edge set; per-iteration state is one slim
``(node, rank)`` table; lineage is cut with ``localCheckpoint`` every
few rounds or the plan tree grows exponentially (measured in round 1
on connected components).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 10,
    damping: float = 0.85,
    checkpoint_every: int = 3,
) -> DataFrame:
    """Power-iteration PageRank over a directed edge list.

    Dangling nodes (no out-edges) donate their mass uniformly to every
    node each round — the standard correction that keeps total rank
    mass at exactly 1, pinned by tests.  Per iteration: one
    co-partitioned join edges⋈ranks on ``src``, one map-side-combinable
    ``groupBy(dst)``, one left join back onto the node set (nodes with
    no in-edges keep the teleport term only).  The dangling-mass scalar
    is the only driver-side value per round.

    Scale shape: the edge table is ``repartition(src)``-ed and persisted
    once; iteration state is ``(node, rank)`` — at 100 TB of edges the
    per-round shuffle is the rank table (nodes, not edges), plus the
    grouped contributions keyed by ``dst``.
    """
    nodes = (
        edges.select(F.col(src).alias("node"))
        .union(edges.select(F.col(dst).alias("node")))
        .distinct()
    )
    out_deg = edges.groupBy(src).agg(F.count("*").alias("_deg"))
    e = (
        edges.select(src, dst)
        .join(out_deg, src)
        .repartition(F.col(src))
        .persist()
    )
    try:
        n_nodes = nodes.count()
        ranks = nodes.withColumn("rank", F.lit(1.0 / n_nodes)).localCheckpoint()
        has_out = e.select(F.col(src).alias("node")).distinct()
        for it in range(iterations):
            dangling = (
                ranks.join(has_out, "node", "left_anti")
                .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("m"))
                .collect()[0]["m"]
            )
            contribs = (
                e.join(ranks, e[src] == ranks["node"])
                .select(F.col(dst).alias("node"), (F.col("rank") / F.col("_deg")).alias("c"))
                .groupBy("node")
                .agg(F.sum("c").alias("c"))
            )
            base = (1.0 - damping) / n_nodes + damping * dangling / n_nodes
            ranks = (
                nodes.join(contribs, "node", "left")
                .select(
                    "node",
                    (F.lit(base) + F.lit(damping) * F.coalesce("c", F.lit(0.0))).alias(
                        "rank"
                    ),
                )
            )
            if (it + 1) % checkpoint_every == 0 or it == iterations - 1:
                ranks = ranks.localCheckpoint()
        return ranks
    finally:
        e.unpersist()
