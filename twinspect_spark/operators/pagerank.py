"""Fixed-point PageRank over a DataFrame edge list.

The reference's only graph algorithm is DFS connected components
(twinspect/datasets/ultils.py:60-91); this engine already distributes
that (operators/cc.py). PageRank adds the *weighted* iterative-graph
family a curation pipeline uses for importance sampling over dependency
/ citation / link graphs (quality propagation a la Common Crawl host
ranks), expressed as K synchronized groupBy-join rounds.

Exactness contract: ranks are int64 fixed-point (``scale`` total mass).
Every step is integer arithmetic — contribution = rank DIV out-degree,
damping = (num * sum) DIV den — so results are independent of partition
count, task order, and summation order (integer addition is
associative; float PageRank is none of those). A DuckDB oracle can
therefore replay the K rounds as K chained CTEs and match bit-exactly.

Dangling nodes (no out-edges) are closed with self-loops BEFORE degree
computation: mass conservation then needs no second aggregate per round
(the standard redistribute-to-all term would need two passes over the
rank relation per iteration and an extra all-to-one aggregate).

Scale shape per iteration: one shuffle joining ranks to the
degree-annotated edge list on src (at cluster scale, pre-partition both
by src so the join is co-located and only the groupBy(dst) exchanges),
one map-side-combinable groupBy(dst), one join back to the static node
relation. The edge relation is localCheckpoint'd once; ranks are
localCheckpoint'd per round to truncate lineage (same idiom as the CC
hash-min loop, cc.py:112-138).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    iterations: int = 5,
    scale: int = 10**12,
    damping_num: int = 85,
    damping_den: int = 100,
) -> DataFrame:
    """edges(src: long, dst: long) → (node: long, rank_scaled: long).

    ``rank_scaled`` sums to ≈``scale`` (floor-division loss only).
    Duplicate edges count as parallel edges; pre-``distinct`` the input
    if multiplicity should not weight the walk.
    """
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint()
    )
    dangling = nodes.join(
        edges.select("src").distinct(),
        nodes.node == F.col("src"),
        "left_anti",
    ).select(F.col("node").alias("src"), F.col("node").alias("dst"))
    closed = edges.select("src", "dst").unionByName(dangling)
    deg = closed.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    e = closed.join(deg, "src").localCheckpoint()

    # in-plan N: one-row aggregate broadcast-crossed into the node
    # relation — no driver-side count materializes mid-plan
    n1 = nodes.agg(F.count(F.lit(1)).alias("n"))
    init = F.expr(f"cast({scale} as bigint) div n")
    base = F.expr(
        f"cast({damping_den - damping_num} as bigint)"
        f" * (cast({scale} as bigint) div n) div {damping_den}"
    )
    ranks = nodes.crossJoin(F.broadcast(n1)).select(
        "node", init.alias("rank_scaled"), base.alias("base")
    ).localCheckpoint(eager=False)

    for _ in range(iterations):
        contrib = (
            ranks.join(e, ranks.node == e.src)
            .select(
                "dst",
                F.expr("rank_scaled div outdeg").alias("c"),
            )
            .groupBy("dst")
            .agg(F.sum("c").alias("c"))
        )
        ranks = (
            ranks.select("node", "base")
            .join(contrib, F.col("node") == F.col("dst"), "left")
            .select(
                "node",
                (
                    F.col("base")
                    + F.expr(
                        f"cast({damping_num} as bigint)"
                        f" * coalesce(c, cast(0 as bigint)) div {damping_den}"
                    )
                ).alias("rank_scaled"),
                "base",
            )
            # lazy checkpoint: truncates lineage without the blocking
            # per-round job an eager one costs (an eager checkpoint per
            # round serializes K driver round-trips; ranks are
            # deterministic ints, so recompute-on-loss is safe)
            .localCheckpoint(eager=False)
        )
    return ranks.select("node", "rank_scaled")
