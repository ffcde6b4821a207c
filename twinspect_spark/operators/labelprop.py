"""Synchronous label-propagation community detection.

Third member of the iterative-graph family: connected components
(operators/cc.py) spreads the MIN label — it finds *reachability*;
PageRank (operators/pagerank.py) spreads *weighted mass*; label
propagation (Raghavan et al., Phys. Rev. E 76, 2007) spreads the
*majority* label — it finds dense communities inside one component,
the granularity a curation pipeline wants when a connected component
is too coarse (one shared boilerplate edge chains unrelated repos into
a single CC; their dense cores are still separable communities).

Determinism contract: classic LPA breaks ties randomly and iterates
asynchronously — both unacceptable here. This variant is synchronous
(round k+1 votes read ONLY round-k labels) for a FIXED round count,
and the per-node argmax orders by (vote count DESC, label ASC), so the
result is a pure function of the edge set: partition count, task
order, and visit order cannot change it, and a DuckDB oracle replays
every round as a chained CTE bit-exactly.

Scale shape per round: one join of the directed adjacency against the
node-sized label relation (at cluster scale pre-partition both by the
join key so only the groupBy exchanges), one map-side-combinable
groupBy (node, label) vote count, one node-partitioned window for the
argmax. Labels are localCheckpoint'd per round to truncate lineage —
the same idiom as the CC hash-min loop (cc.py:112-138).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def label_propagation(edges: DataFrame, rounds: int = 3) -> DataFrame:
    """edges(a: long, b: long) undirected → (node, community) after
    ``rounds`` synchronous majority-vote rounds (community = the label
    the node holds after the final round; initial label = own id).
    Duplicate edges act as vote weights; pre-``distinct`` if not
    wanted. Isolated ids never appear (nodes are defined by edges)."""
    from pyspark.sql import Window as W

    adj = (
        edges.select(F.col("a").alias("src"), F.col("b").alias("dst"))
        .unionByName(
            edges.select(F.col("b").alias("src"), F.col("a").alias("dst"))
        )
        .where(F.col("src") != F.col("dst"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    labels = (
        adj.select(F.col("src").alias("node"))
        .distinct()
        .select("node", F.col("node").alias("community"))
    )
    w = W.partitionBy("src").orderBy(
        F.col("votes").desc(), F.col("community").asc()
    )
    for _ in range(rounds):
        votes = (
            adj.join(labels, adj.dst == labels.node)
            .groupBy("src", "community")
            .agg(F.count(F.lit(1)).alias("votes"))
        )
        labels = (
            votes.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1)
            .select(F.col("src").alias("node"), "community")
            .localCheckpoint(eager=False)
        )
    return labels
