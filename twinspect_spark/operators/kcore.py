"""Fixed-round k-core decomposition (iterative degree peel).

The density filter of the graph family: the k-core is the maximal
subgraph where every node keeps degree >= k, computed by repeatedly
deleting under-degree nodes. Curation pipelines use it to separate
structurally-embedded items (a module imported by a web of mutually
connected repos) from peripheral tendrils that PageRank still scores
and connected components cannot distinguish at all — completing the
reachability (cc.py) / weighted flow (pagerank.py) / label spread
(labelprop.py) / local density (triangles.py) operator set.

Determinism contract: the peel runs a FIXED number of synchronous
rounds (the pagerank/labelprop precedent) — each round drops ALL
currently-under-degree nodes at once, so the result is a pure function
of (graph, k, rounds), independent of partitioning and execution
order, and a SQL oracle can replay the rounds as chained CTEs. The
true k-core is the fixpoint; `converged` in the caller's hands is
"round R+1 drops nobody" (peeling is monotone, so R rounds always
OVER-approximates the k-core, never loses a member).

Scale shape: each round is one map-side-combinable degree count plus
two semi-joins of the edge list against the surviving-node set — the
same shuffle key (the node id) throughout, no all-pairs, no windows.
Lineage is truncated with a lazy localCheckpoint per round (the
operators/pagerank.py idiom) so R rounds never stack R plans.

Reference analog: twinspect's Graph.connected_components DFS
(/root/reference/twinspect/datasets/ultils.py:60-91) is the only graph
machinery in the reference; k-core generalizes the same adjacency
structure to density-thresholded membership.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def kcore_peel(edges: DataFrame, k: int, rounds: int) -> DataFrame:
    """Peel ``rounds`` synchronous under-degree rounds from the
    undirected graph given as an (src, dst) edge list (symmetrized and
    deduplicated here; self-loops dropped — a self-loop would let an
    isolated node count itself toward k). Returns (node, degree):
    surviving nodes with their induced-subgraph degree after the last
    round."""
    sym = (
        edges.select("src", "dst")
        .unionByName(
            edges.select(
                F.col("dst").alias("src"), F.col("src").alias("dst")
            )
        )
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )
    cur = sym
    for _ in range(rounds):
        deg = cur.groupBy("src").agg(F.count("*").alias("deg"))
        alive = deg.where(F.col("deg") >= k).select("src")
        cur = (
            cur.join(alive, "src", "left_semi")
            .join(
                alive.select(F.col("src").alias("dst")), "dst", "left_semi"
            )
            .localCheckpoint(eager=False)
        )
    return cur.groupBy("src").agg(
        F.count("*").cast("long").alias("degree")
    ).select(F.col("src").alias("node"), "degree")
