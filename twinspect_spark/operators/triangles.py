"""Degree-oriented distributed triangle census.

Triangle counting is the third graph operator after connected
components (operators/cc.py) and PageRank (operators/pagerank.py): the
local clustering coefficient it yields is the standard community /
link-farm signal a curation pipeline reads over dependency, citation,
or co-occurrence graphs (reference's graph surface is the adjacency
``Graph`` at twinspect/datasets/ultils.py:60-91; it has no triangle
query — this is a capability extension in the same family).

The naive plan — three-way self-join of the undirected edge list — is
a wedge explosion: a node of degree d contributes d·(d-1)/2 join rows,
so one hub dominates the shuffle. The classic MapReduce fix (Suri &
Vassilvitskii, WWW'11) orients every edge from the endpoint that is
smaller in the total order (degree, node) to the larger one. Then:

- every triangle has exactly ONE wedge whose pivot is its
  smallest-order vertex, so each triangle is found exactly once with
  no post-dedup;
- the out-degree of any vertex under this orientation is O(sqrt(m)),
  so the wedge relation is bounded by sum(outdeg^2) <= m^1.5
  regardless of how skewed the raw degree distribution is — the hub
  that breaks the naive join contributes almost NO wedges because
  nearly all its edges point toward it.

Scale shape: one groupBy for degrees, two joins to annotate endpoint
orders (degree relation is node-sized and hash-joins on the edge key),
one self-join of the oriented relation on the pivot, one equi-join
back to close wedges, one explode+groupBy for per-node counts. All
equi-joins — Catalyst/AQE pick broadcast vs shuffle per side; nothing
is quadratic in any degree.

Everything is integer arithmetic (the clustering coefficient is
emitted in parts-per-million via BIGINT floor division), so the result
is partition- and order-independent and a DuckDB oracle replays it
bit-exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PPM = 2_000_000  # 2 * 10^6: coefficient = 2T / (d (d-1)), scaled


def triangle_census(edges: DataFrame) -> DataFrame:
    """edges(a: long, b: long) undirected (orientation/duplicates/self
    loops tolerated — canonicalized internally) → one row per node:

      (node, degree, n_triangles, clustering_ppm)

    ``clustering_ppm`` = floor(2_000_000 * n_triangles /
    (degree * (degree - 1))), 0 for degree < 2.
    """
    und = (
        edges.select(
            F.least("a", "b").alias("u"), F.greatest("a", "b").alias("v")
        )
        .where(F.col("u") != F.col("v"))
        .distinct()
    )
    deg = (
        und.select(F.col("u").alias("node"))
        .unionByName(und.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("degree"))
    )

    # annotate both endpoints with their degree; orient by (degree, id)
    du = deg.select(F.col("node").alias("u"), F.col("degree").alias("du"))
    dv = deg.select(F.col("node").alias("v"), F.col("degree").alias("dv"))
    ann = und.join(du, "u").join(dv, "v")
    lo_first = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    oriented = ann.select(
        F.when(lo_first, F.col("u")).otherwise(F.col("v")).alias("src"),
        F.when(lo_first, F.col("v")).otherwise(F.col("u")).alias("dst"),
        F.when(lo_first, F.col("dv")).otherwise(F.col("du")).alias("ddst"),
    )

    # wedges at each pivot: ordered pairs of out-neighbors; close with
    # the oriented edge x -> y (orientation of (x, y) is forced by the
    # same total order, so one equi-join suffices)
    o1 = oriented.select(
        F.col("src").alias("p"), F.col("dst").alias("x"), F.col("ddst").alias("dx")
    )
    o2 = oriented.select(
        F.col("src").alias("p"), F.col("dst").alias("y"), F.col("ddst").alias("dy")
    )
    wedges = o1.join(o2, "p").where(
        (F.col("dx") < F.col("dy"))
        | ((F.col("dx") == F.col("dy")) & (F.col("x") < F.col("y")))
    )
    closer = oriented.select(F.col("src").alias("x"), F.col("dst").alias("y"))
    tris = wedges.join(closer, ["x", "y"]).select("p", "x", "y")

    members = (
        tris.select(F.col("p").alias("node"))
        .unionByName(tris.select(F.col("x").alias("node")))
        .unionByName(tris.select(F.col("y").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    return (
        deg.join(members, "node", "left")
        .select(
            "node",
            "degree",
            F.coalesce("n_triangles", F.lit(0)).alias("n_triangles"),
            F.when(
                F.col("degree") >= 2,
                F.expr(
                    f"cast({PPM} as bigint) * coalesce(n_triangles, 0)"
                    " div (degree * (degree - 1))"
                ),
            )
            .otherwise(F.lit(0))
            .cast("long")
            .alias("clustering_ppm"),
        )
    )
