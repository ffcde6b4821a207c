"""SemDeDup: semantic deduplication of an embedding corpus
(Abbas et al., "SemDeDup: Data-efficient learning at web-scale through
semantic deduplication", arXiv:2303.09540, public).

Shape: k-means-cluster the embeddings (reusing the persisted IVF
quantizer — operators/ann.py), compute pairwise cosine ONLY within each
cell, connect pairs above eps into duplicate groups, and keep exactly
one member per group — the one FARTHEST from its centroid (lowest
centroid-cosine; the paper's keep rule, preserving the cell's outer
hull), vec_id as the deterministic tie-break.

Scale shape (10^9 embeddings): the pair join is keyed on cell, so
candidate volume is Σ|cell|² with k chosen so cells stay bounded (the
paper uses k ≈ n/10^4); the group resolution reuses the size-aware
connected-components operator (operators/cc.py). Nothing here is
all-pairs. Reference analog: cross-cluster dedupe semantics
(/root/reference/twinspect/datasets/newsedits.py:225-232) applied in
embedding space rather than hash space.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from twinspect_spark.operators.cc import connected_components

_PAIRS_SCHEMA = T.StructType(
    [
        T.StructField("a", T.LongType()),
        T.StructField("b", T.LongType()),
    ]
)


def cell_dup_pairs(
    members: DataFrame, eps: float, block: int = 1024
) -> DataFrame:
    """(vec_id, embedding, nrm, cell) → pairs(a, b) with
    round(cosine, 6) >= eps, computed per cell as BLOCKED numpy matmuls
    (one X·Xᵀ tile per `block` rows — the canonical SemDeDup kernel).
    A zip_with/aggregate column expression does the same dot but
    interpreted per element (~3 µs/pair measured); the tiled matmul is
    two orders faster and its memory is block·|cell| doubles regardless
    of cell size. Raw dot / norm-product matches the oracle's formula;
    blocked-sum FP order can differ from a sequential fold in the last
    ulp, ~6 orders below the round-to-6 comparison granularity."""

    def _pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        ids = pdf["vec_id"].to_numpy()
        order = np.argsort(ids)
        ids = ids[order]
        X = np.stack(pdf["embedding"].to_numpy()[order]).astype(np.float64)
        nrm = pdf["nrm"].to_numpy()[order]
        n = len(ids)
        out_a: list[np.ndarray] = []
        out_b: list[np.ndarray] = []
        for i0 in range(0, n, block):
            i1 = min(i0 + block, n)
            s = X[i0:i1] @ X.T
            s /= np.outer(nrm[i0:i1], nrm)
            np.round(s, 6, out=s)
            ii, jj = np.nonzero(s >= eps)
            keep = (ii + i0) < jj  # upper triangle: a < b by sorted ids
            out_a.append(ids[ii[keep] + i0])
            out_b.append(ids[jj[keep]])
        return pd.DataFrame(
            {"a": np.concatenate(out_a), "b": np.concatenate(out_b)}
        )

    return (
        members.select("vec_id", "embedding", "nrm", "cell")
        .groupBy("cell")
        .applyInPandas(_pairs, _PAIRS_SCHEMA)
    )


def semdedup_prune(members: DataFrame, eps: float) -> DataFrame:
    """members(vec_id, embedding, nrm, cell, ccos) →
    pruned(vec_id, keep_id, cell, cos_to_centroid): the rows SemDeDup
    removes, each pointing at the member kept in its place. The anti-
    join of `pruned` against the corpus is the deduplicated dataset;
    emitting removals keeps the output gate-sized and auditable."""
    edges = cell_dup_pairs(members, eps)
    comp = connected_components(edges)  # (file_id, cluster_id)
    rk = (
        comp.join(members, comp["file_id"] == members["vec_id"])
        .select("vec_id", "cluster_id", "cell", "ccos")
        .withColumn(
            "krn",
            F.row_number().over(
                Window.partitionBy("cluster_id").orderBy(
                    F.asc("ccos"), F.asc("vec_id")
                )
            ),
        )
    )
    # rk is dup-group-sized (edge endpoints only) and feeds two branches
    # (keep + pruned); without the cut, each branch re-runs the members
    # plan (assignment crossJoin + window) and the pair kernel
    rk = rk.localCheckpoint()
    keep = rk.where("krn = 1").select(
        "cluster_id", F.col("vec_id").alias("keep_id")
    )
    return (
        rk.where("krn > 1")
        .join(keep, "cluster_id")
        .select(
            "vec_id", "keep_id", "cell", F.col("ccos").alias("cos_to_centroid")
        )
    )
