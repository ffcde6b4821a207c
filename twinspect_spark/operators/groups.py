"""Per-cluster group refinement via applyInPandas (SURVEY.md A9).

Reference analog: ``filter_by_similarity`` (twinspect/datasets/
newsedits.py:95-136) — inside one version-group, greedily keep the
largest subset whose members are all pairwise-similar, dropping hangers-
on that only chain transitively. Clusters are tiny (a handful of edit
variants of one original), so the quadratic per-group work is the
textbook ``groupBy(cluster).applyInPandas`` case: Spark shuffles rows to
their group, the kernel runs vectorized numpy per group, and no group
ever crosses an executor boundary.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from twinspect_spark.config import DedupConfig

GROUP_SCHEMA = "cluster_id long, file_id long, group_size int"


def largest_similar_group(
    clustered: DataFrame, cfg: DedupConfig, threshold: float | None = None
) -> DataFrame:
    """clustered(file_id, cluster_id, content_norm) → the largest
    all-pairwise-similar subset of each multi-member cluster:
    (cluster_id, file_id, group_size). Seed member = most neighbors at
    ``threshold`` (min file_id on ties); kept = seed + its direct
    neighbors, mirroring the reference's greedy pick (newsedits.py:124-133).
    """
    t = cfg.jaccard_threshold if threshold is None else threshold
    k = cfg.shingle_size
    # Giant-cluster guard: the kernel's pairwise loop is O(n²·|shingles|)
    # scalar Python — safe for the tiny clusters this operator exists for,
    # lethal if a pathological mega-cluster (boilerplate fused by CC)
    # lands on one executor. Cap kernel input at the same knob that caps
    # all-pairs generation upstream (cfg.chain_bucket_size), deterministic
    # lowest-file_id members kept — by construction no group can exceed it.
    cap = max(2, cfg.chain_bucket_size)

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        from twinspect_spark.functions import hashing as H

        pdf = pdf.sort_values("file_id").reset_index(drop=True)
        if len(pdf) > cap:
            pdf = pdf.iloc[:cap].reset_index(drop=True)
        n = len(pdf)
        if n < 2:
            return pd.DataFrame(
                {
                    "cluster_id": pdf["cluster_id"],
                    "file_id": pdf["file_id"],
                    "group_size": np.ones(n, dtype="int32"),
                }
            )
        sets = [H.shingle_hashes(c or "", k) for c in pdf["content_norm"]]
        sim = np.eye(n, dtype=bool)
        for i in range(n):
            for j in range(i + 1, n):
                inter = np.intersect1d(
                    sets[i], sets[j], assume_unique=True
                ).size
                union = sets[i].size + sets[j].size - inter
                sim[i, j] = sim[j, i] = union > 0 and inter / union >= t
        counts = sim.sum(axis=1)
        seed = int(np.argmax(counts))  # argmax → lowest index on ties,
        # and rows are file_id-sorted, so ties break to min file_id
        keep = np.flatnonzero(sim[seed])
        return pd.DataFrame(
            {
                "cluster_id": pdf["cluster_id"].iloc[keep],
                "file_id": pdf["file_id"].iloc[keep],
                "group_size": np.full(keep.size, keep.size, dtype="int32"),
            }
        )

    return (
        clustered.select("cluster_id", "file_id", "content_norm")
        .groupBy("cluster_id")
        .applyInPandas(kernel, GROUP_SCHEMA)
    )
