"""End-to-end dedup pipeline: files → signatures → candidates → verified
pairs → clusters.

Stage graph (each stage a checkpointable DataFrame, SURVEY.md §7):

    files ──ingest──► ingested ──collapse exact dups──► reps
      reps ──pandas UDF──► signatures
      signatures ──LSH bands──► cand_lsh ─┐
      signatures ──SimHash chunks──► cand_sim ─┤──union+distinct──► candidates
      candidates ──verify (cheap→expensive)──► pairs
      pairs(verified) ∪ exact_edges ──iterative CC──► clusters

The reference runs the analogous stages imperatively per benchmark
(twinspect/__main__.py:42-63); here each stage is a declarative plan and
Catalyst owns the physical strategy.
"""

from __future__ import annotations

import time
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from twinspect_spark.config import DedupConfig
from twinspect_spark.ingest import ingest_files
from twinspect_spark.operators.cc import connected_components
from twinspect_spark.operators.exact import collapse_exact_dups
from twinspect_spark.operators.lsh import band_table, lsh_candidates
from twinspect_spark.operators.simhash_ball import simhash_candidates
from twinspect_spark.operators.verify import (
    estimate_filter_candidates,
    verify_pairs,
)
from twinspect_spark.signatures import compute_signatures


@dataclass
class DedupResult:
    ingested: DataFrame
    signatures: DataFrame
    candidates: DataFrame
    pairs: DataFrame
    clusters: DataFrame
    stage_seconds: dict[str, float] | None = None  # when stages materialized


def run_dedup(
    files: DataFrame,
    cfg: DedupConfig | None = None,
    materialize_stages: bool = True,
) -> DedupResult:
    """Full pipeline over files(repo, path, commit, lang, content).

    Stage materialization (``materialize_stages``, default on) cuts each
    stage boundary with ``localCheckpoint``: downstream plans read the
    materialized result instead of inlining the upstream subtree. This is
    load-bearing twice over —
      * correctness of cost: one fused mega-plan re-executes shared
        subtrees (signatures feed 4 consumers; measured 172 s fused vs
        ~20 s staged at SF=0.1), and AQE only sees real row counts /
        sizes at materialized boundaries (broadcast decisions, skew
        splits);
      * it is the in-memory twin of the parquet stage-checkpoint manifest
        (plans/manifest.py) that gives the production pipeline
        restartability — same cut points, durable medium.
    """
    cfg = cfg or DedupConfig()
    stage_seconds: dict[str, float] = {}

    def cut(df: DataFrame, stage: str = "") -> DataFrame:
        if not materialize_stages:
            return df
        t0 = time.perf_counter()
        out = df.localCheckpoint()  # eager: materializes the stage now
        if stage:
            stage_seconds[stage] = round(time.perf_counter() - t0, 2)
        return out

    ingested = cut(ingest_files(files, cfg), "ingest")

    reps, exact_edges = collapse_exact_dups(ingested)
    signatures = cut(compute_signatures(reps, cfg), "signatures")

    cand_lsh = lsh_candidates(
        band_table(signatures, cfg), cfg, dedupe=False
    ).withColumn("src", F.lit("lsh"))
    cand_sim = simhash_candidates(signatures, cfg, dedupe=False).select(
        "a", "b", F.lit("simhash").alias("src")
    )
    # SO3 pair-dedup FIRST — (a,b,src) rows are the cheapest possible
    # shuffle — then the MinHash-estimate filter joins signature arrays
    # onto distinct pairs only (see estimate_filter_candidates for the
    # cost asymmetry), so only est-filtered survivors are materialized.
    raw = cand_lsh.unionByName(cand_sim.select("a", "b", "src"))
    deduped = raw.groupBy("a", "b").agg(F.min("src").alias("src"))
    candidates = cut(
        estimate_filter_candidates(deduped, signatures, cfg), "candidates"
    )

    pairs = cut(verify_pairs(candidates, ingested, cfg), "verify")
    edges = pairs.where("verified").select("a", "b").unionByName(exact_edges)
    t0 = time.perf_counter()
    clusters = connected_components(edges, vertices=ingested.select("file_id"))
    if materialize_stages:
        clusters = clusters.localCheckpoint()
        stage_seconds["cluster"] = round(time.perf_counter() - t0, 2)
    return DedupResult(
        ingested, signatures, candidates, pairs, clusters,
        stage_seconds or None,
    )
