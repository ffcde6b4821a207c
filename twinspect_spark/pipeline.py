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

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from twinspect_spark.config import DedupConfig
from twinspect_spark.ingest import ingest_files
from twinspect_spark.operators.cc import connected_components
from twinspect_spark.operators.exact import collapse_exact_dups
from twinspect_spark.operators.lsh import band_table, lsh_candidates
from twinspect_spark.operators.simhash_ball import simhash_candidates
from twinspect_spark.operators.verify import verify_pairs
from twinspect_spark.signatures import compute_signatures


@dataclass
class DedupResult:
    ingested: DataFrame
    signatures: DataFrame
    candidates: DataFrame
    pairs: DataFrame
    clusters: DataFrame


def run_dedup(files: DataFrame, cfg: DedupConfig | None = None) -> DedupResult:
    """Full pipeline over files(repo, path, commit, lang, content)."""
    cfg = cfg or DedupConfig()
    ingested = ingest_files(files, cfg)

    reps, exact_edges = collapse_exact_dups(ingested)
    signatures = compute_signatures(reps, cfg)

    cand_lsh = lsh_candidates(band_table(signatures, cfg), cfg).withColumn(
        "src", F.lit("lsh")
    )
    cand_sim = simhash_candidates(signatures, cfg).select(
        "a", "b", F.lit("simhash").alias("src")
    )
    # SO3: a pair found by both paths verifies once
    candidates = (
        cand_lsh.unionByName(cand_sim)
        .groupBy("a", "b")
        .agg(F.min("src").alias("src"))
    )

    pairs = verify_pairs(candidates, ingested, cfg)
    edges = pairs.where("verified").select("a", "b").unionByName(exact_edges)
    clusters = connected_components(edges, vertices=ingested.select("file_id"))
    return DedupResult(ingested, signatures, candidates, pairs, clusters)
