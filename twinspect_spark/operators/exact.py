"""Exact-duplicate operators (SURVEY.md §2.4, D1/D2/D5).

Reference analog: blake3-set dedupe during corpus build
(twinspect/datasets/newsedits.py:200-232) and duplicate-content integrity
errors (integrity.py:150-156). Spark-first: hash-groupBy, no global
driver-side "seen" set.

Scale note: exact-dup collapse runs BEFORE LSH (SURVEY.md §4 item 1) —
byte-identical boilerplate (licenses, generated code) otherwise lands
millions of rows in single LSH band buckets. The collapse is one
map-side-combinable aggregation on sha256.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def exact_dup_groups(ingested: DataFrame) -> DataFrame:
    """D5: sha256 groups with >1 member → (sha256, n_dups, file_ids)."""
    return (
        ingested.groupBy("sha256")
        .agg(
            F.count("*").alias("n_dups"),
            F.sort_array(F.collect_list("file_id")).alias("file_ids"),
        )
        .where(F.col("n_dups") > 1)
    )


def collapse_exact_dups(ingested: DataFrame) -> tuple[DataFrame, DataFrame]:
    """D1: keep one representative row per sha256 (min file_id — stable
    regardless of partitioning); return (representatives, exact_edges).

    exact_edges(a, b) connect each representative to its duplicates so
    the final connected-components stage reunites exact copies with the
    near-dup graph. Implemented as agg + self-semi-join, not a window:
    ``groupBy(sha256).min(file_id)`` gets map-side partial aggregation,
    while ``row_number() over (partition by sha256)`` would sort every
    partition.
    """
    reps = ingested.groupBy("sha256").agg(F.min("file_id").alias("rep_id"))
    with_rep = ingested.join(reps, "sha256")
    representatives = with_rep.where(F.col("file_id") == F.col("rep_id")).drop("rep_id")
    exact_edges = (
        with_rep.where(F.col("file_id") != F.col("rep_id"))
        .select(F.col("rep_id").alias("a"), F.col("file_id").alias("b"))
    )
    return representatives, exact_edges
