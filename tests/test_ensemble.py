"""Ensemble combination (J7): join-based alignment, concatenated lanes,
summed times, additive Hamming, misalignment detection."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from twinspect_spark.config import DedupConfig
from twinspect_spark.corpus import generate_corpus
from twinspect_spark.ingest import ingest_files
from twinspect_spark.operators.ensemble import (
    EnsembleMisalignment,
    combine_signatures,
    ensemble_hamming_expr,
)
from twinspect_spark.signatures import compute_signatures


@pytest.fixture(scope="module")
def two_sets(spark):
    corpus = generate_corpus(n_clusters=6, transforms_per_original=1, seed=4)
    ing = ingest_files(
        spark.createDataFrame(corpus.files), DedupConfig()
    ).localCheckpoint()
    a = compute_signatures(ing, DedupConfig(seed=42)).localCheckpoint()
    b = compute_signatures(ing, DedupConfig(seed=99)).localCheckpoint()
    return a, b


def test_combine_concat_and_sum(spark, two_sets):
    a, b = two_sets
    ens = combine_signatures(a, b)
    assert ens.count() == a.count()
    row = ens.limit(1).collect()[0]
    assert len(row["minhash"]) == 2 * DedupConfig().num_perm
    assert len(row["simhashes"]) == 2
    am = {r["file_id"]: r for r in a.collect()}
    bm = {r["file_id"]: r for r in b.collect()}
    for r in ens.collect():
        assert r["micros"] == am[r["file_id"]]["micros"] + bm[r["file_id"]]["micros"]
        assert r["simhashes"] == [
            am[r["file_id"]]["simhash"], bm[r["file_id"]]["simhash"]
        ]


def test_ensemble_hamming_additive(spark, two_sets):
    a, b = two_sets
    ens = combine_signatures(a, b)
    x = ens.alias("x")
    y = ens.alias("y")
    pairs = (
        x.join(y, F.col("x.file_id") < F.col("y.file_id"))
        .select(
            ensemble_hamming_expr(
                F.col("x.simhashes"), F.col("y.simhashes")
            ).alias("h128"),
            (
                F.bit_count(F.col("x.simhashes")[0].bitwiseXOR(F.col("y.simhashes")[0]))
                + F.bit_count(F.col("x.simhashes")[1].bitwiseXOR(F.col("y.simhashes")[1]))
            ).alias("want"),
        )
        .limit(50)
        .collect()
    )
    assert pairs
    for r in pairs:
        assert r["h128"] == r["want"]
        assert 0 <= r["h128"] <= 128


def test_misalignment_raises(spark, two_sets):
    a, b = two_sets
    with pytest.raises(EnsembleMisalignment):
        combine_signatures(a, b.limit(3))
    # unchecked mode degrades to inner-join semantics
    assert combine_signatures(a, b.limit(3), check=False).count() == 3
