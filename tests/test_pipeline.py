"""End-to-end pipeline vs the brute-force oracle on the planted-cluster
corpus — the dup-pair-recall ≥ 0.99 gate from BASELINE.md, plus the
per-row sha256 invariant (BASELINE.json input_hint) and exact-dup /
determinism checks."""

from __future__ import annotations

import hashlib

import pytest

from twinspect_spark.config import DedupConfig
from twinspect_spark.corpus import generate_corpus
from twinspect_spark.oracle import run_oracle
from twinspect_spark.pipeline import run_dedup

CFG = DedupConfig(jaccard_threshold=0.7)


@pytest.fixture(scope="module")
def corpus():
    return generate_corpus(n_clusters=30, transforms_per_original=3,
                           n_distractors=40, n_exact_dups=8, seed=7)


@pytest.fixture(scope="module")
def oracle(corpus):
    return run_oracle(corpus.files, CFG)


@pytest.fixture(scope="module")
def result(spark, corpus):
    files = spark.createDataFrame(corpus.files)
    return run_dedup(files, CFG)


@pytest.fixture(scope="module")
def key_maps(result, oracle):
    """(repo,path,commit) → spark file_id and → oracle file_id."""
    spark_ids = {
        (r["repo"], r["path"], r["commit"]): r["file_id"]
        for r in result.ingested.select("repo", "path", "commit", "file_id").collect()
    }
    oracle_ids = {
        (r.repo, r.path, r.commit): r.file_id
        for r in oracle.rows.itertuples(index=False)
    }
    return spark_ids, oracle_ids


def test_sha256_invariant(result, corpus):
    """Per-row invariant vs reference ingest: sha256(content) equality."""
    got = {
        (r["repo"], r["path"], r["commit"]): r["sha256"]
        for r in result.ingested.select("repo", "path", "commit", "sha256").collect()
    }
    for row in corpus.files.itertuples(index=False):
        expect = hashlib.sha256(row.content.encode()).hexdigest()
        assert got[(row.repo, row.path, row.commit)] == expect


def test_signature_parity_with_oracle(result, oracle, key_maps):
    """Spark pandas-UDF signatures == oracle scalar signatures, row by row."""
    spark_ids, oracle_ids = key_maps
    sig_by_id = {
        r["file_id"]: (r["minhash"], r["simhash"])
        for r in result.signatures.select("file_id", "minhash", "simhash").collect()
    }
    checked = 0
    for r in oracle.rows.itertuples(index=False):
        key = (r.repo, r.path, r.commit)
        sid = spark_ids[key]
        if sid not in sig_by_id:   # exact-dup non-representatives skipped
            continue
        mh, sim = sig_by_id[sid]
        assert list(mh) == list(r.minhash), f"minhash mismatch at {key}"
        assert sim == r.simhash, f"simhash mismatch at {key}"
        checked += 1
    assert checked > 50


def _spark_cluster_by_oracle_id(result, key_maps):
    spark_ids, oracle_ids = key_maps
    sid_to_cluster = {
        r["file_id"]: r["cluster_id"]
        for r in result.clusters.collect()
    }
    return {
        oracle_ids[key]: sid_to_cluster[sid] for key, sid in spark_ids.items()
    }


def test_dup_pair_recall_ge_099(result, oracle, key_maps):
    """≥99% of oracle dup pairs (exact Jaccard ≥ threshold, plus exact
    dups) end up in the same Spark cluster."""
    cluster_of = _spark_cluster_by_oracle_id(result, key_maps)
    want = oracle.dup_pairs | oracle.exact_pairs
    assert want, "oracle found no dup pairs — corpus broken"
    hit = sum(1 for a, b in want if cluster_of[a] == cluster_of[b])
    recall = hit / len(want)
    assert recall >= 0.99, f"recall {recall:.4f} over {len(want)} pairs"


def test_cluster_precision(result, oracle, key_maps):
    """No Spark cluster merges files the oracle puts in different
    components (precision of the transitive clustering)."""
    cluster_of = _spark_cluster_by_oracle_id(result, key_maps)
    ids = sorted(cluster_of)
    spark_groups: dict[int, list[int]] = {}
    for oid in ids:
        spark_groups.setdefault(cluster_of[oid], []).append(oid)
    bad = 0
    total = 0
    for members in spark_groups.values():
        for i, a in enumerate(members):
            for b in members[i + 1 :]:
                total += 1
                if oracle.clusters[a] != oracle.clusters[b]:
                    bad += 1
    if total:
        assert bad / total <= 0.01, f"{bad}/{total} cross-component merges"


def test_pipeline_deterministic_under_repartition(spark, corpus):
    """Same input, different partitioning → identical clusters partition
    (SURVEY.md §5 invariant tests)."""
    files1 = spark.createDataFrame(corpus.files).repartition(2)
    files2 = spark.createDataFrame(corpus.files).repartition(11, "path")
    c1 = {r["file_id"]: r["cluster_id"] for r in run_dedup(files1, CFG).clusters.collect()}
    c2 = {r["file_id"]: r["cluster_id"] for r in run_dedup(files2, CFG).clusters.collect()}
    assert c1 == c2
