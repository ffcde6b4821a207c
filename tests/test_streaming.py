"""Incremental/streaming dedup: micro-batched ingestion must converge to
the same clusters as the one-shot batch pipeline, via real Structured
Streaming (readStream → foreachBatch → state store) and via direct
process_batch calls; batch replay must be a no-op."""

from __future__ import annotations

import time

import pytest

from twinspect_spark.config import DedupConfig
from twinspect_spark.corpus import generate_corpus
from twinspect_spark.pipeline import run_dedup
from twinspect_spark.streaming.incremental import (
    DedupStore,
    incremental_dedup_stream,
    process_batch,
)

CFG = DedupConfig(jaccard_threshold=0.6)


@pytest.fixture(scope="module")
def corpus():
    return generate_corpus(
        n_clusters=12, transforms_per_original=2, n_distractors=20,
        n_exact_dups=4, seed=5,
    )


@pytest.fixture(scope="module")
def batch_clusters(spark, corpus):
    res = run_dedup(
        spark.createDataFrame(corpus.files), CFG, materialize_stages=False
    )
    return {r["file_id"]: r["cluster_id"] for r in res.clusters.collect()}


def _chunks(corpus, n=3):
    files = corpus.files
    return [files.iloc[i::n] for i in range(n)]


def test_incremental_matches_batch(spark, corpus, batch_clusters, tmp_path_factory):
    store = DedupStore(spark, str(tmp_path_factory.mktemp("store")))
    for i, chunk in enumerate(_chunks(corpus)):
        process_batch(spark, spark.createDataFrame(chunk), store, CFG, batch_id=i)
    got = {r["file_id"]: r["cluster_id"] for r in store.clusters().collect()}
    assert got == batch_clusters
    # batch replay (streaming retry semantics) is a no-op
    n_edges = store.edges().count()
    process_batch(
        spark, spark.createDataFrame(_chunks(corpus)[0]), store, CFG, batch_id=0
    )
    assert store.edges().count() == n_edges


def test_structured_streaming_end_to_end(
    spark, corpus, batch_clusters, tmp_path_factory
):
    in_dir = tmp_path_factory.mktemp("incoming")
    store_root = str(tmp_path_factory.mktemp("store_ss"))
    for i, chunk in enumerate(_chunks(corpus)):
        spark.createDataFrame(chunk).coalesce(1).write.parquet(
            str(in_dir / f"chunk{i}")
        )
    q = incremental_dedup_stream(
        spark, str(in_dir) + "/chunk*", store_root, CFG
    )
    assert q.awaitTermination(300), "stream did not drain in time"
    store = DedupStore(spark, store_root)
    got = {r["file_id"]: r["cluster_id"] for r in store.clusters().collect()}
    assert got == batch_clusters

    # late arrivals: a second availableNow pass picks up only new files
    extra = corpus.files.iloc[:0]
    time.sleep(0.1)
    q2 = incremental_dedup_stream(
        spark, str(in_dir) + "/chunk*", store_root, CFG
    )
    assert q2.awaitTermination(300)
    got2 = {r["file_id"]: r["cluster_id"] for r in store.clusters().collect()}
    assert got2 == batch_clusters
    assert extra.empty  # silence lint; semantic: no new files → unchanged


def test_replay_after_partial_write_is_safe(
    spark, corpus, batch_clusters, tmp_path_factory
):
    """Crash between the batch writes and the marker: Structured
    Streaming replays the batch. Batch-scoped overwrite must REPLACE the
    partial output, not append to it (the append design duplicated state
    rows and inflated every later candidate join)."""
    import os

    store = DedupStore(spark, str(tmp_path_factory.mktemp("store_rp")))
    for i, chunk in enumerate(_chunks(corpus)):
        process_batch(spark, spark.createDataFrame(chunk), store, CFG, batch_id=i)
    n_state = store.state().count()
    n_edges = store.edges().count()
    # simulate the crash window: writes landed, marker did not
    os.remove(os.path.join(store.root, "_batch_2.done"))
    process_batch(
        spark, spark.createDataFrame(_chunks(corpus)[2]), store, CFG, batch_id=2
    )
    assert store.state().count() == n_state
    assert store.edges().count() == n_edges
    got = {r["file_id"]: r["cluster_id"] for r in store.clusters().collect()}
    assert got == batch_clusters


def test_incremental_candidates_plan_is_pruned_and_broadcast(
    spark, corpus, tmp_path_factory
):
    """Scale contract of the incremental path: the stored bucket table is
    read with directory-partition pruning (PartitionFilters on bucket_pt)
    and joined via broadcast — the accumulated side must never be
    shuffled, so per-batch cost tracks the batch, not the store."""
    from twinspect_spark.operators.buckets import bucket_table
    from twinspect_spark.streaming.incremental import (
        STATE_COLS,
        _incremental_candidates,
    )

    store = DedupStore(spark, str(tmp_path_factory.mktemp("store_plan")))
    chunks = _chunks(corpus)
    process_batch(spark, spark.createDataFrame(chunks[0]), store, CFG, batch_id=0)
    ingested = spark.createDataFrame(chunks[1])
    from twinspect_spark.ingest import ingest_files
    from twinspect_spark.signatures import compute_signatures

    ing = ingest_files(ingested, CFG)
    sigs = compute_signatures(ing, CFG)
    new_state = (
        ing.select("file_id", "sha256", "size", "content_norm")
        .join(sigs.select("file_id", "minhash", "mh32", "simhash"), "file_id")
        .select(*STATE_COLS)
    )
    cand = _incremental_candidates(bucket_table(new_state, CFG), store, CFG)
    plan = cand._jdf.queryExecution().toString()
    scan_lines = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert any("bucket_pt" in ln for ln in scan_lines), scan_lines
    assert "BroadcastExchange" in plan or "BroadcastHashJoin" in plan


def test_merge_components_incremental_equivalence(spark):
    """Contraction-based merge equals from-scratch CC on the union."""
    from twinspect_spark.operators.cc import connected_components, merge_components

    e1 = spark.createDataFrame([(1, 2), (3, 4), (10, 11)], "a long, b long")
    c1 = connected_components(e1)
    e2 = spark.createDataFrame([(2, 3), (5, 6), (11, 12)], "a long, b long")
    merged = merge_components(
        c1, e2, new_vertices=spark.createDataFrame(
            [(5,), (6,), (12,), (99,)], "file_id long"
        )
    )
    want = connected_components(
        e1.unionByName(e2),
        vertices=spark.createDataFrame(
            [(1,), (2,), (3,), (4,), (5,), (6,), (10,), (11,), (12,), (99,)],
            "file_id long",
        ),
    )
    got = {r["file_id"]: r["cluster_id"] for r in merged.collect()}
    expected = {r["file_id"]: r["cluster_id"] for r in want.collect()}
    assert got == expected
    assert got[99] == 99  # untouched new vertex is a singleton
    assert got[4] == 1  # 1-2-3-4 merged through contracted edge 2-3
