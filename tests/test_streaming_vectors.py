"""Incremental vector store (streaming/vectors.py): replay-idempotent
cell-partitioned ingest, O(1) commit record, partition-pruned nprobe
search with recall vs brute force."""

from __future__ import annotations

import json
import os

import numpy as np
import pytest

from pyspark.sql import functions as F

from twinspect_spark.streaming.vectors import VectorStore


def _vecs(rng, n, dim=16, centers=4):
    """Clustered unit vectors: center id c gets a distinct orthant."""
    base = rng.normal(size=(centers, dim))
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    rows = []
    for i in range(n):
        c = i % centers
        v = base[c] + 0.15 * rng.normal(size=dim)
        v /= np.linalg.norm(v)
        rows.append((i, v.tolist()))
    return rows


@pytest.fixture(scope="module")
def store(spark, tmp_path_factory):
    from twinspect_spark.operators.ann import train_ivf_centroids

    rng = np.random.default_rng(7)
    rows = _vecs(rng, 120)
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cent = train_ivf_centroids(
        df, k=4, sample_size=120, seed=42, iters=8,
        id_col="vec_id", vec_col="embedding",
    )
    path = str(tmp_path_factory.mktemp("vstore"))
    st = VectorStore(spark, path, cent)
    # ingest as three micro-batches via the foreachBatch hook
    sink = st.sink()
    for bid in range(3):
        sink(df.where((F.col("vec_id") % 3) == bid), bid)
    return st, df, rows


def test_ingest_commit_and_replay_idempotent(store, spark):
    st, df, rows = store
    assert sorted(st.committed_ids()) == [0, 1, 2]
    assert st.read().count() == 120
    # meta is O(1): a pure high-water mark, no per-batch growth
    with open(os.path.join(st.path, "_meta.json")) as f:
        m = json.load(f)
    assert m == {"format": 1, "hwm": 2, "extra": [], "pq": False}
    # foreachBatch replay of batch 1 (same data, same id) is a no-op
    st.sink()(df.where((F.col("vec_id") % 3) == 1), 1)
    assert st.read().count() == 120
    assert st.read().select("vec_id").distinct().count() == 120


def test_out_of_order_commits_absorb_into_hwm(spark, tmp_path):
    st = VectorStore(spark, str(tmp_path / "v2"), np.eye(2))
    df = spark.createDataFrame(
        [(0, [1.0, 0.0])], "vec_id long, embedding array<double>"
    )
    for bid in (2, 0):
        st.process_batch(df, bid)
    assert sorted(st.committed_ids()) == [0, 2]
    st.process_batch(df, 1)  # fills the gap: run absorbs into hwm
    with open(os.path.join(st.path, "_meta.json")) as f:
        m = json.load(f)
    assert m["hwm"] == 2 and m["extra"] == []


def test_cells_match_batch_assignment(store):
    st, df, rows = store
    from twinspect_spark.operators.ann import make_cell_assign_udf

    want = {
        r.vec_id: r.c
        for r in df.select(
            "vec_id",
            F.element_at(
                make_cell_assign_udf(st.centroids, 1)("embedding"), 1
            ).alias("c"),
        ).collect()
    }
    got = {r.vec_id: r.cell for r in st.read().collect()}
    assert got == want


def test_search_recall_and_partition_pruning(store, spark):
    st, df, rows = store
    queries = df.where(F.col("vec_id") < 8)
    res = st.search(queries, k=5, nprobe=2)
    top = res.groupBy("q_id").agg(
        F.max_by("neighbor_id", "cosine").alias("nn")
    )
    # brute-force oracle: exact top-1 neighbor per query
    X = np.array([v for _, v in rows])
    S = X @ X.T
    np.fill_diagonal(S, -2)
    hits = 0
    for r in top.collect():
        if S[r.q_id].argmax() == r.nn:
            hits += 1
    assert hits >= 7  # recall@1 >= 7/8 with nprobe=2 of 4 cells
    # the probed-cell predicate must reach the scan as a PartitionFilter
    plan = st.read().where(F.col("cell").isin([0, 1]))._jdf.queryExecution(
    ).executedPlan().toString()
    assert "PartitionFilters" in plan and "cell" in plan.split(
        "PartitionFilters", 1
    )[1][:200]


def test_compact_merges_generations_and_stream_continues(spark, tmp_path):
    from twinspect_spark.operators.ann import train_ivf_centroids

    rng = np.random.default_rng(11)
    rows = _vecs(rng, 60)
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cent = train_ivf_centroids(
        df, k=4, sample_size=60, seed=1, iters=5,
        id_col="vec_id", vec_col="embedding",
    )
    st = VectorStore(spark, str(tmp_path / "v3"), cent)
    for bid in range(3):
        st.process_batch(df.where((F.col("vec_id") % 3) == bid), bid)
    assert st.compact() == 60
    with open(os.path.join(st.path, "_meta.json")) as f:
        m = json.load(f)
    assert m == {"format": 1, "hwm": -1, "extra": [-1], "pq": False}
    assert st.read().count() == 60
    # old batch dirs are gone; exactly one generation dir remains
    dirs = sorted(os.listdir(os.path.join(st.path, "cells")))
    assert dirs == ["batch_id=-1"]
    # the stream keeps appending with its own (non-colliding) ids
    extra = spark.createDataFrame(
        [(1000, rows[0][1])], "vec_id long, embedding array<double>"
    )
    st.process_batch(extra, 3)
    assert st.read().count() == 61
    assert sorted(st.committed_ids()) == [-1, 3]
    # second compaction uses a fresh generation below the first
    assert st.compact() == 61
    dirs = sorted(os.listdir(os.path.join(st.path, "cells")))
    assert dirs == ["batch_id=-2"]
    assert st.read().count() == 61


def test_pq_store_ingest_search_and_guard(spark, tmp_path):
    """IVF-ADC over the incremental store: codes ride ingest, search_adc
    with full probing + full rerank EQUALS the exact integer-L2 top-k,
    the ADC scan prunes the embedding column, and a pq store refuses to
    open without codebooks."""
    from twinspect_spark.operators.ann import train_ivf_centroids
    from twinspect_spark.operators.pq import PQ_SCALE, train_pq_codebooks
    from twinspect_spark.streaming.vectors import VectorStore

    rng = np.random.default_rng(13)
    rows = _vecs(rng, 90, dim=16)
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cent = train_ivf_centroids(
        df, k=4, sample_size=90, seed=42, iters=8,
        id_col="vec_id", vec_col="embedding",
    )
    cb = train_pq_codebooks(
        df, dim=16, m=4, k=8, sample_size=90, seed=5
    )
    path = str(tmp_path / "pqstore")
    st = VectorStore(spark, path, cent, codebooks=cb)
    sink = st.sink()
    for bid in range(3):
        sink(df.where((F.col("vec_id") % 3) == bid), bid)

    stored = st.read()
    assert "codes" in stored.columns
    queries = df.where(F.col("vec_id") < 5)
    # full probing + full rerank -> must equal exact integer-L2 top-k
    res = st.search_adc(queries, k=3, nprobe=4, rerank=90).toPandas()
    X = np.floor(
        np.array([v for _, v in rows], dtype=np.float64) * PQ_SCALE
    ).astype(np.int64)
    for q in range(5):
        d = ((X - X[q]) ** 2).sum(axis=1)
        ids = np.arange(len(rows))
        mask = ids != q
        order = np.lexsort((ids[mask], d[mask]))[:3]
        want = list(ids[mask][order])
        got = list(
            res[res.q_id == q]
            .sort_values(["dist", "neighbor_id"])
            .neighbor_id
        )
        assert got == want, (q, got, want)
    # ADC path exists with pruning: codes-only scan never reads the
    # embedding column (two scans in the full plan: the rerank one does)
    plan = (
        st.search_adc(queries, k=3, nprobe=2, rerank=20)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "PartitionFilters" in plan
    # mismatch guard: reopening without codebooks must refuse
    st2 = VectorStore(spark, path, cent)
    try:
        st2.read()
        assert False, "expected pq-flag mismatch to raise"
    except ValueError as e:
        assert "pq" in str(e)
