"""IVF ANN: the production quantizer (sampled spherical k-means +
nprobe cell search) must be deterministic, hit recall@k >= 0.95 on
clustered embeddings (the regime IVF exists for), and still beat the
probed-fraction baseline on the driver's ISOTROPIC-RANDOM embeddings —
where high recall at small nprobe is information-theoretically
unavailable to any cell quantizer (measured: within-label and
cross-label cosine are both ~0 in the testdata, i.e. labels carry no
geometric signal; on such data recall tracks the scanned fraction)."""

from __future__ import annotations

import collections

import numpy as np
import pandas as pd
import pytest

from twinspect_spark.operators.ann import train_ivf_centroids, ivf_topk

SF_DIR = "/root/testdata/sf0.1"
K = 10
N_QUERIES = 20


def _recall(spark, emb, k_cells, nprobe, n_queries=N_QUERIES, topk=K):
    C = train_ivf_centroids(emb, k=k_cells, sample_size=2048, seed=42)
    queries = emb.where(f"vec_id < {n_queries}")
    got = ivf_topk(emb, queries, C, k=topk, nprobe=nprobe).collect()
    by_q = collections.defaultdict(set)
    for r in got:
        by_q[r.q_id].add(r.neighbor_id)

    pdf = emb.select("vec_id", "embedding").toPandas()
    ids = pdf["vec_id"].to_numpy()
    X = np.vstack(pdf["embedding"].to_numpy()).astype(np.float64)
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True).clip(min=1e-12)
    hit = total = 0
    for q in range(n_queries):
        qi = int(np.where(ids == q)[0][0])
        sims = Xn @ Xn[qi]
        sims[qi] = -2.0
        order = np.argsort(-sims, kind="stable")[:topk]
        truth = {int(ids[j]) for j in order}
        hit += len(truth & by_q[q])
        total += topk
    return hit / total


@pytest.fixture(scope="module")
def emb_random(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


@pytest.fixture(scope="module")
def emb_clustered(spark):
    """Deterministic clustered embeddings (the shape real text/image
    embeddings have): 20 unit-sphere centers, 100 points each at noise
    scale 0.1 (within-cluster cosine ~0.8, like real embedding spaces)."""
    rng = np.random.default_rng(3)
    centers = rng.normal(size=(20, 64))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    assign = np.repeat(np.arange(20), 100)
    pts = centers[assign] + 0.1 * rng.normal(size=(2000, 64))
    pdf = pd.DataFrame(
        {
            "vec_id": np.arange(2000, dtype=np.int64),
            "embedding": [row.astype(np.float32).tolist() for row in pts],
        }
    )
    return spark.createDataFrame(pdf)


def test_centroids_deterministic_under_partitioning(spark, emb_random):
    c1 = train_ivf_centroids(emb_random, k=8, sample_size=512, seed=7)
    c2 = train_ivf_centroids(
        emb_random.repartition(7), k=8, sample_size=512, seed=7
    )
    assert np.allclose(c1, c2)
    assert c1.shape == (8, 64)
    assert np.allclose(np.linalg.norm(c1, axis=1), 1.0)


def test_centroid_cache_skips_training(spark, emb_random, tmp_path):
    """Persistence contract (reference hamming.py:278-305 index cache):
    second run loads the committed centroid parquet WITHOUT touching the
    embeddings relation (we pass one that would fail any training job)
    and returns bit-identical centroids → identical cell assignments."""
    from twinspect_spark.operators.ann import cached_ivf_centroids

    root = str(tmp_path / "ivf")
    c1 = cached_ivf_centroids(
        spark, emb_random, root, "tok", k=8, sample_size=512, seed=7
    )
    poisoned = spark.createDataFrame([], "vec_id long, embedding array<float>")
    c2 = cached_ivf_centroids(
        spark, poisoned, root, "tok", k=8, sample_size=512, seed=7
    )
    assert np.array_equal(c1, c2)  # exact float64 parquet round-trip
    # different params → different key → must train (and fail on poison)
    with pytest.raises(Exception):
        cached_ivf_centroids(
            spark, poisoned, root, "tok", k=4, sample_size=512, seed=7
        )


def test_ivf_recall_on_clustered_embeddings(spark, emb_clustered):
    """The headline gate: recall@10 >= 0.95 probing 2 of 16 cells."""
    recall = _recall(spark, emb_clustered, k_cells=16, nprobe=2)
    assert recall >= 0.95, f"IVF recall@{K} = {recall:.3f} < 0.95"


def test_ivf_beats_probed_fraction_on_random_embeddings(spark, emb_random):
    """On isotropic data a quantizer can't beat the curse of
    dimensionality, but probing the query's NEAREST cells must still
    recover more neighbors than the scanned fraction (4/8 = 0.5 here)
    — i.e. the trained cells are better than random partitions."""
    recall = _recall(spark, emb_random, k_cells=8, nprobe=4)
    assert recall >= 0.60, f"recall {recall:.3f} not above probed fraction"
