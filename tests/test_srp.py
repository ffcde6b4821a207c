"""SRP (cosine-sketch) LSH over embeddings: bit-exactness and locality."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from twinspect_spark.operators.srp import (
    SRP_BITS,
    SRP_SCALE,
    srp_chunk_candidates,
    srp_code_udf,
    srp_planes,
)


def _oracle_code(vec: np.ndarray, dim: int) -> int:
    """Scalar re-implementation with SEQUENTIAL integer sums — proves the
    kernel's matmul result is order-independent (exact int64)."""
    W = srp_planes(SRP_BITS, dim)
    q = [int(np.floor(float(v) * SRP_SCALE)) for v in vec]
    code = 0
    for i in range(SRP_BITS):
        s = 0
        for j in range(dim):
            s += q[j] * int(W[i, j])
        if s >= 0:
            code |= 1 << i
    return code


def test_srp_code_matches_sequential_oracle(spark):
    rng = np.random.default_rng(7)
    dim = 16
    vecs = rng.standard_normal((20, dim)).astype(np.float32)
    df = spark.createDataFrame(
        pd.DataFrame(
            {"vec_id": range(20), "embedding": [v.tolist() for v in vecs]}
        )
    ).withColumn("embedding", F.col("embedding").cast("array<float>"))
    got = {
        r["vec_id"]: r["code"]
        for r in df.select(
            "vec_id", srp_code_udf(dim)(F.col("embedding")).alias("code")
        ).collect()
    }
    for i, v in enumerate(vecs):
        assert got[i] == _oracle_code(v, dim), f"vec {i} code mismatch"


def test_srp_locality_and_candidates(spark):
    """Near-identical vectors share chunk buckets; random pairs rarely do."""
    rng = np.random.default_rng(11)
    dim = 64
    base = rng.standard_normal((30, dim)).astype(np.float32)
    # pairs (2k, 2k+1) are tiny perturbations of each other
    vecs = np.repeat(base, 2, axis=0)
    vecs[1::2] += rng.standard_normal((30, dim)).astype(np.float32) * 0.01
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "vec_id": range(60),
                "embedding": [v.tolist() for v in vecs],
            }
        )
    ).withColumn("embedding", F.col("embedding").cast("array<float>"))
    codes = df.select(
        "vec_id", srp_code_udf(dim)(F.col("embedding")).alias("code")
    )
    cand = {(r["a"], r["b"]) for r in srp_chunk_candidates(codes).collect()}
    planted = {(2 * k, 2 * k + 1) for k in range(30)}
    recall = len(cand & planted) / len(planted)
    assert recall >= 0.95, f"planted near-dup recall {recall}"
    # accidental (non-planted) candidates stay a small fraction of all
    # C(60,2)=1770 pairs — the sketch separates far pairs
    accidents = len(cand - planted)
    assert accidents < 0.25 * 1770, f"too many accidental candidates: {accidents}"


def test_srp_planes_deterministic_and_bounded():
    W = srp_planes(SRP_BITS, 64)
    assert W.shape == (SRP_BITS, 64)
    assert (W == srp_planes(SRP_BITS, 64)).all()
    assert W.min() >= -(1 << 31) and W.max() < (1 << 31)
    # not degenerate: both signs present in every row
    assert ((W > 0).any(axis=1) & (W < 0).any(axis=1)).all()


@pytest.mark.parametrize("dim", [8, 64])
def test_srp_identical_vectors_identical_codes(spark, dim):
    v = list(np.linspace(-1, 1, dim).astype(float))
    df = spark.createDataFrame(
        pd.DataFrame({"vec_id": [0, 1], "embedding": [v, v]})
    ).withColumn("embedding", F.col("embedding").cast("array<float>"))
    out = df.select(srp_code_udf(dim)(F.col("embedding")).alias("c")).collect()
    assert out[0]["c"] == out[1]["c"]
