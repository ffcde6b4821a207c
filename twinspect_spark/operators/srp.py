"""Signed-random-projection LSH over embedding vectors (cosine SimHash).

The reference buckets compact binary codes derived from content
(twinspect/metrics/hamming.py:87-118); for EMBEDDING columns the classic
analog is Charikar's SRP: bit_i = sign(<v, w_i>) for random hyperplanes
w_i, giving P[bit match] = 1 - angle(v, u)/pi — a binary sketch whose
Hamming distance estimates cosine. Candidate generation then reuses the
pigeonhole chunk join (operators/simhash_ball.py) and exact cosine
verifies survivors: sketch → bucket → verify, the same three-phase shape
as the text pipeline.

Two engineering choices make this ORACLE-REPRODUCIBLE (the driver runs an
independent DuckDB SQL implementation and compares value hashes), which a
float dot product would not be:

* DETERMINISTIC INTEGER PLANES, not a seeded RNG: w(i, j) =
  ((1 + i*dim + j) * 2654435761) mod 2^32 - 2^31 (Knuth multiplicative
  hash) — expressible in both engines with plain integer arithmetic.
* INTEGER dot products: embeddings are quantized q = floor(v * 1e6) as
  int64, so the projection sum is exact and ASSOCIATIVE — float
  summation order (numpy pairwise vs SQL sequential) can flip the sign
  of a near-zero projection and corrupt one bit; int64 cannot.
  |q| <= ~2^21, |w| < 2^31, dim 64 → |sum| < 2^57: exact in int64.

The code kernel is one int64 matmul per Arrow batch (pandas UDF) — the
vectorized scale path; chunking and the self-join are pure column
expressions. At 10^12 rows the chunk join shuffles sum(|bucket|^2) pairs,
never n^2, and hot buckets would be capped exactly like the text path
(operators/buckets.py cap + chain).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SRP_BITS = 32       # sketch width
SRP_CHUNK_BITS = 8  # pigeonhole chunk width → 4 chunks
SRP_SCALE = 1_000_000  # embedding quantization for exact integer dots


def srp_planes(n_bits: int = SRP_BITS, dim: int = 64) -> np.ndarray:
    """(n_bits, dim) int64 plane matrix, w(i,j) as documented above."""
    idx = 1 + np.arange(n_bits, dtype=np.int64)[:, None] * dim + np.arange(
        dim, dtype=np.int64
    )
    return (idx * 2654435761) % (1 << 32) - (1 << 31)


def srp_code_udf(dim: int, n_bits: int = SRP_BITS):
    """pandas UDF: embedding array<float> → int64 SRP code. One exact
    int64 matmul per Arrow batch; bit i set iff sum_j q_j * w(i,j) >= 0."""
    W = srp_planes(n_bits, dim)
    pows = (np.int64(1) << np.arange(n_bits, dtype=np.int64))

    @F.pandas_udf("long")
    def _code(emb: pd.Series) -> pd.Series:
        X = np.vstack(emb.to_numpy())  # (n, dim) float32/64
        Q = np.floor(X.astype(np.float64) * SRP_SCALE).astype(np.int64)
        S = Q @ W.T  # (n, n_bits) exact int64
        return pd.Series((S >= 0).astype(np.int64) @ pows)

    return _code


def srp_chunk_candidates(
    codes: DataFrame,
    id_col: str = "vec_id",
    n_bits: int = SRP_BITS,
    chunk_bits: int = SRP_CHUNK_BITS,
) -> DataFrame:
    """codes(id, code) → distinct (a, b), a < b, sharing >= 1 chunk.
    Pigeonhole: Hamming(code_a, code_b) <= n_chunks - 1 guarantees a
    shared chunk; near-dup embeddings (small angle) land here with high
    probability, far pairs almost never do."""
    mask = (1 << chunk_bits) - 1
    vals = F.array(
        *[
            F.shiftrightunsigned(F.col("code"), i * chunk_bits).bitwiseAND(
                F.lit(mask)
            )
            for i in range(n_bits // chunk_bits)
        ]
    )
    ch = codes.select(
        F.col(id_col), F.posexplode(vals).alias("chunk_idx", "chunk_val")
    )
    left = ch.select("chunk_idx", "chunk_val", F.col(id_col).alias("a"))
    right = ch.select("chunk_idx", "chunk_val", F.col(id_col).alias("b"))
    return (
        left.join(right, ["chunk_idx", "chunk_val"])
        .where(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )
