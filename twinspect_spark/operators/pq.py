"""Product quantization (PQ) codes + asymmetric-distance ANN search.

IVF (operators/ann.py) solves WHICH vectors a query scans; PQ solves
what a scan COSTS: a 64-dim float32 vector (256 B) compresses to M=16
4-bit per-subspace centroid ids (8 B packed, 32x), and query-to-code
distances come from a per-query lookup table without touching raw
vectors —
Jegou, Douze & Schmid, "Product Quantization for Nearest Neighbor
Search" (TPAMI 2011). At 10^12 vectors the raw-embedding store is
~0.25 PB while PQ codes are ~8 TB — the difference between an index
that lives in object storage and one that fits executor memory; the
standard composition is IVF cells for pruning + PQ codes inside each
cell (IVF-ADC), both of which this repo now provides.

Oracle reproducibility (the driver replays the search in DuckDB and
compares value hashes): everything downstream of driver-side TRAINING
is exact int64 arithmetic —

* embeddings quantize q = floor(v * 1e6) as int64 (operators/srp.py
  idiom; floor is bit-identical in numpy and ANSI SQL, float32→float64
  widening is exact);
* codebooks train in float but PERSIST floored onto the same grid, so
  both engines read identical integers;
* encode = argmin of integer squared L2 per subspace, ties to the
  lowest centroid id (numpy argmin first-occurrence == ORDER BY d, cid);
* ADC distance = sum of integer LUT entries — associative, so numpy
  pairwise summation and SQL sequential aggregation cannot diverge.

Magnitude audit: |q| <= ~2^27 even for |v| <= 100, diff^2 <= 2^54,
summed over 64 dims < 2^60 — exact in int64 with headroom.

Scale shape: training samples a deterministic hash-ordered bounded set
(constant cost at any corpus size); encoding is one vectorized numpy
kernel per Arrow batch; search broadcasts the (nq x M x K) LUTs and
emits per-batch partial top-k — (dist, id) is a total order, so every
global top-k row survives its batch cut — then one window over
nq x topk x n_batches rows. No shuffle touches raw vectors.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

PQ_M = 16           # subspaces
PQ_K = 16           # centroids per subspace (4-bit ids: M nibbles -> 8 B)
PQ_SCALE = 1_000_000  # embedding quantization grid (srp.py idiom)
PQ_SAMPLE = 2048    # training sample cap
PQ_ITERS = 10       # Lloyd iterations per subspace


def train_pq_codebooks(
    embeddings: DataFrame,
    dim: int,
    m: int = PQ_M,
    k: int = PQ_K,
    sample_size: int = PQ_SAMPLE,
    seed: int = 77,
    iters: int = PQ_ITERS,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> np.ndarray:
    """(m, k, dsub) int64 codebooks on the PQ_SCALE grid.

    Deterministic hash-ordered bounded sample (train_ivf_centroids
    idiom — constant training cost at any corpus size), per-subspace
    k-means++ + Lloyd in float64 over the QUANTIZED points, empty cells
    re-seeded from DISTINCT farthest points, final centroids floored
    back onto the integer grid."""
    assert dim % m == 0, f"dim {dim} not divisible by M {m}"
    dsub = dim // m
    samp = (
        embeddings.select(id_col, vec_col)
        .orderBy(F.xxhash64(F.col(id_col).cast("string")), F.col(id_col))
        .limit(sample_size)
        .toPandas()
    )
    X = np.floor(
        np.vstack(samp[vec_col].to_numpy()).astype(np.float64) * PQ_SCALE
    )
    n = len(X)
    k = min(k, n)
    out = np.empty((m, k, dsub), dtype=np.int64)
    for mi in range(m):
        S = X[:, mi * dsub : (mi + 1) * dsub]
        rng = np.random.default_rng(seed + mi)
        cent = np.empty((k, dsub), dtype=np.float64)
        cent[0] = S[int(rng.integers(n))]
        d2 = ((S - cent[0]) ** 2).sum(axis=1)
        for i in range(1, k):
            probs = np.clip(d2, 1e-9, None)
            probs = probs / probs.sum()
            cent[i] = S[int(rng.choice(n, p=probs))]
            d2 = np.minimum(d2, ((S - cent[i]) ** 2).sum(axis=1))
        for _ in range(iters):
            D = ((S[:, None, :] - cent[None, :, :]) ** 2).sum(axis=-1)
            assign = D.argmin(axis=1)
            far_order = iter(np.argsort(D.min(axis=1), kind="stable")[::-1])
            for c in range(k):
                members = S[assign == c]
                if len(members):
                    cent[c] = members.mean(axis=0)
                else:
                    cent[c] = S[int(next(far_order))]
        out[mi] = np.floor(cent).astype(np.int64)
    return out


def save_codebooks(
    spark: SparkSession, cb: np.ndarray, path: str
) -> None:
    """Persist (m, k, dsub) int64 codebooks in LONG form (m, cid, j, v)
    — directly joinable by the SQL oracle, lossless (integers). The
    table is ~m*k*dsub rows (kilobytes), so it writes DRIVER-side via
    pyarrow: a Spark job for it is ~5 s of pure scheduling overhead at
    local[32]. The single part file still matches the oracle's
    ``<path>/*.parquet`` glob (``spark`` kept for signature stability)."""
    import shutil

    m, k, dsub = cb.shape
    idx = np.indices((m, k, dsub)).reshape(3, -1)
    pdf = pd.DataFrame(
        {
            "m": idx[0].astype(np.int32),
            "cid": idx[1].astype(np.int32),
            "j": idx[2].astype(np.int32),
            "v": cb.reshape(-1),
        }
    )
    if os.path.exists(path):
        shutil.rmtree(path)
    os.makedirs(path, exist_ok=True)
    pdf.to_parquet(os.path.join(path, "part-0.parquet"), index=False)


def load_codebooks(spark: SparkSession, path: str) -> np.ndarray:
    pdf = pd.read_parquet(path).sort_values(["m", "cid", "j"])
    m = pdf["m"].max() + 1
    k = pdf["cid"].max() + 1
    dsub = pdf["j"].max() + 1
    return pdf["v"].to_numpy(dtype=np.int64).reshape(m, k, dsub)


def _quantize(emb: pd.Series) -> np.ndarray:
    return np.floor(
        np.vstack(emb.to_numpy()).astype(np.float64) * PQ_SCALE
    ).astype(np.int64)


def pq_encode_udf(cb: np.ndarray):
    """pandas UDF: embedding array → codes array<int>. Per-subspace
    argmin of exact integer squared L2 against the codebooks; ties go
    to the lowest centroid id (numpy argmin first occurrence). One
    broadcasting numpy kernel per Arrow batch; the codebooks ride in
    the closure (m x k x dsub ints, broadcast once)."""
    m, k, dsub = cb.shape

    @F.pandas_udf("array<int>")
    def _enc(emb: pd.Series) -> pd.Series:
        Q = _quantize(emb)
        codes = np.empty((len(Q), m), dtype=np.int32)
        for mi in range(m):
            S = Q[:, mi * dsub : (mi + 1) * dsub]
            D = ((S[:, None, :] - cb[mi][None, :, :]) ** 2).sum(axis=-1)
            codes[:, mi] = D.argmin(axis=1)
        return pd.Series([c.tolist() for c in codes])

    return _enc


def pq_encode(
    df: DataFrame,
    cb: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, codes array<int>) — see pq_encode_udf."""
    enc = pq_encode_udf(cb)
    return df.select(F.col(id_col), enc(F.col(vec_col)).alias("codes"))


def pq_query_luts(
    qemb: pd.DataFrame,
    cb: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[np.ndarray, np.ndarray]:
    """Per-query ADC lookup tables: (nq, m, k) int64 where
    lut[q, m, c] = exact squared L2 between the query's m-th subvector
    and centroid c. qemb is a DRIVER-side frame (the audit panel is
    metric-sized; at scale this is nq x m x k integers, broadcastable
    for any nq that fits a task)."""
    m, k, dsub = cb.shape
    Q = _quantize(qemb[vec_col])
    nq = len(Q)
    luts = np.empty((nq, m, k), dtype=np.int64)
    for mi in range(m):
        S = Q[:, mi * dsub : (mi + 1) * dsub]
        luts[:, mi, :] = ((S[:, None, :] - cb[mi][None, :, :]) ** 2).sum(
            axis=-1
        )
    return luts, qemb[id_col].to_numpy(dtype=np.int64)


def pq_adc_topk(
    codes: DataFrame,
    luts: np.ndarray,
    qids: np.ndarray,
    topk: int,
    id_col: str = "vec_id",
) -> DataFrame:
    """ADC top-k: distance = sum over subspaces of the query's LUT entry
    at the code's centroid id — raw vectors never read. Per-batch
    partial top-k (safe: (dist, id) is a total order) then one global
    window over nq x topk x n_batches rows."""
    from pyspark.sql import Window

    spark = codes.sparkSession
    m = luts.shape[1]
    bc = spark.sparkContext.broadcast((luts, qids))

    def gen(batches):
        lu, qi = bc.value
        marange = np.arange(m)
        for b in batches:
            if not len(b):
                continue
            C = np.vstack(b["codes"].to_numpy()).astype(np.int64)
            ids = b[id_col].to_numpy(dtype=np.int64)
            for q in range(len(qi)):
                d = lu[q][marange[None, :], C].sum(axis=1)
                mask = ids != qi[q]
                dm, im = d[mask], ids[mask]
                order = np.lexsort((im, dm))[:topk]
                yield pd.DataFrame(
                    {
                        "q_id": qi[q],
                        "neighbor_id": im[order],
                        "dist": dm[order],
                    }
                )

    out = codes.mapInPandas(gen, "q_id long, neighbor_id long, dist long")
    w = Window.partitionBy("q_id").orderBy(
        F.asc("dist"), F.asc("neighbor_id")
    )
    return (
        out.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= topk)
        .drop("rn")
    )


def pq_exact_rerank(
    shortlist: DataFrame,
    embeddings: DataFrame,
    qpdf: pd.DataFrame,
    topk: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact integer-L2 rerank of the ADC shortlist — the second half
    of the production IVF-ADC + rerank shape: ADC prunes to R
    candidates per query from codes alone, then raw vectors are read
    for ONLY nq x R rows and re-scored exactly. R stays constant as
    the corpus grows, so the scanned fraction shrinks with n. Same
    int64 quantized arithmetic as the ADC path (oracle-exact)."""
    from pyspark.sql import Window

    spark = shortlist.sparkSession
    Qv = _quantize(qpdf[vec_col])
    qids = qpdf[id_col].to_numpy(dtype=np.int64)
    bc = spark.sparkContext.broadcast((Qv, qids))
    cand = shortlist.join(
        embeddings.select(F.col(id_col).alias("neighbor_id"), vec_col),
        "neighbor_id",
    )

    def gen(batches):
        qv, qi = bc.value
        qpos = {int(q): i for i, q in enumerate(qi)}
        for b in batches:
            if not len(b):
                continue
            V = _quantize(b[vec_col])
            qidx = np.fromiter(
                (qpos[int(x)] for x in b["q_id"]), dtype=np.int64
            )
            d = ((V - qv[qidx]) ** 2).sum(axis=1)
            yield pd.DataFrame(
                {
                    "q_id": b["q_id"],
                    "neighbor_id": b["neighbor_id"],
                    "dist": d,
                }
            )

    out = cand.mapInPandas(gen, "q_id long, neighbor_id long, dist long")
    w = Window.partitionBy("q_id").orderBy(
        F.asc("dist"), F.asc("neighbor_id")
    )
    return (
        out.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= topk)
        .drop("rn")
    )


def pq_adc_score(
    cand: DataFrame,
    luts: np.ndarray,
    qids: np.ndarray,
    id_col: str = "vec_id",
) -> DataFrame:
    """ADC-score pre-joined (q_id, candidate, codes) rows — the IVF-ADC
    composition path: candidates arrive from an IVF cell-probe join, so
    each row carries its own q_id and the scan touches only probed
    cells (Σ probed-cell sizes, never the full code table). Same exact
    int64 LUT-sum distance as pq_adc_topk."""
    spark = cand.sparkSession
    m = luts.shape[1]
    bc = spark.sparkContext.broadcast((luts, qids))

    def gen(batches):
        lu, qi = bc.value
        qpos = {int(q): i for i, q in enumerate(qi)}
        marange = np.arange(m)
        for b in batches:
            if not len(b):
                continue
            C = np.vstack(b["codes"].to_numpy()).astype(np.int64)
            qidx = np.fromiter(
                (qpos[int(x)] for x in b["q_id"]), dtype=np.int64
            )
            d = lu[qidx[:, None], marange[None, :], C].sum(axis=1)
            yield pd.DataFrame(
                {
                    "q_id": b["q_id"],
                    "neighbor_id": b[id_col],
                    "dist": d,
                }
            )

    return cand.mapInPandas(gen, "q_id long, neighbor_id long, dist long")


def cached_pq_codebooks(
    spark: SparkSession,
    embeddings: DataFrame | None,
    cache_root: str,
    corpus_token: str,
    dim: int,
    m: int = PQ_M,
    k: int = PQ_K,
    sample_size: int = PQ_SAMPLE,
    seed: int = 77,
    iters: int = PQ_ITERS,
) -> np.ndarray:
    """Train-once PQ codebooks (cached_ivf_centroids idiom): keyed
    parquet cache committed write-then-marker, so every batch/stream
    run reloads identical codebooks instead of re-sampling — which also
    guarantees identical codes (and therefore identical ADC results)
    across runs. On a cache hit ``embeddings`` is never touched."""
    import json as _json
    import os as _os

    key = (
        f"pq-m{m}-k{k}-s{sample_size}-seed{seed}-it{iters}"
        f"-d{dim}-{corpus_token}"
    )
    path = _os.path.join(cache_root, key)
    done = _os.path.join(cache_root, f"{key}.done.json")
    if _os.path.exists(done):
        return load_codebooks(spark, path)
    if embeddings is None:
        raise ValueError(f"PQ cache miss for {key} and no embeddings given")
    cb = train_pq_codebooks(
        embeddings, dim, m=m, k=k, sample_size=sample_size,
        seed=seed, iters=iters,
    )
    _os.makedirs(cache_root, exist_ok=True)
    save_codebooks(spark, cb, path)
    with open(done, "w") as f:  # marker strictly AFTER the data write
        _json.dump({"key": key, "shape": [int(x) for x in cb.shape]}, f)
    return cb
