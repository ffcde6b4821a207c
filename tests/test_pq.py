"""Product-quantization ANN (operators/pq.py): recall gate against
exact quantized-L2 ground truth, ADC-vs-rerank behavior, partitioning
determinism, and codebook persistence round-trip. The cross-engine
bit-exactness claim is proven by the driver oracle (ann_pq_adc_topk);
these tests pin the SEMANTICS and the quality floor."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from twinspect_spark.operators.pq import (
    PQ_SCALE,
    load_codebooks,
    pq_adc_topk,
    pq_encode,
    pq_exact_rerank,
    pq_query_luts,
    save_codebooks,
    train_pq_codebooks,
)

SF = "/root/testdata/sf0.001"
NQ, TOPK, RERANK = 5, 10, 100


def _truth(emb_pdf: pd.DataFrame, nq: int, topk: int) -> dict[int, set]:
    X = np.floor(
        np.vstack(emb_pdf["embedding"].to_numpy()).astype(np.float64)
        * PQ_SCALE
    ).astype(np.int64)
    ids = emb_pdf["vec_id"].to_numpy()
    out = {}
    for q in range(nq):
        qv = X[ids == q][0]
        d = ((X - qv) ** 2).sum(axis=1)
        mask = ids != q
        order = np.lexsort((ids[mask], d[mask]))[:topk]
        out[q] = set(int(i) for i in ids[mask][order])
    return out


def test_pq_rerank_recall_and_determinism(spark, tmp_path):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    dim = len(emb.select("embedding").first()["embedding"])
    cb = train_pq_codebooks(emb, dim)

    # persistence round-trip is lossless (integers)
    path = str(tmp_path / "cb.parquet")
    save_codebooks(spark, cb, path)
    assert np.array_equal(load_codebooks(spark, path), cb)

    qpdf = (
        emb.where(F.col("vec_id") < NQ)
        .select("vec_id", "embedding")
        .orderBy("vec_id")
        .toPandas()
    )
    luts, qids = pq_query_luts(qpdf, cb)

    codes = pq_encode(emb, cb)
    short = pq_adc_topk(codes, luts, qids, RERANK)
    res = pq_exact_rerank(short, emb, qpdf, TOPK)
    got = res.toPandas()
    assert set(got.columns) == {"q_id", "neighbor_id", "dist"}
    assert (got.groupby("q_id").size() == TOPK).all()

    truth = _truth(emb.toPandas(), NQ, TOPK)
    recalls = [
        len(truth[q] & set(got[got.q_id == q].neighbor_id)) / TOPK
        for q in range(NQ)
    ]
    # rerank reads raw vectors for the shortlist, so recall is bounded
    # only by ADC shortlist misses; 0.8 is a loose floor (measured 0.95
    # at sf0.01 with the default panel)
    assert float(np.mean(recalls)) >= 0.8, recalls

    # rerank distances ARE the exact quantized L2 (spot-check one row)
    emb_pdf = emb.toPandas()
    X = np.floor(
        np.vstack(emb_pdf["embedding"].to_numpy()).astype(np.float64)
        * PQ_SCALE
    ).astype(np.int64)
    ids = emb_pdf["vec_id"].to_numpy()
    r = got.iloc[0]
    qv = X[ids == r.q_id][0]
    nv = X[ids == r.neighbor_id][0]
    assert int(((qv - nv) ** 2).sum()) == int(r.dist)

    # determinism: a different partitioning yields the identical result
    codes7 = pq_encode(emb.repartition(7), cb)
    short7 = pq_adc_topk(codes7, luts, qids, RERANK)
    got7 = (
        pq_exact_rerank(short7, emb, qpdf, TOPK)
        .toPandas()
        .sort_values(["q_id", "dist", "neighbor_id"])
        .reset_index(drop=True)
    )
    assert got.sort_values(["q_id", "dist", "neighbor_id"]).reset_index(
        drop=True
    ).equals(got7)
