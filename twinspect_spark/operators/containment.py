"""Density-adaptive exact containment verification.

The prefix-filter containment join (queries.q_ngram_containment_engine,
SSJoin/PPJoin family) is the scale path when the shingle vocabulary is
LARGE — prefixes are then rare tokens and the candidate set is sparse.
On a low-entropy corpus the prefix loses all selectivity: measured at
sf0.1, the 4-char shingle vocabulary is 985 strings (avg document
frequency 895), so EVERY doc collides with every other on some prefix
element — 12,485,397 of the 12,497,500 possible pairs survived the
filter and the join spent ~240 s re-verifying what amounts to all
pairs.

A tiny vocabulary is, however, exactly the regime where the
doc × shingle incidence matrix packs into broadcastable bits
(n_docs × vocab/8 bytes), so this module provides the dense
counterpart: exact |A ∩ B| for every pair via AND + popcount over the
broadcast packed matrix, distributed with mapInPandas over row blocks —
ONE broadcast, ZERO shuffle, no candidate materialization. The engine
query measures vocab × n_docs and picks the strategy, mirroring the
size-tiered design of operators/cc.py (driver union-find below 2M
edges, distributed hash-min above): the dense tier is bounded by
construction (DENSE_CELLS_MAX caps the broadcast at 32 MB packed), and
everything above the bound is the high-entropy regime where the prefix
filter is selective again.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# n_docs * vocab budget for the dense tier: 2^28 incidence cells packs
# to 32 MB of broadcast bits. Above this, prefix-filter joins win.
DENSE_CELLS_MAX = 1 << 28

_BLOCK = 128     # rows per kernel block
_JCHUNK = 1024   # columns per inner chunk (bounds temp memory per task)


def dense_containment_intersections(
    spark: SparkSession, sh: DataFrame, threshold: float
) -> DataFrame:
    """Exact pair intersections |A ∩ B| over a SMALL shingle universe:
    returns (a, b, i, na, nb) for every doc pair whose containment can
    round (HALF_UP, 6 digits) to >= threshold; a < b; na/nb are the
    distinct-shingle set sizes (free from the incidence row sums — the
    caller needs no separate sizes aggregation). The caller applies
    the authoritative round()-based filter and computes the ratios in
    Spark so rounding semantics stay engine-side.

    The packed incidence matrix is built once (arrow collect, bounded
    by DENSE_CELLS_MAX upstream) and broadcast; row blocks fan out via
    mapInPandas and each task runs AND + popcount-LUT kernels against
    the full matrix — O(n^2 * vocab/8) byte ops total, no shuffle."""
    num = round(threshold * 1_000_000)
    pdf = sh.select("doc_id", "sh").toPandas()
    # vocabulary derives from the one collected stream — a separate
    # distinct-collect would re-run the shingle explode scan (~6 s at
    # sf0.1, a third of the query) for data already on the driver
    vocab = np.sort(pdf["sh"].unique())
    v = len(vocab)
    doc_ids = np.sort(pdf["doc_id"].unique().astype(np.int64))
    n = len(doc_ids)
    docpos = pd.Series(np.arange(n), index=doc_ids)
    shidx = pd.Series(np.arange(v), index=vocab)
    m = np.zeros((n, v), dtype=np.uint8)
    m[
        docpos[pdf["doc_id"]].to_numpy(),
        shidx[pdf["sh"]].to_numpy(),
    ] = 1
    sizes = m.sum(axis=1).astype(np.int64)
    packed = np.packbits(m, axis=1)  # n × ceil(v/8), uint8
    bc = spark.sparkContext.broadcast((packed, sizes, doc_ids, v))

    def gen(batches):
        mat, sz, dids, nv = bc.value
        nn = mat.shape[0]
        for b in batches:
            for start in b["start"].to_numpy():
                i0, i1 = int(start), min(int(start) + _BLOCK, nn)
                # 0/1 float32 sgemm: products exact, sums <= vocab << 2^24,
                # so the matmul IS exact integer set intersection
                rows = np.unpackbits(
                    mat[i0:i1], axis=1, count=nv
                ).astype(np.float32)
                for j0 in range(0, nn, _JCHUNK):
                    j1 = min(j0 + _JCHUNK, nn)
                    if j1 <= i0:  # whole chunk is p >= q: skip early
                        continue
                    chunk = np.unpackbits(
                        mat[j0:j1], axis=1, count=nv
                    ).astype(np.float32)
                    inter = (rows @ chunk.T).astype(np.int64)
                    pg = np.arange(i0, i1)[:, None]
                    qg = np.arange(j0, j1)[None, :]
                    mn = np.minimum(sz[i0:i1][:, None], sz[j0:j1][None, :])
                    # 2e6*i >= (2*num-1)*min  <=>  i/min can HALF_UP-round
                    # to >= threshold at 6 digits
                    keep = (qg > pg) & (
                        2_000_000 * inter >= (2 * num - 1) * mn
                    )
                    if not keep.any():
                        continue
                    pi, qi = np.nonzero(keep)
                    yield pd.DataFrame(
                        {
                            "a": dids[i0 + pi],
                            "b": dids[j0 + qi],
                            "i": inter[pi, qi],
                            "na": sz[i0 + pi],
                            "nb": sz[j0 + qi],
                        }
                    )

    blocks = spark.createDataFrame(
        [(int(i),) for i in range(0, n, _BLOCK)], "start int"
    ).repartition(max(1, (n + _BLOCK - 1) // _BLOCK))
    return blocks.mapInPandas(
        gen, "a long, b long, i long, na long, nb long"
    )


def containment_stats(sh: DataFrame) -> tuple[int, int]:
    """(n_docs, vocab) in one pass — the dense-vs-prefix routing stats."""
    row = sh.agg(
        F.countDistinct("doc_id").alias("n"),
        F.countDistinct("sh").alias("v"),
    ).first()
    return int(row["n"]), int(row["v"])
