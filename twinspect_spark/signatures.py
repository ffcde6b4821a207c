"""Signature stage: normalized content → MinHash + SimHash per row.

Reference analog: the per-file "simprint" computation
(twinspect/algos/processing.py:51-61 — one scalar UDF per file in a
thread pool). Spark-first redesign: ONE vectorized pandas UDF over Arrow
batches; all per-shingle work is numpy (functions/hashing.py); the UDF is
the only Python on the signature path. Timing is captured per batch and
amortized per row (reference Task.time analog, SURVEY.md SF9).

Failed/null rows get a null signature and are split into an errors
relation — preserving the reference's drop-and-log semantics
(processing.py:96-98) without killing the job.
"""

from __future__ import annotations

import time
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from twinspect_spark.config import DedupConfig
from twinspect_spark.functions import hashing as H

SIGNATURE_FIELDS = T.StructType(
    [
        T.StructField("minhash", T.ArrayType(T.LongType()), True),
        # top-16-bit lane prefixes, precomputed vectorized: the estimate
        # filter consumes these directly — computing them later with a
        # Catalyst transform() costs 128 interpreted ops/row/consumer.
        # 16 bits per lane is enough for an EQUALITY-only consumer: a
        # non-matching lane pair collides at 2^-16, inflating the lane-
        # match estimate by ≤ (1-J)·2^-16 ≈ 1.5e-5 — invisible next to
        # the ±margin triage band — while the payload the estimate join
        # shuffles per document drops 2x vs int32 prefixes (4x vs full
        # lanes). A truly matching lane always matches its prefix, so
        # the cascade only ADDS candidates; exact verify re-checks all.
        T.StructField("mh16", T.ArrayType(T.ShortType()), True),
        T.StructField("simhash", T.LongType(), True),
        T.StructField("n_shingles", T.LongType(), True),
        T.StructField("micros", T.LongType(), True),
    ]
)


def make_signature_udf(cfg: DedupConfig):
    """Build the Series→DataFrame pandas UDF for this config.

    The config is captured by value in the closure (small, frozen) — the
    executor side never consults driver state.
    """
    k = cfg.shingle_size
    num_perm = cfg.num_perm
    seed = cfg.seed

    def _batch(s: pd.Series) -> pd.DataFrame:
        t0 = time.perf_counter_ns()
        n = len(s)
        minhashes: list[list[int] | None] = [None] * n
        mh16s: list[list[int] | None] = [None] * n
        simhashes: list[int | None] = [None] * n
        counts: list[int | None] = [None] * n
        scratch: dict = {}  # minhash tile buffers, reused across the batch
        for i, text in enumerate(s):
            if text is None:
                continue
            sh = H.shingle_hashes(text, k)
            mh = H.minhash(sh, num_perm, seed, _scratch=scratch)
            minhashes[i] = H.to_signed64(mh).tolist()
            mh16s[i] = (mh >> np.uint64(48)).astype(np.int16).tolist()
            simhashes[i] = H.to_signed64(H.simhash64(sh, seed))
            counts[i] = int(len(sh))
        per_row = (time.perf_counter_ns() - t0) // max(n, 1) // 1000
        return pd.DataFrame(
            {
                "minhash": minhashes,
                "mh16": mh16s,
                "simhash": pd.array(simhashes, dtype="Int64"),
                "n_shingles": pd.array(counts, dtype="Int64"),
                "micros": np.full(n, per_row, dtype=np.int64),
            }
        )

    return F.pandas_udf(_batch, SIGNATURE_FIELDS)


def compute_signatures(
    ingested: DataFrame,
    cfg: DedupConfig,
    content_col: str = "content_norm",
    id_col: str = "file_id",
) -> DataFrame:
    """→ signatures(file_id, sha256, size, minhash, simhash, n_shingles,
    micros). Projects only the needed columns into the Arrow pipe
    (SURVEY.md §7 watch-list item 4: don't ship `content` anywhere it
    isn't needed)."""
    sig = make_signature_udf(cfg)
    return (
        ingested.select(id_col, "sha256", "size", content_col)
        .withColumn("sig", sig(F.col(content_col)))
        .select(id_col, "sha256", "size", "sig.*")
    )
