"""Winnowing document fingerprints (Schleimer, Wilkerson & Aiken,
"Winnowing: Local Algorithms for Document Fingerprinting", SIGMOD'03 —
the MOSS code-plagiarism fingerprint; public algorithm).

Per document: hash every k-char gram at every position (FNV-1a codepoint
fold + SplitMix64, the engine's shared hash spec — functions/hashing.py),
slide a w-hash window, and select each window's minimum with the
RIGHTMOST-on-tie rule. The selected set is a deterministic, position-
robust fingerprint: any shared substring of length >= k + w - 1 is
guaranteed to contribute at least one common fingerprint (the paper's
guarantee threshold), so partial clones — a function pasted into an
otherwise different file — surface even when whole-document MinHash
Jaccard is low. Density is 2/(w+1) of positions, so fingerprint volume
is a constant fraction of content length.

Reference analog: the reference fingerprints whole payloads per
algorithm profile (/root/reference/twinspect/algos/processing.py) and
has no sub-document locality; winnowing is the code-lake tier below
chunk dedup — local, gapless, tie-stable.

Scale shape (10^9 files): the kernel is one vectorized numpy pass per
document inside an Arrow-batched pandas UDF (sliding_window_view —
zero-copy strided argmin, no per-position Python); pair scoring is an
inverted-index self-join keyed on the fingerprint hash, volume
Σ|fp bucket|², never #docs². Hot fingerprints (license headers) are the
same skew problem as LSH buckets and reuse the same mitigation: cap or
drop buckets above a document-frequency ceiling (`max_fp_df`).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from twinspect_spark.functions.hashing import (
    FNV_OFFSET,
    FNV_PRIME,
    MASK64,
    splitmix64,
    splitmix64_py,
)

_U64 = np.uint64

# decorrelate winnow fingerprints from the MinHash/SimHash lanes
WINNOW_SALT = 0x57494E4E4F573633


def winnow_key(seed: int) -> int:
    return splitmix64_py((seed ^ WINNOW_SALT) & MASK64)


def _positional_gram_hashes(text: str, k: int) -> np.ndarray:
    """FNV-1a codepoint-fold hash of the k-gram at EVERY position
    (order-preserving — unlike shingle_hashes, no dedup). Texts of
    <= k chars hash the whole text as one gram."""
    cps = np.frombuffer(text.encode("utf-32-le"), dtype="<u4").astype(_U64)
    n = len(cps)
    if n <= k:
        h = np.array([FNV_OFFSET], dtype=_U64)
        for c in cps:
            h = (h ^ c) * _U64(FNV_PRIME)
        return h
    m = n - k + 1
    h = np.full(m, FNV_OFFSET, dtype=_U64)
    for j in range(k):
        h = (h ^ cps[j : j + m]) * _U64(FNV_PRIME)
    return h


def winnow_fingerprints(text: str, k: int, w: int, key: int) -> np.ndarray:
    """Distinct selected fingerprint hashes (uint64, sorted). Rightmost
    tie-break via argmin over the reversed strided window view — the
    first minimum of the reversed row IS the rightmost of the original."""
    h = splitmix64(_positional_gram_hashes(text, k) ^ _U64(key))
    m = len(h)
    if m <= w:
        sel = np.array([m - 1 - int(np.argmin(h[::-1]))])
    else:
        win = np.lib.stride_tricks.sliding_window_view(h, w)
        rev_arg = np.argmin(win[:, ::-1], axis=1)
        sel = np.arange(m - w + 1) + (w - 1 - rev_arg)
    return np.unique(h[sel])


def winnow_fingerprints_py(text: str, k: int, w: int, key: int) -> set[int]:
    """Scalar twin of the spec above — independent code path for tests
    (the repo's brute-force-oracle idiom, functions/hashing.py:1-9)."""
    cps = [ord(c) for c in text]
    if len(cps) <= k:
        grams = [cps]
    else:
        grams = [cps[i : i + k] for i in range(len(cps) - k + 1)]
    hs = []
    for g in grams:
        h = FNV_OFFSET
        for c in g:
            h = ((h ^ c) * FNV_PRIME) & MASK64
        hs.append(splitmix64_py(h ^ key))
    m = len(hs)
    out: set[int] = set()
    for s in range(max(m - w + 1, 1)):
        window = hs[s : s + w]
        mv = min(window)
        # rightmost occurrence of the minimum
        pos = s + max(i for i, v in enumerate(window) if v == mv)
        out.add(hs[pos])
    return out


def make_winnow_udf(k: int, w: int, seed: int):
    """Series(text) → Series(array<long>): distinct winnow fingerprints
    per document (signed-int64 view of the uint64 hashes)."""
    key = winnow_key(seed)

    def _batch(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for s in it:
            out: list[list[int] | None] = [None] * len(s)
            for i, text in enumerate(s):
                if text is None:
                    continue
                fps = winnow_fingerprints(text, k, w, key)
                out[i] = fps.view(np.int64).tolist()
            yield pd.Series(out)

    return F.pandas_udf(_batch, T.ArrayType(T.LongType()))


def clone_pairs(
    fps: DataFrame, sim_threshold: float, max_fp_df: int | None = None
) -> DataFrame:
    """fps(doc_id, fp) distinct rows → (a, b, shared_fps, winnow_sim)
    for pairs with shared/min(|A|,|B|) >= threshold. ``max_fp_df`` drops
    fingerprints seen in more than that many documents before the pair
    join (license-header hot buckets — same skew treatment as LSH
    bucket caps); sizes are computed BEFORE the drop so similarity
    stays an estimate against full fingerprint sets."""
    # fps feeds three plan branches (sizes + both join sides); without
    # the cut each branch re-runs the winnow UDF over the full corpus
    fps = fps.localCheckpoint()
    sizes = fps.groupBy("doc_id").agg(F.count("*").alias("nf"))
    joinable = fps
    if max_fp_df is not None:
        hot = (
            fps.groupBy("fp")
            .agg(F.count("*").alias("df"))
            .where(F.col("df") > max_fp_df)
            .select("fp")
        )
        joinable = fps.join(F.broadcast(hot), "fp", "left_anti")
    shared = (
        joinable.alias("x")
        .join(joinable.alias("y"), "fp")
        .where(F.col("x.doc_id") < F.col("y.doc_id"))
        .groupBy(F.col("x.doc_id").alias("a"), F.col("y.doc_id").alias("b"))
        .agg(F.count("*").cast("long").alias("shared_fps"))
    )
    sa = sizes.select(F.col("doc_id").alias("a"), F.col("nf").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("b"), F.col("nf").alias("nb"))
    return (
        shared.join(sa, "a")
        .join(sb, "b")
        .select(
            "a",
            "b",
            "shared_fps",
            F.round(F.col("shared_fps") / F.least("na", "nb"), 6).alias(
                "winnow_sim"
            ),
        )
        .where(F.col("winnow_sim") >= sim_threshold)
    )
