"""Content-defined chunking (CDC) for insertion-robust chunk dedup.

Boundary rule: hash the k-char gram STARTING at every position of the
normalized text (FNV-1a codepoint fold + SplitMix64 — the engine's
shared hash spec, functions/hashing.py) and cut a chunk boundary at
every position whose hash is ≡ 0 (mod d). Boundaries therefore depend
only on a k-char local window of content, never on absolute position:
inserting or deleting a span re-chunks ONLY the neighborhood of the
edit, while every fixed-width scheme (the CHUNK_W disjoint-window tier,
queries.py q_chunk_dup_spans) shifts every chunk after the edit. This
is the Rabin/Gear-style chunking used by storage dedup (LBFS, Muthitacharoen
et al. SOSP'01) and by training-data pipelines to catch shared spans
across shifted boilerplate; expected chunk length is d chars.

Reference analog: the reference fingerprints whole files per algorithm
profile (/root/reference/twinspect/algos/processing.py:51-61) and has
no sub-document dedup at all; CDC is the shift-robust tier between the
fixed chunk tier and winnowing in this engine's ladder (winnowing
selects sparse fingerprints for PAIR scoring; CDC partitions the full
text so the duplicated bytes themselves are identified and accountable).

Production CDC adds min/max chunk-size clamps (a sequential per-doc
suppression pass); this operator ships the pure content-defined rule so
the kernel stays one vectorized numpy pass AND the DuckDB oracle can
replay it declaratively — a clamp would need a recursive dependency on
the previously accepted boundary.

Scale shape (10^9 files): chunking is per-document local work inside an
Arrow-batched pandas UDF (one strided FNV pass + one flatnonzero — no
per-position Python); the cross-document group-by runs on sha256(chunk)
— map-side combinable, and the hot-chunk skew story is identical to the
fixed-chunk tier (license headers concentrate on few hashes; df caps
apply downstream of the groupBy, which is itself never skewed because
sha256 keys distribute uniformly).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

from twinspect_spark.functions.hashing import (
    FNV_OFFSET,
    FNV_PRIME,
    MASK64,
    splitmix64,
    splitmix64_py,
)
from twinspect_spark.operators.winnow import _positional_gram_hashes

_U64 = np.uint64

# decorrelate CDC boundaries from the winnow / MinHash / SimHash lanes
CDC_SALT = 0x4344435F424F554E


def cdc_key(seed: int) -> int:
    return splitmix64_py((seed ^ CDC_SALT) & MASK64)


def cdc_chunks(text: str, k: int, d: int, key: int) -> list[str]:
    """Partition ``text`` into content-defined chunks.

    A chunk starts at position 1 and at every gram-start position i > 1
    (1-based) with splitmix64(fnv(text[i:i+k]) ^ key) % d == 0. The
    chunks concatenate back to ``text`` exactly (lossless partition);
    empty text yields no chunks. Texts of <= k chars hash as a single
    whole-text gram (position 1, never a boundary) → one chunk.
    """
    if not text:
        return []
    h = splitmix64(_positional_gram_hashes(text, k) ^ _U64(key))
    # position 1 is always a chunk start, never an interior boundary
    cuts = np.flatnonzero(h % _U64(d) == 0)
    cuts = cuts[cuts > 0]  # 0-based index > 0 == 1-based position > 1
    starts = [0, *cuts.tolist()]
    return [text[s:e] for s, e in zip(starts, [*starts[1:], len(text)])]


def cdc_chunks_py(text: str, k: int, d: int, key: int) -> list[str]:
    """Scalar twin of the spec above — independent code path for tests
    (the repo's brute-force-oracle idiom, functions/hashing.py:1-9)."""
    cps = [ord(c) for c in text]
    n = len(cps)
    if n == 0:
        return []
    grams = [cps] if n <= k else [cps[i : i + k] for i in range(n - k + 1)]
    starts = [0]
    for i, g in enumerate(grams):
        h = FNV_OFFSET
        for c in g:
            h = ((h ^ c) * FNV_PRIME) & MASK64
        if i > 0 and splitmix64_py(h ^ key) % d == 0:
            starts.append(i)
    return [text[s:e] for s, e in zip(starts, [*starts[1:], n])]


def make_cdc_udf(k: int, d: int, seed: int):
    """Series(text) → Series(array<string>): content-defined chunks per
    document, in document order."""
    key = cdc_key(seed)

    def _batch(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for s in it:
            out: list[list[str] | None] = [None] * len(s)
            for i, text in enumerate(s):
                if text is None:
                    continue
                out[i] = cdc_chunks(text, k, d, key)
            yield pd.Series(out)

    return F.pandas_udf(_batch, T.ArrayType(T.StringType()))
