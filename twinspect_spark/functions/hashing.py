"""Deterministic 64-bit hashing kernels for signatures.

Two implementations of one spec:

* vectorized numpy (used inside pandas UDFs on executors), and
* pure-Python scalar twins (``*_py``) used by the brute-force oracle in
  tests — an independent code path so vectorization bugs can't hide
  (mirrors the reference keeping brute-force LameDuck as the semantic
  baseline for its SIMD engines, twinspect/metrics/hamming.py:1-8).

Spec
----
- ``shingle_hash``: FNV-1a-style fold over the Unicode *codepoints* of a
  k-char shingle (codepoints, not UTF-8 bytes, so the window width is
  fixed and the numpy fold is k vectorized steps).
- ``splitmix64``: the SplitMix64 finalizer (public domain, Steele et al.,
  "Fast Splittable Pseudorandom Number Generators", OOPSLA'14) — the
  single mixer everywhere. MinHash is One-Permutation Hashing: each
  shingle is mixed once with a seed-derived master key, dropped into bin
  ``mix % num_perm``, per-bin minima kept, empty bins rotation-densified
  (see the MinHash section below). This avoids (a*x+b) mod p modular
  arithmetic, which is not exactly reproducible in wrapped uint64 numpy.
- SimHash: sign-sum over per-shingle mixed hashes of the +/-1 bit matrix.

All arithmetic is mod 2^64 (numpy uint64 wraps natively; Python ints are
masked). Signed reinterpretation (two's complement) happens only at the
Spark LongType boundary.
"""

from __future__ import annotations

import numpy as np

MASK64 = (1 << 64) - 1

FNV_OFFSET = 0xCBF29CE484222325
FNV_PRIME = 0x100000001B3

SM_GAMMA = 0x9E3779B97F4A7C15
SM_MUL1 = 0xBF58476D1CE4E5B9
SM_MUL2 = 0x94D049BB133111EB

_U64 = np.uint64


# ---------------------------------------------------------------- splitmix64
def splitmix64(x: np.ndarray) -> np.ndarray:
    """SplitMix64 finalizer, vectorized over a uint64 array."""
    z = x.astype(_U64, copy=True)
    _splitmix64_inplace(z)
    return z


def _splitmix64_inplace(z: np.ndarray, shift_buf: np.ndarray | None = None) -> None:
    """SplitMix64 on ``z`` in place. ``shift_buf`` (same shape) is reused
    for the three shift temporaries — with it, the whole finalizer
    touches exactly two buffers, which is what keeps the minhash tile
    L2-resident (the allocating version churns ~6 temporaries per call
    and saturates DRAM bandwidth at high core counts)."""
    if shift_buf is None:
        shift_buf = np.empty_like(z)
    np.right_shift(z, _U64(30), out=shift_buf)
    z ^= shift_buf
    z *= _U64(SM_MUL1)
    np.right_shift(z, _U64(27), out=shift_buf)
    z ^= shift_buf
    z *= _U64(SM_MUL2)
    np.right_shift(z, _U64(31), out=shift_buf)
    z ^= shift_buf


def splitmix64_py(x: int) -> int:
    z = x & MASK64
    z = (z ^ (z >> 30)) * SM_MUL1 & MASK64
    z = (z ^ (z >> 27)) * SM_MUL2 & MASK64
    return z ^ (z >> 31)


# ------------------------------------------------------------- shingle hashes
def shingle_hashes(text: str, k: int) -> np.ndarray:
    """Distinct FNV-1a codepoint-fold hashes of all k-char shingles.

    Texts shorter than k hash the whole text as one shingle (so no row is
    silently signature-less; the reference rejects empty files outright,
    twinspect/datasets/integrity.py:74-78 — empty text yields one hash of
    the empty fold).
    """
    cps = np.frombuffer(text.encode("utf-32-le"), dtype="<u4").astype(_U64)
    n = len(cps)
    if n <= k:
        h = np.array([FNV_OFFSET], dtype=_U64)  # array ops: uint64 wraps silently
        for c in cps:
            h = (h ^ c) * _U64(FNV_PRIME)
        return h
    m = n - k + 1
    h = np.full(m, FNV_OFFSET, dtype=_U64)
    for j in range(k):
        h = (h ^ cps[j : j + m]) * _U64(FNV_PRIME)
    return np.unique(h)


def shingle_hashes_py(text: str, k: int) -> set[int]:
    cps = [ord(c) for c in text]
    if len(cps) <= k:
        windows = [cps]
    else:
        windows = [cps[i : i + k] for i in range(len(cps) - k + 1)]
    out = set()
    for w in windows:
        h = FNV_OFFSET
        for c in w:
            h = ((h ^ c) * FNV_PRIME) & MASK64
        out.add(h)
    return out


# -------------------------------------------------------------------- MinHash
#
# One-Permutation Hashing (Li, Owen & Zhang, NIPS'12) with rotation
# densification (Shrivastava & Li, ICML'14): mix every shingle ONCE, drop
# it into bin ``mix % num_perm``, keep the per-bin minimum, and fill
# empty bins from the nearest non-empty bin to the left (circular) with a
# distance-salted remix. Versus classic k-lane MinHash this is O(n) per
# row instead of O(n × num_perm) — the difference between a signature
# stage that scales with cores and one that saturates DRAM bandwidth
# (measured 1.4x local[8]→local[32] for the dense mix; the per-pair lane
# -match estimate stays a consistent Jaccard estimator).


def _master_key(seed: int) -> int:
    return splitmix64_py((seed ^ SM_GAMMA) & MASK64)


_EMPTY = np.iinfo(np.uint64).max
EMPTY_BIN = _EMPTY  # public sentinel for pre-densification bin minima


def minhash(
    sh: np.ndarray,
    num_perm: int,
    seed: int,
    _scratch: dict | None = None,
) -> np.ndarray:
    """OPH MinHash signature, uint64[num_perm]. One splitmix pass over
    the shingles; per-bin minima; rotation-densified empty bins.
    ``_scratch`` is accepted for buffer reuse across a batch (currently
    the working set is one n_shingles-sized array, so it is a no-op).

    An empty shingle set is rejected: densification has no donor bin, so
    the signature is undefined (shingle_hashes always yields >= 1 hash —
    this guards direct callers only)."""
    if sh.size == 0:
        raise ValueError("minhash: empty shingle set has no signature")
    return densify_binmin(minhash_binmin(sh, num_perm, seed))


def minhash_binmin(sh: np.ndarray, num_perm: int, seed: int) -> np.ndarray:
    """Pre-densification half of the OPH spec: per-bin minima of the
    mixed shingle hashes, uint64[num_perm] with ``EMPTY_BIN`` sentinel
    for bins no shingle landed in.

    Unlike the densified signature, bin minima COMPOSE under set union:
    binmin(A ∪ B) = elementwise-min(binmin(A), binmin(B)) — the algebra
    that lets per-document sketches roll up to repo/source-level
    sketches without touching the shingles again."""
    m = splitmix64(sh.astype(_U64, copy=False) ^ _U64(_master_key(seed)))
    bins = (m % _U64(num_perm)).astype(np.int64)
    out = np.full(num_perm, EMPTY_BIN, dtype=_U64)
    np.minimum.at(out, bins, m)
    return out


def densify_binmin(binmin: np.ndarray) -> np.ndarray:
    """Rotation densification (Shrivastava & Li, ICML'14): each empty
    bin borrows from the nearest originally-filled bin to its left
    (circular), re-mixed with the distance so borrowed lanes stay
    pairwise-independent. Input uses the ``EMPTY_BIN`` sentinel; at
    least one bin must be filled."""
    out = binmin.astype(_U64, copy=True)
    filled = out != EMPTY_BIN
    if not filled.all():
        num_perm = len(out)
        idx = np.arange(num_perm, dtype=np.int64)
        donor = np.where(filled, idx, -1)
        np.maximum.accumulate(donor, out=donor)
        donor[donor == -1] = donor[-1]  # circular wrap to last filled bin
        dist = (idx - donor) % num_perm
        dense = splitmix64(out[donor] + dist.astype(_U64))
        out = np.where(filled, out, dense)
    return out


def minhash_py(sh: set[int], num_perm: int, seed: int) -> list[int]:
    """Scalar twin of the OPH spec above (independent code path)."""
    if not sh:
        raise ValueError("minhash_py: empty shingle set has no signature")
    key = _master_key(seed)
    out: list[int | None] = [None] * num_perm
    for h in sh:
        m = splitmix64_py(h ^ key)
        b = m % num_perm
        if out[b] is None or m < out[b]:
            out[b] = m
    orig_filled = [v is not None for v in out]
    for j in range(num_perm):
        if orig_filled[j]:
            continue
        d = 1  # donors are the ORIGINALLY filled bins only
        while not orig_filled[(j - d) % num_perm]:
            d += 1
        out[j] = splitmix64_py((out[(j - d) % num_perm] + d) & MASK64)
    return [int(v) for v in out]


# -------------------------------------------------------------------- SimHash
SIMHASH_SALT = 0x5354_4157_4E44_5250  # decorrelate from MinHash lanes


def simhash64(sh: np.ndarray, seed: int) -> int:
    """64-bit SimHash: sign-sum of the +/-1 bit matrix of the mixed
    shingle hashes. Tie (sum == 0) resolves to bit 0 — deterministic.
    Returns a Python int in [0, 2^64)."""
    mixed = splitmix64(sh.astype(_U64) ^ _U64((SIMHASH_SALT + seed) & MASK64))
    bits = np.unpackbits(mixed.view(np.uint8).reshape(-1, 8), axis=1, bitorder="little")
    votes = 2 * bits.sum(axis=0, dtype=np.int64) - len(mixed)
    code_bits = (votes > 0).astype(np.uint8)
    return int(np.packbits(code_bits, bitorder="little").view(np.uint64)[0])


def simhash64_py(sh: set[int], seed: int) -> int:
    votes = [0] * 64
    for h in sh:
        m = splitmix64_py(h ^ ((SIMHASH_SALT + seed) & MASK64))
        for b in range(64):
            votes[b] += 1 if (m >> b) & 1 else -1
    code = 0
    for b in range(64):
        if votes[b] > 0:
            code |= 1 << b
    return code


# ----------------------------------------------------------------- utilities
def to_signed64(x: int | np.ndarray):
    """Reinterpret uint64 as two's-complement int64 (Spark LongType)."""
    if isinstance(x, np.ndarray):
        return x.view(np.int64) if x.dtype == np.uint64 else x.astype(np.int64)
    x &= MASK64
    return x - (1 << 64) if x >= (1 << 63) else x


def to_unsigned64(x: int) -> int:
    return x & MASK64


def hamming64_py(a: int, b: int) -> int:
    return bin((a ^ b) & MASK64).count("1")
