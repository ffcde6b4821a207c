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
  "Fast Splittable Pseudorandom Number Generators", OOPSLA'14) — our
  per-lane mixer. MinHash lane i hashes shingle h as
  ``splitmix64(h XOR lane_key(i, seed))``; the minimum over shingles is
  the lane value. This avoids (a*x+b) mod p modular arithmetic, which is
  not exactly reproducible in wrapped uint64 numpy.
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
    z ^= z >> _U64(30)
    z *= _U64(SM_MUL1)
    z ^= z >> _U64(27)
    z *= _U64(SM_MUL2)
    z ^= z >> _U64(31)
    return z


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
def lane_keys(num_perm: int, seed: int) -> np.ndarray:
    """Per-lane XOR keys: splitmix64 of the lane index stream from seed."""
    idx = np.arange(1, num_perm + 1, dtype=_U64)
    return splitmix64(idx * _U64(SM_GAMMA) + _U64(seed & MASK64))


def minhash(sh: np.ndarray, num_perm: int, seed: int) -> np.ndarray:
    """MinHash signature: per lane i, min over shingles of
    splitmix64(h XOR key_i). Returns uint64[num_perm].

    Memory: the [n_shingles, num_perm] mix matrix is computed in lane
    chunks of 32 so a 100k-shingle document stays < 32 MB per batch row.
    """
    keys = lane_keys(num_perm, seed)
    out = np.empty(num_perm, dtype=_U64)
    sh = sh.astype(_U64, copy=False)
    for lo in range(0, num_perm, 32):
        hi = min(lo + 32, num_perm)
        mixed = splitmix64(sh[:, None] ^ keys[None, lo:hi])
        out[lo:hi] = mixed.min(axis=0)
    return out


def minhash_py(sh: set[int], num_perm: int, seed: int) -> list[int]:
    keys = [
        splitmix64_py((i * SM_GAMMA + seed) & MASK64)
        for i in range(1, num_perm + 1)
    ]
    return [min(splitmix64_py(h ^ k) for h in sh) for k in keys]


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
