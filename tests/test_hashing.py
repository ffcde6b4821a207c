"""Vectorized numpy kernels must agree exactly with the pure-Python
oracle twins (independent implementations of one spec)."""

from __future__ import annotations

import random

import numpy as np
import pytest

from twinspect_spark.functions import hashing as H

SAMPLES = [
    "",
    "a",
    "abc",
    "abcd",
    "def load(x):\n    return x + 1\n",
    "the quick brown fox jumps over the lazy dog " * 5,
    "unicode: héllo wörld ünïcode é中文",
]


@pytest.mark.parametrize("text", SAMPLES)
def test_shingle_hashes_twins(text):
    vec = set(int(v) for v in H.shingle_hashes(text, 4))
    py = H.shingle_hashes_py(text, 4)
    assert vec == py


@pytest.mark.parametrize("text", [s for s in SAMPLES if s])
def test_minhash_twins(text):
    sh_vec = H.shingle_hashes(text, 4)
    sh_py = H.shingle_hashes_py(text, 4)
    vec = [int(v) for v in H.minhash(sh_vec, 32, seed=42)]
    py = H.minhash_py(sh_py, 32, seed=42)
    assert vec == py


@pytest.mark.parametrize("text", [s for s in SAMPLES if s])
def test_simhash_twins(text):
    sh_vec = H.shingle_hashes(text, 4)
    sh_py = H.shingle_hashes_py(text, 4)
    assert H.simhash64(sh_vec, seed=42) == H.simhash64_py(sh_py, seed=42)


def test_splitmix_twins_random():
    rng = random.Random(1)
    xs = [rng.getrandbits(64) for _ in range(1000)]
    vec = H.splitmix64(np.array(xs, dtype=np.uint64))
    for x, v in zip(xs, vec):
        assert int(v) == H.splitmix64_py(x)


def test_minhash_jaccard_estimate_accuracy():
    """MinHash lane-match fraction ≈ exact Jaccard (property test from
    SURVEY.md §5)."""
    rng = random.Random(2)
    base = {rng.getrandbits(64) for _ in range(2000)}
    overlap = set(list(base)[:1500])
    other = overlap | {rng.getrandbits(64) for _ in range(500)}
    exact = len(base & other) / len(base | other)
    a = H.minhash(np.array(sorted(base), dtype=np.uint64), 256, 42)
    b = H.minhash(np.array(sorted(other), dtype=np.uint64), 256, 42)
    est = float(np.mean(a == b))
    assert abs(est - exact) < 0.08


def test_signed_roundtrip():
    for x in [0, 1, 2**63 - 1, 2**63, 2**64 - 1]:
        s = H.to_signed64(x)
        assert H.to_unsigned64(s) == x


def test_binmin_union_algebra():
    """binmin(A ∪ B) == elementwise-min(binmin(A), binmin(B)) — the
    property the repo-level sketch rollup (operators/sketch.py) rests
    on — and minhash == densify(binmin) (refactor is behavior-equal)."""
    rng = random.Random(7)
    p, seed = 128, 1
    for _ in range(10):
        a = np.array(
            rng.sample(range(1, 1 << 60), rng.randint(1, 300)), dtype=np.uint64
        )
        b = np.array(
            rng.sample(range(1, 1 << 60), rng.randint(1, 300)), dtype=np.uint64
        )
        u = np.union1d(a, b)
        bm_u = H.minhash_binmin(u, p, seed)
        bm_min = np.minimum(
            H.minhash_binmin(a, p, seed), H.minhash_binmin(b, p, seed)
        )
        assert (bm_u == bm_min).all()
        assert (H.minhash(u, p, seed) == H.densify_binmin(bm_u)).all()


class TestNativeLcs:
    """functions/lcs_native.py must be a drop-in accelerator for the
    Python suffix automaton — identical lengths on arbitrary input
    (round-4 profile: LCS was 85% of verify wall; the C kernel is the
    fix, the Python automaton the portable fallback)."""

    def test_native_matches_python_automaton(self):
        import random

        from twinspect_spark.functions.lcs_native import (
            lcs_len_native,
            native_available,
        )
        from twinspect_spark.operators.verify import _lcs_len as py_ref

        if not native_available():
            import pytest

            pytest.skip("no C compiler on this host")
        rng = random.Random(7)
        alpha = "abcdef é中"
        for _ in range(200):
            a = "".join(
                rng.choice(alpha) for _ in range(rng.randint(0, 60))
            )
            b = "".join(
                rng.choice(alpha) for _ in range(rng.randint(0, 60))
            )
            # py_ref dispatches to native when available; call the
            # underlying automaton by disabling dispatch via strings
            # short enough that both paths are exercised through the
            # public entry: compare native against a brute-force scan
            best = 0
            for i in range(len(a)):
                for j in range(i + best + 1, len(a) + 1):
                    if a[i:j] in b:
                        best = j - i
                    else:
                        break
            assert lcs_len_native(a, b) == best
            assert py_ref(a, b) == best

    def test_empty_and_disjoint(self):
        from twinspect_spark.functions.lcs_native import lcs_len_native

        if lcs_len_native("", "x") is None:
            return  # no compiler: fallback covered by verify tests
        assert lcs_len_native("", "x") == 0
        assert lcs_len_native("x", "") == 0
        assert lcs_len_native("abc", "xyz") == 0
        assert lcs_len_native("abc", "abc") == 3
