"""Winnowing kernel: vectorized numpy vs scalar twin, paper guarantee,
edge cases (the repo's independent-twin oracle idiom)."""

import random

import numpy as np
import pytest

from twinspect_spark.operators.winnow import (
    winnow_fingerprints,
    winnow_fingerprints_py,
    winnow_key,
)

K, W = 8, 8
KEY = winnow_key(42)


def _rand_text(rng, n, alpha="ab"):
    # tiny alphabet on purpose: forces repeated grams, i.e. hash TIES,
    # exercising the rightmost tie-break in both implementations
    return "".join(rng.choice(alpha) for _ in range(n))


def test_numpy_matches_scalar_twin():
    rng = random.Random(3)
    for _ in range(50):
        t = _rand_text(rng, rng.randint(0, 200))
        vec = set(int(x) for x in winnow_fingerprints(t, K, W, KEY))
        assert vec == winnow_fingerprints_py(t, K, W, KEY)


def test_short_and_empty_texts():
    for t in ["", "a", "ab", "a" * K, "a" * (K + 1), "a" * (K + W - 1)]:
        fps = winnow_fingerprints(t, K, W, KEY)
        assert len(fps) >= 1
        assert set(int(x) for x in fps) == winnow_fingerprints_py(t, K, W, KEY)


def test_shared_run_guarantee():
    """Any common substring of >= k + w - 1 chars must yield at least
    one shared fingerprint (SIGMOD'03 guarantee threshold)."""
    rng = random.Random(9)
    needle = _rand_text(rng, K + W - 1, alpha="xyz")
    for _ in range(20):
        a = _rand_text(rng, 80) + needle + _rand_text(rng, 80)
        b = _rand_text(rng, 120, alpha="cd") + needle
        fa = set(int(x) for x in winnow_fingerprints(a, K, W, KEY))
        fb = set(int(x) for x in winnow_fingerprints(b, K, W, KEY))
        assert fa & fb, "guaranteed shared fingerprint missing"


def test_density_bound():
    """Selected positions per doc stay near the 2/(w+1) expectation —
    a 10x blowout would mean window selection is broken."""
    rng = random.Random(11)
    t = _rand_text(rng, 5000, alpha="abcdefghij")
    fps = winnow_fingerprints(t, K, W, KEY)
    n_positions = len(t) - K + 1
    assert len(fps) <= n_positions * 2 * 2 / (W + 1)
    assert len(fps) >= n_positions / (2 * W)


def test_position_invariance():
    """The same content shifted by a prefix keeps the interior
    fingerprints (locality: selection depends only on a w-window)."""
    rng = random.Random(5)
    body = _rand_text(rng, 300, alpha="mnop")
    f1 = set(int(x) for x in winnow_fingerprints(body, K, W, KEY))
    f2 = set(
        int(x) for x in winnow_fingerprints("zq" * 40 + body, K, W, KEY)
    )
    # all but the boundary-window fingerprints survive the shift
    assert len(f1 & f2) >= len(f1) * 0.8
