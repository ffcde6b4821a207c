"""Property tests (SURVEY.md §5): statistical behavior of the signature
kernels — MinHash estimate accuracy over random set pairs, LSH band
collision vs the analytic 1-(1-s^r)^b curve, SimHash/Jaccard
monotonicity. Pure numpy, no Spark session."""

from __future__ import annotations

import random

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from twinspect_spark.functions import hashing as H

NUM_PERM = 128
SEED = 42


def _pair_with_jaccard(rng: random.Random, n: int, j: float):
    """Two hash-sets of ~n elements with Jaccard ≈ j."""
    inter = int(n * 2 * j / (1 + j))
    only = n - inter
    shared = [rng.getrandbits(64) for _ in range(inter)]
    a = shared + [rng.getrandbits(64) for _ in range(only)]
    b = shared + [rng.getrandbits(64) for _ in range(only)]
    return (
        np.array(sorted(set(a)), dtype=np.uint64),
        np.array(sorted(set(b)), dtype=np.uint64),
    )


@given(st.integers(0, 2**32), st.floats(0.3, 0.95))
@settings(max_examples=25, deadline=None)
def test_minhash_estimate_tracks_jaccard(seed, target_j):
    rng = random.Random(seed)
    a, b = _pair_with_jaccard(rng, 600, target_j)
    sa = set(a.tolist())
    sb = set(b.tolist())
    exact = len(sa & sb) / len(sa | sb)
    ma = H.minhash(a, NUM_PERM, SEED)
    mb = H.minhash(b, NUM_PERM, SEED)
    est = float(np.mean(ma == mb))
    # OPH lane-match is a consistent estimator; 128 bins on 600-element
    # sets → sampling σ ≈ 0.05, allow 4σ
    assert abs(est - exact) < 0.2


def test_lsh_band_collision_matches_analytic_curve():
    """Empirical P(≥1 band collision) vs 1-(1-s^r)^b within binomial
    noise, across the similarity range that matters for thresholding."""
    rng = random.Random(7)
    r = NUM_PERM // 16  # rows per band at the default 16 bands
    b = 16
    for s in (0.5, 0.7, 0.9):
        hits = 0
        trials = 120
        exacts = []
        for _ in range(trials):
            x, y = _pair_with_jaccard(rng, 500, s)
            sx = set(x.tolist())
            sy = set(y.tolist())
            exacts.append(len(sx & sy) / len(sx | sy))
            mx = H.minhash(x, NUM_PERM, SEED)
            my = H.minhash(y, NUM_PERM, SEED)
            bands_x = mx.reshape(b, r)
            bands_y = my.reshape(b, r)
            if bool(np.any(np.all(bands_x == bands_y, axis=1))):
                hits += 1
        s_eff = float(np.mean(exacts))
        expect = 1 - (1 - s_eff**r) ** b
        sigma = (expect * (1 - expect) / trials) ** 0.5
        # OPH densification correlates lanes slightly; allow 5σ + 0.05
        assert abs(hits / trials - expect) < 5 * sigma + 0.05, (
            s, hits / trials, expect
        )


def test_simhash_hamming_monotone_in_similarity():
    """Higher Jaccard → lower expected SimHash Hamming distance."""
    rng = random.Random(3)
    means = []
    for s in (0.2, 0.5, 0.8, 0.95):
        ds = []
        for _ in range(60):
            x, y = _pair_with_jaccard(rng, 400, s)
            hx = H.simhash64(x, SEED)
            hy = H.simhash64(y, SEED)
            ds.append(H.hamming64_py(hx, hy))
        means.append(sum(ds) / len(ds))
    assert means[0] > means[1] > means[2] > means[3]
    assert means[-1] < 8  # near-dups land inside the Hamming ball


@given(st.text(min_size=0, max_size=200))
@settings(max_examples=60, deadline=None)
def test_signature_twins_agree_on_arbitrary_text(text):
    """numpy and scalar implementations agree on any unicode input."""
    sh_np = H.shingle_hashes(text, 4)
    sh_py = H.shingle_hashes_py(text, 4)
    assert set(int(v) for v in sh_np) == sh_py
    mh_np = [int(v) for v in H.minhash(sh_np, 32, SEED)]
    mh_py = H.minhash_py(sh_py, 32, SEED)
    assert mh_np == mh_py
    assert int(H.simhash64(sh_np, SEED)) == H.simhash64_py(sh_py, SEED)


def test_union_find_matches_bruteforce_components():
    """Driver union-find equals a brute-force reachability closure on
    random graphs (the small-graph CC fast path's kernel)."""
    rng = random.Random(11)
    for _ in range(20):
        n = rng.randint(2, 40)
        edges = [
            (rng.randint(0, n - 1), rng.randint(0, n - 1))
            for _ in range(rng.randint(1, 60))
        ]
        edges = [(a, b) for a, b in edges if a != b]
        if not edges:
            continue
        # brute force: iterate label minimization to fixpoint
        label = {v: v for e in edges for v in e}
        changed = True
        while changed:
            changed = False
            for a, b in edges:
                m = min(label[a], label[b])
                if label[a] != m or label[b] != m:
                    label[a] = label[b] = m
                    changed = True
        # kernel under test (no Spark needed: call the pure part)
        parent: dict[int, int] = {}

        def find(x: int) -> int:
            r = x
            while parent.get(r, r) != r:
                parent[r] = parent.get(parent[r], parent[r])
                r = parent[r]
            return r

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                lo, hi = (ra, rb) if ra < rb else (rb, ra)
                parent[hi] = lo
        got = {v: find(v) for v in label}
        assert got == label
