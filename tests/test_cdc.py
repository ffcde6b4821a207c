"""Content-defined chunking kernel: vectorized numpy vs scalar twin,
lossless partition, insertion robustness vs fixed-width chunking."""

import random

from twinspect_spark.operators.cdc import cdc_chunks, cdc_chunks_py, cdc_key

K, D = 8, 64
KEY = cdc_key(42)


def _rand_text(rng, n, alpha="abcdefgh "):
    return "".join(rng.choice(alpha) for _ in range(n))


def test_numpy_matches_scalar_twin():
    rng = random.Random(3)
    for _ in range(50):
        t = _rand_text(rng, rng.randint(0, 600))
        assert cdc_chunks(t, K, D, KEY) == cdc_chunks_py(t, K, D, KEY)


def test_unicode_matches_scalar_twin():
    rng = random.Random(5)
    for _ in range(20):
        t = _rand_text(rng, rng.randint(0, 300), alpha="日本語コードαβ ∑x")
        assert cdc_chunks(t, K, D, KEY) == cdc_chunks_py(t, K, D, KEY)


def test_lossless_partition():
    rng = random.Random(7)
    for _ in range(30):
        t = _rand_text(rng, rng.randint(1, 2000))
        chunks = cdc_chunks(t, K, D, KEY)
        assert "".join(chunks) == t
        assert all(c for c in chunks)  # no empty chunks


def test_short_and_empty_texts():
    assert cdc_chunks("", K, D, KEY) == []
    for t in ["a", "ab", "a" * K, "a" * (K + 1)]:
        got = cdc_chunks(t, K, D, KEY)
        assert got == cdc_chunks_py(t, K, D, KEY)
        assert "".join(got) == t


def test_mean_chunk_length_near_d():
    rng = random.Random(11)
    t = _rand_text(rng, 50_000, alpha="abcdefghijklmnop ")
    chunks = cdc_chunks(t, K, D, KEY)
    mean = len(t) / len(chunks)
    # geometric with p = 1/D → mean ≈ D; allow wide slack
    assert D / 3 < mean < D * 3


def test_insertion_robustness_beats_fixed_chunking():
    """Inserting a span mid-document must re-chunk only the edit's
    neighborhood: the CDC chunk multisets before/after the edit share
    all but O(1) chunks, while fixed-width chunking shifts (and thus
    changes) every chunk after the edit point."""
    rng = random.Random(13)
    t = _rand_text(rng, 4000)
    edited = t[:1000] + "INSERTED SPAN " + t[1000:]

    a, b = cdc_chunks(t, K, D, KEY), cdc_chunks(edited, K, D, KEY)
    from collections import Counter

    shared_cdc = sum((Counter(a) & Counter(b)).values())
    # all but the few chunks overlapping the edit survive
    assert shared_cdc >= len(a) - 3

    w = D  # fixed windows of the same mean size
    fa = [t[i : i + w] for i in range(0, len(t), w)]
    fb = [edited[i : i + w] for i in range(0, len(edited), w)]
    shared_fixed = sum((Counter(fa) & Counter(fb)).values())
    # fixed chunking keeps only the prefix before the edit
    assert shared_fixed <= 1000 // w + 1
    assert shared_cdc / len(a) > shared_fixed / len(fa)


def test_boundaries_are_content_local():
    """The same text embedded at two different offsets chunks into the
    same interior chunks (boundaries are functions of content, not
    position)."""
    rng = random.Random(17)
    core = _rand_text(rng, 3000)
    pre_a, pre_b = _rand_text(rng, 500), _rand_text(rng, 1700)
    ca = set(cdc_chunks(pre_a + core, K, D, KEY))
    cb = set(cdc_chunks(pre_b + core, K, D, KEY))
    interior = set(cdc_chunks(core, K, D, KEY)[1:-1])
    # every interior chunk of the core that starts after the first
    # core-internal boundary reappears in both embeddings
    assert len(interior & ca & cb) >= len(interior) - 2
