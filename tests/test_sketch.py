"""Repo-level sketch rollup (operators/sketch.py) + SemDeDup
(operators/semdedup.py)."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from twinspect_spark.config import DedupConfig
from twinspect_spark.functions import hashing as H
from twinspect_spark.operators.semdedup import semdedup_prune
from twinspect_spark.operators.sketch import (
    doc_binmin,
    group_sketch,
    sketch_pair_similarity,
)

CFG = DedupConfig(num_perm=64)


def _union_sketch(texts: list[str]) -> np.ndarray:
    """Direct sketch of the unioned shingle-hash set (the ground truth
    the distributed rollup must reproduce)."""
    hashes = np.unique(
        np.concatenate(
            [H.shingle_hashes(t, CFG.shingle_size) for t in texts]
        )
    )
    return H.minhash(hashes, CFG.num_perm, CFG.seed)


def test_group_sketch_equals_union_sketch(spark):
    groups = {
        "g1": ["alpha beta gamma delta", "beta gamma delta epsilon"],
        "g2": ["one two three four five six", "seven eight nine ten"],
        "g3": ["alpha beta gamma delta"],  # proper subset of g1's union
    }
    rows = [(g, t) for g, ts in groups.items() for t in ts]
    df = spark.createDataFrame(rows, "src string, t string")
    lanes = (
        group_sketch(doc_binmin(df, CFG, id_col="src", text_col="t"), "src", CFG)
        .orderBy("group_key", "bin")
        .collect()
    )
    got: dict[str, list[int]] = {}
    for r in lanes:
        got.setdefault(r.group_key, []).append(r.lane)
    for g, texts in groups.items():
        expect = H.to_signed64(_union_sketch(texts)).tolist()
        assert got[g] == expect, g


def test_sketch_pair_similarity_matrix(spark):
    rows = [
        ("a", "the quick brown fox jumps over the lazy dog"),
        ("b", "the quick brown fox jumps over the lazy dog"),  # identical
        ("c", "zzzz qqqq wwww kkkk yyyy xxxx vvvv"),
    ]
    df = spark.createDataFrame(rows, "src string, t string")
    lanes = group_sketch(
        doc_binmin(df, CFG, id_col="src", text_col="t"), "src", CFG
    )
    sim = {
        (r.src_a, r.src_b): (r.lanes_match, r.est_jaccard)
        for r in sketch_pair_similarity(lanes, CFG.num_perm).collect()
    }
    assert len(sim) == 3  # full matrix, zero-match pairs included
    assert sim[("a", "b")] == (CFG.num_perm, 1.0)
    assert sim[("a", "c")][0] < CFG.num_perm // 4


def test_semdedup_keep_rule(spark):
    # one cell; vecs 1/2/3 mutually near-identical, 4 orthogonal.
    # centroid-cosines: 3 lowest among the dupes -> 3 kept, 1 and 2
    # pruned pointing at 3.
    members = spark.createDataFrame(
        [
            (1, [1.0, 0.0], 1.0, 0, 0.95),
            (2, [0.999, 0.01], 1.0, 0, 0.93),
            (3, [0.998, 0.02], 1.0, 0, 0.91),
            (4, [0.0, 1.0], 1.0, 0, 0.40),
        ],
        "vec_id long, embedding array<double>, nrm double, cell int, ccos double",
    )
    pruned = {
        r.vec_id: r.keep_id
        for r in semdedup_prune(members, eps=0.99).collect()
    }
    assert pruned == {1: 3, 2: 3}


def test_semdedup_cell_fence(spark):
    # identical vectors in DIFFERENT cells are never compared (the
    # SemDeDup approximation, by construction)
    members = spark.createDataFrame(
        [
            (1, [1.0, 0.0], 1.0, 0, 0.9),
            (2, [1.0, 0.0], 1.0, 1, 0.9),
        ],
        "vec_id long, embedding array<double>, nrm double, cell int, ccos double",
    )
    assert semdedup_prune(members, eps=0.5).count() == 0


# ---------------------------------------------------------------- HLL sketch


def test_hll_bitlength_exact():
    """The 6-step binary-search bit length must match int.bit_length
    exactly — float log2 would round wrong above 2^53."""
    from twinspect_spark.operators.sketch import HLL_RHO_MAX, hll_registers

    vals = [0, 1, 2, (1 << 53) - 1, 1 << 53, (1 << 54) - 1, (1 << 56) - 1]
    # register 0 for all: multiply by 256 so payload == val
    mixed = np.array([v * 256 for v in vals], dtype=np.uint64)
    regs = hll_registers(mixed)
    assert regs[0] == max(HLL_RHO_MAX - v.bit_length() for v in vals)
    for v in vals:
        single = hll_registers(np.array([v * 256], dtype=np.uint64))
        assert single[0] == HLL_RHO_MAX - v.bit_length()


def test_hll_register_union_algebra():
    """registers(A ∪ B) == elementwise-max(registers(A), registers(B))."""
    import random

    from twinspect_spark.operators.sketch import hll_registers

    rng = random.Random(13)
    a = np.array(rng.sample(range(1 << 62), 5000), dtype=np.uint64)
    b = np.array(rng.sample(range(1 << 62), 5000), dtype=np.uint64)
    u = np.union1d(a, b)
    assert (
        hll_registers(u)
        == np.maximum(hll_registers(a), hll_registers(b))
    ).all()


def test_hll_estimate_accuracy(spark):
    """Estimate within 4 sigma (1.04/sqrt(256) ≈ 6.5% per sigma) of the
    true cardinality across two orders of magnitude."""
    from twinspect_spark.operators.sketch import HLL_M, hll_estimate, hll_registers

    rng = np.random.default_rng(7)
    rows = []
    for gi, n in enumerate([1000, 20000, 100000]):
        # full-range uint64, like the mixed production hashes — a
        # smaller range biases every payload's leading-zero count
        hashes = rng.integers(0, 1 << 64, size=n, dtype=np.uint64)
        regs = hll_registers(np.unique(hashes))
        rows += [(str(gi), int(r), int(regs[r])) for r in range(HLL_M)]
    df = spark.createDataFrame(rows, "group_key string, register int, rho int")
    est = {
        r.group_key: r.est_distinct
        for r in hll_estimate(df, "group_key").collect()
    }
    for gi, n in enumerate([1000, 20000, 100000]):
        assert abs(est[str(gi)] - n) / n < 4 * 1.04 / np.sqrt(HLL_M)
