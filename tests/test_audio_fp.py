"""Audio sub-fingerprint dedup (q_audio_fingerprint_dedup): the
Haitsma-Kalker temporal-difference kernel over frame-band energies.

Property under test: a shared frame-ALIGNED segment of L frames yields
exactly L-1 shared sub-fingerprint codes regardless of where the
segment sits in either stream (each code depends on two consecutive
frames; matching is on distinct code values, so it is position-
invariant). The planted-jingle corpus structure itself is gated by the
DuckDB oracle at sf0.01; these tests pin the kernel semantics on a
hand-built corpus."""

from __future__ import annotations

import pytest

from twinspect_spark.queries import (
    AFP_FRAME,
    AFP_MIN_SHARED,
    q_audio_fingerprint_dedup,
)


def _frame(tag: str) -> str:
    """One deterministic frame-sized (AFP_FRAME chars) block."""
    return (tag * AFP_FRAME)[:AFP_FRAME]


@pytest.fixture(scope="module")
def afp_dir(spark, tmp_path_factory):
    """documents.parquet where only doc_id % 3 == 1 rows are audio:
    docs 1 and 4 share a 4-frame segment at DIFFERENT frame offsets
    (1 vs 2); doc 7 is unrelated; doc 10 is shorter than two frames
    (no codes at all). No doc_id hits the %19==5 jingle plant."""
    shared = "".join(_frame(f"S{k}") for k in range(4))
    rows = [
        (1, _frame("a") + shared + _frame("z")),
        (4, _frame("b") + _frame("c") + shared),
        (7, _frame("q") + _frame("r") + _frame("s")),
        (10, "tiny"),
        # non-audio rows (doc_id % 3 != 1) must be ignored entirely,
        # even when byte-identical to an audio doc
        (3, _frame("a") + shared + _frame("z")),
    ]
    d = tmp_path_factory.mktemp("afp")
    spark.createDataFrame(rows, "doc_id long, text string").coalesce(
        1
    ).write.mode("overwrite").parquet(str(d / "documents.parquet"))
    return str(d)


def test_shared_segment_codes_position_invariant(spark, afp_dir):
    out = q_audio_fingerprint_dedup(spark, afp_dir)
    rows = {(r["a"], r["b"]): r for r in out.collect()}
    # 4 shared frames -> 3 interior codes, exactly at the threshold;
    # the boundary codes (prev frame differs between docs) must NOT match
    assert set(rows) == {(1, 4)}
    assert rows[(1, 4)]["n_shared"] == 3 == AFP_MIN_SHARED
    # doc 1: 6 frames -> 5 codes; doc 4: 6 frames -> 5 codes
    assert rows[(1, 4)]["n_codes_a"] == 5
    assert rows[(1, 4)]["n_codes_b"] == 5
    assert rows[(1, 4)]["overlap_frac"] == pytest.approx(3 / 5)


def test_short_doc_and_modality_filter(spark, afp_dir):
    out = q_audio_fingerprint_dedup(spark, afp_dir)
    ids = {v for r in out.collect() for v in (r["a"], r["b"])}
    assert 10 not in ids  # < 2 frames -> no codes, no error
    assert 3 not in ids  # non-audio modality never enters the join
