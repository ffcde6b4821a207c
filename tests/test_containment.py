"""Density-adaptive containment engine: the dense bitmap/sgemm tier and
the prefix-filter join tier must produce IDENTICAL pair sets (both are
lossless by construction), and the router must pick dense exactly when
n_docs * vocab fits the broadcast budget."""

from __future__ import annotations

import pytest

import twinspect_spark.operators.containment as C
from twinspect_spark.queries import q_ngram_containment_engine

SF = "/root/testdata/sf0.001"


def _rows(df):
    return sorted(
        (r["a"], r["b"], r["containment"], r["jaccard"]) for r in df.collect()
    )


def test_dense_and_prefix_tiers_identical(spark, monkeypatch):
    dense = _rows(q_ngram_containment_engine(spark, SF))
    # force the prefix-filter join by shrinking the dense budget to zero
    monkeypatch.setattr(C, "DENSE_CELLS_MAX", 0)
    prefix = _rows(q_ngram_containment_engine(spark, SF))
    assert dense == prefix
    assert len(dense) > 0


def test_dense_tier_selected_at_gate_scale(spark):
    from twinspect_spark.queries import _doc_shingles

    n, v = C.containment_stats(_doc_shingles(spark, SF))
    assert n * v <= C.DENSE_CELLS_MAX  # the gate corpus routes dense
