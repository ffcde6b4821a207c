from __future__ import annotations

import math

import numpy as np
from pyspark.sql import functions as F

from twinspect_spark.queries import (
    PCA_SCALE,
    q_embedding_power_iteration,
    q_events_error_rate_wilson,
    q_order_interarrival_profile,
)

SF = "/root/testdata/sf0.001"


def test_power_iteration_matches_numpy_direction(spark):
    rows = sorted(
        q_embedding_power_iteration(spark, SF).collect(),
        key=lambda r: r["d"],
    )
    assert len(rows) == 64
    v = np.array([r["v_scaled"] for r in rows], dtype=np.float64)
    assert np.abs(v).max() == PCA_SCALE  # renormalized each round
    # numpy reference: same fixed-point pipeline in float is close to
    # the true dominant eigenvector of X^T X after 3 iterations
    emb = spark.read.parquet(f"{SF}/embeddings.parquet").collect()
    X = np.floor(
        np.array([r["embedding"] for r in emb], dtype=np.float64) * PCA_SCALE
    )
    ref = np.ones(64)
    for _ in range(3):
        ref = X.T @ (X @ ref)
        ref = ref * PCA_SCALE / np.abs(ref).max()
    cos = float(
        v @ ref / (np.linalg.norm(v) * np.linalg.norm(ref))
    )
    assert cos > 0.999999  # integer truncation is sub-ulp here


def test_wilson_bound_below_rate_and_sane(spark):
    rows = q_events_error_rate_wilson(spark, SF).collect()
    assert rows
    for r in rows:
        rate = r["n_err"] / r["n"]
        assert r["wilson_low"] <= rate + 1e-12
        assert r["wilson_low"] >= -1e-9
        assert r["rate_ppm"] == (r["n_err"] * 1_000_000) // r["n"]
    # corpus-wide error fraction ~1/5 of event types
    tot = sum(r["n"] for r in rows)
    errs = sum(r["n_err"] for r in rows)
    assert 0.1 < errs / tot < 0.3


def test_interarrival_profile_bounds(spark):
    rows = q_order_interarrival_profile(spark, SF).collect()
    assert rows
    for r in rows:
        assert r["n_gaps"] > 0
        assert 0 <= r["p50_gap_days"] <= r["p90_gap_days"]
        assert r["mean_gap_days"] > 0


def test_bloom_runtime_filter_contract(spark):
    from twinspect_spark.queries import q_bloom_runtime_filter_audit

    r = q_bloom_runtime_filter_audit(spark, SF).collect()[0]
    assert r["n_false_neg"] == 0  # Bloom filters never false-negative
    assert r["n_bloom_pass"] == r["n_true"] + r["n_false_pos"]
    assert r["n_true"] <= r["n_bloom_pass"] <= r["n_keys"]
    # 4096 bits / ~30 urgent keys at sf0.001: fp rate must be tiny;
    # theoretical (1-e^{-kn/m})^k ~ (k*n/m)^k — allow generous slack
    assert r["fp_ppm"] < 100_000
    assert r["fp_ppm"] == (
        (r["n_false_pos"] * 1_000_000) // (r["n_keys"] - r["n_true"])
        if r["n_keys"] > r["n_true"]
        else 0
    )


def test_event_signature_users_conserved(spark):
    from twinspect_spark.queries import q_user_event_signature

    rows = q_user_event_signature(spark, SF).collect()
    ev = spark.read.parquet(f"{SF}/events.parquet")
    n_users = ev.select("user_id").distinct().count()
    assert sum(r["n_users"] for r in rows) == n_users
    # signature length mass equals total events
    total_len = sum(r["sig_len"] * r["n_users"] for r in rows)
    assert total_len == ev.count()


def test_dow_profile_shares(spark):
    from twinspect_spark.queries import q_orders_dow_profile

    rows = q_orders_dow_profile(spark, SF).collect()
    assert {r["isodow"] for r in rows} <= set(range(1, 8))
    s = sum(r["share_ppm"] for r in rows)
    assert 1_000_000 - len(rows) < s <= 1_000_000
