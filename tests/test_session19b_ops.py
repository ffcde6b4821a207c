from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from twinspect_spark.queries import (
    q_customer_rfm_segments,
    q_min_cost_supplier,
    q_session_transition_matrix,
    q_supplier_part_variety,
)

SF = "/root/testdata/sf0.001"


def test_min_cost_supplier_is_argmin(spark):
    rows = q_min_cost_supplier(spark, SF).collect()
    assert rows
    # one supplier per part
    parts = [r["p_partkey"] for r in rows]
    assert len(parts) == len(set(parts))
    # spot-check argmin against a direct recomputation for 5 parts
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    for r in rows[:5]:
        cand = (
            li.where(F.col("l_partkey") == r["p_partkey"])
            .groupBy("l_suppkey")
            .agg(
                F.round(
                    F.min(F.col("l_extendedprice") / F.col("l_quantity")), 6
                ).alias("c")
            )
            .collect()
        )
        best = min(cand, key=lambda x: (x["c"], x["l_suppkey"]))
        assert (best["l_suppkey"], best["c"]) == (
            r["s_suppkey"],
            r["min_cost"],
        )


def test_supplier_variety_excludes_bad(spark):
    out = q_supplier_part_variety(spark, SF)
    bad = {
        r["s_suppkey"]
        for r in spark.read.parquet(f"{SF}/supplier.parquet")
        .where("s_acctbal < 0")
        .collect()
    }
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    n_supp = li.select("l_suppkey").distinct().count()
    mx = out.agg(F.max("supplier_cnt")).collect()[0][0]
    assert mx <= n_supp - len(bad) if bad else mx <= n_supp


def test_rfm_scores_partition_customers_evenly(spark):
    rows = q_customer_rfm_segments(spark, SF).collect()
    n = len(rows)
    assert n > 0
    for col in ("r_score", "f_score", "m_score"):
        c = Counter(r[col] for r in rows)
        assert set(c) <= {1, 2, 3, 4}
        # quartiles from integer rank math: sizes differ by at most 1
        assert max(c.values()) - min(c.values()) <= 1
    for r in rows:
        assert r["segment"] == f"{r['r_score']}{r['f_score']}{r['m_score']}"


def test_rfm_monotone_in_rank(spark):
    rows = q_customer_rfm_segments(spark, SF).collect()
    # lower recency must never get a worse (higher) r_score than a
    # strictly higher recency
    by_rec = sorted(rows, key=lambda r: (r["recency_days"], r["c_custkey"]))
    scores = [r["r_score"] for r in by_rec]
    assert scores == sorted(scores)


def test_transition_matrix_probabilities(spark):
    rows = q_session_transition_matrix(spark, SF).collect()
    assert rows
    by_prev: dict[str, list] = {}
    for r in rows:
        by_prev.setdefault(r["prev_type"], []).append(r)
    for prev, rs in by_prev.items():
        tot = sum(r["n"] for r in rs)
        for r in rs:
            assert r["p_ppm"] == (r["n"] * 1_000_000) // tot
        # integer-floor probabilities sum to <= 1e6 within |types| ulps
        s = sum(r["p_ppm"] for r in rs)
        assert 1_000_000 - len(rs) < s <= 1_000_000


def test_transition_matrix_counts_conserve_steps(spark):
    rows = q_session_transition_matrix(spark, SF).collect()
    total_steps = sum(r["n"] for r in rows)
    ev = spark.read.parquet(f"{SF}/events.parquet")
    n_events = ev.count()
    n_users = ev.select("user_id").distinct().count()
    assert total_steps == n_events - n_users  # lag drops one per user


def test_price_outliers_mad_hand_check(spark):
    from twinspect_spark.queries import q_price_outliers_mad

    rows = q_price_outliers_mad(spark, SF).collect()
    assert rows
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    part = spark.read.parquet(f"{SF}/part.parquet")
    import numpy as np

    x = (
        li.join(part, li.l_partkey == part.p_partkey)
        .selectExpr("p_brand", "l_extendedprice / l_quantity AS unit")
        .toPandas()
    )
    for r in rows[:3]:
        v = np.sort(x[x.p_brand == r["p_brand"]].unit.values)
        med = round(float(np.percentile(v, 50)), 6)
        assert med == r["median_unit"]
        adev = np.abs(v - med)
        mad = round(float(np.percentile(adev, 50)), 6)
        assert mad == r["mad_unit"]
        assert r["n_outliers"] == int((adev > 10 * mad).sum())
        assert r["n_items"] == len(v)


def test_events_debounce_conservation(spark):
    from twinspect_spark.queries import q_events_debounce

    rows = q_events_debounce(spark, SF).collect()
    ev_n = spark.read.parquet(f"{SF}/events.parquet").count()
    assert sum(r["n_total"] for r in rows) == ev_n
    for r in rows:
        assert 0 <= r["n_dropped"] < r["n_total"]


def test_repo_dep_entropy_bounds(spark):
    from twinspect_spark.queries import q_repo_dep_entropy

    rows = q_repo_dep_entropy(spark, SF).collect()
    assert rows
    import math

    for r in rows:
        # 0 <= H <= log2(distinct deps)
        assert -1e-9 <= r["entropy_bits"] <= math.log2(
            r["n_distinct_deps"]
        ) + 1e-9
        assert r["n_distinct_deps"] <= r["n_imports"]


def test_idle_rich_customers_thresholds(spark):
    from twinspect_spark.queries import q_idle_rich_customers

    rows = q_idle_rich_customers(spark, SF).collect()
    assert rows  # recency arm keeps the Q22 shape non-degenerate here
    cust = spark.read.parquet(f"{SF}/customer.parquet")
    n_above = cust.where("c_acctbal > 0").count()
    assert sum(r["n_cust"] for r in rows) <= n_above


def test_percentile_ranks_boundaries(spark):
    from twinspect_spark.queries import q_order_percentile_ranks

    rows = q_order_percentile_ranks(spark, SF).collect()
    by_p: dict[str, list] = {}
    for r in rows:
        by_p.setdefault(r["o_orderpriority"], []).append(r)
    for p, rs in by_p.items():
        n = len(rs)
        ranks = sorted(r["rn"] for r in rs)
        assert ranks == list(range(1, n + 1))
        ppms = {r["rn"]: r["pr_ppm"] for r in rs}
        assert ppms[1] == 0
        assert ppms[n] == 1_000_000


def test_salted_agg_equals_direct(spark):
    from twinspect_spark.queries import q_salted_agg_orders

    got = {
        r["o_custkey"]: (r["n_orders"], r["total_price"])
        for r in q_salted_agg_orders(spark, SF).collect()
    }
    direct = {
        r["o_custkey"]: (r["n"], r["t"])
        for r in spark.read.parquet(f"{SF}/orders.parquet")
        .groupBy("o_custkey")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.round(
                F.sum(F.col("o_totalprice").cast("decimal(38,2)")).cast(
                    "double"
                ),
                2,
            ).alias("t"),
        )
        .collect()
    }
    assert got == direct


def test_monthly_growth_recomputation(spark):
    from twinspect_spark.queries import q_monthly_revenue_growth

    rows = sorted(
        q_monthly_revenue_growth(spark, SF).collect(),
        key=lambda r: r["month"],
    )
    assert rows[0]["growth_ppm"] is None
    prev = None
    for r in rows:
        cents = round(r["revenue"] * 100)
        if prev is not None:
            assert r["growth_ppm"] == (cents * 1_000_000) // prev - 1_000_000
        prev = cents


def test_int8_quant_error_bounds(spark):
    from twinspect_spark.queries import q_embedding_int8_quant_error

    rows = q_embedding_int8_quant_error(spark, SF).collect()
    assert rows
    for r in rows:
        assert r["v_min"] <= r["v_max"]
        # per-element error is < one quantization step
        step = (r["v_max"] - r["v_min"]) / 255
        assert 0 <= r["mean_abs_err"] <= step + 1e-9
