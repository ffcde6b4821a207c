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


def test_streaks_hand_recomputation(spark):
    import datetime as dt
    from collections import defaultdict

    from twinspect_spark.queries import q_user_activity_streaks

    rows = {r["user_id"]: r for r in q_user_activity_streaks(spark, SF).collect()}
    ev = spark.read.parquet(f"{SF}/events.parquet")
    by_user = defaultdict(set)
    for r in ev.select("user_id", F.col("ts").cast("date").alias("d")).collect():
        by_user[r["user_id"]].add(r["d"])
    for uid, days in by_user.items():
        ds = sorted(days)
        streaks, cur = [], 1
        for a, b in zip(ds, ds[1:]):
            if (b - a).days == 1:
                cur += 1
            else:
                streaks.append(cur)
                cur = 1
        streaks.append(cur)
        r = rows[uid]
        assert r["longest_streak"] == max(streaks)
        assert r["n_streaks"] == len(streaks)
        assert r["last_active_day"] == ds[-1]


def test_revenue_tree_shares_consistent(spark):
    from collections import defaultdict

    from twinspect_spark.queries import q_region_nation_revenue_tree

    rows = q_region_nation_revenue_tree(spark, SF).collect()
    by_region = defaultdict(list)
    for r in rows:
        by_region[r["r_name"]].append(r)
    region_share_total = 0
    seen_regions = set()
    for region, rs in by_region.items():
        s = sum(r["share_of_region_ppm"] for r in rs)
        assert 1_000_000 - len(rs) < s <= 1_000_000
        # region share identical on every row of the region
        shares = {r["region_share_ppm"] for r in rs}
        assert len(shares) == 1
        if region not in seen_regions:
            region_share_total += shares.pop()
            seen_regions.add(region)
    assert 1_000_000 - len(by_region) < region_share_total <= 1_000_000


def test_mode_is_argmax_with_smallest_tiebreak(spark):
    from twinspect_spark.queries import q_part_mode_quantity

    rows = q_part_mode_quantity(spark, SF).collect()
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    part = spark.read.parquet(f"{SF}/part.parquet")
    counts = (
        li.join(part, li.l_partkey == part.p_partkey)
        .groupBy("p_brand", F.col("l_quantity").cast("long").alias("q"))
        .count()
        .collect()
    )
    from collections import defaultdict

    per_brand = defaultdict(dict)
    for r in counts:
        per_brand[r["p_brand"]][r["q"]] = r["count"]
    for r in rows:
        cm = per_brand[r["p_brand"]]
        best = min(
            (q for q in cm if cm[q] == max(cm.values()))
        )
        assert (r["mode_quantity"], r["mode_count"]) == (best, cm[best])


def test_growth_curve_identities(spark):
    from twinspect_spark.queries import q_user_growth_curve

    rows = sorted(q_user_growth_curve(spark, SF).collect(), key=lambda r: r["day"])
    ev = spark.read.parquet(f"{SF}/events.parquet")
    n_users = ev.select("user_id").distinct().count()
    assert rows[-1]["cum_users"] == n_users
    cum = 0
    for r in rows:
        cum += r["n_new"]
        assert r["cum_users"] == cum
        assert r["n_returning"] == r["n_active"] - r["n_new"]
        assert 0 <= r["n_new"] <= r["n_active"] <= r["cum_users"]


def test_dense_ties_keep_all_peers(spark):
    from collections import defaultdict

    from twinspect_spark.queries import q_top_quantity_dense_ties

    rows = q_top_quantity_dense_ties(spark, SF).collect()
    by_brand = defaultdict(list)
    for r in rows:
        by_brand[r["p_brand"]].append(r)
    for brand, rs in by_brand.items():
        levels = sorted({r["level"] for r in rs})
        assert levels == list(range(1, len(levels) + 1))
        # every row at a level shares that level's count value
        by_level = defaultdict(set)
        for r in rs:
            by_level[r["level"]].add(r["n"])
        assert all(len(v) == 1 for v in by_level.values())
        # counts strictly decrease across levels
        ns = [by_level[l].pop() for l in levels]
        assert ns == sorted(ns, reverse=True) and len(set(ns)) == len(ns)


def test_abc_partition_and_order(spark):
    from twinspect_spark.queries import q_customer_abc_classes

    rows = {r["abc_class"]: r for r in q_customer_abc_classes(spark, SF).collect()}
    assert set(rows) == {"A", "B", "C"}
    n_cust = spark.read.parquet(f"{SF}/orders.parquet").select(
        "o_custkey"
    ).distinct().count()
    assert sum(r["n_customers"] for r in rows.values()) == n_cust
    # A carries ~80% with far fewer customers than C's tail
    assert rows["A"]["share_ppm"] >= 750_000
    s = sum(r["share_ppm"] for r in rows.values())
    assert 1_000_000 - 3 < s <= 1_000_000


def test_lines_histogram_mass(spark):
    from twinspect_spark.queries import q_order_lines_histogram

    rows = q_order_lines_histogram(spark, SF).collect()
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    assert sum(r["n_lines"] * r["n_orders"] for r in rows) == li.count()
    assert sum(r["n_orders"] for r in rows) == li.select(
        "l_orderkey"
    ).distinct().count()


def test_heatmap_grid_and_shares(spark):
    from twinspect_spark.queries import q_events_hour_heatmap

    rows = q_events_hour_heatmap(spark, SF).collect()
    for r in rows:
        assert 1 <= r["isodow"] <= 7 and 0 <= r["hour"] <= 23
    s = sum(r["share_ppm"] for r in rows)
    assert 1_000_000 - len(rows) < s <= 1_000_000


def test_discount_bands_partition_fact(spark):
    from twinspect_spark.queries import q_discount_band_effect

    rows = q_discount_band_effect(spark, SF).collect()
    li_n = spark.read.parquet(f"{SF}/lineitem.parquet").count()
    assert sum(r["n_items"] for r in rows) == li_n
    for r in rows:
        assert r["net_revenue"] <= r["gross_revenue"]
        assert 0 <= r["effective_discount_ppm"] < 200_000  # <= 10% rates


def test_zipf_slope_negative_and_share_sane(spark):
    from twinspect_spark.queries import q_zipf_word_slope

    r = q_zipf_word_slope(spark, SF).collect()[0]
    # this synthetic corpus has a ~31-word vocabulary — n is capped by
    # min(100, |vocab|), and the flat template distribution yields a
    # slope far above natural text's -1 (the audit's whole point)
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    vocab = (
        docs.selectExpr(
            "explode(filter(split(lower(text), '[^a-z0-9]+'),"
            " x -> x != '')) AS w"
        )
        .select("w")
        .distinct()
        .count()
    )
    assert r["n"] == min(100, vocab)
    assert r["zipf_slope"] < 0  # frequency still decreasing in rank
    assert 0 < r["top_word_share_ppm"] < 500_000


def test_hapax_bounds(spark):
    from twinspect_spark.queries import q_doc_hapax_ratio

    rows = q_doc_hapax_ratio(spark, SF).collect()
    assert rows
    for r in rows:
        assert 0 <= r["n_hapax"] <= r["n_distinct_words"]
        assert r["hapax_ppm"] == (
            r["n_hapax"] * 1_000_000
        ) // r["n_distinct_words"]


def test_vocab_growth_monotone_saturating(spark):
    from twinspect_spark.queries import q_corpus_vocab_growth

    rows = sorted(
        q_corpus_vocab_growth(spark, SF).collect(), key=lambda r: r["pct"]
    )
    assert [r["pct"] for r in rows] == [20, 40, 60, 80, 100]
    sizes = [r["vocab_size"] for r in rows]
    assert sizes == sorted(sizes)  # monotone non-decreasing
    # template corpus: vocabulary saturates essentially immediately
    assert sizes[0] >= sizes[-1] * 0.9


def test_hhi_bounds(spark):
    from twinspect_spark.queries import q_supplier_hhi_concentration

    rows = q_supplier_hhi_concentration(spark, SF).collect()
    for r in rows:
        lo = 1_000_000 // r["n_suppliers"] - r["n_suppliers"]
        assert lo <= r["hhi_ppm"] <= 1_000_000


def test_boxplot_ordering(spark):
    from twinspect_spark.queries import q_events_value_boxplot

    rows = q_events_value_boxplot(spark, SF).collect()
    for r in rows:
        assert (
            r["v_min"] <= r["q1"] <= r["median"] <= r["q3"] <= r["v_max"]
        )
        assert r["n_high_outliers"] >= 0


def test_char_classes_partition(spark):
    from twinspect_spark.queries import q_char_class_profile

    rows = q_char_class_profile(spark, SF).collect()
    for r in rows:
        s = r["alpha_ppm"] + r["digit_ppm"] + r["space_ppm"] + r["other_ppm"]
        assert 1_000_000 - 4 <= s <= 1_000_000


def test_gini_range_and_hand_value(spark):
    from twinspect_spark.queries import q_orders_value_gini

    r = q_orders_value_gini(spark, SF).collect()[0]
    assert 0 <= r["gini"] < 1
    # recompute directly
    per = (
        spark.read.parquet(f"{SF}/orders.parquet")
        .groupBy("o_custkey")
        .agg(
            (F.sum(F.col("o_totalprice").cast("decimal(38,2)")) * 100)
            .cast("long")
            .alias("cents")
        )
        .collect()
    )
    xs = sorted((p["cents"], p["o_custkey"]) for p in per)
    n = len(xs)
    sx = sum(x for x, _ in xs)
    six = sum((i + 1) * x for i, (x, _) in enumerate(xs))
    want = round(2.0 * six / (n * sx) - (n + 1) / n, 6)
    assert abs(r["gini"] - want) < 2e-6


def test_cdc_insertion_locality(spark):
    from twinspect_spark.queries import q_cdc_insertion_robustness

    rows = q_cdc_insertion_robustness(spark, SF).collect()
    assert rows
    for r in rows:
        lost = r["n_chunks_orig"] - r["n_common"]
        # the edit touches at most its own chunk plus one boundary
        # neighbor — fixed-window chunking would lose every chunk
        # after position 100
        assert 0 <= lost <= 2
        assert abs(r["n_chunks_edit"] - r["n_chunks_orig"]) <= 1
        assert r["survival_ppm"] == (
            r["n_common"] * 1_000_000
        ) // r["n_chunks_orig"]


def test_forward_asof_hand_case(spark):
    import datetime as dt

    from twinspect_spark.operators.asof import asof_join_forward

    def ts(m):
        return dt.datetime(2026, 4, 1, 10, m)

    left = spark.createDataFrame(
        [(1, 10, ts(0)), (2, 10, ts(5)), (3, 10, ts(30)), (4, 11, ts(0))],
        "eid long, k long, t timestamp",
    )
    right = spark.createDataFrame(
        [(100, 10, ts(5)), (101, 10, ts(20)), (102, 10, ts(20))],
        "rid long, k long, t timestamp",
    )
    out = {
        r["eid"]: r["asof_rid"]
        for r in asof_join_forward(
            left, right, "k", "t", "t", ["rid"], right_seq="rid"
        ).collect()
    }
    assert out[1] == 100      # earliest at-or-after 10:00 is 10:05
    assert out[2] == 100      # exact-ts match included
    assert out[3] is None     # nothing after 10:30
    assert out[4] is None     # no right rows for key 11
    # equal-ts peers at 10:20 resolve to the SMALLEST seq
    left2 = spark.createDataFrame(
        [(9, 10, ts(10))], "eid long, k long, t timestamp"
    )
    out2 = asof_join_forward(
        left2, right, "k", "t", "t", ["rid"], right_seq="rid"
    ).collect()[0]
    assert out2["asof_rid"] == 101


def test_forward_asof_query_semantics(spark):
    from twinspect_spark.queries import q_event_next_purchase_asof

    rows = q_event_next_purchase_asof(spark, SF).collect()
    assert rows
    matched = [r for r in rows if r["next_purchase_id"] is not None]
    assert matched
    for r in matched:
        assert r["days_to_purchase"] >= 0


def test_pps_sample_proportionality(spark):
    from twinspect_spark.queries import q_pps_systematic_sample

    rows = q_pps_systematic_sample(spark, SF).collect()
    # systematic PPS yields ~k selections (±1 boundary effects), each
    # crossing a distinct boundary unless one heavy item spans several
    assert 15 <= len(rows) <= 21
    idxs = [r["boundary_idx"] for r in rows]
    assert len(set(idxs)) == len(idxs)  # one selection per boundary
    assert all(r["w"] > 0 for r in rows)


def test_snapshot_expiry_accounting(spark):
    from twinspect_spark.queries import q_snapshot_expiry_plan

    rows = {r["commit_seq"]: r for r in q_snapshot_expiry_plan(spark, SF).collect()}
    assert set(rows) == {1, 2, 3}
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    n = docs.count()
    n3 = docs.where("doc_id % 3 = 0").count()
    n5 = docs.where("doc_id % 5 = 0").count()
    assert rows[1]["n_files_written"] == n
    assert rows[2]["n_files_written"] == n3
    assert rows[3]["n_files_written"] == n5
    # nothing supersedes the final commit
    assert rows[3]["n_superseded"] == 0
    # commit-2 versions superseded only where doc_id%15==0 (rev3 wrote over)
    n15 = docs.where("doc_id % 15 = 0").count()
    assert rows[2]["n_superseded"] == n15
    for r in rows.values():
        assert r["reclaimable_bytes"] <= r["bytes_written"]


def test_drawdown_bounds(spark):
    from twinspect_spark.queries import q_revenue_drawdown_profile

    r = q_revenue_drawdown_profile(spark, SF).collect()[0]
    assert r["max_drawdown"] >= 0
    assert abs(
        (r["peak_revenue"] - r["trough_revenue"]) - r["max_drawdown"]
    ) < 0.011  # cents rounding
    assert r["trough_revenue"] <= r["peak_revenue"]


def test_same_day_audit_groups(spark):
    from twinspect_spark.queries import q_same_day_order_audit

    rows = q_same_day_order_audit(spark, SF).collect()
    for r in rows:
        assert r["n_orders"] >= 2
        assert r["first_orderkey"] < r["last_orderkey"]


def test_seasonal_index_centers_on_unity(spark):
    from twinspect_spark.queries import q_monthly_seasonal_index

    rows = q_monthly_seasonal_index(spark, SF).collect()
    assert len(rows) == 12
    mean_idx = sum(r["seasonal_index_ppm"] for r in rows) / 12
    # indices average ~1e6 (exact only if every month spans the same
    # number of years; corpus ends mid-year so allow a few percent)
    assert 0.9e6 < mean_idx < 1.1e6
    for r in rows:
        assert r["n_years"] >= 1
        assert r["seasonal_index_ppm"] > 0


def test_burst_minutes_exact_threshold(spark):
    from twinspect_spark.queries import q_events_burst_minutes

    rows = q_events_burst_minutes(spark, SF).collect()
    ev = spark.read.parquet(f"{SF}/events.parquet")
    per = (
        ev.groupBy(F.date_trunc("minute", "ts").alias("m"))
        .count()
        .collect()
    )
    cs = [r["count"] for r in per]
    n, s1, s2 = len(cs), sum(cs), sum(c * c for c in cs)
    want = {
        c
        for c in cs
        if (c * n - s1) > 0 and (c * n - s1) ** 2 > 9 * (n * s2 - s1 * s1)
    }
    got_counts = {r["c"] for r in rows}
    assert got_counts == want
    for r in rows:
        assert r["excess_ppm"] == (r["c"] * n - s1) * 1_000_000 // s1


def test_qty_price_grid_shares(spark):
    from twinspect_spark.queries import q_qty_price_grid

    rows = q_qty_price_grid(spark, SF).collect()
    li_n = spark.read.parquet(f"{SF}/lineitem.parquet").count()
    assert sum(r["n"] for r in rows) == li_n
    s = sum(r["share_ppm"] for r in rows)
    assert 1_000_000 - len(rows) < s <= 1_000_000


def test_priority_mix_rows_per_year(spark):
    from collections import defaultdict

    from twinspect_spark.queries import q_priority_mix_by_year

    rows = q_priority_mix_by_year(spark, SF).collect()
    by_year = defaultdict(list)
    for r in rows:
        by_year[r["year"]].append(r)
    for year, rs in by_year.items():
        s = sum(r["share_ppm"] for r in rs)
        assert 1_000_000 - len(rs) < s <= 1_000_000


def test_anova_effect_near_zero_on_independent_draws(spark):
    from twinspect_spark.queries import q_priority_anova_effect

    r = q_priority_anova_effect(spark, SF).collect()[0]
    assert r["k"] == 5
    # this generator draws value independently of priority: eta^2
    # must be tiny and F unremarkable (well under the ~2.4 critical
    # value region at these dof)
    assert 0 <= r["eta_squared"] < 0.05
    assert 0 <= r["f_stat"] < 5
