from __future__ import annotations

from pyspark.sql import functions as F

from twinspect_spark.queries import (
    q_lineitem_corr_matrix,
    q_nation_trade_matrix,
    q_revenue_decile_lift,
    q_top_parts_per_brand,
)

SF = "/root/testdata/sf0.001"


def test_trade_matrix_mass_conservation(spark):
    rows = q_nation_trade_matrix(spark, SF).collect()
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    assert sum(r["n_items"] for r in rows) == li.count()
    total = round(
        sum(r["revenue"] for r in rows), 0
    )
    direct = li.agg(
        F.sum(
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                "decimal(38,4)"
            )
        ).cast("double")
    ).collect()[0][0]
    assert abs(total - direct) < 1.0  # per-cell rounding only


def test_decile_lift_monotone_and_complete(spark):
    rows = sorted(
        q_revenue_decile_lift(spark, SF).collect(), key=lambda r: r["decile"]
    )
    assert [r["decile"] for r in rows] == list(range(10))
    # ranked by DESC revenue: share must be non-increasing
    shares = [r["share_ppm"] for r in rows]
    assert shares == sorted(shares, reverse=True)
    assert rows[-1]["cum_share_ppm"] in (999_999, 1_000_000)
    cum = 0
    for r in rows:
        assert r["cum_share_ppm"] >= cum
        cum = r["cum_share_ppm"]


def test_corr_matrix_bounds_and_n(spark):
    rows = q_lineitem_corr_matrix(spark, SF).collect()
    assert {r["pair"] for r in rows} == {
        "quantity_price",
        "quantity_discount",
        "price_discount",
    }
    li_n = spark.read.parquet(f"{SF}/lineitem.parquet").count()
    for r in rows:
        assert r["n"] == li_n
        assert -1.0 <= r["pearson_r"] <= 1.0


def test_corr_measures_are_independent_draws(spark):
    # this generator draws quantity/price/discount INDEPENDENTLY, so
    # every pairwise correlation must sit near zero — the matrix's job
    # is to report that faithfully (|r| < 0.1 at n≈6000)
    rows = {
        r["pair"]: r["pearson_r"]
        for r in q_lineitem_corr_matrix(spark, SF).collect()
    }
    for pair, r in rows.items():
        assert abs(r) < 0.1, (pair, r)


def test_top_parts_rank_contract(spark):
    rows = q_top_parts_per_brand(spark, SF).collect()
    by_brand = {}
    for r in rows:
        by_brand.setdefault(r["p_brand"], []).append(r)
    for brand, rs in by_brand.items():
        ranks = sorted(r["rank"] for r in rs)
        assert ranks == list(range(1, len(rs) + 1))
        assert len(rs) <= 3
        ordered = sorted(rs, key=lambda r: r["rank"])
        revs = [r["revenue"] for r in ordered]
        assert revs == sorted(revs, reverse=True)


def test_typo_pairs_blocked_and_bounded(spark):
    from twinspect_spark.queries import q_part_name_typo_pairs

    rows = q_part_name_typo_pairs(spark, SF).collect()
    assert rows
    for r in rows:
        assert r["name_a"] < r["name_b"]
        assert r["name_a"].split(" ")[-1] == r["block"]
        assert r["name_b"].split(" ")[-1] == r["block"]
        assert 1 <= r["edit_dist"] <= 3  # distinct names: dist >= 1
    # python-side levenshtein spot check
    def lev(a, b):
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                prev, dp[j] = dp[j], min(
                    dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb)
                )
        return dp[-1]

    for r in rows[:10]:
        assert lev(r["name_a"], r["name_b"]) == r["edit_dist"]


def test_winsorized_mean_inside_clip_range(spark):
    from twinspect_spark.queries import q_events_winsorized_stats

    rows = q_events_winsorized_stats(spark, SF).collect()
    assert rows
    for r in rows:
        assert r["p05"] <= r["winsorized_mean"] <= r["p95"]
        # ~5% clipped on each side at n/20 granularity
        assert r["n_clipped_low"] <= r["n"] * 0.06 + 2
        assert r["n_clipped_high"] <= r["n"] * 0.06 + 2


def test_date_dim_contiguous_calendar(spark):
    import datetime as dt

    from twinspect_spark.queries import q_date_dim_build

    rows = sorted(q_date_dim_build(spark, SF).collect(), key=lambda r: r["d"])
    days = [r["d"] for r in rows]
    assert (days[-1] - days[0]).days + 1 == len(days)  # no gaps
    for r in rows[:400]:
        d: dt.date = r["d"]
        assert r["isodow"] == d.isoweekday()
        assert r["is_weekend"] == (d.isoweekday() >= 6)
        assert r["is_month_start"] == (d.day == 1)
        nxt = d + dt.timedelta(days=1)
        assert r["is_month_end"] == (nxt.month != d.month)


def test_fulfilment_latency_bounds(spark):
    from twinspect_spark.queries import q_order_fulfilment_latency

    rows = q_order_fulfilment_latency(spark, SF).collect()
    li_n = spark.read.parquet(f"{SF}/lineitem.parquet").count()
    assert sum(r["n_items"] for r in rows) == li_n
    for r in rows:
        assert r["p50_days"] <= r["p95_days"]
        assert r["n_late_90d"] <= r["n_items"]


def test_balance_outlier_rate_sane(spark):
    from twinspect_spark.queries import q_supplier_balance_outliers

    rows = q_supplier_balance_outliers(spark, SF).collect()
    assert rows
    supp_n = spark.read.parquet(f"{SF}/supplier.parquet").count()
    assert sum(r["n_suppliers"] for r in rows) == supp_n
    # |z|>2 on roughly-uniform balances: a small minority per nation
    for r in rows:
        assert r["n_outliers"] <= max(2, r["n_suppliers"] // 3)


def test_dau_wau_invariants(spark):
    from twinspect_spark.queries import q_events_dau_wau

    rows = sorted(q_events_dau_wau(spark, SF).collect(), key=lambda r: r["day"])
    assert rows
    ev = spark.read.parquet(f"{SF}/events.parquet")
    import datetime as dt

    by_day = {}
    for r in ev.select(
        F.col("user_id"), F.col("ts").cast("date").alias("day")
    ).distinct().collect():
        by_day.setdefault(r["day"], set()).add(r["user_id"])
    days = sorted(by_day)
    # first emitted day covers a full trailing week
    assert rows[0]["day"] == days[0] + dt.timedelta(days=6)
    for r in rows:
        assert r["dau"] <= r["wau"]  # DAU is a subset of the window
        want_wau = len(
            set().union(
                *(
                    by_day.get(r["day"] - dt.timedelta(days=k), set())
                    for k in range(7)
                )
            )
        )
        assert r["wau"] == want_wau
        assert r["dau"] == len(by_day[r["day"]])
        assert r["stickiness_ppm"] == (r["dau"] * 1_000_000) // r["wau"]


def test_promo_share_bounds(spark):
    from twinspect_spark.queries import q_promo_revenue_share

    rows = q_promo_revenue_share(spark, SF).collect()
    assert rows
    for r in rows:
        assert 0 <= r["promo_share_ppm"] <= 1_000_000
        assert r["promo_revenue"] <= r["total_revenue"]


def test_top_supplier_unique_per_period(spark):
    from twinspect_spark.queries import q_top_supplier_by_period

    rows = q_top_supplier_by_period(spark, SF).collect()
    periods = [r["period"] for r in rows]
    assert len(periods) == len(set(periods))
    # the winner's revenue really is the period max
    per = spark.read.parquet(f"{SF}/lineitem.parquet").selectExpr(
        "concat(year(l_shipdate), '-Q', quarter(l_shipdate)) AS period",
        "l_suppkey",
        "cast(l_extendedprice * (1 - l_discount) AS decimal(38,4)) AS rev",
    ).groupBy("period", "l_suppkey").agg(
        F.round(F.sum("rev").cast("double"), 2).alias("revenue")
    )
    mx = {
        r["period"]: r["m"]
        for r in per.groupBy("period").agg(F.max("revenue").alias("m")).collect()
    }
    for r in rows:
        assert r["revenue"] == mx[r["period"]]


def test_disjunctive_arm_accounting(spark):
    from twinspect_spark.queries import q_disjunctive_filter_revenue

    r = q_disjunctive_filter_revenue(spark, SF).collect()[0]
    # arms are brand-disjoint, so their counts partition the total
    assert r["n_arm1"] + r["n_arm2"] + r["n_arm3"] == r["n_items"]
    assert r["n_items"] > 0
