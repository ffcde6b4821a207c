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
