from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from twinspect_spark.operators.rangejoin import point_in_interval_join


def _mk(spark, pts, ivs):
    p = spark.createDataFrame(pts, "pid long, ts timestamp")
    i = spark.createDataFrame(ivs, "iid long, s timestamp, e timestamp")
    return point_in_interval_join(p, i, "ts", "s", "e")


def test_boundaries_closed_open(spark):
    d = dt.datetime
    out = _mk(
        spark,
        [(1, d(2024, 1, 2, 0, 0)), (2, d(2024, 1, 5, 0, 0)), (3, d(2024, 1, 4, 23, 59))],
        [(10, d(2024, 1, 2), d(2024, 1, 5))],
    ).select("pid", "iid").collect()
    got = {(r.pid, r.iid) for r in out}
    # start inclusive, end exclusive
    assert got == {(1, 10), (3, 10)}


def test_overlapping_intervals_multi_match(spark):
    d = dt.datetime
    out = _mk(
        spark,
        [(1, d(2024, 1, 3, 12))],
        [(10, d(2024, 1, 1), d(2024, 1, 4)), (11, d(2024, 1, 3), d(2024, 1, 6))],
    ).select("pid", "iid").collect()
    assert {(r.pid, r.iid) for r in out} == {(1, 10), (1, 11)}


def test_matches_naive_join_and_no_nested_loop(spark):
    # deterministic spread: 500 points over 30 days, 20 intervals of
    # varying width; bucketization must not change the result set
    pts = spark.range(500).select(
        F.col("id").alias("pid"),
        F.expr(
            "timestamp'2024-01-01 00:00:00' + make_interval(0,0,0,0,0,"
            "cast(id * 83 % 43200 as int),0)"
        ).alias("ts"),
    )
    ivs = spark.range(20).select(
        F.col("id").alias("iid"),
        F.expr(
            "timestamp'2024-01-01 00:00:00' + make_interval(0,0,0,"
            "cast(id % 28 as int),0,0,0)"
        ).alias("s"),
        F.expr(
            "timestamp'2024-01-01 00:00:00' + make_interval(0,0,0,"
            "cast(id % 28 + id % 5 + 1 as int),0,0,0)"
        ).alias("e"),
    )
    fast = point_in_interval_join(pts, ivs, "ts", "s", "e")
    naive = pts.join(ivs, (F.col("ts") >= F.col("s")) & (F.col("ts") < F.col("e")))
    a = {(r.pid, r.iid) for r in fast.collect()}
    b = {(r.pid, r.iid) for r in naive.collect()}
    assert a == b and len(a) > 0
    plan = fast._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "Cartesian" not in plan
