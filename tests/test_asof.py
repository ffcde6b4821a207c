from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from twinspect_spark.operators.asof import asof_join


def _ts(day: int, hour: int = 0) -> dt.datetime:
    return dt.datetime(2024, 1, day, hour)


def test_asof_backward_match_and_null(spark):
    left = spark.createDataFrame(
        [(1, "u", _ts(5)), (2, "u", _ts(1)), (3, "v", _ts(9))],
        "event_id long, k string, t timestamp",
    )
    right = spark.createDataFrame(
        [("u", _ts(2), 10, 100.0), ("u", _ts(5), 11, 200.0), ("w", _ts(1), 12, 1.0)],
        "k string, rt timestamp, rid long, val double",
    )
    out = {
        r["event_id"]: (r["asof_rid"], r["asof_val"])
        for r in asof_join(
            left, right, on="k", left_ts="t", right_ts="rt",
            payload=["rid", "val"], right_seq="rid",
        ).collect()
    }
    # exact-timestamp right row matches (at-or-before semantics)
    assert out[1] == (11, 200.0)
    # left row before any right row -> nulls
    assert out[2] == (None, None)
    # key with no right rows at all -> nulls
    assert out[3] == (None, None)


def test_asof_equal_ts_tiebreak_max_seq(spark):
    left = spark.createDataFrame(
        [(1, "u", _ts(3))], "event_id long, k string, t timestamp"
    )
    right = spark.createDataFrame(
        [("u", _ts(2), 7, 1.0), ("u", _ts(2), 9, 2.0), ("u", _ts(2), 8, 3.0)],
        "k string, rt timestamp, rid long, val double",
    )
    row = asof_join(
        left, right, on="k", left_ts="t", right_ts="rt",
        payload=["rid", "val"], right_seq="rid",
    ).collect()[0]
    assert (row["asof_rid"], row["asof_val"]) == (9, 2.0)


def test_asof_single_shuffle_plan(spark):
    """The union-window plan must contain exactly one Exchange (the
    window's hash partitioning on the key) and no join operator — the
    whole point vs the inequality-join+argmax shape."""
    left = spark.range(100).select(
        F.col("id").alias("event_id"),
        (F.col("id") % 10).alias("k"),
        F.to_timestamp(F.lit("2024-01-05 00:00:00")).alias("t"),
    )
    right = spark.range(50).select(
        (F.col("id") % 10).alias("k"),
        F.to_timestamp(F.lit("2024-01-02 00:00:00")).alias("rt"),
        F.col("id").alias("rid"),
    )
    out = asof_join(
        left, right, on="k", left_ts="t", right_ts="rt",
        payload=["rid"], right_seq="rid",
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    assert plan.count("Exchange hashpartitioning") == 1


def test_asof_reserved_name_collision_raises(spark):
    """ADVICE r3: a left schema using an internal tagged-union column
    name must fail fast, not silently collide."""
    import pytest

    left = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 1), 5)], "k int, t timestamp, _ts int"
    )
    right = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 1), 7)], "k int, t timestamp, v int"
    )
    with pytest.raises(ValueError, match="_ts"):
        asof_join(left, right, "k", "t", "t", ["v"])
    from twinspect_spark.operators.asof import asof_join_forward

    with pytest.raises(ValueError, match="_ts"):
        asof_join_forward(left, right, "k", "t", "t", ["v"])
