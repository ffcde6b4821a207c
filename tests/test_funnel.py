from __future__ import annotations

import datetime as dt

from twinspect_spark.queries import q_event_funnel


def _ts(m):
    return dt.datetime(2024, 1, 1, 0, m)


def test_funnel_sequential_semantics(spark, tmp_path):
    # user 1: full ordered path -> reaches all 4 steps
    # user 2: purchase BEFORE signup, nothing after -> stops at step 1
    # user 3: signup + click but no view -> stops at step 1
    #         (click can't convert without a view strictly after signup)
    # user 4: no signup at all -> reaches no step
    rows = [
        (1, "signup", _ts(0)), (1, "view", _ts(1)),
        (1, "click", _ts(2)), (1, "purchase", _ts(3)),
        (2, "purchase", _ts(0)), (2, "signup", _ts(1)),
        (3, "signup", _ts(0)), (3, "click", _ts(1)),
        (4, "view", _ts(0)), (4, "click", _ts(1)),
    ]
    ev = spark.createDataFrame(
        [(i, t, u, et, 1.0, "{}") for i, (u, et, t) in enumerate(rows)],
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    ev.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))

    out = {r["step"]: r for r in q_event_funnel(spark, str(tmp_path)).collect()}
    assert out["signup"]["n_users"] == 3
    assert out["view"]["n_users"] == 1
    assert out["click"]["n_users"] == 1
    assert out["purchase"]["n_users"] == 1
    # ppm: 3 of 4 users signed up; 1 of 3 viewed; 1 of 1 clicked/purchased
    assert out["signup"]["conv_ppm"] == 1_000_000 * 3 // 4
    assert out["view"]["conv_ppm"] == 1_000_000 // 3
    assert out["click"]["conv_ppm"] == 1_000_000
    assert out["purchase"]["conv_ppm"] == 1_000_000


def test_funnel_equal_ts_not_a_conversion(spark, tmp_path):
    # strictly-after: a view at the SAME timestamp as signup doesn't count
    ev = spark.createDataFrame(
        [
            (0, _ts(0), 1, "signup", 1.0, "{}"),
            (1, _ts(0), 1, "view", 1.0, "{}"),
            (2, _ts(1), 1, "view", 1.0, "{}"),
        ],
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    ev.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    out = {r["step"]: r for r in q_event_funnel(spark, str(tmp_path)).collect()}
    assert out["view"]["n_users"] == 1  # via the later view only
