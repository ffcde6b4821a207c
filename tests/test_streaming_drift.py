"""Streaming TV-drift monitor: finalized windows must emit exactly once
across checkpoint-resumed passes, the TV arithmetic must match a hand
computation, and a distribution shift must trip the alert while
in-distribution windows stay quiet."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from twinspect_spark.streaming.drift import (
    baseline_histogram,
    run_drift_monitor,
    windowed_tv_drift,
)

D = dt.date(2026, 2, 1)


def _ts(h, m=0):
    return dt.datetime(D.year, D.month, D.day, h, m)


def _write(spark, rows, path):
    df = spark.createDataFrame(rows, "ts timestamp, v double")
    df.coalesce(1).write.mode("append").parquet(path)


def _baseline(spark):
    # uniform over buckets 0..3 (v in [0, 40), bucket = v div 10)
    rows = [(float(v),) for v in range(0, 40)]
    df = spark.createDataFrame(rows, "v double")
    return baseline_histogram(df, F.expr("cast(floor(v / 10) as int)"), 4)


def test_baseline_histogram_clamps_and_counts(spark):
    rows = [(-5.0,), (0.0,), (15.0,), (39.0,), (99.0,)]
    df = spark.createDataFrame(rows, "v double")
    counts = baseline_histogram(df, F.expr("cast(floor(v / 10) as int)"), 4)
    assert counts == [2, 1, 0, 2]  # -5 clamps to 0, 99 clamps to 3


def test_drift_monitor_alerts_on_shift_not_on_match(spark, tmp_path):
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    base = _baseline(spark)  # [10, 10, 10, 10]

    # window 10:00 matches the baseline (uniform); window 11:00 is
    # fully concentrated in bucket 3 (max shift, TV = 750000 ppm)
    uniform = [(_ts(10, i % 60), float(v)) for i, v in enumerate(range(0, 40))]
    shifted = [(_ts(11, i % 60), 35.0) for i in range(40)]
    _write(spark, uniform, src)
    _write(spark, shifted, src)
    run_drift_monitor(
        spark, src, out, ckpt, base, "cast(floor(v / 10) as int)",
        window="1 hour", watermark="30 minutes",
    )
    # sentinel pushes the watermark past both windows
    _write(spark, [(_ts(20, 0), 0.0)], src)
    run_drift_monitor(
        spark, src, out, ckpt, base, "cast(floor(v / 10) as int)",
        window="1 hour", watermark="30 minutes",
    )

    got = {
        r.window_start.hour: r
        for r in spark.read.parquet(out).collect()
        if r.window_start.hour in (10, 11)
    }
    assert set(got) == {10, 11}
    assert got[10].tv_ppm == 0 and not got[10].drifted
    # TV between uniform[1/4 each] and point-mass[bucket 3] = 3/4
    assert got[11].tv_ppm == 750_000 and got[11].drifted

    # exactly-once: a third pass with a later sentinel must not
    # re-emit finalized windows
    _write(spark, [(_ts(23, 0), 0.0)], src)
    run_drift_monitor(
        spark, src, out, ckpt, base, "cast(floor(v / 10) as int)",
        window="1 hour", watermark="30 minutes",
    )
    n = (
        spark.read.parquet(out)
        .where(F.hour("window_start").isin(10, 11))
        .count()
    )
    assert n == 2


def test_tv_matches_batch_drift_arithmetic(spark):
    # the streaming TV on one window must equal the hand value for a
    # half-shifted distribution: stream [20 in b0, 20 in b3] vs
    # uniform baseline -> TV = ½·(¼+¼+¼+¼) = 1/2
    base = _baseline(spark)
    rows = [(_ts(9, i % 60), 5.0) for i in range(20)] + [
        (_ts(9, i % 60), 35.0) for i in range(20)
    ]
    df = spark.createDataFrame(rows, "ts timestamp, v double")
    # run the same expression through the batch path (no stream needed
    # for arithmetic equality — windowed_tv_drift is a pure plan)
    out = (
        windowed_tv_drift(
            df, base, F.expr("cast(floor(v / 10) as int)"), "ts", "1 hour"
        )
        .collect()
    )
    assert len(out) == 1
    assert out[0].tv_ppm == 500_000


def test_single_stateful_aggregation_plan(spark):
    base = [1, 1, 1, 1]
    df = spark.createDataFrame(
        [(_ts(9), 1.0)], "ts timestamp, v double"
    )
    plan = (
        windowed_tv_drift(df, base, F.expr("cast(floor(v / 10) as int)"))
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    assert plan.lower().count("aggregate") <= 2  # partial+final, one agg
