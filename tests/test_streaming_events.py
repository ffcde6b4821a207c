"""Watermarked windowed streaming agg: append-mode emission must be
exactly-once across checkpoint-resumed availableNow passes, and the
emitted windows must equal the batch aggregation of the same rows."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from twinspect_spark.streaming.events import (
    run_windowed_counts,
    windowed_event_counts,
)

D = dt.date(2026, 1, 1)


def _ts(h, m=0):
    return dt.datetime(D.year, D.month, D.day, h, m)


def _write(spark, rows, path):
    df = spark.createDataFrame(rows, "ts timestamp, event_type string, value double")
    df.coalesce(1).write.mode("append").parquet(path)


def test_windowed_counts_exactly_once(spark, tmp_path):
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    batch_a = [
        (_ts(10, 0), "click", 1.0),
        (_ts(10, 20), "click", 2.0),
        (_ts(10, 40), "view", 3.0),
    ]
    batch_b = [
        (_ts(11, 10), "click", 4.0),
        (_ts(11, 30), "view", 5.0),
        (_ts(12, 10), "click", 6.0),
        (_ts(12, 40), "click", 7.0),
    ]
    _write(spark, batch_a, src)
    _write(spark, batch_b, src)

    # pass 1: drain both files (one per micro-batch so the watermark
    # advances); pass 2 and 3 each add a far-future sentinel whose
    # arrival pushes the watermark past the older windows
    run_windowed_counts(spark, src, out, ckpt)
    _write(spark, [(_ts(18, 0), "sentinel", 0.0)], src)
    run_windowed_counts(spark, src, out, ckpt)
    _write(spark, [(_ts(23, 0), "sentinel", 0.0)], src)
    run_windowed_counts(spark, src, out, ckpt)

    got = {
        (r.window_start, r.event_type): (r.n_events, r.sum_value)
        for r in spark.read.parquet(out).collect()
        if r.event_type != "sentinel"
    }
    # exactly-once: no duplicate (window, type) rows across the passes
    assert len(got) == spark.read.parquet(out).where(
        "event_type != 'sentinel'"
    ).count()

    expected_df = windowed_event_counts(
        spark.createDataFrame(
            batch_a + batch_b, "ts timestamp, event_type string, value double"
        )
    )
    expected = {
        (r.window_start, r.event_type): (r.n_events, r.sum_value)
        for r in expected_df.collect()
    }
    assert got == expected


def test_late_row_beyond_watermark_dropped(spark, tmp_path):
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    _write(spark, [(_ts(10, 0), "click", 1.0), (_ts(10, 30), "click", 1.0)], src)
    _write(spark, [(_ts(14, 0), "click", 1.0)], src)  # wm -> 13:30
    run_windowed_counts(spark, src, out, ckpt)
    # 10:05 is hours behind the persisted watermark: must be dropped,
    # not merged into the already-finalized 10:00 window
    _write(spark, [(_ts(10, 5), "click", 99.0)], src)
    _write(spark, [(_ts(20, 0), "sentinel", 0.0)], src)
    run_windowed_counts(spark, src, out, ckpt)
    _write(spark, [(_ts(23, 0), "sentinel", 0.0)], src)
    run_windowed_counts(spark, src, out, ckpt)

    rows = {
        r.window_start: (r.n_events, r.sum_value)
        for r in spark.read.parquet(out).where("event_type = 'click'").collect()
    }
    assert rows[_ts(10, 0)] == (2, 2.0)
