"""Stream-stream interval join (conversion attribution): cross-batch
state carry, horizon cutoff, exactly-once emission across
checkpoint-resumed availableNow passes, and left-outer emission of
unmatched impressions once the watermark proves no match can arrive."""

from __future__ import annotations

import datetime as dt

from twinspect_spark.streaming.joins import run_attribution

D = dt.date(2026, 1, 1)


def _ts(h, m=0):
    return dt.datetime(D.year, D.month, D.day, h, m)


def _write(spark, rows, path):
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long,"
        " event_type string, value double",
    )
    df.coalesce(1).write.mode("append").parquet(path)


def _read(spark, out):
    try:
        return {
            (r["imp_id"], r["conv_id"]): r
            for r in spark.read.parquet(out).collect()
        }
    except Exception:
        return {}


def test_attribution_inner_and_resume(spark, tmp_path):
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    # batch 1: impressions only — the matching conversions arrive in a
    # LATER micro-batch (maxFilesPerTrigger=1), so a match proves join
    # state carries across batches
    _write(
        spark,
        [
            (1, _ts(10, 0), 100, "view", 0.0),
            (2, _ts(10, 5), 200, "view", 0.0),
            (3, _ts(10, 0), 300, "view", 0.0),
        ],
        src,
    )
    # batch 2: user 100 converts inside the 1 h horizon; user 200
    # converts OUTSIDE it (2 h later); user 300 never converts;
    # user 400 converts with no prior impression
    _write(
        spark,
        [
            (10, _ts(10, 30), 100, "click", 5.0),
            (11, _ts(12, 10), 200, "click", 7.0),
            (12, _ts(10, 40), 400, "click", 9.0),
        ],
        src,
    )
    run_attribution(spark, src, out, ckpt)
    got = _read(spark, out)
    assert set(got) == {(1, 10)}
    assert got[(1, 10)]["lag_s"] == 1800
    assert got[(1, 10)]["conv_value"] == 5.0

    # pass 2 with a new batch: a fresh impression+conversion pair must
    # emit; the (1, 10) match must NOT re-emit (exactly-once via the
    # checkpoint — output rows only grow by the new match)
    _write(
        spark,
        [
            (4, _ts(13, 0), 500, "view", 0.0),
            (13, _ts(13, 20), 500, "click", 2.0),
        ],
        src,
    )
    run_attribution(spark, src, out, ckpt)
    got2 = _read(spark, out)
    assert set(got2) == {(1, 10), (4, 13)}


def test_attribution_left_outer_emits_on_watermark(spark, tmp_path):
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    _write(
        spark,
        [
            (1, _ts(10, 0), 100, "view", 0.0),  # converts in-horizon
            (2, _ts(10, 0), 200, "view", 0.0),  # never converts
        ],
        src,
    )
    _write(spark, [(10, _ts(10, 30), 100, "click", 5.0)], src)
    # far-future sentinels must advance BOTH sides: the global watermark
    # is the MIN across the two withWatermark streams, so a click-only
    # sentinel would leave the impression-side watermark (and with it
    # outer emission) pinned forever. The OUTER row itself emits in the
    # batch AFTER the watermark advance (watermarks update between
    # micro-batches), hence the second sentinel pair + pass.
    _write(
        spark,
        [(99, _ts(20, 0), 900, "click", 0.0),
         (97, _ts(20, 0), 900, "view", 0.0)],
        src,
    )
    run_attribution(spark, src, out, ckpt, join_type="left_outer")
    _write(
        spark,
        [(98, _ts(21, 0), 901, "click", 0.0),
         (96, _ts(21, 0), 901, "view", 0.0)],
        src,
    )
    run_attribution(spark, src, out, ckpt, join_type="left_outer")
    got = _read(spark, out)
    assert (1, 10) in got
    # unmatched impression 2 emitted exactly once, with NULL conv side
    outer = [k for k in got if k[0] == 2]
    assert outer == [(2, None)]
    assert got[(2, None)]["conv_value"] is None
    assert got[(2, None)]["lag_s"] is None
