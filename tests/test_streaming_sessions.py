"""applyInPandasWithState sessionization: gap-split sessions close
in-stream; idle sessions close via the event-time timeout once the
watermark passes last_event + gap; emission is append/exactly-once
across checkpoint-resumed availableNow passes."""

from __future__ import annotations

import datetime as dt

from twinspect_spark.streaming.sessions import run_sessionize

D = dt.date(2026, 1, 1)


def _ts(h, m=0):
    return dt.datetime(D.year, D.month, D.day, h, m)


def _write(spark, rows, path):
    df = spark.createDataFrame(rows, "ts timestamp, user_id long")
    df.coalesce(1).write.mode("append").parquet(path)


def test_sessionize_gap_split_and_timeout(spark, tmp_path):
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    GAP = 1800  # 30 min

    # user 1: two events 5 min apart (one session), then silence
    # user 3: events 10:00 and 11:00 in ONE batch — gap split in-stream
    _write(
        spark,
        [
            (_ts(10, 0), 1),
            (_ts(10, 5), 1),
            (_ts(10, 0), 3),
            (_ts(11, 0), 3),
        ],
        src,
    )
    # later file: watermark advances past 10:35 (user 1 timeout) and past
    # 11:30 (user 3's second session timeout) only after the 13:00 row
    _write(spark, [(_ts(13, 0), 2)], src)
    run_sessionize(spark, src, out, ckpt, gap_seconds=GAP,
                   watermark="10 minutes")
    # one more pass with a sentinel so user 2's own session times out too
    _write(spark, [(_ts(18, 0), 9)], src)
    run_sessionize(spark, src, out, ckpt, gap_seconds=GAP,
                   watermark="10 minutes")
    _write(spark, [(_ts(23, 0), 9)], src)
    run_sessionize(spark, src, out, ckpt, gap_seconds=GAP,
                   watermark="10 minutes")

    rows = spark.read.parquet(out).collect()
    got = {
        (r.user_id, r.session_start, r.session_end): r.n_events
        for r in rows
        if r.user_id not in (9,)
    }
    # exactly-once: no duplicate session rows across passes
    assert len(got) == len([r for r in rows if r.user_id != 9])
    assert got[(1, _ts(10, 0), _ts(10, 5))] == 2
    assert got[(3, _ts(10, 0), _ts(10, 0))] == 1  # closed by gap split
    assert got[(3, _ts(11, 0), _ts(11, 0))] == 1  # closed by timeout
    assert got[(2, _ts(13, 0), _ts(13, 0))] == 1


def test_sessionize_state_survives_batches(spark, tmp_path):
    """Events for the same user split across micro-batches, within the
    gap, merge into ONE session (state carries across batches)."""
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    _write(spark, [(_ts(10, 0), 7)], src)
    _write(spark, [(_ts(10, 10), 7)], src)  # within gap, next batch
    _write(spark, [(_ts(15, 0), 9)], src)   # watermark mover
    run_sessionize(spark, src, out, ckpt, gap_seconds=1800,
                   watermark="10 minutes")
    _write(spark, [(_ts(23, 0), 9)], src)
    run_sessionize(spark, src, out, ckpt, gap_seconds=1800,
                   watermark="10 minutes")

    rows = [r for r in spark.read.parquet(out).collect() if r.user_id == 7]
    assert len(rows) == 1
    assert rows[0].session_start == _ts(10, 0)
    assert rows[0].session_end == _ts(10, 10)
    assert rows[0].n_events == 2
