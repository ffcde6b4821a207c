from __future__ import annotations

import datetime as dt

from twinspect_spark.queries import q_events_gapfill


def test_gapfill_calendar_and_forward_fill(spark, tmp_path):
    # user 1 active on Jan 1 (value 2.5) and Jan 4 (value 7.0): Jan 2-3
    # must materialize with 0 events and the Jan-1 value carried forward
    rows = [
        (0, dt.datetime(2024, 1, 1, 10), 1, "view", 1.0),
        (1, dt.datetime(2024, 1, 1, 11), 1, "view", 1.5),
        (2, dt.datetime(2024, 1, 4, 9), 1, "click", 7.0),
        (3, dt.datetime(2024, 2, 1, 0), 2, "view", 3.0),
    ]
    ev = spark.createDataFrame(
        [(i, t, u, et, v, "{}") for (i, t, u, et, v) in rows],
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    ev.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))

    out = {
        (r["user_id"], r["day"]): (r["n_events"], r["filled_value"])
        for r in q_events_gapfill(spark, str(tmp_path)).collect()
    }
    assert out[(1, "2024-01-01")] == (2, 2.5)
    assert out[(1, "2024-01-02")] == (0, 2.5)  # gap day, carried forward
    assert out[(1, "2024-01-03")] == (0, 2.5)
    assert out[(1, "2024-01-04")] == (1, 7.0)
    # single-day user: exactly one row, no spill into other users' spans
    assert out[(2, "2024-02-01")] == (1, 3.0)
    assert len([k for k in out if k[0] == 2]) == 1
    assert len(out) == 5
