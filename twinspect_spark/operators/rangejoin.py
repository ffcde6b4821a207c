"""Bucketized point-in-interval range join.

``points.ts BETWEEN intervals.start AND intervals.end`` has no equi-key,
so Catalyst plans it as BroadcastNestedLoopJoin (fine while one side
broadcasts) or a cartesian product (fatal when both sides are big: a
10^9-event × 10^6-interval join is 10^15 comparisons). The classic fix
Spark lacks as an operator is **binning**: quantize time into
fixed-width buckets, explode each interval into the buckets it covers
(bounded by interval_length/bucket + 1 rows), equi-join point-bucket to
interval-bucket, then refine with the exact inequality. Comparisons
drop from |P|·|I| to Σ per-bucket |P_b|·|I_b|, and the join becomes a
plain shuffled hash join on the bucket key — AQE-sizable, skew-aware,
whole-stage-codegen'd.

Correctness does not depend on the bucket width (any width yields the
same refined result — width only trades explode fan-out against bucket
co-occupancy), which makes the operator oracle-checkable against the
naive inequality join; the plan-shape test pins that no nested-loop or
cartesian operator survives.

Interval semantics are closed-open ``[start, end)`` — the standard
convention that makes adjacent windows partition time without double
counting. Each (point, interval) match surfaces exactly once: a point
has exactly one bucket, and an interval covers each bucket at most once
(``sequence`` yields distinct buckets).

Reference relationship: the reference has no temporal data plane
(SURVEY.md §1.4); this is part of the training-pipeline surface (promo
/ experiment-window attribution, snapshot validity ranges) the engine
adds beyond it, the batch complement of the watermarked stream-stream
interval join (streaming/joins.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def point_in_interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_ts: str,
    end_ts: str,
    bucket_seconds: int = 86400,
) -> DataFrame:
    """Inner join of points to every interval containing them.

    Output carries all columns of both inputs (names must not collide).
    ``bucket_seconds`` should be on the order of the typical interval
    length: much smaller multiplies the interval explode fan-out, much
    larger piles unrelated intervals into each bucket's refine step.
    """
    bs = int(bucket_seconds)
    pts = points.withColumn(
        "_b", F.expr(f"unix_timestamp({point_ts}) div {bs}")
    )
    ivs = intervals.withColumn(
        "_b",
        F.explode(
            F.expr(
                f"sequence(unix_timestamp({start_ts}) div {bs},"
                f" unix_timestamp({end_ts}) div {bs})"
            )
        ),
    )
    return (
        pts.join(ivs, "_b")
        .where(
            (F.col(point_ts) >= F.col(start_ts))
            & (F.col(point_ts) < F.col(end_ts))
        )
        .drop("_b")
    )
