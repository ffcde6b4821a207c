"""Watermarked stream-stream interval join: conversion attribution.

The one Structured Streaming surface the engine's streaming family did
not yet exercise: joining two unbounded streams on a key PLUS an
event-time range condition. The shape is classic click attribution —
each conversion event is matched to the impression(s) by the same user
that preceded it within an attribution horizon.

Why this is the scale-critical shape (100 TB lens): without the time
bound, a stream-stream join would have to buffer EVERY past row of both
sides forever. The watermark + interval condition is what lets Spark
prove a buffered impression can never match again (its ts is more than
``horizon`` behind the conversion-side watermark) and evict it — state
is bounded by (watermark + horizon) × arrival rate, not stream length.
Both inputs shuffle on ``user_id`` into the same state store, so the
match itself is co-partitioned and never rescans history.

Reference relationship: the reference is strictly batch (SURVEY.md
§1.4); its nearest analog is the ground-truth ⋈ results equi join
(twinspect/metrics/eff.py:235). This module is that join idiom lifted
to unbounded event streams with explicit state-retention semantics.

Inner joins emit a match as soon as both rows have arrived (exactly
once to the sink via the checkpoint). Left-outer additionally emits
unmatched impressions with NULL conversion columns — but only once the
watermark proves no future conversion can match, which is the
state-cleanup semantics made visible in the output.

Operational gotchas (both bit during development, both pinned by
tests/test_streaming_joins.py):
- the GLOBAL watermark is the minimum across every withWatermark in
  the query (multipleWatermarkPolicy=min), so a stalled side — e.g. a
  quiet impression stream — pins eviction and outer emission for the
  whole join;
- outer rows materialize in the micro-batch AFTER the one whose data
  advanced the watermark (watermarks commit between batches), so an
  availableNow drain needs one more trigger past the advance before
  outer results appear in the sink.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from twinspect_spark.streaming.events import read_event_stream


def attribute_conversions(
    impressions: DataFrame,
    conversions: DataFrame,
    horizon: str = "1 hour",
    watermark: str = "30 minutes",
    join_type: str = "inner",
) -> DataFrame:
    """Join two event streams (schema: events-table shape with ``ts``,
    ``user_id``, ``event_id``, ``value``) on user + attribution window:
    conversion.ts ∈ [impression.ts, impression.ts + horizon]. Both
    sides carry an event-time watermark so the join state is evictable;
    ``join_type`` may be ``inner`` or ``left_outer`` (outer rows emit
    once the watermark passes impression.ts + horizon)."""
    # rename BEFORE withWatermark: the watermark must be declared on the
    # exact attributes the join condition references, or state eviction
    # (and with it outer-row emission) silently never happens
    imp = impressions.select(
        F.col("event_id").alias("imp_id"),
        F.col("user_id"),
        F.col("ts").alias("imp_ts"),
    ).withWatermark("imp_ts", watermark)
    conv = conversions.select(
        F.col("event_id").alias("conv_id"),
        F.col("user_id").alias("conv_user"),
        F.col("ts").alias("conv_ts"),
        F.col("value").alias("conv_value"),
    ).withWatermark("conv_ts", watermark)
    cond = (
        (imp["user_id"] == conv["conv_user"])
        & (conv["conv_ts"] >= imp["imp_ts"])
        & (conv["conv_ts"] <= imp["imp_ts"] + F.expr(f"INTERVAL {horizon}"))
    )
    joined = imp.join(conv, cond, join_type)
    return joined.select(
        "user_id",
        "imp_id",
        "imp_ts",
        "conv_id",
        "conv_ts",
        "conv_value",
        (
            F.unix_timestamp("conv_ts") - F.unix_timestamp("imp_ts")
        ).alias("lag_s"),
    )


def run_attribution(
    spark: SparkSession,
    src_path: str,
    out_path: str,
    checkpoint: str,
    horizon: str = "1 hour",
    watermark: str = "30 minutes",
    join_type: str = "inner",
    max_files_per_trigger: int | None = 1,
) -> None:
    """One availableNow pass of the attribution join over the events
    directory (impressions = event_type 'view', conversions = 'click'),
    append-mode parquet sink. Re-running against the same checkpoint
    resumes exactly-once: already-emitted matches are never re-emitted,
    and impressions still inside the horizon keep waiting in state."""
    stream = read_event_stream(spark, src_path, max_files_per_trigger)
    imp = stream.where(F.col("event_type") == "view")
    conv = stream.where(F.col("event_type") == "click")
    q = (
        attribute_conversions(imp, conv, horizon, watermark, join_type)
        .writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
