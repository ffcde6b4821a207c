"""Structured Streaming event analytics: watermarked tumbling-window
aggregation over the events table.

The reference is strictly batch (SURVEY.md §1.4); this module is the
engine's streaming surface for event-shaped data — the streaming twin
of queries.q_events_hourly. Shape: ``readStream`` over a parquet
directory → event-time watermark → tumbling-window hash aggregation →
append-mode parquet sink, with an ``availableNow`` trigger so the same
code runs as an incremental backfill job and resumes from its
checkpoint.

Scale notes (100 TB lens):
- the windowed agg is map-side combinable; streaming state is bounded
  by (watermark horizon / window size) × event_type cardinality, not by
  stream length — the watermark is what makes unbounded ingestion safe;
- append mode emits a window only once the watermark passes its end, so
  the parquet sink receives each finalized window exactly once
  (idempotent under replay via the checkpoint);
- no Python in the hot path: window(), count, sum are codegen'd JVM
  expressions, identical to the batch plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_event_stream(
    spark: SparkSession,
    path: str,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-source stream over an events parquet directory. The schema
    is pinned from a one-off batch read (file streams require a
    declared schema — inference at stream start would race appends)."""
    schema = spark.read.parquet(path).schema
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(path)


def windowed_event_counts(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Tumbling-window per-event-type counts/sums with an event-time
    watermark: rows later than `watermark` behind the max observed ts
    are dropped, and a window finalizes (emits, in append mode) once
    the watermark passes its end."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum("value").alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def run_windowed_counts(
    spark: SparkSession,
    src_path: str,
    out_path: str,
    checkpoint: str,
    window: str = "1 hour",
    watermark: str = "30 minutes",
    max_files_per_trigger: int | None = 1,
) -> None:
    """One availableNow pass: drain whatever is currently in src_path
    through the windowed agg into an append-mode parquet sink, then
    stop. Re-running with the same checkpoint resumes exactly where the
    last pass ended (already-emitted windows are not re-emitted; late
    rows inside the watermark still merge into pending state)."""
    stream = read_event_stream(spark, src_path, max_files_per_trigger)
    q = (
        windowed_event_counts(stream, window, watermark)
        .writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
