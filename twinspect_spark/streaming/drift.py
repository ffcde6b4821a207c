"""Streaming distribution-drift monitor: per-window total-variation
distance against a static baseline histogram.

The continuous twin of operators/drift.py (batch two-sample KS): a
production stream wants "did this window's value distribution move away
from the reference?" emitted live, per finalized event-time window.
Drift here is total-variation distance — ½ Σ_b |p_w(b) − p_base(b)|
over a FIXED bucket vocabulary — rather than KS, because TV over fixed
buckets is computable inside ONE streaming aggregation (KS needs the
merged value order, i.e. a second sort per window).

Why one aggregation matters: Structured Streaming restricts chained
stateful operators; folding the whole monitor into a single
``groupBy(window).agg(...)`` keeps the plan inside the ordinary
watermark + append-mode contract — each window emits exactly once when
the watermark passes its end, replay via checkpoint cannot double-emit,
and state is (windows in flight) × O(B) counters, independent of
stream length.

The baseline enters as LITERALS, not a join: the reference histogram is
bucket-count list (config-sized, B ≤ 64) captured at monitor build
time — the same driver-side fencing as the IVF centroid table. Per
bucket the agg computes a conditional count; the TV numerator
Σ_b |c_b·n_base − base_b·n_w| stays in exact BIGINT, ppm by integer
division at the end (the operators/drift.py arithmetic, so the batch
and streaming monitors agree digit-for-digit on the same rows).

Reference analog: twinspect's distance-distribution metric
(/root/reference/twinspect/metrics/distribution.py:42-66), made
continuous.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

PPM = 1_000_000
MAX_BUCKETS = 64


def baseline_histogram(
    df: DataFrame, bucket: Column, n_buckets: int
) -> list[int]:
    """Collect the reference bucket counts [c_0 .. c_{B-1}] from a
    static DataFrame. Bucket ids outside [0, B) are clamped into the
    edge buckets (the stream side clamps identically, so mass can
    never silently vanish). Config-sized collect — B rows."""
    if not 0 < n_buckets <= MAX_BUCKETS:
        raise ValueError(f"n_buckets must be in 1..{MAX_BUCKETS}")
    b = _clamp(bucket, n_buckets)
    rows = df.select(b.alias("b")).groupBy("b").count().collect()
    counts = [0] * n_buckets
    for r in rows:
        counts[int(r["b"])] = int(r["count"])
    if sum(counts) == 0:
        raise ValueError("baseline is empty — no rows to profile")
    return counts


def _clamp(bucket: Column, n_buckets: int) -> Column:
    return F.greatest(
        F.lit(0), F.least(F.lit(n_buckets - 1), bucket.cast("int"))
    )


def windowed_tv_drift(
    stream: DataFrame,
    baseline_counts: list[int],
    bucket: Column,
    ts_col: str = "ts",
    window: str = "1 hour",
    watermark: str = "30 minutes",
    alert_ppm: int = 200_000,
) -> DataFrame:
    """Streaming DataFrame of per-window drift readings:
    (window_start, window_end, n_rows, tv_ppm, drifted). ONE stateful
    aggregation: per-bucket conditional counts + the exact-integer TV
    fold against the literal baseline."""
    n_buckets = len(baseline_counts)
    n_base = sum(baseline_counts)
    b = _clamp(bucket, n_buckets)
    per_bucket = [
        F.sum(F.when(b == i, 1).otherwise(0)).alias(f"_c{i}")
        for i in range(n_buckets)
    ]
    agged = (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window).alias("w"))
        .agg(F.count("*").alias("n_rows"), *per_bucket)
    )
    # Σ_b |c_b·n_base − base_b·n_rows|  (BIGINT exact), ppm with the ½
    # folded into the divisor
    tv_num = None
    for i, base_c in enumerate(baseline_counts):
        term = F.abs(
            F.col(f"_c{i}").cast("long") * F.lit(n_base)
            - F.lit(base_c) * F.col("n_rows").cast("long")
        )
        tv_num = term if tv_num is None else tv_num + term
    tv_ppm = F.expr(
        f"(_tvnum * {PPM}) div (2 * n_rows * {n_base})"
    ).cast("long")
    return (
        agged.withColumn("_tvnum", tv_num)
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            F.col("n_rows").cast("long").alias("n_rows"),
            tv_ppm.alias("tv_ppm"),
        )
        .withColumn("drifted", F.col("tv_ppm") >= alert_ppm)
    )


def run_drift_monitor(
    spark: SparkSession,
    src_path: str,
    out_path: str,
    checkpoint: str,
    baseline_counts: list[int],
    bucket_sql: str,
    ts_col: str = "ts",
    window: str = "1 hour",
    watermark: str = "30 minutes",
    alert_ppm: int = 200_000,
    max_files_per_trigger: int | None = 1,
) -> None:
    """One availableNow pass of the drift monitor over a parquet
    directory stream (the events.run_windowed_counts runner contract:
    re-running with the same checkpoint resumes, finalized windows are
    appended exactly once). ``bucket_sql`` is a SQL expression over the
    stream's columns yielding the bucket id."""
    from twinspect_spark.streaming.events import read_event_stream

    stream = read_event_stream(spark, src_path, max_files_per_trigger)
    q = (
        windowed_tv_drift(
            stream,
            baseline_counts,
            F.expr(bucket_sql),
            ts_col,
            window,
            watermark,
            alert_ppm,
        )
        .writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
