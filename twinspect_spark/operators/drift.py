"""Two-sample distribution-drift statistics (Kolmogorov–Smirnov).

The data-quality monitor a production lake runs between snapshots /
cohorts: "did this column's distribution move?". The KS statistic
``D = max_x |F_a(x) - F_b(x)|`` needs the merged empirical CDFs of the
two cohorts — i.e. a cumulative sum over the globally ordered distinct
values, which naively is ONE task sorting the whole relation (a global
window). This implements the distributed decomposition instead (the
same two-level prefix-sum idiom as training.token_budget_export):

1. per-distinct-value cohort counts (map-side-combinable groupBy);
2. bucket each value with a caller-supplied MONOTONE bucket expression
   (bucket id non-decreasing in the value, so buckets partition the
   global order into runs);
3. per-bucket totals -> running offsets (a window over the ~|buckets|
   rollup, trivially small);
4. within-bucket cumsum (window partitioned by bucket — parallel).

cum_a/cum_b are bit-identical to the global window. The D readout is
kept in EXACT integers: the max is taken over
``|cum_a * n_b - cum_b * n_a|`` (BIGINT) and only the final ratio is
scaled to ppm with integer division — so partitioning can never move
the argmax by a ulp and the DuckDB oracle (which runs the naive global
window) matches bit-for-bit.

Reference analog: twinspect's distance-distribution metric
(/root/reference/twinspect/metrics/distribution.py:42-66) — the same
"histogram the corpus, compare shapes" role, upgraded from a fixed-bin
histogram to the exact two-sample statistic.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

PPM = 1_000_000


def ks_two_sample(
    df: DataFrame,
    value_col: str,
    is_a: Column,
    bucket: Column,
) -> DataFrame:
    """One-row DataFrame (n_a, n_b, ks_d_ppm, ks_at_value): the exact
    two-sample KS distance (ppm, integer) between the ``value_col``
    distributions of the is_a=true and is_a=false cohorts, plus the
    smallest value attaining it. ``bucket`` must be monotone
    non-decreasing in the value (it only affects the plan, never the
    result). Caller pre-filters df to the two cohorts.

    Degenerate input: if either cohort is empty, D is undefined and
    the result is EMPTY (0 rows) — guarded explicitly below, because
    the engines would otherwise diverge on the 0-denominator (Spark
    non-ANSI ``div`` yields NULL; DuckDB ``//`` raises).

    Exactness bound: the integer readout |cum_a*n_b - cum_b*n_a| is
    exact while n_a*n_b < 2^63 — i.e. up to ~3e9 rows per cohort.
    Beyond that the BIGINT product wraps silently under Spark's
    non-ANSI mode; for larger cohorts pre-aggregate values into
    quantile buckets (the bucket expression already in the plan)
    so n_a/n_b count buckets, not rows."""
    g = (
        df.select(
            F.col(value_col).alias("val"),
            is_a.alias("isa"),
            bucket.alias("bkt"),
        )
        .groupBy("val", "bkt")
        .agg(
            F.sum(F.when(F.col("isa"), 1).otherwise(0))
            .cast("long")
            .alias("ca"),
            F.sum(F.when(F.col("isa"), 0).otherwise(1))
            .cast("long")
            .alias("cb"),
        )
    )
    totals = g.groupBy("bkt").agg(
        F.sum("ca").cast("long").alias("ta"),
        F.sum("cb").cast("long").alias("tb"),
    )
    prior = Window.orderBy("bkt").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = totals.select(
        "bkt",
        F.coalesce(F.sum("ta").over(prior), F.lit(0)).alias("offa"),
        F.coalesce(F.sum("tb").over(prior), F.lit(0)).alias("offb"),
    )
    w = Window.partitionBy("bkt").orderBy("val")
    cum = g.join(F.broadcast(offsets), "bkt").select(
        "val",
        (F.col("offa") + F.sum("ca").over(w)).alias("cum_a"),
        (F.col("offb") + F.sum("cb").over(w)).alias("cum_b"),
    )
    n = totals.agg(
        F.sum("ta").cast("long").alias("n_a"),
        F.sum("tb").cast("long").alias("n_b"),
    )
    num = cum.crossJoin(F.broadcast(n)).select(
        "val",
        "n_a",
        "n_b",
        F.abs(
            F.col("cum_a") * F.col("n_b") - F.col("cum_b") * F.col("n_a")
        )
        .cast("long")
        .alias("num"),
    )
    # empty-cohort guard: n_a*n_b = 0 makes D undefined — return 0 rows
    # in BOTH engines' semantics rather than a NULL-vs-raise divergence
    num = num.where((F.col("n_a") > 0) & (F.col("n_b") > 0))
    mx = num.groupBy("n_a", "n_b").agg(F.max("num").alias("mx"))
    return (
        num.join(F.broadcast(mx), ["n_a", "n_b"])
        .where(F.col("num") == F.col("mx"))
        .groupBy("n_a", "n_b", "mx")
        .agg(F.min("val").alias("ks_at_value"))
        .select(
            "n_a",
            "n_b",
            F.expr(f"(mx * {PPM}) div (n_a * n_b)")
            .cast("long")
            .alias("ks_d_ppm"),
            "ks_at_value",
        )
    )
