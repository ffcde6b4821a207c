"""Z-order (Morton-curve) file-layout planning.

The compaction planner (plans referenced by q_compaction_plan) decides
file SIZES; this module decides file CONTENTS: interleave the bits of
two clustering dimensions into a Morton z-value and cut the z-ordered
corpus into equal-row files, so per-file min/max ranges are tight in
BOTH dimensions at once — the property Iceberg/Delta ``OPTIMIZE
ZORDER BY`` exploits to make column statistics prune multi-predicate
scans (a file sorted only by dim A has full-width dim-B ranges; the
z-curve bounds both).

The bit interleave is the standard mask-spread ladder (5 shift/mask
steps per 16-bit coordinate instead of 16 per-bit terms) expressed as
ONE integer SQL expression — whole-stage codegen in Spark, and the
exact same string runs under DuckDB, so the oracle shares the formula
by construction rather than re-deriving it.

File assignment needs each row's GLOBAL rank in z-order. The naive
``row_number() over (order by z)`` is one task sorting the corpus;
this module reuses the distributed prefix-sum idiom of
training.token_budget_export: bucket by the z-value's high bits
(bucket id monotone in z, so buckets partition the global order into
runs), per-bucket counts, running-sum the tiny bucket relation into
offsets, rank within buckets in parallel. Ranks are bit-identical to
the global window — the oracle replays the naive form to prove it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# 64 prefix-sum buckets over the 32-bit z domain
_ZBUCKET_SHIFT = 26


def zvalue16_sql(a: str, b: str) -> str:
    """SQL for the 32-bit Morton interleave of two 16-bit coordinates
    (``a`` in odd bit positions, ``b`` in even). Plain integer ops —
    valid Spark SQL and DuckDB SQL alike."""

    def spread(x: str) -> str:
        s = f"({x} & 65535)"
        s = f"(({s} | ({s} << 8)) & 16711935)"
        s = f"(({s} | ({s} << 4)) & 252645135)"
        s = f"(({s} | ({s} << 2)) & 858993459)"
        s = f"(({s} | ({s} << 1)) & 1431655765)"
        return s

    return f"(({spread(a)} << 1) | {spread(b)})"


def zorder_file_plan(
    df: DataFrame,
    dim_a: str,
    dim_b: str,
    tiebreak: str,
    n_files: int,
) -> DataFrame:
    """Assign every row to one of ``n_files`` equal-row files in
    z-order; returns the input plus ``zval`` and ``file_id``.

    ``tiebreak`` pins the order among equal z-values (required for a
    deterministic plan). Balanced cuts: file_id = rank·n_files div N,
    so file sizes differ by at most one row.
    """
    base = df.withColumn("zval", F.expr(zvalue16_sql(dim_a, dim_b))).withColumn(
        "_bkt", F.shiftright(F.col("zval"), _ZBUCKET_SHIFT)
    )
    totals = base.groupBy("_bkt").agg(F.count(F.lit(1)).alias("_tot"))
    wall = Window.orderBy("_bkt")
    offsets = totals.select(
        "_bkt",
        F.coalesce(
            F.sum("_tot").over(wall.rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0),
        ).alias("_offset"),
        F.sum("_tot")
        .over(
            wall.rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        )
        .alias("_n"),
    )
    win = Window.partitionBy("_bkt").orderBy("zval", tiebreak)
    return (
        base.join(F.broadcast(offsets), "_bkt")
        .withColumn(
            "_rank",
            F.col("_offset") + F.row_number().over(win) - F.lit(1),
        )
        .withColumn(
            "file_id",
            F.expr(f"(_rank * {int(n_files)}) div _n").cast("long"),
        )
        .drop("_bkt", "_offset", "_n", "_rank")
    )
