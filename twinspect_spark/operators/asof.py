"""As-of (backward temporal) join — a first-class operator Spark lacks.

For every left row (key, t) find the single most recent right row with
the same key and ``right_ts <= t``. The naive expression — inequality
join then per-left-row argmax window — explodes to the full history per
key before the window discards all but one row (a user with 1k orders
and 1k events materializes 10^6 intermediate rows per key).

The scalable shape used here is the **union-tag single-window** plan:

1. tag right rows side=0 carrying their payload, left rows side=1 with a
   null payload,
2. union and run ONE window ``last(payload, ignorenulls=True)`` ordered
   by (ts, side, seq) with rows unbounded-preceding → current,
3. keep side=1 rows.

Exactly one shuffle (the window's partitioning on key), intermediate
row count = |left| + |right| — never their product. Within-partition
sort replaces the join; this is the same plan a sort-merge as-of join
would run, expressed with existing Catalyst operators (window gets
whole-stage-codegen'd except the sort).

Tie semantics are explicit and deterministic: a right row at exactly
``t`` matches (side 0 sorts before side 1 at equal ts), and among right
rows with equal ts the one with the greatest ``seq`` column wins
(``last`` picks the latest in window order).

Reference relationship: the reference has no temporal joins (strictly
batch, no timestamps in its data plane — SURVEY.md §1.4); this operator
is part of the training-data-pipeline surface (point-in-time-correct
feature lookup / snapshot attribution) the engine adds beyond it.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# internal tagged-union column names; unioned with ALL of left's columns,
# so a caller schema containing one would silently collide
_RESERVED = ("_k", "_ts", "_side", "_seq", "_pay", "_m")


def _check_reserved(left: DataFrame, payload: Sequence[str]) -> None:
    """Fail fast (ValueError) instead of silently mis-joining when the
    caller's left schema or payload list uses one of the internal
    tagged-union column names."""
    clash = [c for c in left.columns if c in _RESERVED]
    clash += [c for c in payload if c in _RESERVED and c not in clash]
    if clash:
        raise ValueError(
            f"asof_join: column name(s) {clash} collide with internal "
            f"names {_RESERVED}; rename them before the join"
        )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    payload: Sequence[str],
    right_seq: str | None = None,
    prefix: str = "asof_",
) -> DataFrame:
    """Backward as-of join: left enriched with the latest right payload
    at or before each left row's timestamp.

    Parameters
    ----------
    on : equi-key column name (must exist on both sides).
    left_ts / right_ts : timestamp columns (orderable types).
    payload : right columns to carry; appear on the output as
        ``{prefix}{col}`` (NULL when no right row precedes the left row).
    right_seq : deterministic tie-break among right rows sharing a
        timestamp — the row with the greatest value wins. Required when
        right (key, ts) is not unique, else results depend on partition
        order.
    """
    _check_reserved(left, payload)
    pay = F.struct(*[F.col(c) for c in payload]).alias("_pay")
    seq = F.col(right_seq) if right_seq else F.lit(0)
    r = right.select(
        F.col(on).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        seq.cast("long").alias("_seq"),
        pay,
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left.columns],
    )
    l = left.select(
        F.col(on).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.lit(0).cast("long").alias("_seq"),
        F.lit(None).cast(r.schema["_pay"].dataType).alias("_pay"),
        *left.columns,
    )
    w = (
        Window.partitionBy("_k")
        .orderBy("_ts", "_side", "_seq")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = (
        r.unionByName(l)
        .withColumn("_m", F.last("_pay", ignorenulls=True).over(w))
        .where(F.col("_side") == 1)
    )
    return matched.select(
        *left.columns,
        *[F.col(f"_m.{c}").alias(f"{prefix}{c}") for c in payload],
    )


def asof_join_forward(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    payload: Sequence[str],
    right_seq: str | None = None,
    prefix: str = "asof_",
) -> DataFrame:
    """Forward as-of join: left enriched with the EARLIEST right
    payload at or after each left row's timestamp — the mirror of
    asof_join through the same tagged-union single-window plan, with
    the sort reversed (ts DESC) so `last(ignorenulls)` over the
    preceding frame picks the nearest following right row. Exact-ts
    right rows match (right sorts before left at equal ts); equal-ts
    right peers resolve to the SMALLEST right_seq (the mirror of the
    backward join's greatest-seq rule). One shuffle on the key,
    |L|+|R| intermediate rows, zero Join operators."""
    _check_reserved(left, payload)
    pay = F.struct(*[F.col(c) for c in payload]).alias("_pay")
    seq = F.col(right_seq) if right_seq else F.lit(0)
    r = right.select(
        F.col(on).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        seq.cast("long").alias("_seq"),
        pay,
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in left.columns
        ],
    )
    l = left.select(
        F.col(on).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.lit(0).cast("long").alias("_seq"),
        F.lit(None).cast(r.schema["_pay"].dataType).alias("_pay"),
        *left.columns,
    )
    w = (
        Window.partitionBy("_k")
        .orderBy(F.desc("_ts"), F.asc("_side"), F.desc("_seq"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = (
        r.unionByName(l)
        .withColumn("_m", F.last("_pay", ignorenulls=True).over(w))
        .where(F.col("_side") == 1)
    )
    return matched.select(
        *left.columns,
        *[F.col(f"_m.{c}").alias(f"{prefix}{c}") for c in payload],
    )
