"""Rendezvous (highest-random-weight) shard placement.

Assigns every row to one of N shards such that growing the fleet to
N+1 moves only ~1/(N+1) of the rows (Thaler & Ravishankar's HRW
hashing — the placement rule behind consistent-hash stores): row r
lands on ``argmax_s h(r, s)``. Contrast with ``hash(r) % N``, where a
resize remaps ~(N-1)/N of all rows and a 100 TB lake re-shuffles
almost everything. This is the file→shard planning op for export
layouts (plans/layout.py zorder is WHERE in a file a row goes; this is
WHICH file/bucket the row goes to when the bucket count must be able
to grow).

Scale shape: the argmax over shards is a PURE COLUMN EXPRESSION — the
per-shard weights are a transform() over sequence(0, n_shards), the
winner an array_max; no explode, no shuffle, whole-stage codegen. The
weight is the 56-bit prefix of sha256(key ':' shard) packed with the
shard id into one BIGINT (h*16 + s, h < 2^56 so the pack can't
overflow), which makes argmax-with-deterministic-tie-break a plain
integer max and lets the DuckDB oracle replay it bit-exactly.

Reference analog: twinspect's seeded deterministic sampling idiom
(/root/reference/twinspect/datasets/ultils.py:18-31) — placement as a
pure function of the key, no RNG state, invariant to partitioning.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# pack = h*16 + s requires s < 16 and h < 2^56 (14 hex chars)
MAX_SHARDS = 16


def _packed_weights(key: Column, n: int) -> Column:
    """array of h(key, s)*16 + s for s in 0..n-1 (56-bit sha prefix)."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(n - 1)),
        lambda s: F.conv(
            F.substring(
                F.sha2(
                    F.concat(key.cast("string"), F.lit(":"), s.cast("string")),
                    256,
                ),
                1,
                14,
            ),
            16,
            10,
        ).cast("long")
        * 16
        + s,
    )


def rendezvous_shard(
    df: DataFrame, key_col: str, n_shards: int, with_next: bool = True
) -> DataFrame:
    """df + ``shard`` (HRW winner among n_shards) and, if with_next,
    ``shard_next`` (winner among n_shards+1) — the pair that makes the
    minimal-disruption property directly measurable: shard_next !=
    shard iff the row moves when the fleet grows by one, and HRW
    guarantees the only possible move target is the NEW shard."""
    if not 0 < n_shards < MAX_SHARDS:
        raise ValueError(f"n_shards must be in 1..{MAX_SHARDS - 1}")
    ext = n_shards + 1 if with_next else n_shards
    arr = _packed_weights(F.col(key_col), ext)
    out = df.withColumn("_w", arr).withColumn(
        "shard",
        (
            F.array_max(
                F.filter(F.col("_w"), lambda x: x % 16 < n_shards)
            )
            % 16
        ).cast("int"),
    )
    if with_next:
        out = out.withColumn(
            "shard_next", (F.array_max("_w") % 16).cast("int")
        )
    return out.drop("_w")
