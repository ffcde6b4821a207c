"""Deterministic Bloom-filter bit positions as a pure column
expression (no UDF): k positions from disjoint 8-hex windows of
sha256(key). Cryptographically uniform, whole-stage-codegen on the
JVM, and bit-exactly replayable in ANSI SQL via
``CAST(concat('0x', substr(sha256(key), 1+8*i, 8)) AS UBIGINT) % m``
— which is what puts Bloom-based operators under the DuckDB oracle
(queries.py `bloom_seen_filter`).

Used by the batch seen-filter query and the streaming crawl-frontier
store (streaming/frontier.py). sha256 yields 64 hex chars = eight
disjoint 32-bit windows, so k <= 8.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def bloom_positions(key: Column, m: int, k: int) -> Column:
    """array<long> of k Bloom bit positions in [0, m) for ``key``."""
    if not 1 <= k <= 8:
        raise ValueError(f"k must be in 1..8 (got {k})")
    h = F.sha2(key, 256)
    return F.array(
        *[
            F.conv(F.substring(h, 1 + 8 * i, 8), 16, 10).cast("long") % m
            for i in range(k)
        ]
    )
