"""S7: SQLite source/sink (SURVEY.md §2.1).

The reference reads its NewsEdits corpus out of a SQLite database with
driver-side cursor queries (twinspect/datasets/newsedits.py:158-198:
``SELECT entry_id, COUNT(*) ... GROUP BY entry_id HAVING ... `` then a
per-entry ``SELECT version, title, summary``). This adapter lets a
reference user point the engine at that same ``.db`` file — but the
read is Spark-shaped, not cursor-shaped:

- **Partitioned scan**: the driver probes ``min(rowid)``/``max(rowid)``
  and the declared schema (``PRAGMA table_info``), then fans out one
  bounded ``WHERE rowid BETWEEN lo AND hi`` range query per partition
  via ``mapInPandas`` — the same rowid-range splitting strategy
  ``spark.read.jdbc`` uses for its ``partitionColumn`` option, without
  needing a JDBC driver jar. Each task streams its range in bounded
  chunks, so executor memory tracks the chunk size, not the table.
  The db file must be visible to executors (shared storage on a real
  cluster — the same requirement JDBC-over-sqlite has).
- **Sharded write**: sqlite is single-writer BY DESIGN, so the sink
  writes one shard db per partition in parallel (each task owns its
  file — no lock contention), then the driver merges shards with
  ``ATTACH`` + ``INSERT INTO ... SELECT`` in deterministic partition
  order. The merge is a sequential disk copy — cheap relative to the
  upstream compute — and the parallel part (computing + serializing
  rows) is where the work lives.

The per-entry grouping the reference does in Python (≥ min_versions,
ordered by version) is plain DataFrame algebra downstream of this
source — see ``tests/test_sqlite_source.py`` for the parity flow.
"""

from __future__ import annotations

import os
import sqlite3
import tempfile
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

_CHUNK_ROWS = 10_000  # per-task streaming fetch size


def _decl_to_spark(decl: str) -> T.DataType:
    """SQLite type affinity (https://sqlite.org/datatype3.html §3.1) →
    Spark type: INT* → long, REAL/FLOA/DOUB → double, BLOB → binary,
    everything else (TEXT/CHAR/CLOB/empty) → string. NUMERIC affinity
    maps to string to stay lossless for mixed payloads."""
    d = (decl or "").upper()
    if "INT" in d:
        return T.LongType()
    if "REAL" in d or "FLOA" in d or "DOUB" in d:
        return T.DoubleType()
    if "BLOB" in d or d == "":
        return T.BinaryType()
    return T.StringType()


def sqlite_schema(db_path: str, table: str) -> T.StructType:
    """Declared schema of ``table`` via PRAGMA table_info."""
    with sqlite3.connect(db_path) as con:
        info = con.execute(f"PRAGMA table_info({_q(table)})").fetchall()
    if not info:
        raise ValueError(f"sqlite table not found: {table}")
    return T.StructType(
        [
            T.StructField(name, _decl_to_spark(decl), True)
            for _, name, decl, _, _, _ in info
        ]
    )


def _q(ident: str) -> str:
    """Quote an identifier (tables/columns come from PRAGMA or the
    caller's own schema, but quoting keeps odd names safe)."""
    return '"' + ident.replace('"', '""') + '"'


def read_sqlite(
    spark: SparkSession,
    db_path: str,
    table: str,
    num_partitions: int | None = None,
    columns: list[str] | None = None,
) -> DataFrame:
    """Partitioned scan of a SQLite table: one rowid-range query per
    partition, executed inside mapInPandas tasks. Column pruning is
    pushed into the per-task SELECT (pass ``columns``)."""
    full = sqlite_schema(db_path, table)
    names = columns or [f.name for f in full.fields]
    schema = T.StructType([f for f in full.fields if f.name in set(names)])
    with sqlite3.connect(db_path) as con:
        lo_hi = con.execute(
            f"SELECT min(rowid), max(rowid) FROM {_q(table)}"
        ).fetchone()
    if lo_hi[0] is None:  # empty table
        return spark.createDataFrame([], schema)
    lo, hi = int(lo_hi[0]), int(lo_hi[1])
    n = num_partitions or spark.sparkContext.defaultParallelism
    n = max(1, min(n, hi - lo + 1))
    # n contiguous rowid ranges covering [lo, hi]
    span = hi - lo + 1
    bounds = [
        (lo + (span * i) // n, lo + (span * (i + 1)) // n - 1)
        for i in range(n)
    ]
    ranges = spark.createDataFrame(
        bounds, T.StructType([
            T.StructField("r_lo", T.LongType(), False),
            T.StructField("r_hi", T.LongType(), False),
        ])
    ).repartition(n, "r_lo")
    sel = ", ".join(_q(c) for c in [f.name for f in schema.fields])
    sql = (
        f"SELECT {sel} FROM {_q(table)} "
        f"WHERE rowid BETWEEN ? AND ? ORDER BY rowid"
    )
    colnames = [f.name for f in schema.fields]

    def scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        con = sqlite3.connect(db_path)
        try:
            for b in batches:
                for r_lo, r_hi in zip(b["r_lo"], b["r_hi"]):
                    cur = con.execute(sql, (int(r_lo), int(r_hi)))
                    while True:
                        rows = cur.fetchmany(_CHUNK_ROWS)
                        if not rows:
                            break
                        # dtype=object keeps NULL-able int columns exact
                        # (a float64 coercion would corrupt large ints)
                        yield pd.DataFrame.from_records(
                            rows, columns=colnames
                        ).astype(object).where(pd.notnull, None)
        finally:
            con.close()

    return ranges.mapInPandas(scan, schema)


def _spark_to_decl(dt: T.DataType) -> str:
    if isinstance(dt, (T.LongType, T.IntegerType, T.ShortType,
                       T.ByteType, T.BooleanType)):
        return "INTEGER"
    if isinstance(dt, (T.DoubleType, T.FloatType)):
        return "REAL"
    if isinstance(dt, T.BinaryType):
        return "BLOB"
    return "TEXT"


def write_sqlite(
    df: DataFrame,
    db_path: str,
    table: str,
    mode: str = "overwrite",
    shard_dir: str | None = None,
) -> int:
    """Sharded SQLite sink: each partition writes its own shard db in
    parallel (sqlite is single-writer — per-task files sidestep the
    lock), the driver merges shards via ATTACH in partition order.
    Returns the row count written. ``shard_dir`` must be storage both
    executors and driver can see (defaults to a local tempdir — correct
    in local mode; pass a shared scratch path on a real cluster)."""
    if mode not in ("overwrite", "append"):
        raise ValueError(f"unsupported mode: {mode}")
    fields = df.schema.fields
    colnames = [f.name for f in fields]
    decls = ", ".join(
        f"{_q(f.name)} {_spark_to_decl(f.dataType)}" for f in fields
    )
    shard_dir = shard_dir or tempfile.mkdtemp(prefix="sqlite_shards_")
    os.makedirs(shard_dir, exist_ok=True)
    ins = (
        f"INSERT INTO {_q(table)} ({', '.join(_q(c) for c in colnames)}) "
        f"VALUES ({', '.join('?' * len(colnames))})"
    )
    manifest_schema = T.StructType([
        T.StructField("shard", T.StringType(), False),
        T.StructField("n_rows", T.LongType(), False),
    ])

    def write_shard(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        path = os.path.join(shard_dir, f"shard-{pid:05d}.db")
        con = sqlite3.connect(path)
        n = 0
        try:
            con.execute(f"CREATE TABLE {_q(table)} ({decls})")
            for b in batches:
                rows = list(b[colnames].itertuples(index=False, name=None))
                rows = [
                    tuple(None if pd.isna(v) else v for v in r) for r in rows
                ]
                con.executemany(ins, rows)
                n += len(rows)
            con.commit()
        finally:
            con.close()
        yield pd.DataFrame({"shard": [path], "n_rows": [n]})

    shards = sorted(
        (r.shard, r.n_rows)
        for r in df.mapInPandas(write_shard, manifest_schema).collect()
    )
    con = sqlite3.connect(db_path)
    try:
        if mode == "overwrite":
            con.execute(f"DROP TABLE IF EXISTS {_q(table)}")
        con.execute(f"CREATE TABLE IF NOT EXISTS {_q(table)} ({decls})")
        for shard, _ in shards:
            con.execute("ATTACH ? AS s", (shard,))
            con.execute(
                f"INSERT INTO {_q(table)} SELECT * FROM s.{_q(table)}"
            )
            con.commit()
            con.execute("DETACH s")
    finally:
        con.close()
    return sum(n for _, n in shards)
