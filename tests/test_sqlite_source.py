"""S7 SQLite source/sink: partitioned rowid-range reads, sharded
writes, and the reference's NewsEdits entry-selection flow
(newsedits.py:158-198) as DataFrame algebra over the source."""

from __future__ import annotations

import sqlite3

import pytest
from pyspark.sql import functions as F

from twinspect_spark.sources.sqlite_src import (
    read_sqlite,
    sqlite_schema,
    write_sqlite,
)


@pytest.fixture(scope="module")
def news_db(tmp_path_factory):
    """entryversion-like table: 40 entries × 1..5 versions, with NULL
    titles and a large int to catch float64 corruption."""
    path = str(tmp_path_factory.mktemp("sqlite") / "news.db")
    con = sqlite3.connect(path)
    con.execute(
        "CREATE TABLE entryversion ("
        "entry_id INTEGER, version INTEGER, title TEXT, summary TEXT, "
        "big INTEGER)"
    )
    rows = []
    for e in range(40):
        for v in range(1 + e % 5):
            rows.append(
                (
                    e,
                    v,
                    None if (e + v) % 7 == 0 else f"title {e}.{v}",
                    f"summary text for entry {e} version {v}",
                    (1 << 60) + e * 1000 + v,
                )
            )
    con.executemany("INSERT INTO entryversion VALUES (?,?,?,?,?)", rows)
    con.commit()
    con.close()
    return path, rows


def test_schema_inference(news_db):
    path, _ = news_db
    s = sqlite_schema(path, "entryversion")
    assert [f.name for f in s.fields] == [
        "entry_id", "version", "title", "summary", "big",
    ]
    assert [f.dataType.simpleString() for f in s.fields] == [
        "bigint", "bigint", "string", "string", "bigint",
    ]


def test_partitioned_read_exact(spark, news_db):
    path, rows = news_db
    df = read_sqlite(spark, path, "entryversion", num_partitions=5)
    assert df.rdd.getNumPartitions() >= 5
    got = {tuple(r) for r in df.collect()}
    assert got == set(rows)  # NULLs and 2^60-scale ints survive exactly


def test_column_pruning_pushed(spark, news_db):
    path, rows = news_db
    df = read_sqlite(
        spark, path, "entryversion", num_partitions=3,
        columns=["entry_id", "version"],
    )
    assert df.columns == ["entry_id", "version"]
    assert {tuple(r) for r in df.collect()} == {r[:2] for r in rows}


def test_newsedits_entry_selection_parity(spark, news_db):
    """The reference's cursor flow — entries with >= min_versions,
    versions ordered — as DataFrame algebra, checked against direct
    SQL on the same db."""
    path, _ = news_db
    min_versions = 3
    df = read_sqlite(spark, path, "entryversion", num_partitions=4)
    picked = (
        df.groupBy("entry_id")
        .agg(F.count("*").alias("version_count"))
        .where(F.col("version_count") >= min_versions)
    )
    got = sorted((r.entry_id, r.version_count) for r in picked.collect())
    con = sqlite3.connect(path)
    want = con.execute(
        "SELECT entry_id, COUNT(*) AS c FROM entryversion "
        "GROUP BY entry_id HAVING c >= ? ORDER BY entry_id",
        (min_versions,),
    ).fetchall()
    con.close()
    assert got == [tuple(w) for w in want]
    assert got  # selection is non-trivial


def test_write_roundtrip(spark, news_db, tmp_path):
    path, rows = news_db
    df = read_sqlite(spark, path, "entryversion", num_partitions=4)
    out = str(tmp_path / "out.db")
    n = write_sqlite(df, out, "entryversion", shard_dir=str(tmp_path / "sh"))
    assert n == len(rows)
    back = read_sqlite(spark, out, "entryversion", num_partitions=2)
    assert {tuple(r) for r in back.collect()} == set(rows)


def test_write_append(spark, news_db, tmp_path):
    path, rows = news_db
    df = read_sqlite(spark, path, "entryversion", num_partitions=2)
    out = str(tmp_path / "app.db")
    write_sqlite(df, out, "t", shard_dir=str(tmp_path / "s1"))
    write_sqlite(df, out, "t", mode="append", shard_dir=str(tmp_path / "s2"))
    con = sqlite3.connect(out)
    assert con.execute("SELECT count(*) FROM t").fetchone()[0] == 2 * len(rows)
    con.close()


def test_empty_table(spark, tmp_path):
    path = str(tmp_path / "empty.db")
    con = sqlite3.connect(path)
    con.execute("CREATE TABLE t (a INTEGER, b TEXT)")
    con.commit()
    con.close()
    df = read_sqlite(spark, path, "t")
    assert df.count() == 0
    assert df.columns == ["a", "b"]
