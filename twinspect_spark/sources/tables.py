"""Catalog-table source/sink — the north-rule's Iceberg seam.

The engine's input contract is a files TABLE ``(repo, path, commit,
lang, content)`` served by the cluster's catalog. On a real deployment
that catalog is Iceberg (``spark.sql.catalog.<name>`` conf + the
iceberg-spark-runtime jar) and these helpers resolve through
``spark.table()`` / ``DataFrame.writeTo()`` — the DataSourceV2 API
Iceberg implements, which is also where partition pruning, hidden
partitioning, and snapshot reads come from. This sandbox ships no
Iceberg runtime jar, so tests exercise the same code path against the
built-in ``spark_catalog`` with parquet-backed managed tables; pointing
at Iceberg is a deploy-time ``--conf`` change, not a code change.

A ``source`` string is treated as a catalog table reference when it
looks like a (possibly catalog-/schema-qualified) identifier and does
not exist on the filesystem; otherwise it is a parquet path. That rule
keeps one CLI flag working for both worlds.
"""

from __future__ import annotations

import os
import re

from pyspark.sql import DataFrame, SparkSession

# at least one dot (db.table or catalog.db.table): a bare single
# segment like "clusters_out" is far more likely a relative output path
# than a default-namespace table, and misrouting a write is worse than
# asking the user to qualify the name
_TABLE_RE = re.compile(r"^[A-Za-z_][\w]*(\.[A-Za-z_][\w]*){1,2}$")


_DATA_EXTS = {"parquet", "csv", "json", "orc", "txt"}


def is_table_ref(source: str) -> bool:
    if not _TABLE_RE.match(source) or os.path.exists(source):
        return False
    # "out.parquet" is a dotted identifier too — but an extension-shaped
    # last segment means a file path, not a table
    return source.rsplit(".", 1)[-1].lower() not in _DATA_EXTS


def read_table(spark: SparkSession, source: str) -> DataFrame:
    """Catalog table name → ``spark.table`` (Iceberg et al.); anything
    else → parquet path."""
    if is_table_ref(source):
        return spark.table(source)
    return spark.read.parquet(source)


def write_table(df: DataFrame, target: str, provider: str = "parquet") -> None:
    """Replace ``target`` with ``df``. Catalog references go through the
    DataSourceV2 ``writeTo`` API (Iceberg's native write path — becomes
    a transactional snapshot commit there); paths fall back to a parquet
    overwrite. ``provider`` applies only to catalog creation and is
    ignored by catalogs with a fixed format (Iceberg)."""
    if is_table_ref(target):
        try:
            df.writeTo(target).using(provider).createOrReplace()
        except Exception:
            # transactional REPLACE TABLE AS SELECT needs a V2 catalog
            # with staging support (Iceberg has it); the built-in
            # session catalog does not — fall back to drop + create,
            # which loses atomicity but not correctness
            df.sparkSession.sql(f"DROP TABLE IF EXISTS {target}")
            df.writeTo(target).using(provider).create()
    else:
        df.write.mode("overwrite").parquet(target)


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    n_buckets: int = 32,
    provider: str = "parquet",
) -> None:
    """Persist ``df`` as a catalog table hash-BUCKETED (and sorted)
    by ``key`` — the co-located-join layout for relations that are
    repeatedly joined on the same key (signatures ⋈ clusters,
    signatures ⋈ candidate ids, …).

    A join of two tables bucketed on the join key with matching bucket
    counts reads both sides already partitioned by the key: Catalyst
    drops BOTH shuffle Exchanges (and, with ``sortBy``, both sorts) from
    the sort-merge join — at 100 TB that is the difference between
    re-shuffling the full signature store on every consumer and reading
    it join-ready. The streaming stores get the same effect from
    directory partitions (bucket_pt/id_pt + PartitionFilters); bucketed
    catalog tables are the batch-side counterpart for high-cardinality
    equi-join keys where directory-per-key is infeasible. On Iceberg
    the equivalent layout is the hidden partition transform
    ``bucket(N, key)`` declared at CREATE TABLE; the write call is the
    only thing that changes.

    Spark's parquet bucketing cannot transactionally replace an
    existing table; this helper mirrors write_table's drop + create
    fallback semantics. With an IN-MEMORY session catalog a previous
    process may have left the managed LOCATION on disk while this
    session's catalog has no entry — DROP is then a no-op and CTAS
    fails with LOCATION_ALREADY_EXISTS — so the orphaned local
    directory is cleared explicitly (a Hive/Iceberg catalog never hits
    that branch: its DROP removes the location).
    """
    ss = df.sparkSession
    ss.sql(f"DROP TABLE IF EXISTS {table}")
    parts = table.split(".")
    db, name = (parts[-2], parts[-1]) if len(parts) >= 2 else ("default", table)
    wh = ss.conf.get("spark.sql.warehouse.dir", "")
    wh = wh[len("file:"):] if wh.startswith("file:") else wh
    loc = os.path.join(wh, name if db == "default" else f"{db}.db/{name}")
    if wh and os.path.isdir(loc):
        import shutil

        shutil.rmtree(loc)
    (
        df.write.format(provider)
        .mode("overwrite")
        .bucketBy(n_buckets, key)
        .sortBy(key)
        .saveAsTable(table)
    )
