"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)      — flagship near-dup clustering of the sf0.001 documents
queries()         — operator battery (SURVEY.md §2 + training-data ops)
oracle_sql()      — matching ANSI SQL for the DuckDB correctness gate

All real logic lives in twinspect_spark/ (queries in
twinspect_spark/queries.py); this module is the thin driver-facing shim.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: end-to-end near-duplicate clustering of the sf0.001
    documents table — signatures → LSH candidates → exact verify →
    connected components → cluster-size histogram."""
    from pyspark.sql import functions as F

    from twinspect_spark.queries import q_dup_clusters

    clusters = q_dup_clusters(spark, "/root/testdata/sf0.001")
    return (
        clusters.groupBy("cluster_id")
        .agg(F.count("*").alias("cluster_size"))
        .groupBy("cluster_size")
        .agg(F.count("*").alias("n_clusters"))
        .orderBy("cluster_size")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from twinspect_spark.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from twinspect_spark.queries import ORACLE_SQL

    return dict(ORACLE_SQL)
