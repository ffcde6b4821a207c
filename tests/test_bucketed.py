"""Bucketed catalog tables: co-located joins read both sides
pre-partitioned — the plan must carry NO shuffle Exchange (and no sort)
where the same join on plain parquet shuffles both relations."""

from __future__ import annotations

from pyspark.sql import functions as F

from twinspect_spark.sources.tables import write_bucketed

N_BUCKETS = 8


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _mk_rels(spark):
    sigs = spark.range(0, 2000).select(
        F.col("id").alias("file_id"),
        F.xxhash64("id").alias("simhash"),
    )
    clusters = spark.range(0, 2000, 3).select(
        F.col("id").alias("file_id"),
        (F.col("id") % 50).alias("cluster_id"),
    )
    return sigs, clusters


def test_bucketed_join_drops_both_exchanges(spark):
    sigs, clusters = _mk_rels(spark)
    write_bucketed(sigs, "tw_test_sigs_b", "file_id", N_BUCKETS)
    write_bucketed(clusters, "tw_test_clusters_b", "file_id", N_BUCKETS)
    try:
        joined = (
            # the merge hint pins a sort-merge join: a broadcast join
            # would also skip the shuffle but proves nothing about
            # bucketing (it must be on a join INPUT, not the result)
            spark.table("tw_test_sigs_b")
            .hint("merge")
            .join(spark.table("tw_test_clusters_b"), "file_id")
        )
        plan = _plan(joined)
        assert "Exchange" not in plan, plan
        assert "SelectedBucketsCount" in plan, plan

        # identical join on unbucketed relations shuffles both sides
        raw = sigs.hint("merge").join(clusters, "file_id")
        assert "Exchange" in _plan(raw)

        # layout changes the plan, never the result
        want = {
            (r["file_id"], r["cluster_id"])
            for r in sigs.join(clusters, "file_id").collect()
        }
        got = {(r["file_id"], r["cluster_id"]) for r in joined.collect()}
        assert got == want and len(got) == 667
    finally:
        spark.sql("DROP TABLE IF EXISTS tw_test_sigs_b")
        spark.sql("DROP TABLE IF EXISTS tw_test_clusters_b")


def test_bucketed_replace_semantics(spark):
    sigs, _ = _mk_rels(spark)
    try:
        write_bucketed(sigs.limit(10), "tw_test_replace_b", "file_id", 4)
        write_bucketed(sigs.limit(25), "tw_test_replace_b", "file_id", 4)
        assert spark.table("tw_test_replace_b").count() == 25
    finally:
        spark.sql("DROP TABLE IF EXISTS tw_test_replace_b")
